#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run Verify's dumped results
against the DuckDB oracle and diff them. Usage:
  python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Strictness contract (round 11 lesson — local green MUST predict driver
green):
  * float cells compare at BIT level (struct.pack '>d'), so -0.0 vs 0.0
    and NaN-payload divergences FAIL here exactly as they fail the
    driver's bit/string hash; plain tuple `!=` treats -0.0 == 0.0 and
    let a12 slip through in round 11.
  * ARRAY/LIST-typed columns in the Spark output are a hard FAIL: the
    driver's pandas sorter crashes on them ("unhashable type:
    numpy.ndarray", round-11 e13) before any comparison happens.
"""
import decimal, duckdb, json, struct, sys, glob, os

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")


def bits(cell):
    """Bit-identity key for one cell: floats go to their IEEE-754 bytes
    (the driver hashes representations, not tolerant equality). DECIMAL
    goes through float64 first — the driver's pandas fetch converts
    DuckDB DECIMAL to float64, so that is the representation it hashes
    (fetchall() keeping exact Decimal objects would be STRICTER than
    the driver and flag t4's DECIMAL oracle column, which is
    driver-green)."""
    if isinstance(cell, decimal.Decimal):
        cell = float(cell)
    if isinstance(cell, float):
        return struct.pack(">d", cell)
    if isinstance(cell, (list, tuple)):
        return tuple(bits(x) for x in cell)
    return cell


def row_key(row):
    return tuple(bits(c) for c in row)


oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for q, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{q}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {q}: no spark output"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
        listy = [c for c, t in zip(got.columns, got.types)
                 if str(t).endswith("[]") or str(t).startswith("STRUCT")]
        if listy:
            print(f"FAIL {q}: non-scalar output columns {listy} "
                  "(driver's pandas sorter cannot hash them)")
            fails += 1; continue
        want = con.sql(sql)
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {q}: columns {gcols} != {wcols}"); fails += 1; continue
        sel = ", ".join(f'"{c}"' for c in gcols)
        g = con.sql(f"SELECT {sel} FROM got ORDER BY ALL").fetchall()
        w = con.sql(f"SELECT {sel} FROM want ORDER BY ALL").fetchall()
        if len(g) != len(w):
            print(f"FAIL {q}: rows {len(g)} != {len(w)}"); fails += 1; continue
        bad = [(a, b) for a, b in zip(g, w) if row_key(a) != row_key(b)]
        if bad:
            print(f"FAIL {q}: {len(bad)} mismatched rows, first: {bad[0]}"); fails += 1
        else:
            print(f"PASS {q} ({len(g)} rows)")
    except Exception as e:
        print(f"FAIL {q}: {type(e).__name__}: {e}"); fails += 1
sys.exit(1 if fails else 0)
