#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run Verify's dumped results
against the DuckDB oracle and diff them. Usage:
  python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import duckdb, json, sys, glob, os

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for q, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{q}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {q}: no spark output"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
        want = con.sql(sql)
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {q}: columns {gcols} != {wcols}"); fails += 1; continue
        sel = ", ".join(f'"{c}"' for c in gcols)
        g = con.sql(f"SELECT {sel} FROM got ORDER BY ALL").fetchall()
        w = con.sql(f"SELECT {sel} FROM want ORDER BY ALL").fetchall()
        if len(g) != len(w):
            print(f"FAIL {q}: rows {len(g)} != {len(w)}"); fails += 1; continue
        bad = [(a, b) for a, b in zip(g, w) if a != b]
        if bad:
            print(f"FAIL {q}: {len(bad)} mismatched rows, first: {bad[0]}"); fails += 1
        else:
            print(f"PASS {q} ({len(g)} rows)")
    except Exception as e:
        print(f"FAIL {q}: {type(e).__name__}: {e}"); fails += 1
sys.exit(1 if fails else 0)
