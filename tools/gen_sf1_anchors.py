#!/usr/bin/env python3
"""Derive SteadyState.sf1Sec entries from a REPEAT=2 sf1 sidecar:
anchor = the pass-2 wall (the steady reading; `passes[0]`), falling back
to pass-1 when a query has no extra pass. Emits the Scala map body,
2-decimal, sorted by query name — paste into SteadyState.sf1Sec.
Usage: gen_sf1_anchors.py <bench_detail_sf1.json>"""
import json, sys

d = json.load(open(sys.argv[1]))
assert d.get("repeat", 1) >= 2, "need a REPEAT>=2 sidecar (pass-2 = steady)"
rows = []
for name, q in sorted(d["queries"].items()):
    passes = q.get("passes") or []
    steady = passes[0] if passes else q.get("p1")
    if steady is None:
        continue  # failed query: no anchor
    rows.append((name, steady))
for name, steady in rows:
    print(f'    "{name}" -> {steady:.2f},')
print(f"// {len(rows)} anchors from {d.get('sf')} ts_ms={d.get('ts_ms')}",
      f"total={d.get('total_sec')}")
