#!/usr/bin/env python3
"""Merge a PARTIAL ScaleBench run (SPARK_GRAFT_ONLY=...) into BENCH_sf1.json.

ScaleBench only writes BENCH_sf1.json on full runs; targeted slope probes
print `[scalebench] <name> base=..s scaled=..s slope=.. rows: a -> b`
lines instead. This parses those lines from a captured log and updates the
committed snapshot in place, so per-query refreshes don't require paying
for the whole 20-query sweep.

Usage: tools/merge_sf1.py <scalebench-log> [BENCH_sf1.json]
"""
import json
import re
import sys

log = sys.argv[1]
snap = sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf1.json"

pat = re.compile(
    r"\[scalebench\] (\S+)\s+base=\s*([0-9.]+)s scaled=\s*([0-9.]+)s "
    r"slope=\s*([0-9.]+) rows: (\d+) -> (\d+)")
rows = {}
with open(log) as f:
    for line in f:
        m = pat.search(line)
        if m:
            name, base, scaled, slope, rb, rs = m.groups()
            rows[name] = {
                "base_sec": float(base), "scaled_sec": float(scaled),
                "slope": float(slope),
                "base_rows": int(rb), "scaled_rows": int(rs),
            }
if not rows:
    sys.exit(f"no [scalebench] lines found in {log}")

with open(snap) as f:
    doc = json.load(f)
for name, row in rows.items():
    old = doc["queries"].get(name)
    doc["queries"][name] = row
    print(f"{name}: {old} -> {row}")
doc["queries"] = dict(sorted(doc["queries"].items()))
with open(snap, "w") as f:
    json.dump(doc, f, indent=1, sort_keys=False)
    f.write("\n")
print(f"merged {len(rows)} rows into {snap}")
