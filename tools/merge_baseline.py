#!/usr/bin/env python3
"""Extend BASELINE_RDD.json to the full query surface.

Recorded baseline numbers are never overwritten: queries already in the
baseline keep their original seconds (the regression contract's fixed
point); queries present in the bench artifact but missing from the
baseline are appended with this round's min-of-N rdd seconds.

Usage: python3 tools/merge_baseline.py <bench_queries.json> <round>
"""
import json, sys

bench_path = sys.argv[1]
rnd = int(sys.argv[2])
base_path = "BASELINE_RDD.json"

bench = json.load(open(bench_path))
rdd_min = bench["rdd"]["min"]
base = json.load(open(base_path))
q = base["queries"]
added = {k: v for k, v in rdd_min.items() if k not in q and v >= 0}
if not added:
    # nothing to merge: leave the file byte-identical (reruns previously
    # grew the note string unboundedly — ADVICE r13)
    print(f"baseline unchanged at {len(q)} queries (+0)")
    sys.exit(0)
q.update(added)
base["note"] = (base.get("note", "") +
    f"; r{rnd}: +{len(added)} queries appended from BENCH_r{rnd} "
    f"(existing {len(q) - len(added)} numbers retained verbatim)")
json.dump(base, open(base_path, "w"), indent=1)
print(f"baseline now {len(q)} queries (+{len(added)}):",
      sorted(added)[:8], "...")
