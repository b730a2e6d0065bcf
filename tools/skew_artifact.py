#!/usr/bin/env python3
"""Fold one or more selfcheck logs into a SKEW_rN.json artifact.

Each log line of interest is `PASS <name> (<n> rows)` or `FAIL <name>: ...`.
Later logs win on duplicate names (supplement runs re-check new queries).

Usage: python3 tools/skew_artifact.py <out.json> <dataset> <log> [<log> ...]
"""
import json, re, sys

out_path, dataset = sys.argv[1], sys.argv[2]
results = {}
for path in sys.argv[3:]:
    for line in open(path):
        m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
        if m:
            results[m.group(1)] = {"pass": True, "rows": int(m.group(2))}
            continue
        m = re.match(r"FAIL (\S+): (.*)", line)
        if m and "no engine output" not in m.group(2):
            results[m.group(1)] = {"pass": False, "err": m.group(2)[:200]}

n_pass = sum(1 for v in results.values() if v["pass"])
json.dump({
    "dataset": dataset,
    "n_queries": len(results),
    "n_pass": n_pass,
    "n_fail": len(results) - n_pass,
    "failed": sorted(k for k, v in results.items() if not v["pass"]),
    "queries": {k: results[k] for k in sorted(results)},
}, open(out_path, "w"), indent=1)
print(f"{out_path}: {n_pass}/{len(results)} pass")
