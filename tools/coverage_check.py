#!/usr/bin/env python3
"""SURVEY.md §2 x CORRECTNESS bijection check (round 15, VERDICT item 7).

Every Tier A/B row in SURVEY.md §2 carries a machine-readable Check cell
(last column, backticked): comma-separated CORRECTNESS query keys, or
`spec:<SuiteName>` for components the DuckDB oracle cannot hash, or
`infra`. This script asserts:

  1. every row has a Check cell;
  2. every cited query key exists in CORRECTNESS_r<N>.json and is fully
     green (rows_match + schema_match + hash_match, no err);
  3. every `spec:` suite name exists under src/test;
  4. (report-only) CORRECTNESS keys cited by no row.

Usage: python3 tools/coverage_check.py [CORRECTNESS_rNN.json]
Exit 1 on any assertion failure — run in the seal step.
"""
import glob, json, re, subprocess, sys

corr_path = sys.argv[1] if len(sys.argv) > 1 else \
    sorted(glob.glob("CORRECTNESS_r*.json"))[-1]
corr = json.load(open(corr_path))
# queries added since the last driver artifact: the builder records its own
# selfcheck result there (same row shape) until the next CORRECTNESS_rN lands
try:
    corr = {**json.load(open("CORRECTNESS_localnew.json")), **corr}
except FileNotFoundError:
    pass

rows = {}
no_check = []
for line in open("SURVEY.md"):
    m = re.match(r"^\| ([AB]\d+) \|", line)
    if not m:
        continue
    rid = m.group(1)
    c = re.search(r"`([^`]*)` \|\s*$", line)
    if not c:
        no_check.append(rid)
    else:
        rows[rid] = c.group(1)

fails = []
if no_check:
    fails.append(f"rows with no Check cell: {no_check}")

cited = set()
test_src = subprocess.run(
    ["grep", "-rloE", "class [A-Za-z0-9]+", "src/test/scala"],
    capture_output=True, text=True).stdout
for rid, cell in sorted(rows.items()):
    for tok in cell.split(","):
        tok = tok.strip()
        if tok == "infra":
            continue
        if tok.startswith("spec:"):
            suite = tok[5:]
            hit = subprocess.run(["grep", "-rl", f"class {suite}",
                                  "src/test/scala"], capture_output=True,
                                 text=True).stdout.strip()
            if not hit:
                fails.append(f"{rid}: spec suite {suite} not found in src/test")
            continue
        cited.add(tok)
        q = corr.get(tok)
        if q is None:
            fails.append(f"{rid}: query {tok} missing from {corr_path}")
        elif q.get("err") or not (q.get("rows_match") and
                                  q.get("schema_match") and
                                  q.get("hash_match")):
            fails.append(f"{rid}: query {tok} not green in {corr_path}: {q}")

uncited = sorted(set(corr) - cited)
print(f"rows: {len(rows)}  cited queries: {len(cited)}  "
      f"correctness queries: {len(corr)}  uncited: {len(uncited)}")
if uncited:
    print("uncited (info only):", ", ".join(uncited))
if fails:
    print("\n".join("FAIL " + f for f in fails))
    sys.exit(1)
print("coverage check: OK")
