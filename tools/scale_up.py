#!/usr/bin/env python3
"""Scale a testdata dir N× for stress runs (default: sf0.1 → ~sf1).

Replicates each fact table N times with FK-consistent key remapping: every
key column shifts by copy_index * (max(domain)+1), so distinct counts, join
fan-outs and group cardinalities scale realistically instead of just
duplicating rows under the same keys. Dimension tables (region, nation) copy
once. Value columns (text, embeddings, timestamps) are left untouched.

Usage: python3 tools/scale_up.py [src] [dst] [copies] [skew_frac]

skew_frac (default 0): after scaling, remap that fraction of events rows
to ONE hot user_id — the power-law fixture for as-of-join / sessionization
skew runs. The remap is deterministic (event_id % 100 < frac*100).
"""
import duckdb, os, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
skew_frac = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
os.makedirs(dst, exist_ok=True)

# key column → key domain (domains shared across tables keep FKs valid)
KEYS = {
    "region": {}, "nation": {},
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
DOMAINS = {"cust": ("customer", "c_custkey"), "supp": ("supplier", "s_suppkey"),
           "part": ("part", "p_partkey"), "order": ("orders", "o_orderkey"),
           "event": ("events", "event_id"), "user": ("events", "user_id"),
           "doc": ("documents", "doc_id"), "vec": ("embeddings", "vec_id")}

con = duckdb.connect()
bases = {d: con.sql(f"SELECT max({c}) + 1 FROM read_parquet('{src}/{t}.parquet')")
            .fetchone()[0] for d, (t, c) in DOMAINS.items()}

for t, keymap in KEYS.items():
    path = f"{src}/{t}.parquet"
    desc = con.sql(f"DESCRIBE SELECT * FROM read_parquet('{path}')").fetchall()
    if not keymap:
        con.sql(f"COPY (SELECT * FROM read_parquet('{path}')) "
                f"TO '{dst}/{t}.parquet' (FORMAT parquet)")
        continue
    exprs = []
    for name, dtype, *_ in desc:
        if name in keymap:
            exprs.append(f'CAST("{name}" + i * {bases[keymap[name]]} AS {dtype}) AS "{name}"')
        else:
            exprs.append(f'"{name}"')
    q = (f"SELECT {', '.join(exprs)} FROM read_parquet('{path}') "
         f"CROSS JOIN (SELECT unnest(range({copies})) AS i)")
    if t == "events" and skew_frac > 0:
        # power-law fixture: a deterministic slice of all events collapses
        # onto one hot user (user_id 0 stays a valid domain member)
        pct = int(skew_frac * 100)
        q = (f"SELECT * REPLACE (CASE WHEN event_id % 100 < {pct} "
             f"THEN 0 ELSE user_id END AS user_id) FROM ({q})")
    con.sql(f"COPY ({q}) TO '{dst}/{t}.parquet' (FORMAT parquet)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")
print(f"wrote {dst} at {copies}x {src}")
