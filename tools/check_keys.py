#!/usr/bin/env python3
"""Dev-loop oracle check: run graft.Verify for the given keys at a SF,
then compare each parquet result against the DuckDB oracle the same way
the driver does (columns sorted by name, rows sorted, values compared).

Usage: python3 tools/check_keys.py sf0.01 key1 key2 ...
"""
import json, subprocess, sys, tempfile, os
import duckdb, pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
keys = sys.argv[2:]
sfdir = f"/root/testdata/{sf}"
out = tempfile.mkdtemp(prefix="graftverify_")
cmd = ["sbt", "-batch", f"runMain graft.Verify {sfdir} {out} " + " ".join(keys)]
env = dict(os.environ, SPARK_GRAFT_CPUS="32")
r = subprocess.run(cmd, cwd="/root/repo", env=env, capture_output=True, text=True)
if "error" in r.stdout.lower() and "[success]" not in r.stdout:
    print(r.stdout[-3000:]); sys.exit(1)

oracle = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

fail = 0
for k in (keys or sorted(oracle)):
    pq = f"{out}/{k}"
    if not os.path.isdir(pq):
        print(f"{k}: NO SPARK OUTPUT"); fail += 1; continue
    s = pd.read_parquet(pq)
    if k not in oracle:
        print(f"{k}: no oracle (rows={len(s)})"); continue
    o = con.sql(oracle[k]).df()
    s = s.reindex(sorted(s.columns), axis=1)
    o = o.reindex(sorted(o.columns), axis=1)
    if list(s.columns) != list(o.columns):
        print(f"{k}: SCHEMA MISMATCH spark={list(s.columns)} oracle={list(o.columns)}"); fail += 1; continue
    s = s.sort_values(list(s.columns)).reset_index(drop=True)
    o = o.sort_values(list(o.columns)).reset_index(drop=True)
    if len(s) != len(o):
        print(f"{k}: ROWS {len(s)} vs {len(o)}"); fail += 1; continue
    ok = True
    for c in s.columns:
        a, b = s[c], o[c]
        try:
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                if not ((a.astype(float) - b.astype(float)).abs() < 1e-9).all(): ok = False
            else:
                if not (a.astype(str) == b.astype(str)).all(): ok = False
        except Exception as e:
            ok = False
        if not ok:
            d = (a.astype(str) != b.astype(str))
            print(f"{k}: COL {c} diff, first rows:\n{pd.concat([a[d], b[d]], axis=1).head()}")
            break
    print(f"{k}: {'PASS' if ok else 'FAIL'} ({len(s)} rows)")
    fail += 0 if ok else 1
sys.exit(1 if fail else 0)
