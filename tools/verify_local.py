#!/usr/bin/env python3
"""Local reproduction of the driver's t2 correctness gate (SURVEY §5.3).

Usage: python3 tools/verify_local.py <sfDir> <outDir> [key ...]

Reads <outDir>/<key>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle SQL in DuckDB with views over
<sfDir>/*.parquet, canonicalises both sides (sort columns by name), and
compares row count, column names, and values. Dev-only tool — the
shipped engine is the Scala library; this script never runs on cluster.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) < 1e-9
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(values_equal(x, y) for x, y in zip(la, lb))
    return a == b


def compare(key: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame):
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        return f"COLS spark={list(s.columns)} duck={list(d.columns)}"
    if len(s) != len(d):
        return f"ROWS spark={len(s)} duck={len(d)}"
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (x, y) in enumerate(zip(sv, dv)):
            if not values_equal(x, y):
                return f"VAL col={col} row={i} spark={x!r} duck={y!r}"
    # dtype drift is only a warning locally (driver may be stricter)
    warn = [
        (c, str(s[c].dtype), str(d[c].dtype))
        for c in s.columns
        if str(s[c].dtype) != str(d[c].dtype)
    ]
    return ("WARN-DTYPE " + str(warn)) if warn else None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    n_pass = n_fail = 0
    for key, sql in sorted(oracle.items()):
        if only and key not in only:
            continue
        res_dir = Path(out_dir, key)
        if not res_dir.exists():
            print(f"FAIL {key}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = pd.read_parquet(res_dir)
            duck_df = con.execute(sql).fetchdf()
            err = compare(key, spark_df, duck_df)
        except Exception as e:  # noqa: BLE001
            err = f"EXC {type(e).__name__}: {e}"
        if err is None or err.startswith("WARN"):
            print(f"PASS {key} ({len(spark_df)} rows)" + (f"  [{err}]" if err else ""))
            n_pass += 1
        else:
            print(f"FAIL {key}: {err}")
            n_fail += 1
    declared_no_oracle = "declared-no-oracle keys are unit-tested, not compared here"
    print(f"== {n_pass} pass / {n_fail} fail  ({declared_no_oracle})")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
