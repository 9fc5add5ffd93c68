#!/usr/bin/env python3
"""Determinism probe (SURVEY §5.3): two independent graft.Verify runs
must produce BYTE-IDENTICAL values for every declared key — catching
unordered output, partition-dependent float sums, and RNG leakage that
the single-run oracle compare cannot see.

Usage: python3 tools/determinism_probe.py <outDirA> <outDirB>
(the caller runs `sbt "runMain graft.Verify <sfDir> <outDir>"` twice
first; separate JVMs give genuinely different partition/merge orders).

Dev-only tool; the shipped engine is the Scala library.
"""
import sys
from pathlib import Path

import pandas as pd


def main() -> None:
    a, b = Path(sys.argv[1]), Path(sys.argv[2])
    keys = sorted(p.name for p in a.iterdir() if p.is_dir())
    keys_b = sorted(p.name for p in b.iterdir() if p.is_dir())
    if keys != keys_b:
        print(f"KEY SET MISMATCH: {set(keys) ^ set(keys_b)}")
        sys.exit(1)
    bad = []
    for k in keys:
        da, db = pd.read_parquet(a / k), pd.read_parquet(b / k)
        same = list(da.columns) == list(db.columns)
        if same:
            # row order across part files is a partitioning artifact,
            # not part of the declared result: canonicalize both sides
            # by a full-column sort before the byte compare
            cols = list(da.columns)
            try:
                # sort into temporaries so a TypeError on EITHER side
                # leaves both frames unsorted (sorted-vs-unsorted would
                # be a guaranteed spurious FAIL)
                sa = da.sort_values(cols, kind="mergesort").reset_index(drop=True)
                sb = db.sort_values(cols, kind="mergesort").reset_index(drop=True)
                da, db = sa, sb
            except TypeError:
                # unsortable (array-typed) column: compare as emitted
                pass
            same = da.equals(db)
        print(f"{'PASS' if same else 'FAIL'} {k} ({len(da)} rows)")
        if not same:
            bad.append(k)
    print(f"== {len(keys) - len(bad)} deterministic / {len(bad)} nondeterministic")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
