#!/usr/bin/env python3
"""Merge freshly-benched keys into an existing BENCH_SCALE10 artifact.

Usage:
  python3 tools/merge_scale10.py BENCH_SCALE10_r18.json <bench_1x.json> \
      <bench_10x.json> [--bound 12] [--note key="text" ...] [--method-append "text"]

Reads the committed artifact, computes growth for every key present in
BOTH subset bench runs (min-of-runs each side, same rule as
assemble_scale10), and writes the union back — existing keys keep
their committed numbers unless re-measured in these runs. Summary
counts and flagged keys are recomputed over the union.
"""
import datetime
import json
import sys
from pathlib import Path


def main():
    art_path = Path(sys.argv[1])
    art = json.loads(art_path.read_text())
    b1 = json.loads(Path(sys.argv[2]).read_text())
    b10 = json.loads(Path(sys.argv[3]).read_text())
    bound = float(art.get("bound", 12.0)) if "bound" in art else 12.0
    notes, method_append = {}, ""
    args = sys.argv[4:]
    i = 0
    while i < len(args):
        if args[i] == "--bound":
            bound = float(args[i + 1]); i += 2
        elif args[i] == "--note":
            k, _, v = args[i + 1].partition("="); notes[k] = v; i += 2
        elif args[i] == "--method-append":
            method_append = args[i + 1]; i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    def per_key(bench):
        # bench_full.json shape: queries = min per key, runs = all runs,
        # plans = operator summary
        out = {}
        for k, mn in bench["queries"].items():
            out[k] = {"min": mn,
                      "runs": bench.get("runs", {}).get(k, [mn]),
                      "plan": bench.get("plans", {}).get(k, "")}
        return out

    # one bound governs the whole artifact: persist it and re-judge
    # EVERY key (pre-existing included) under it, so a --bound override
    # can never leave the file judging different keys by different
    # bounds (r18 ADVICE)
    art["bound"] = bound
    for v in art["keys"].values():
        g = v.get("growth")
        v["within_bound"] = g is not None and g <= bound

    k1, k10 = per_key(b1), per_key(b10)
    added = []
    for k in sorted(set(k1) & set(k10)):
        g = round(k10[k]["min"] / k1[k]["min"], 2) if k1[k]["min"] else None
        art["keys"][k] = {
            "sec_1x": k1[k]["min"], "sec_10x": k10[k]["min"], "growth": g,
            "within_bound": (g is not None and g <= bound),
            "runs_1x": k1[k]["runs"], "runs_10x": k10[k]["runs"],
            "plan_10x": k10[k]["plan"],
        }
        if k in notes:
            art["keys"][k]["note"] = notes[k]
        added.append(k)
    if method_append:
        art["method"] = art.get("method", "") + " " + method_append
    art["generated_utc"] = datetime.datetime.now(
        datetime.timezone.utc).isoformat()
    flagged = [k for k, v in art["keys"].items() if not v.get("within_bound")]
    art["summary"] = {"n_keys": len(art["keys"]),
                      "n_within_bound": len(art["keys"]) - len(flagged),
                      "flagged": flagged}
    art_path.write_text(json.dumps(art, indent=1) + "\n")
    print(f"merged {len(added)} keys: {added}")
    print(f"summary: {art['summary']}")


if __name__ == "__main__":
    main()
