#!/usr/bin/env python3
"""Assemble BENCH_SCALE10_<round>.json from two graft.Bench subset
artifacts (1x and 10x runs over the Scale10GenAll fixtures).

Usage:
  python3 tools/assemble_scale10.py <round> <bench_1x.json> <bench_10x.json> \
      [--method "<free text>"] [--bound 12] [--note key="text" ...]

Growth = min_10x / min_1x per key; within_bound iff growth <= bound.
Exit 0 regardless of bound violations (violations are findings to
root-cause, not pipeline errors) - the summary lists flagged keys.
"""
import datetime
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main():
    rnd = sys.argv[1]
    b1 = json.loads(Path(sys.argv[2]).read_text())
    b10 = json.loads(Path(sys.argv[3]).read_text())
    bound = 12.0
    method = ""
    notes = {}
    args = sys.argv[4:]
    i = 0
    while i < len(args):
        if args[i] == "--method":
            i += 1
            method = args[i]
        elif args[i] == "--bound":
            i += 1
            bound = float(args[i])
        elif args[i] == "--note":
            i += 1
            k, _, v = args[i].partition("=")
            notes[k] = v
        else:
            sys.exit(f"unrecognized argument: {args[i]}")
        i += 1
    keys = {}
    for k in sorted(b1["queries"]):
        if k not in b10["queries"]:
            continue
        s1, s10 = b1["queries"][k], b10["queries"][k]
        growth = round(s10 / s1, 2) if s1 > 0 else None
        entry = {
            "sec_1x": s1, "sec_10x": s10, "growth": growth,
            "within_bound": growth is not None and growth <= bound,
            "runs_1x": b1["runs"][k], "runs_10x": b10["runs"][k],
            "plan_10x": b10["plans"][k].split("|")[0],
        }
        if b1["plans"][k].split("|")[0] != b10["plans"][k].split("|")[0]:
            entry["plan_1x"] = b1["plans"][k].split("|")[0]
        if k in notes:
            entry["note"] = notes[k]
        keys[k] = entry
    flagged = [k for k, v in keys.items() if not v["within_bound"]]
    artifact = {
        "round": rnd,
        "generated_utc":
            datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "method": method,
        "criterion":
            f"sub-quadratic growth: <=~{bound:g}x wall at 10x rows per key",
        "keys": keys,
        "summary": {"n_keys": len(keys),
                    "n_within_bound": len(keys) - len(flagged),
                    "flagged": flagged},
    }
    path = ROOT / f"BENCH_SCALE10_{rnd}.json"
    path.write_text(json.dumps(artifact, indent=1))
    print(f"wrote {path}: {len(keys) - len(flagged)}/{len(keys)} within "
          f"{bound:g}x; flagged={flagged}")


if __name__ == "__main__":
    main()
