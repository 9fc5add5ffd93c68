#!/usr/bin/env python3
"""Assemble RECALL_<round>.json from graft.tools.RecallProbe logs
(one `RECALL {...}` JSON line each) plus optional PqScaleProbe ladders.

Usage:
  python3 tools/assemble_recall.py <round> \
      --scale name=path/to/log [...] \
      --pq-ladder name=path/to/pqscale.log [...] \
      [--claim "..."] [--method "..."] [--corpus-note "..."] \
      [--parity-notes "..."] [--thresholds "..."]
"""
import datetime
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def parse_recall(path):
    for line in Path(path).read_text().splitlines():
        m = re.search(r"RECALL (\{.*\})$", line.strip())
        if m:
            d = json.loads(m.group(1))
            d.pop("sf_dir", None)
            return d
    sys.exit(f"no RECALL line in {path}")


def parse_ladder(path):
    rungs = []
    for line in Path(path).read_text().splitlines():
        m = re.search(
            r"PQSCALE dir=\S+ coarse=(\d+) ks=(\d+) nprobe=(\d+) "
            r"rerank=(\d+) recall@5=([0-9.]+)", line)
        if m:
            rungs.append({"coarse": int(m.group(1)), "ks": int(m.group(2)),
                          "nprobe": int(m.group(3)), "rerank": int(m.group(4)),
                          "recall_at_5": float(m.group(5))})
    if not rungs:
        sys.exit(f"no PQSCALE lines in {path}")
    return rungs


def main():
    rnd = sys.argv[1]
    out = {"round": rnd,
           "generated_utc": datetime.datetime.utcnow()
               .strftime("%Y-%m-%dT%H:%M:%SZ"),
           "scales": {}, "pq_ladders": {}}
    args = sys.argv[2:]
    i = 0
    while i < len(args):
        if args[i] == "--scale":
            i += 1
            k, _, v = args[i].partition("=")
            out["scales"][k] = parse_recall(v)
        elif args[i] == "--pq-ladder":
            i += 1
            k, _, v = args[i].partition("=")
            out["pq_ladders"][k] = parse_ladder(v)
        elif args[i].startswith("--"):
            key = args[i][2:].replace("-", "_")
            i += 1
            out[key] = args[i]
        else:
            sys.exit(f"unrecognized argument: {args[i]}")
        i += 1
    if not out["pq_ladders"]:
        del out["pq_ladders"]
    path = ROOT / f"RECALL_{rnd}.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path} ({len(out['scales'])} scales)")


if __name__ == "__main__":
    main()
