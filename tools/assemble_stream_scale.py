#!/usr/bin/env python3
"""Assemble STREAM_SCALE_<round>.json from two graft.tools.StreamScaleBench
logs (sf0.1 and the Scale10GenAll 10x events fixture).

Usage:
  python3 tools/assemble_stream_scale.py <round> <log_1x> <log_10x> \
      [--method "<free text>"] [--note key="text" ...]

Per key: rows/sec at both scales, throughput ratio (10x/1x — ~1.0 means
per-row cost is scale-flat), state rows/memory growth (the bounded-state
claim: window-grid keys must stay ~flat; keyed-state keys must track the
10x key universe, never the row count x batches).
"""
import datetime
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def parse(path):
    keys, meta = {}, {}
    for line in Path(path).read_text().splitlines():
        m = re.match(r"STREAMSCALE (\{.*\})$", line.strip())
        if m:
            d = json.loads(m.group(1))
            keys[d.pop("key")] = d
        m = re.match(r"STREAMSCALE_META (\{.*\})$", line.strip())
        if m:
            meta = json.loads(m.group(1))
    if not keys:
        sys.exit(f"no STREAMSCALE lines in {path}")
    return keys, meta


def main():
    rnd = sys.argv[1]
    k1, m1 = parse(sys.argv[2])
    k10, m10 = parse(sys.argv[3])
    method = ""
    notes = {}
    args = sys.argv[4:]
    i = 0
    while i < len(args):
        if args[i] == "--method":
            i += 1
            method = args[i]
        elif args[i] == "--note":
            i += 1
            k, _, v = args[i].partition("=")
            notes[k] = v
        else:
            sys.exit(f"unrecognized argument: {args[i]}")
        i += 1
    keys = {}
    for k in sorted(k1):
        if k not in k10:
            continue
        a, b = k1[k], k10[k]
        entry = {
            "rows_1x": a["rows"], "rows_10x": b["rows"],
            "wall_sec_1x": a["wall_sec"], "wall_sec_10x": b["wall_sec"],
            "rows_per_sec_1x": a["rows_per_sec"],
            "rows_per_sec_10x": b["rows_per_sec"],
            "throughput_ratio": round(b["rows_per_sec"] / a["rows_per_sec"], 2)
                if a["rows_per_sec"] else None,
            "n_batches_1x": a["n_batches"], "n_batches_10x": b["n_batches"],
            "state_rows_1x": a["state_rows"], "state_rows_10x": b["state_rows"],
            "state_rows_growth": round(b["state_rows"] / a["state_rows"], 2)
                if a["state_rows"] > 0 else None,
            "state_mem_bytes_1x": a["state_mem_bytes"],
            "state_mem_bytes_10x": b["state_mem_bytes"],
            "rocksdb_sst_bytes_10x": b["rocksdb_sst_bytes"],
            "max_batch_ms_10x": b["max_batch_ms"],
        }
        if k in notes:
            entry["note"] = notes[k]
        keys[k] = entry
    out = {
        "round": rnd,
        "generated_utc": datetime.datetime.utcnow().strftime("%Y-%m-%dT%H:%M:%SZ"),
        "method": method,
        "fixtures": {"1x": m1, "10x": m10},
        "keys": keys,
    }
    path = ROOT / f"STREAM_SCALE_{rnd}.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {path} ({len(keys)} keys)")


if __name__ == "__main__":
    main()
