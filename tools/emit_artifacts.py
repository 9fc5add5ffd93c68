#!/usr/bin/env python3
"""Consolidate the multi-scale oracle gate and the determinism probe
into COMMITTED per-round artifacts — the r15 judge asked for the
"180/180 at three scales" and "determinism N/N" claims as files in
git, not prose (VERDICT r15 "Next round" #3).

Usage:
  python3 tools/emit_artifacts.py <round> \
      --scale <label>=<sfDir>:<verifyOutDir> [...] \
      [--scale-from-log <label>=<sfDir>:<verify_local logfile> [...]] \
      [--determinism <outDirA>:<outDirB>] \
      [--determinism-from-log <dirA>:<dirB>:<probe logfile>]

--scale re-runs the DuckDB compare; --scale-from-log parses a
verify_local log captured earlier in the SAME session (the sf0.1
compare takes ~45 min — re-running it to transcribe verdicts it
already printed is pure waste). Same verdict parser either way.

The caller runs `sbt "runMain graft.Verify <sfDir> <outDir>"` for each
scale first (twice at one scale for the determinism pair). This script
re-runs the DuckDB compare per scale (tools/verify_local.py) and the
pandas byte-compare (tools/determinism_probe.py) as subprocesses,
parses their per-key verdicts, and writes
VERIFY_SCALES_<round>.json / DETERMINISM_<round>.json in the repo
root. Exit 0 only if every key passes everywhere. Dev-only tool; the
shipped engine is the Scala library.
"""
import datetime
import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run_lines(cmd):
    p = subprocess.run(cmd, capture_output=True, text=True)
    return p.stdout.splitlines()


def parse_verdicts(lines):
    out = {}
    for ln in lines:
        m = re.match(r"(PASS|FAIL) (\S+)(.*)", ln)
        if m:
            st, key, rest = m.groups()
            rows = None
            rm = re.search(r"\((\d+) rows\)", rest)
            if rm:
                rows = int(rm.group(1))
            out[key] = {"verdict": st.lower(), "rows": rows}
            detail = rest.strip(" :")
            if st == "FAIL" and detail:
                out[key]["detail"] = detail[:300]
    return out


def main():
    rnd = sys.argv[1]
    scales = []
    det = None
    det_log = None
    args = sys.argv[2:]
    i = 0
    while i < len(args):
        arg = args[i]
        # accept BOTH --flag=value and the docstring's --flag value form
        # (the =-only parser silently ignored space-separated flags and
        # exited 0 with no artifact written - a false success in the
        # evidence-gate tool)
        if arg.startswith("--determinism="):
            det = arg.split("=", 1)[1]
        elif arg == "--determinism":
            i += 1
            det = args[i]
        elif arg.startswith("--determinism-from-log="):
            det_log = arg.split("=", 1)[1]
        elif arg == "--determinism-from-log":
            i += 1
            det_log = args[i]
        elif arg.startswith("--scale="):
            scales.append(("run", arg.split("=", 1)[1]))
        elif arg == "--scale":
            i += 1
            scales.append(("run", args[i]))
        elif arg.startswith("--scale-from-log="):
            scales.append(("log", arg.split("=", 1)[1]))
        elif arg == "--scale-from-log":
            i += 1
            scales.append(("log", args[i]))
        else:
            sys.exit(f"unrecognized argument: {arg}")
        i += 1
    if not scales and det is None and det_log is None:
        sys.exit("nothing to do: pass --scale and/or --determinism")
    ok = True

    if scales:
        artifact = {"round": rnd, "generated_utc":
                    datetime.datetime.now(datetime.timezone.utc).isoformat(),
                    "scales": {}}
        for mode, spec in scales:
            label, rest = spec.split("=", 1)
            sf_dir, out_dir = rest.split(":", 1)
            # provenance: record whether the verdicts come from a fresh
            # DuckDB compare ("run") or a transcription of a logfile
            # captured earlier ("log") — without this the two are
            # byte-indistinguishable, which weakens the evidence chain
            # the artifact exists to provide (r16 ADVICE)
            entry = {"sf_dir": sf_dir, "source": mode}
            if mode == "log":
                entry["log_path"] = out_dir
                lines = Path(out_dir).read_text().splitlines()
            else:
                entry["verify_out_dir"] = out_dir
                lines = run_lines([sys.executable,
                                   str(ROOT / "tools/verify_local.py"),
                                   sf_dir, out_dir])
            verdicts = parse_verdicts(lines)
            n_pass = sum(1 for v in verdicts.values() if v["verdict"] == "pass")
            n_fail = len(verdicts) - n_pass
            ok &= n_fail == 0 and n_pass > 0
            entry.update({"n_pass": n_pass, "n_fail": n_fail,
                          "keys": verdicts})
            artifact["scales"][label] = entry
        path = ROOT / f"VERIFY_SCALES_{rnd}.json"
        path.write_text(json.dumps(artifact, indent=1, sort_keys=True))
        print(f"wrote {path}: " + ", ".join(
            f"{l}={s['n_pass']}/{s['n_pass'] + s['n_fail']}"
            for l, s in artifact["scales"].items()))

    if det or det_log:
        if det_log:
            da, db, logf = det_log.split(":", 2)
            lines = Path(logf).read_text().splitlines()
        else:
            logf = None
            da, db = det.split(":", 1)
            lines = run_lines([sys.executable,
                               str(ROOT / "tools/determinism_probe.py"),
                               da, db])
        verdicts = parse_verdicts(lines)
        n_pass = sum(1 for v in verdicts.values() if v["verdict"] == "pass")
        n_fail = len(verdicts) - n_pass
        ok &= n_fail == 0 and n_pass > 0
        artifact = {"round": rnd, "generated_utc":
                    datetime.datetime.now(datetime.timezone.utc).isoformat(),
                    "dirs": [da, db],
                    "source": "log" if det_log else "run",
                    "n_deterministic": n_pass,
                    "n_nondeterministic": n_fail, "keys": verdicts}
        if logf:
            artifact["log_path"] = logf
        path = ROOT / f"DETERMINISM_{rnd}.json"
        path.write_text(json.dumps(artifact, indent=1, sort_keys=True))
        print(f"wrote {path}: {n_pass}/{n_pass + n_fail} deterministic")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
