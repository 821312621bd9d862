"""Capture the non-default bench modes as a committed artifact.

Runs `bench.py --hard` and `bench.py --streams S` serially (CLAUDE.md: one
host core — never two compute processes at once) and writes every mode's
JSON line plus run metadata to BENCH_extra_r<N>.json at the repo root.
These modes' numbers previously lived only in README/DESIGN prose; the
reference's convention is that the captured demo run IS the oracle
(/root/reference/README.md:97-113), so uncaptured claims don't count.

Usage: python tools/capture_extras.py --round 5 [--streams 4 8] [--skip-hard]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run_mode(args: list[str], timeout: int = 3600) -> dict:
    """Run one bench mode; return its parsed JSON line + timing/stderr tail."""
    t0 = time.perf_counter()
    env = dict(os.environ)
    env.setdefault("VDO_BENCH_NO_PROBE", "1")  # probe only needed on default
    proc = subprocess.run(
        [sys.executable, str(ROOT / "bench.py"), *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=ROOT,
    )
    wall = time.perf_counter() - t0
    line = None
    for ln in proc.stdout.strip().splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                line = json.loads(ln)
            except json.JSONDecodeError:
                pass
    out = {
        "args": args,
        "rc": proc.returncode,
        "wall_s": round(wall, 1),
        "result": line,
        "stderr_tail": proc.stderr.strip().splitlines()[-12:],
    }
    print(f"[capture] {' '.join(args) or '(default)'}: rc={proc.returncode} "
          f"{wall:.0f}s -> {line}", file=sys.stderr, flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--streams", type=int, nargs="*", default=[4])
    ap.add_argument("--skip-hard", action="store_true")
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()

    runs = []
    if not args.skip_hard:
        runs.append(run_mode(["--hard"], args.timeout))
    for s in args.streams:
        runs.append(run_mode(["--streams", str(s)], args.timeout))
    # the max-aggregate-throughput point (bench.py --throughput: S=6 +
    # half-res depth wire + refit-enabled reduced LM budgets)
    runs.append(run_mode(["--throughput"], args.timeout))

    artifact = {
        "captured_utc": datetime.now(timezone.utc).isoformat(
            timespec="seconds"),
        "runs": runs,
    }
    out = ROOT / f"BENCH_extra_r{args.round:02d}.json"
    out.write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"[capture] wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
