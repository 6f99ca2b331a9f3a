"""Run bench.py until a PHASE-CLEAN pass lands (or attempts run out).

The host oscillates between healthy (control ≈ 0.1 s) and ~3×-degraded
phases on a seconds-to-minutes timescale (BASELINE.md round-5 notes), so
single bench runs are a lottery: min-of-k rescues spot noise, not a
mid-run phase flip.  bench.py records the single-thread control at three
points (pre / mid / end); a suite total certifies only when ALL THREE are
healthy.  This wrapper loops attempts, keeps every pass's summary, and
reports:

* ``certified``  — first pass with pre/mid/end all ≤ THRESHOLD (stops),
* ``best``       — lowest suite total over all passes (degradation only
  inflates wall time, so every observation ≥ the true healthy number
  and the minimum is the tightest UPPER bound on it),
* ``flagship_best`` — best pages/sec whose PRE **and** MID canaries were
  healthy (the flagship runs between those two samples; a healthy mid
  alone can follow a flip that happened after a degraded flagship).

Usage: python tools/certify_bench.py [attempts] [threshold]
Prints one JSON line; exits 0 on certification, 3 otherwise.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

THRESHOLD = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
ATTEMPTS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    passes = []
    certified = None
    for i in range(ATTEMPTS):
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(here, "bench.py")],
            capture_output=True, text=True,
        )
        lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
        if proc.returncode != 0 or not lines:
            # keep enough stderr to diagnose a burned attempt; "no output
            # with exit 0" is its own named failure, not a fake success
            passes.append({
                "attempt": i,
                "error": "empty_stdout" if proc.returncode == 0 else proc.returncode,
                "stderr_tail": proc.stderr[-400:],
            })
            continue
        try:
            summary = json.loads(lines[-1])
        except json.JSONDecodeError:
            # a stray trailing line (JVM shutdown chatter) must cost one
            # attempt, not the whole sweep's completed passes
            passes.append({
                "attempt": i, "error": "unparseable_tail", "tail": lines[-1][:200],
            })
            continue
        summary["attempt"] = i
        summary["wall_sec"] = round(time.time() - t0, 1)
        passes.append(summary)
        cs = [summary.get(k) for k in
              ("host_control_pre", "host_control_mid", "host_control_sec")]
        if all(c is not None and c <= THRESHOLD for c in cs):
            certified = summary
            break
    ok = [p for p in passes if "value" in p]
    best = min(ok, key=lambda p: p["value"]) if ok else None
    flag_ok = [
        p for p in ok
        if p.get("host_control_pre", 9) <= THRESHOLD
        and p.get("host_control_mid", 9) <= THRESHOLD
    ]
    flagship_best = (
        max(flag_ok, key=lambda p: p["pages_per_sec"]) if flag_ok else None
    )
    print(json.dumps({
        "certified": certified,
        "best": best,
        "flagship_best": flagship_best,
        "attempts": len(passes),
        "threshold": THRESHOLD,
        "passes": [
            {k: p.get(k) for k in ("attempt", "value", "pages_per_sec",
                                   "host_control_pre", "host_control_mid",
                                   "host_control_sec", "error")}
            for p in passes
        ],
    }))
    return 0 if certified else 3


if __name__ == "__main__":
    sys.exit(main())
