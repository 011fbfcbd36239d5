"""End-of-round verification capture (the anchors-table ritual).

Runs, in order, and prints one summary block to paste into
BASELINE.md's anchors table (VERDICT r4 missing #2 / next #8 — every
headline, including "the tests pass", must be verifiable from the one
table):

1. the full test suite on the forced 8-CPU mesh (count + wall time),
2. ``bench.py`` (headline JSON + medianized sub-benchmark lines),

Usage:  python tools/capture_round.py [--skip-tests] [--skip-bench]
Writes the raw transcript to /tmp/capture_round.log as it goes.
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = "/tmp/capture_round.log"


def run(cmd, env=None, timeout=7200):
    with open(LOG, "a") as f:
        f.write(f"\n$ {' '.join(cmd)}\n")
    t0 = time.time()
    p = subprocess.run(cmd, cwd=ROOT, env=env, capture_output=True,
                       text=True, timeout=timeout)
    dt = time.time() - t0
    with open(LOG, "a") as f:
        f.write(p.stdout + p.stderr)
    return p, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-tests", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    a = ap.parse_args()
    open(LOG, "w").close()
    summary = [f"capture @ {time.strftime('%Y-%m-%d %H:%M:%S')}"]

    if not a.skip_tests:
        p, dt = run([sys.executable, "-m", "pytest", "tests/", "-q"])
        tail = [l for l in p.stdout.splitlines()[-5:] if "passed" in l or
                "failed" in l or "error" in l.lower()]
        summary.append(
            f"full suite (8-CPU mesh): {' '.join(tail) or p.stdout[-200:]} "
            f"[{dt / 60:.1f} min wall]")

    if not a.skip_bench:
        p, dt = run([sys.executable, "bench.py"])
        try:
            head = json.loads(p.stdout.strip().splitlines()[-1])
            summary.append(f"bench headline: {head['value']} {head['unit']} "
                           f"(vs_baseline {head['vs_baseline']})")
        except Exception:
            summary.append(f"bench headline: PARSE FAILED: {p.stdout[-200:]}")
        for line in p.stderr.splitlines():
            if any(k in line for k in ("secure_fedavg", "encrypted_inference",
                                       "fss_sign", "train_throughput")):
                summary.append("bench: " + line.strip())

    print("\n".join("  " + s for s in summary))
    print(f"(raw transcript: {LOG})")


if __name__ == "__main__":
    main()
