#!/usr/bin/env python3
"""A/B sweep of XLA TPU compiler flags against bench.py's train step.

Motivation (BENCH_NOTES round 4): the step is at a measured plateau —
block2 and Adam are floor-argued, the tail is layout copies + diffuse
smalls. Compiler scheduling/fusion knobs are the one remaining zero-code
lever; each arm is a fresh subprocess because XLA_FLAGS is read once at
backend init. DebugOptions parsed from XLA_FLAGS ride the compile RPC,
so they reach this image's remote TPU compiler (empirically verified:
scoped-vmem changes shift measured step time).

Usage:  python tools/sweep_xla_flags.py [--arms N] [--quick]
Prints one JSON line per arm and a summary; interleaved ABAB per arm
vs baseline so tunnel drift (CLAUDE.md: ~10-15%/session) cancels.
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Candidate flags. Unknown-flag arms fail cleanly (XLA aborts at init)
# and are recorded as errors rather than crashing the sweep.
ARMS = [
    ("baseline", ""),
    ("scoped_vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("scoped_vmem_96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("latency_hiding", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("aggressive_loop_fusion", "--xla_tpu_enable_aggressive_loop_fusion=true"),
]


def run_bench(xla_flags: str, timeout: int = 900):
    env = dict(os.environ)
    if xla_flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + xla_flags).strip()
    r = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        timeout=timeout, cwd=REPO, env=env)
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            d = json.loads(line)
            return {"ok": True, "ms": d.get("ms_per_step"),
                    "utts": d.get("value")}
    err = (r.stderr or "").strip().splitlines()
    return {"ok": False, "error": err[-1][:200] if err else f"rc={r.returncode}"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", type=int, default=len(ARMS) - 1,
                    help="how many non-baseline arms to run")
    ap.add_argument("--repeats", type=int, default=1,
                    help="ABAB repeats per arm (baseline re-run each time)")
    args = ap.parse_args()

    results = []
    for name, flags in ARMS[1:1 + args.arms]:
        pair = []
        for _ in range(args.repeats):
            base = run_bench("")
            arm = run_bench(flags)
            pair.append((base, arm))
        rec = {"arm": name, "flags": flags, "pairs": pair}
        oks = [(b, a) for b, a in pair if b.get("ok") and a.get("ok")]
        if oks:
            rec["delta_ms"] = round(
                sum(a["ms"] - b["ms"] for b, a in oks) / len(oks), 2)
            rec["delta_pct"] = round(
                100 * sum((a["ms"] - b["ms"]) / b["ms"] for b, a in oks)
                / len(oks), 1)
        print(json.dumps(rec), flush=True)
        results.append(rec)
    best = min((r for r in results if "delta_ms" in r),
               key=lambda r: r["delta_ms"], default=None)
    print(json.dumps({"summary": True,
                      "best_arm": best["arm"] if best else None,
                      "best_delta_ms": best.get("delta_ms") if best else None}))


if __name__ == "__main__":
    main()
