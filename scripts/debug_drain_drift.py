"""Isolate the monotonic count_drain drift across in-process repetitions.

BENCH r05 6-rep capture: drain 5.9 -> 5.7 -> 6.3 -> 7.3 -> 9.2 -> 12.1 s
while graph stays flat (~4.0 s) and the relay throughput probe stays flat —
something the COUNTING path allocates/donates accumulates per run. This
script runs ONLY count_spectrum repeatedly and prints the drain per rep,
under (a) the production donated one-shot path, (b) TPU_EULER_NO_DONATE=1
(re-exec), (c) donated + per-rep settle sleep.

Usage: python scripts/debug_drain_drift.py [--reps 8] [--variant a|b|c]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(reps: int, settle: float) -> list[dict]:
    from tpu_euler.utils.runtime import setup_compilation_cache

    setup_compilation_cache()
    from tpu_euler.config import AssemblyConfig
    from tpu_euler.pipeline.assemble import count_spectrum
    from tpu_euler.reference_impl.simulate import random_genome, simulate_read_codes

    genome = random_genome(4_600_000, seed=2024)
    codes = simulate_read_codes(
        genome, read_len=100, coverage=50, seed=2025, circular=True
    )
    cfg = AssemblyConfig(
        k=31, read_batch=1 << 18, read_len=100, spectrum_capacity=1 << 23
    )
    rows = []
    for i in range(reps):
        t: dict = {}
        t0 = time.perf_counter()
        acc, nw = count_spectrum(codes, cfg, t)
        wall = time.perf_counter() - t0
        del acc
        rows.append(
            {
                "rep": i,
                "wall_s": round(wall, 3),
                "encode": round(t["encode"], 3),
                "count": round(t["count"], 3),
                "drain": round(t["count_drain"], 3),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
        if settle:
            time.sleep(settle)
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--variant", default="a", choices=["a", "b", "c"])
    ap.add_argument("--worker", action="store_true")
    args = ap.parse_args()
    if args.worker or args.variant == "a":
        return 0 if run_variant(args.reps, 0.0) else 1
    if args.variant == "c":
        return 0 if run_variant(args.reps, 10.0) else 1
    # variant b: re-exec with donation disabled
    env = dict(os.environ, TPU_EULER_NO_DONATE="1")
    return subprocess.call(
        [sys.executable, os.path.abspath(__file__), "--worker",
         "--reps", str(args.reps)],
        env=env,
    )


if __name__ == "__main__":
    sys.exit(main())
