"""Drift experiment 2: does the BACKEND degrade globally across full-pipeline
repetitions, or is the growth specific to the counting path?

Alternates full assemble_codes runs with a FIXED non-donated 165M-row 2-op
sort probe on a persistent device buffer. If the probe slows in step with
the drain, the backend/allocator state degrades globally after graph/extract
churn; if the probe stays flat while the drain grows, the cause is inside
the counting path's own buffers.

Usage: python scripts/debug_drain_drift2.py [--reps 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_euler.utils.runtime import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    from tpu_euler.config import AssemblyConfig
    from tpu_euler.pipeline.assemble import assemble_codes
    from tpu_euler.reference_impl.simulate import random_genome, simulate_read_codes

    genome = random_genome(4_600_000, seed=2024)
    codes = simulate_read_codes(
        genome, read_len=100, coverage=50, seed=2025, circular=True
    )
    cfg = AssemblyConfig(
        k=31, read_batch=1 << 18, read_len=100, spectrum_capacity=1 << 23
    )

    T = 165_000_000
    a = jax.random.bits(jax.random.PRNGKey(0), (T,), jnp.uint32)
    b = jax.random.bits(jax.random.PRNGKey(1), (T,), jnp.uint32)
    sort_probe = jax.jit(lambda x, y: jax.lax.sort([x, y], num_keys=2))

    def probe() -> float:
        t0 = time.perf_counter()
        out = sort_probe(a, b)
        np.asarray(jax.device_get(out[0][T - 1]))
        del out
        return time.perf_counter() - t0

    probe()  # compile
    warm = assemble_codes(codes, cfg)  # compile the pipeline
    del warm
    for i in range(args.reps):
        p0 = probe()
        t0 = time.perf_counter()
        res = assemble_codes(codes, cfg)
        wall = time.perf_counter() - t0
        p1 = probe()
        print(
            json.dumps(
                {
                    "rep": i,
                    "probe_before_s": round(p0, 3),
                    "wall_s": round(wall, 3),
                    "drain": round(res.stage_seconds["count_drain"], 3),
                    "graph": round(res.stage_seconds["graph"], 3),
                    "probe_after_s": round(p1, 3),
                }
            ),
            flush=True,
        )
        del res
    return 0


if __name__ == "__main__":
    sys.exit(main())
