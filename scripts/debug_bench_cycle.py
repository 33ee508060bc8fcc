"""Replicate bench.py's timed loop exactly to bisect the graph_build gap.

debug_graph_repeat.py (manual stage calls) reaches graph_step=1.1s steady
state; bench.py (assemble_codes) sees graph_build=4.5s steady. Same programs,
same data, same syncs — this script calls assemble_codes in a loop with fine
timers to confirm, then the caller bisects what differs.
"""

from __future__ import annotations

import os
import sys
import time

os.environ["TPU_EULER_FINE_TIMERS"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_euler.utils.runtime import setup_compilation_cache

setup_compilation_cache()

from tpu_euler.config import AssemblyConfig
from tpu_euler.pipeline.assemble import assemble_codes
from tpu_euler.reference_impl.simulate import random_genome, simulate_read_codes


def main():
    genome = random_genome(4_600_000, seed=2024)
    codes = simulate_read_codes(genome, read_len=100, coverage=50, seed=2025,
                                circular=True)
    cfg = AssemblyConfig(k=31, read_batch=1 << 18, read_len=100,
                         spectrum_capacity=1 << 23)
    for i in range(4):
        t0 = time.perf_counter()
        res = assemble_codes(codes, cfg)
        wall = time.perf_counter() - t0
        print(f"run {i}: wall {wall:.2f}s "
              f"{ {k: round(v,3) for k,v in res.stage_seconds.items()} }",
              flush=True)


if __name__ == "__main__":
    main()
