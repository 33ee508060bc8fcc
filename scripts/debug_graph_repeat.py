"""Why is graph_step 4.5s inside the bench but 1.1s on repeat execution?

Assemble the bench spectrum once, then call the cached graph_step repeatedly
with syncs, interleaved with a fresh count pass, to separate: (a) steady-state
execution cost, (b) first-call-after-count cost (allocator/relay effects).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_euler.utils.runtime import setup_compilation_cache

setup_compilation_cache()

import jax
import numpy as np

from tpu_euler.config import AssemblyConfig
from tpu_euler.pipeline.assemble import (
    count_spectrum,
    make_graph_step,
    right_size_spectrum,
)
from tpu_euler.reference_impl.simulate import random_genome, simulate_read_codes


def sync(x):
    np.asarray(jax.device_get(x.ravel()[0]))


def main():
    genome = random_genome(4_600_000, seed=2024)
    codes = simulate_read_codes(genome, read_len=100, coverage=50, seed=2025,
                                circular=True)
    cfg = AssemblyConfig(k=31, read_batch=1 << 18, read_len=100,
                         spectrum_capacity=1 << 23)
    graph_step = make_graph_step(cfg.k, cfg.min_count)

    for round_ in range(2):
        acc, _ = count_spectrum(codes, cfg, {})
        acc = right_size_spectrum(acc)
        sync(acc.limbs)
        for i in range(3):
            t0 = time.perf_counter()
            g, cut = graph_step(acc)
            sync(g.head)
            print(f"round {round_} call {i}: graph_step "
                  f"{time.perf_counter()-t0:.3f}s", flush=True)
            if os.environ.get("FULL_CYCLE"):
                from tpu_euler.euler.unitigs import unitig_chains_fast
                from tpu_euler.euler.extract import chains_to_contigs_device
                t0 = time.perf_counter()
                chains = unitig_chains_fast(g, cfg.k)
                sync(chains.chain)
                t1 = time.perf_counter()
                contigs = chains_to_contigs_device(g, chains, cfg.k)
                print(f"  chains {t1-t0:.3f}s extract "
                      f"{time.perf_counter()-t1:.3f}s n={len(contigs)}",
                      flush=True)
        del g, cut, acc


if __name__ == "__main__":
    main()
