"""Attribute the bench count_drain: how much is extract/H2D backlog vs the
global sort? Runs the oneshot counting path on bench-scale data with an extra
sync between the fill loop and the drain sort (perturbs overlap, but splits
the attribution the stage timers can't)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_euler.utils.runtime import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from tpu_euler.config import AssemblyConfig
from tpu_euler.pipeline import assemble as A
from tpu_euler.reference_impl.simulate import random_genome, simulate_read_codes


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def run(codes_all, cfg, label, sync_fills):
    Wb = cfg.read_batch * cfg.windows_per_read
    n_batches = A._n_batches(codes_all, cfg)
    T = n_batches * Wb
    fill = A.make_extract_fill_step(cfg.k, cfg.read_len)
    oneshot = A.make_oneshot_count(cfg.k, cfg.spectrum_capacity)
    buf = tuple(jnp.full((T,), jnp.uint32(0xFFFFFFFF)) for _ in range(cfg.nlimbs))
    t0 = time.perf_counter()
    feed = A._batch_feed(codes_all, cfg)
    n_windows = jnp.zeros((), jnp.int32)
    try:
        for b in range(n_batches):
            packed, nmask = next(feed)
            buf, nw = fill(packed, nmask, buf, jnp.asarray(b * Wb, jnp.int32))
            n_windows = n_windows + nw
    finally:
        feed.close()
    if sync_fills:
        sync(n_windows)
        t1 = time.perf_counter()
        print(f"{label}: fill+H2D (synced) {t1 - t0:.3f}s", flush=True)
    else:
        t1 = time.perf_counter()
        print(f"{label}: fill dispatch {t1 - t0:.3f}s", flush=True)
    acc, over = oneshot(buf)
    sync(acc.n)
    t2 = time.perf_counter()
    print(f"{label}: drain {t2 - t1:.3f}s   total {t2 - t0:.3f}s", flush=True)


def main():
    genome = random_genome(4_600_000, seed=2024)
    codes_all = simulate_read_codes(
        genome, read_len=100, coverage=50, seed=2025, circular=True
    )
    cfg = AssemblyConfig(
        k=31, read_batch=1 << 18, read_len=100, spectrum_capacity=1 << 23
    )
    run(codes_all, cfg, "warmup", sync_fills=False)
    run(codes_all, cfg, "overlapped", sync_fills=False)
    run(codes_all, cfg, "split", sync_fills=True)
    run(codes_all, cfg, "split2", sync_fills=True)


if __name__ == "__main__":
    main()
