"""Prototype: per-batch dedup in the fill step + weighted final merge.

Current oneshot: fill buffers 165M raw keys, drain = 165M 2-limb sort (+comp
sort). Candidate: each batch sorts its own 18.35M windows and dedups to
<=U uniques with counts; the drain sorts only n_batches*U rows with a count
payload. Measures whether the per-batch sorts hide under the H2D/prefetch
overlap and what the final weighted merge costs.
"""

from __future__ import annotations

import functools
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
from tpu_euler.kmer.extract import extract_canonical_kmers
from tpu_euler.pipeline import assemble as A
from tpu_euler.pipeline.assemble import unpack_codes
from tpu_euler.reference_impl.simulate import random_genome, simulate_read_codes

SENT = jnp.uint32(0xFFFFFFFF)


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def make_dedup_fill_step(k: int, read_len: int, U: int):
    @functools.partial(jax.jit, donate_argnums=(2,))
    def step(packed, nmask, buf, start):
        codes = unpack_codes(packed, nmask, read_len)
        limbs, valid = extract_canonical_kmers(codes, k)
        limbs = jnp.where(valid[:, None], limbs, SENT)
        W, L = limbs.shape
        s = jax.lax.sort([limbs[:, j] for j in range(L)], num_keys=L)
        is_new = jnp.zeros((W,), jnp.bool_)
        for j in range(L):
            is_new = is_new | (s[j] != jnp.roll(s[j], 1))
        is_new = is_new.at[0].set(True) & (s[0] != SENT)
        n_u = jnp.sum(is_new.astype(jnp.int32))
        n_valid = jnp.sum(valid.astype(jnp.int32))
        iota = jnp.arange(W, dtype=jnp.uint32)
        comp = jnp.where(is_new, iota, iota + jnp.uint32(W))
        (cs,) = jax.lax.sort([comp], num_keys=1)
        b = cs[:U]
        live = b < jnp.uint32(W)
        bounds = jnp.concatenate(
            [jnp.where(live, b.astype(jnp.int32), n_valid), n_valid[None]]
        )
        cnt = jnp.where(live, bounds[1:] - bounds[:-1], 0)
        src = jnp.clip(bounds[:U], 0, W - 1)
        ulimbs = tuple(jnp.where(live, s[j][src], SENT) for j in range(L))
        buf = tuple(
            jax.lax.dynamic_update_slice(buf[j], ulimbs[j], (start,))
            for j in range(L)
        ) + (jax.lax.dynamic_update_slice(buf[L], cnt, (start,)),)
        return buf, n_valid, n_u > U

    return step


def make_weighted_drain(capacity: int):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def drain(buf):
        L = len(buf) - 1
        cnts = buf[L]
        T = buf[0].shape[0]
        s = jax.lax.sort(list(buf[:L]) + [cnts], num_keys=L)
        sc = s[L]
        sv = s[0] != SENT
        is_new = jnp.zeros((T,), jnp.bool_)
        for j in range(L):
            is_new = is_new | (s[j] != jnp.roll(s[j], 1))
        is_new = is_new.at[0].set(True) & sv
        n = jnp.sum(is_new.astype(jnp.int32))
        seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
        w = jnp.where(sv, sc, 0)
        ecs = jnp.cumsum(w) - w
        total = ecs[-1] + w[-1]
        dest = jnp.where(is_new, seg, capacity)
        bounds = jnp.full((capacity + 1,), total, w.dtype).at[dest].set(
            ecs, mode="drop"
        )
        counts = (bounds[1:] - bounds[:-1]).astype(jnp.int32)
        kdest = jnp.where(is_new, seg, capacity)
        uniq = jnp.stack(
            [
                jnp.zeros((capacity,), jnp.uint32)
                .at[kdest]
                .set(s[j], mode="drop")
                for j in range(L)
            ],
            axis=-1,
        )
        live = jnp.arange(capacity, dtype=jnp.int32) < n
        return uniq, jnp.where(live, counts, 0), n, total

    return drain


def run(codes_all, cfg, U, label):
    Wb = cfg.read_batch * cfg.windows_per_read
    n_batches = A._n_batches(codes_all, cfg)
    T = n_batches * U
    fill = make_dedup_fill_step(cfg.k, cfg.read_len, U)
    drain = make_weighted_drain(cfg.spectrum_capacity)
    buf = tuple(jnp.full((T,), SENT) for _ in range(cfg.nlimbs)) + (
        jnp.zeros((T,), jnp.int32),
    )
    t0 = time.perf_counter()
    feed = A._batch_feed(codes_all, cfg)
    nv = jnp.zeros((), jnp.int32)
    overs = []
    try:
        for b in range(n_batches):
            packed, nmask = next(feed)
            buf, nw, over = fill(packed, nmask, buf, jnp.asarray(b * U, jnp.int32))
            nv = nv + nw
            overs.append(over)
    finally:
        feed.close()
    t1 = time.perf_counter()
    uniq, counts, n, total = drain(buf)
    n_host = int(n)
    total_host = int(total)
    t2 = time.perf_counter()
    print(
        f"{label}: fill(dispatch) {t1 - t0:.3f}s  drain {t2 - t1:.3f}s  "
        f"total {t2 - t0:.3f}s  distinct {n_host}  instances {total_host}  "
        f"nv {int(nv)}  over {any(bool(o) for o in overs)}",
        flush=True,
    )


def main():
    genome = random_genome(4_600_000, seed=2024)
    codes_all = simulate_read_codes(
        genome, read_len=100, coverage=50, seed=2025, circular=True
    )
    cfg = AssemblyConfig(
        k=31, read_batch=1 << 18, read_len=100, spectrum_capacity=1 << 23
    )
    U = 1 << 23
    run(codes_all, cfg, U, "warmup")
    run(codes_all, cfg, U, "run1")
    run(codes_all, cfg, U, "run2")


if __name__ == "__main__":
    main()
