"""Sort-shape microbench: is a bucket-partitioned batched sort faster than
one flat sort at drain scale?

The drain sort is 165M rows x 2 uint32 key limbs (k=31). XLA's sort cost
scales ~N log^2 N per operand; partitioning into B independent buckets of
M rows each cuts log2(N)^2 -> log2(M)^2 at the price of a partition pass
and padding. This measures, on the real chip:

  - flat lax.sort at 165M rows (2 ops, the production shape)
  - batched lax.sort [B, M] for several (B, M) at equal padded volume
  - the XLA building blocks a partition pass would use (1-op sort of
    bucket tags, scatter at computed destinations)

Output: one line per shape with ms (mean of reps, D2H-synced).
"""

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

N = 165_150_720  # production drain rows (9 batches x 2^18 reads x 70 windows)
REPS = 3


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args):
    fn(*args)  # warm-up/compile
    sync(fn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import numpy as np
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))

    @jax.jit
    def flat2(a, b):
        return jax.lax.sort([a, b], num_keys=2)[0][0]

    print(f"flat   [{N}] 2-op: {timeit(flat2, a, b)*1e3:8.1f} ms", flush=True)

    @jax.jit
    def flat1(a):
        return jax.lax.sort([a], num_keys=1)[0][0]

    print(f"flat   [{N}] 1-op: {timeit(flat1, a)*1e3:8.1f} ms", flush=True)

    for B in (64, 256, 1024, 4096):
        M = -(-N // B)
        M = -(-M // 512) * 512
        a2 = a[: B * M // 2]
        a2 = jnp.concatenate([a2, a2]).reshape(B, M)
        b2 = b[: B * M // 2]
        b2 = jnp.concatenate([b2, b2]).reshape(B, M)

        @jax.jit
        def batched2(a2, b2):
            return jax.lax.sort([a2, b2], num_keys=2, dimension=1)[0][0, 0]

        print(
            f"batched[{B},{M}] 2-op: {timeit(batched2, a2, b2)*1e3:8.1f} ms",
            flush=True,
        )

    # partition building blocks at production scale
    @jax.jit
    def scatter_rand(a, dest):
        return jnp.zeros((N,), jnp.uint32).at[dest].set(a)[0]

    dest = jnp.asarray(rng.permutation(N).astype(np.int32))
    print(f"scatter[{N}] random dest: {timeit(scatter_rand, a, dest)*1e3:8.1f} ms",
          flush=True)

    # "semi-sorted" scatter: destinations ascending within 256 coarse buckets
    # (what a bucket-partition scatter actually does)
    dnp = np.asarray(dest)
    order = np.argsort(dnp >> 24, kind="stable")
    dest_bucketed = jnp.asarray(np.argsort(order).astype(np.int32))
    print(
        f"scatter[{N}] bucketed dest: {timeit(scatter_rand, a, dest_bucketed)*1e3:8.1f} ms",
        flush=True,
    )

    # gather at sorted-ish indices (partition via take instead of scatter)
    @jax.jit
    def gather_idx(a, idx):
        return a[idx][0]

    idx_b = jnp.asarray(order.astype(np.int32))
    print(f"gather [{N}] bucket-grouped idx: {timeit(gather_idx, a, idx_b)*1e3:8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
