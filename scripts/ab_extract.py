"""A/B on the real chip: Pallas fused extract+canonicalize vs the XLA
window-pack path, at bench batch shape ([2^18, 100] int8, k in {31, 41}).

Decides whether make_extract_fill_step uses the Pallas kernel on TPU
(VERDICT item 4). Also verifies bit-identical outputs at full batch size.
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

from tpu_euler.kmer.extract import extract_canonical_kmers
from tpu_euler.kmer.pallas_extract import extract_canonical_pallas


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(fn(*args))
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:44s} {dt:8.1f} ms", flush=True)
    return dt


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    R, Lmax = 1 << 18, 100
    codes_np = rng.integers(0, 4, (R, Lmax), dtype=np.int8)
    codes_np[rng.random((R, Lmax)) < 0.001] = 4  # sprinkle Ns
    codes = jnp.asarray(codes_np)
    sync(codes)

    for k in (21, 31, 41):
        print(f"-- k={k}")
        xla = lambda c: extract_canonical_kmers(c, k)
        t_x = timeit(f"XLA window-pack extract k={k}", xla, codes)
        for blk in (256, 512, 1024):
            try:
                pal = lambda c, b=blk: extract_canonical_pallas(c, k, block_reads=b)
                t_p = timeit(f"Pallas extract k={k} block={blk}", pal, codes)
            except Exception as e:
                print(f"Pallas k={k} block={blk} FAILED: {type(e).__name__}: {e}")
                continue
        # bit-exactness at full batch
        lx, vx = jax.jit(xla)(codes)
        lp, vp = extract_canonical_pallas(codes, k, block_reads=256)
        lx, vx, lp, vp = map(np.asarray, (lx, vx, lp, vp))
        assert (vx == vp).all(), "validity mismatch"
        assert (lx[vx] == lp[vp]).all(), "key mismatch"
        print(f"k={k}: outputs bit-identical on {int(vx.sum())} valid windows")


if __name__ == "__main__":
    main()
