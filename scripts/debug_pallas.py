"""Debug the real-chip Pallas extract mismatch: where and how do keys differ?"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_euler.utils.runtime import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from tpu_euler.kmer.extract import extract_canonical_kmers, extract_kmers
from tpu_euler.kmer.pallas_extract import extract_canonical_pallas

k = 31
rng = np.random.default_rng(0)
R, Lmax = 1024, 100
codes_np = rng.integers(0, 4, (R, Lmax), dtype=np.int8)
codes_np[rng.random((R, Lmax)) < 0.001] = 4
codes = jnp.asarray(codes_np)

lx, vx = jax.jit(lambda c: extract_canonical_kmers(c, k))(codes)
lp, vp = extract_canonical_pallas(codes, k, block_reads=256)
lx, vx, lp, vp = map(np.asarray, (lx, vx, lp, vp))
print("valid equal:", (vx == vp).all())
bad = (lx != lp).any(axis=1) & vx
print("mismatched valid windows:", int(bad.sum()), "of", int(vx.sum()))
idx = np.flatnonzero(bad)[:10]
W = Lmax - k + 1
# raw (non-canonical) forward keys for comparison
lf, _ = jax.jit(lambda c: extract_kmers(c, k))(codes)
lf = np.asarray(lf)
for i in idx:
    r, w = divmod(int(i), W)
    print(
        f"row {i} (read {r} win {w}): xla={lx[i]} pallas={lp[i]} fwd={lf[i]} "
        f"codes={codes_np[r, w : w + k].tolist()}"
    )
if len(idx):
    # which limb differs, and is pallas = fwd (i.e. canonicalization failed)?
    d0 = (lx[bad, 0] != lp[bad, 0]).mean()
    d1 = (lx[bad, 1] != lp[bad, 1]).mean()
    eq_fwd = (lp[bad] == lf[bad]).all(axis=1).mean()
    print(f"limb0 differs frac {d0:.3f}, limb1 {d1:.3f}, pallas==fwd frac {eq_fwd:.3f}")
