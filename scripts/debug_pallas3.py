"""Probe 2: which stage of the Pallas extract miscompiles on real TPU —
the shift-OR window pack, the revcomp bit ops, or the canonical select?"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_euler.utils.runtime import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_euler.kmer import keys as K
from tpu_euler.kmer.pallas_extract import _pack_windows, _revcomp_limbs, _canonical_limbs

k = 31
R, Lmax = 512, 100
W = Lmax - k + 1
BLK = 256
L = K.nlimbs(k)


def kernel(codes_ref, *outs):
    codes = codes_ref[:].astype(jnp.int32)
    fwd = _pack_windows(codes, k, W)
    rev = _revcomp_limbs(fwd, k)
    canon = _canonical_limbs(fwd, rev)
    o = 0
    for arr in (fwd, rev, canon):
        for j in range(L):
            outs[o][:] = arr[j]
            o += 1


@jax.jit
def probe(codes):
    spec2d = pl.BlockSpec((BLK, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(R // BLK,),
        in_specs=[pl.BlockSpec((BLK, Lmax), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=tuple([spec2d] * (3 * L)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((R, W), jnp.uint32) for _ in range(3 * L)
        ),
    )(codes)


rng = np.random.default_rng(0)
codes_np = rng.integers(0, 4, (R, Lmax), dtype=np.int8)
out = [np.asarray(x) for x in probe(jnp.asarray(codes_np))]

# XLA reference
from tpu_euler.kmer.extract import extract_kmers

limbs, valid = jax.jit(lambda c: extract_kmers(c, k))(jnp.asarray(codes_np))
fwd_ref = np.asarray(limbs).reshape(R, W, L)
rev_ref = np.asarray(jax.jit(lambda l: K.revcomp(l, k))(limbs)).reshape(R, W, L)
can_ref = np.asarray(jax.jit(lambda l: K.canonical(l, k)[0])(limbs)).reshape(R, W, L)

names = ["fwd", "rev", "canon"]
for s, nm in enumerate(names):
    ref = (fwd_ref, rev_ref, can_ref)[s]
    for j in range(L):
        got = out[s * L + j]
        bad = int((got != ref[:, :, j]).sum())
        print(f"{nm} limb{j}: {'OK' if bad == 0 else f'{bad} wrong'}", flush=True)
        if bad:
            r, w = np.argwhere(got != ref[:, :, j])[0]
            print(f"  ({r},{w}): got {got[r,w]:#010x} want {ref[r,w,j]:#010x} "
                  f"xor {got[r,w]^ref[r,w,j]:#010x}")
