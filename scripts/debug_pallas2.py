"""Minimal Mosaic probe: does codes[:, i:i+W] lane slicing work in a TPU
Pallas kernel for each offset i? One compile, 8 outputs."""

from __future__ import annotations

import functools
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

R, Lmax, W, NI = 512, 100, 70, 8
BLK = 256


def kernel(codes_ref, *outs):
    codes = codes_ref[:].astype(jnp.int32)
    for i in range(NI):
        outs[i][:] = codes[:, i : i + W]


@jax.jit
def probe(codes):
    spec2d = pl.BlockSpec((BLK, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(R // BLK,),
        in_specs=[pl.BlockSpec((BLK, Lmax), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=tuple([spec2d] * NI),
        out_shape=tuple(jax.ShapeDtypeStruct((R, W), jnp.int32) for _ in range(NI)),
    )(codes)


rng = np.random.default_rng(0)
codes_np = rng.integers(0, 4, (R, Lmax), dtype=np.int8)
out = probe(jnp.asarray(codes_np))
for i in range(NI):
    got = np.asarray(out[i])
    want = codes_np[:, i : i + W].astype(np.int32)
    n_bad = int((got != want).sum())
    print(f"slice i={i}: {'OK' if n_bad == 0 else f'{n_bad} wrong'}", flush=True)
    if n_bad:
        r, c = np.argwhere(got != want)[0]
        print(f"  first bad at ({r},{c}): got {got[r,c]} want {want[r,c]}")
        print(f"  row got  {got[r,:12].tolist()}")
        print(f"  row want {want[r,:12].tolist()}")
