"""Probe 4: map the broken-shift landscape on real TPU Mosaic — u32 left
shifts, right shifts, and multiply-by-2^s equivalents."""

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

R, C = 512, 128
BLK = 256
U32 = jnp.uint32
LS = [2, 8, 14, 16, 18, 20, 22, 26, 30]
RS = [2, 8, 14, 16, 18, 20, 22, 26, 30]
MS = [14, 16, 18, 20, 22]
NOUT = len(LS) + len(RS) + len(MS)


def kernel(x_ref, *outs):
    x = x_ref[:]
    o = 0
    for s in LS:
        outs[o][:] = x << U32(s)
        o += 1
    for s in RS:
        outs[o][:] = x >> U32(s)
        o += 1
    for s in MS:
        outs[o][:] = x * U32(1 << s)
        o += 1


@jax.jit
def probe(x):
    spec = pl.BlockSpec((BLK, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(R // BLK,),
        in_specs=[spec],
        out_specs=tuple([spec] * NOUT),
        out_shape=tuple(jax.ShapeDtypeStruct((R, C), jnp.uint32) for _ in range(NOUT)),
    )(x)


rng = np.random.default_rng(0)
x_np = rng.integers(0, 1 << 32, (R, C), dtype=np.uint64).astype(np.uint32)
out = [np.asarray(v) for v in probe(jnp.asarray(x_np))]
o = 0
for s in LS:
    bad = int((out[o] != (x_np << np.uint32(s))).sum())
    print(f"u32 << {s:2d}: {'OK' if bad == 0 else f'{bad} wrong'}")
    o += 1
for s in RS:
    bad = int((out[o] != (x_np >> np.uint32(s))).sum())
    print(f"u32 >> {s:2d}: {'OK' if bad == 0 else f'{bad} wrong'}")
    o += 1
for s in MS:
    bad = int((out[o] != (x_np * np.uint32(1 << s))).sum())
    print(f"u32 *2^{s:2d}: {'OK' if bad == 0 else f'{bad} wrong'}")
    o += 1
