"""Probe 5: candidate workarounds for the slice+convert+shift miscompile:
 a) hoist astype/mask BEFORE the lane slice, then shift
 b) pltpu.roll-based packing (no lane-offset slices at all)
Checked for the previously-broken offsets and the full limb0 accumulation."""

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

R, Lmax = 512, 100
W = Lmax - 31 + 1
BLK = 256
U32 = jnp.uint32
NOUT = 5


def kernel(codes_ref, *outs):
    cm = codes_ref[:].astype(U32) & U32(3)  # convert/mask BEFORE slicing
    outs[0][:] = cm[:, 4 : 4 + W] << U32(20)
    outs[1][:] = cm[:, 5 : 5 + W] << U32(18)
    acc = jnp.zeros((BLK, W), U32)
    for i in range(15):
        acc = acc | (cm[:, i : i + W] << U32(2 * (14 - i)))
    outs[2][:] = acc
    # roll variant: lane-aligned prefix slices only
    accr = jnp.zeros((BLK, Lmax), U32)
    for i in range(15):
        accr = accr | ((pltpu.roll(cm, Lmax - i, 1) if i else cm) << U32(2 * (14 - i)))
    outs[3][:] = accr[:, :W]
    # Horner roll variant (shift-by-2 only)
    acch = jnp.zeros((BLK, Lmax), U32)
    for i in range(15):
        acch = (acch << U32(2)) | (pltpu.roll(cm, Lmax - i, 1) if i else cm)
    outs[4][:] = acch[:, :W]


@jax.jit
def probe(codes):
    spec = pl.BlockSpec((BLK, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(R // BLK,),
        in_specs=[pl.BlockSpec((BLK, Lmax), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=tuple([spec] * NOUT),
        out_shape=tuple(jax.ShapeDtypeStruct((R, W), jnp.uint32) for _ in range(NOUT)),
    )(codes)


rng = np.random.default_rng(0)
codes_np = rng.integers(0, 4, (R, Lmax), dtype=np.int8)
out = [np.asarray(v) for v in probe(jnp.asarray(codes_np))]
cw = codes_np.astype(np.uint32) & 3
want = np.zeros((R, W), np.uint32)
for i in range(15):
    want |= cw[:, i : i + W] << np.uint32(2 * (14 - i))
checks = [
    ("hoisted slice i=4 <<20", out[0], cw[:, 4 : 4 + W] << np.uint32(20)),
    ("hoisted slice i=5 <<18", out[1], cw[:, 5 : 5 + W] << np.uint32(18)),
    ("hoisted OR accumulation", out[2], want),
    ("roll OR accumulation", out[3], want),
    ("roll Horner accumulation", out[4], want),
]
for nm, got, w in checks:
    bad = int((got != w).sum())
    print(f"{nm}: {'OK' if bad == 0 else f'{bad} wrong'}", flush=True)
