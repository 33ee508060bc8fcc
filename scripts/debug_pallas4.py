"""Probe 3: isolate the Pallas pack miscompile — single shift terms vs the
OR accumulation vs a sum accumulation, limb0 only (bases 0..14)."""

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

k = 31
R, Lmax = 512, 100
W = Lmax - k + 1
BLK = 256
U32 = jnp.uint32

NOUT = 6


def kernel(codes_ref, *outs):
    codes = codes_ref[:].astype(jnp.int32)

    def term(i):
        shift = 2 * (14 - i) + 0  # limb0 shifts: i=0 -> 28 ... i=14 -> 0
        c = codes[:, i : i + W].astype(U32) & U32(3)
        return c << U32(shift)

    outs[0][:] = term(4)  # shift 20 (corrupt zone)
    outs[1][:] = term(5)  # shift 18
    outs[2][:] = term(8)  # shift 12 (control)
    acc_or = jnp.zeros((BLK, W), U32)
    for i in range(15):
        acc_or = acc_or | term(i)
    outs[3][:] = acc_or
    acc_sum = jnp.zeros((BLK, W), U32)
    for i in range(15):
        acc_sum = acc_sum + term(i)
    outs[4][:] = acc_sum
    # int32 shifts then bitcast
    acc_i = jnp.zeros((BLK, W), jnp.int32)
    for i in range(15):
        shift = 2 * (14 - i)
        c = codes[:, i : i + W] & 3
        acc_i = acc_i | (c << shift)
    outs[5][:] = acc_i.astype(U32)


@jax.jit
def probe(codes):
    spec2d = pl.BlockSpec((BLK, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(R // BLK,),
        in_specs=[pl.BlockSpec((BLK, Lmax), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=tuple([spec2d] * NOUT),
        out_shape=tuple(jax.ShapeDtypeStruct((R, W), jnp.uint32) for _ in range(NOUT)),
    )(codes)


rng = np.random.default_rng(0)
codes_np = rng.integers(0, 4, (R, Lmax), dtype=np.int8)
out = [np.asarray(x) for x in probe(jnp.asarray(codes_np))]

cw = codes_np.astype(np.uint32)
terms = [
    ((cw[:, i : i + W] & 3) << (2 * (14 - i))).astype(np.uint32) for i in range(15)
]
want_acc = np.zeros((R, W), np.uint32)
for t in terms:
    want_acc |= t

checks = [
    ("term i=4 (shift 20)", out[0], terms[4]),
    ("term i=5 (shift 18)", out[1], terms[5]),
    ("term i=8 (shift 12)", out[2], terms[8]),
    ("OR accumulation", out[3], want_acc),
    ("SUM accumulation", out[4], want_acc),
    ("int32 OR + bitcast", out[5], want_acc),
]
for nm, got, want in checks:
    bad = int((got != want).sum())
    print(f"{nm}: {'OK' if bad == 0 else f'{bad} wrong'}", flush=True)
    if bad:
        r, w = np.argwhere(got != want)[0]
        print(f"  ({r},{w}): got {got[r,w]:#010x} want {want[r,w]:#010x}")
