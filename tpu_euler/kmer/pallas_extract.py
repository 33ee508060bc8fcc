"""Pallas TPU kernel: fused k-mer extraction + canonicalization.

BASELINE.json north star names "k-mer extraction and counting as a Pallas
hash/radix-sort kernel" — this is the extraction half: one VMEM-resident kernel
per read block that packs every k-window into multi-limb keys, computes the
reverse complement with in-register bit tricks, and emits the canonical
min(key, revcomp) plus validity — the work the XLA path does as ~k fused slice
ops (tpu_euler/kmer/extract.py), hand-fused so codes are read from VMEM once.

All ops are VPU elementwise on [block_reads, W] tiles; there is no MXU work in
this stage (it is bandwidth-bound by design — 2 bits out per input base).
Interpret mode makes the same kernel run on CPU for tests; the public entry
falls back to the XLA path on non-TPU backends unless forced.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_euler.kmer import keys as K

_U32 = jnp.uint32


def _pack_windows(codes, k: int, W: int):
    """codes [B, Lmax] int32 -> list of L limb arrays [B, W] (big-endian).

    Interpret-mode/reference form ONLY. On real TPU the direct
    ``(codes[:, i:i+W] & 3) << shift`` MISCOMPILES: Mosaic packs values
    provably < 2^16 into 16-bit lanes and any single shift that pushes them
    past bit 15 silently produces 0 (measured: scripts/debug_pallas4/5/6.py —
    isolated shifts of full-range loads are fine; <<16..22 of the masked
    2-bit slices return zeros). The real-TPU kernel uses _pack_roll instead.
    """
    L = K.nlimbs(k)
    limbs = []
    for a in range(L):
        lj = L - 1 - a
        lo_i = max(0, k - 16 * lj - 16)
        hi_i = k - 1 - 16 * lj
        acc = jnp.zeros(codes.shape[:1] + (W,), _U32)
        for i in range(lo_i, hi_i + 1):
            shift = 2 * (k - 1 - i) - 32 * lj
            c = (codes[:, i : i + W].astype(_U32)) & _U32(3)
            acc = acc | (c << _U32(shift))
        limbs.append(acc)
    return limbs


def _revcomp_limbs(limbs, k: int):
    """Reverse complement of per-limb arrays (same layout as keys.revcomp)."""
    L = len(limbs)
    rev = [K._rev2bit32(x) for x in limbs][::-1]
    s = 32 * L - 2 * k
    if s:
        shifted = []
        for j in range(L):
            lo = rev[j] >> _U32(s)
            hi = rev[j - 1] << _U32(32 - s) if j > 0 else jnp.zeros_like(rev[j])
            shifted.append(lo | hi)
        rev = shifted
    mask = K.key_mask(k)
    return [(x ^ _U32(0xFFFFFFFF)) & _U32(int(mask[j])) for j, x in enumerate(rev)]


def _canonical_limbs(fwd, rev):
    lt = jnp.zeros_like(fwd[0], dtype=jnp.bool_)
    eq = jnp.ones_like(fwd[0], dtype=jnp.bool_)
    for f, r in zip(fwd, rev):
        lt = lt | (eq & (r < f))
        eq = eq & (r == f)
    return [jnp.where(lt, r, f) for f, r in zip(fwd, rev)]


def _pack_roll(src, k: int, W: int, reverse: bool):
    """Horner/roll window pack of per-base values ``src`` [B, Lmax] u32.

    reverse=False: big-endian key of bases w..w+k-1 (the forward k-mer).
    reverse=True: big-endian key of bases w+k-1..w (feed complemented codes to
    get the reverse complement directly — this avoids _rev2bit32's wide shifts
    of provably-small values, the Mosaic 16-bit-lane-packing miscompile that
    scripts/debug_pallas4/5/6.py pinned down; Horner only ever shifts by 2).
    """
    from jax.experimental.pallas import tpu as _pltpu

    L = K.nlimbs(k)
    Lmax = src.shape[1]
    limbs = []
    for a in range(L):
        lj = L - 1 - a
        lo_i = max(0, k - 16 * lj - 16)
        hi_i = k - 1 - 16 * lj
        acc = None
        for j in range(lo_i, hi_i + 1):
            i = (k - 1 - j) if reverse else j
            r = _pltpu.roll(src, Lmax - i, 1) if i else src
            acc = r if acc is None else ((acc << _U32(2)) | r)
        limbs.append(acc[:, :W])
    return limbs


def _extract_kernel(k: int, W: int, L: int, rolled: bool):
    def kernel(codes_ref, *out_refs):
        # per-limb 2-D outputs: a [B, W, L] output would tile the minor dim
        # L -> 128 under the TPU (8,128) layout (64x VMEM waste -> stack OOM)
        codes = codes_ref[:].astype(jnp.int32)
        if rolled:
            cm = codes.astype(_U32) & _U32(3)
            fwd = _pack_roll(cm, k, W, reverse=False)
            rev = _pack_roll(cm ^ _U32(3), k, W, reverse=True)
        else:
            fwd = _pack_windows(codes, k, W)
            rev = _revcomp_limbs(fwd, k)
        canon = _canonical_limbs(fwd, rev)
        for j in range(L):
            out_refs[j][:] = canon[j]
        ok = jnp.ones(codes.shape[:1] + (W,), jnp.bool_)
        for i in range(k):
            ok = ok & (codes[:, i : i + W] != 4)
        out_refs[L][:] = ok

    return kernel


def extract_canonical_auto(
    codes: jax.Array, k: int, block_reads: int = 512
) -> tuple[jax.Array, jax.Array]:
    """Pallas extraction on TPU backends, XLA path elsewhere (the fallback the
    module contract promises: interpret-mode Pallas is far slower than the XLA
    window-pack on CPU, so non-TPU callers get the XLA kernel)."""
    if jax.default_backend() in ("tpu", "axon"):
        return extract_canonical_pallas(codes, k, block_reads)
    from tpu_euler.kmer.extract import extract_canonical_kmers

    return extract_canonical_kmers(codes, k)


@functools.partial(jax.jit, static_argnames=("k", "block_reads", "interpret"))
def extract_canonical_pallas(
    codes: jax.Array, k: int, block_reads: int = 512, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Pallas extraction; same contract as kmer.extract.extract_canonical_kmers."""
    R, Lmax = codes.shape
    W = Lmax - k + 1
    L = K.nlimbs(k)
    if R % block_reads:
        pad = block_reads - R % block_reads
        codes = jnp.concatenate(
            [codes, jnp.full((pad, Lmax), 4, codes.dtype)], axis=0
        )
    Rp = codes.shape[0]
    grid = (Rp // block_reads,)
    spec2d = pl.BlockSpec(
        (block_reads, W), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _extract_kernel(k, W, L, rolled=not interpret),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_reads, Lmax), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple([spec2d] * L) + (spec2d,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((Rp, W), jnp.uint32) for _ in range(L)
        )
        + (jax.ShapeDtypeStruct((Rp, W), jnp.bool_),),
        interpret=interpret,
    )(codes)
    limbs = jnp.stack(out[:L], axis=-1)
    valid = out[L]
    return limbs[:R].reshape(R * W, L), valid[:R].reshape(R * W)
