"""Graph cleaning: iterative tip clipping (SURVEY.md section 7 step 7).

Real error-containing reads (SPEC config 3) leave artifacts the frequency
cutoff can't always remove: short dead-end branches ("tips") from errors near
read ends. A unitig chain is a tip iff its edge count is < tip_len and EXACTLY
one of its ends is dead (start node in-degree 0 / end node out-degree 0 —
both-dead chains are standalone contigs and stay). Tip k-mers are removed in
both orientations (strand symmetry preserved: the mirror chain is a mirror
tip) and chains recomputed; iterate a bounded number of rounds.

Semantics are shared exactly with the CPU oracle
(reference_impl/oracle.py:find_tip_kmers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_euler.euler.unitigs import unitig_chains
from tpu_euler.graph.build import build_graph
from tpu_euler.kmer.count import Spectrum


@functools.partial(jax.jit, static_argnames=("k", "tip_len"))
def clip_tips_once(spec: Spectrum, k: int, tip_len: int) -> tuple[Spectrum, jax.Array]:
    """One tip-clipping round over a (cutoff-filtered) spectrum.

    Returns (new spectrum with tip k-mers removed, number of k-mers removed).
    """
    g = build_graph(spec, k)
    chains = unitig_chains(g, k)
    E = g.edge_limbs.shape[0]
    C = E // 2

    h = jnp.clip(g.head, 0, 2 * E - 1)
    tl = jnp.clip(g.tail, 0, 2 * E - 1)
    # chain-indexed dead flags (chain id = end edge id in [0, E))
    is_end = chains.in_chain & (chains.pos == chains.length - 1)
    dead_s = (
        jnp.zeros((E,), jnp.bool_)
        .at[jnp.where(chains.is_start, chains.chain, E)]
        .set(g.indeg[tl] == 0, mode="drop")
    )
    dead_e = (
        jnp.zeros((E,), jnp.bool_)
        .at[jnp.where(is_end, chains.chain, E)]
        .set(g.outdeg[h] == 0, mode="drop")
    )
    cid = jnp.clip(chains.chain, 0, E - 1)
    is_tip = (
        chains.in_chain
        & (chains.length < tip_len)
        & (dead_s[cid] ^ dead_e[cid])
    )

    # edge i maps to spectrum row i % C (rows emit 2 orientations)
    tip_row = is_tip[:C] | is_tip[C:]
    valid_row = jnp.arange(C, dtype=jnp.int32) < spec.n
    keep = valid_row & ~tip_row
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = jnp.where(keep, dest, C)
    limbs = jnp.zeros_like(spec.limbs).at[dest].set(spec.limbs, mode="drop")
    counts = jnp.zeros_like(spec.counts).at[dest].set(spec.counts, mode="drop")
    n_removed = jnp.sum((valid_row & tip_row).astype(jnp.int32))
    return Spectrum(limbs, counts, spec.n - n_removed), n_removed


def clip_tips(
    spec: Spectrum, k: int, tip_rounds: int, tip_len: int = 0
) -> tuple[Spectrum, int]:
    """Iterate tip clipping to a fixed point (bounded rounds). Host loop."""
    tip_len = tip_len or 2 * k
    total = 0
    for _ in range(tip_rounds):
        spec, n = clip_tips_once(spec, k, tip_len)
        n = int(n)
        total += n
        if n == 0:
            break
    return spec, total
