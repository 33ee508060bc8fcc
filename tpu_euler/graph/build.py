"""De Bruijn graph construction as sorted-edge-array CSR.

Reference counterpart: SURVEY.md R4/R6 — the PyCUDA reference assigned vertex ids
for (k-1)-mers with an atomics-based GPU hash table and built adjacency arrays.
TPU-native redesign (BASELINE.json north star): node ids come from a variadic
sort + segment-rank over all edge endpoints; degrees and unique-successor arrays
from segment-sums/scatter-mins. Everything is dense int32/uint32 with static
capacities and validity masks — no pointers, no atomics, no dynamic shapes.

Graph semantics (shared with the CPU oracle, tpu_euler/reference_impl/oracle.py):
the *doubled* directed graph — both orientations of every surviving canonical
k-mer are edges; nodes are (k-1)-mers; edge w: w[:-1] -> w[1:].
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_euler.kmer import keys
from tpu_euler.kmer.count import Spectrum


class DeBruijnGraph(NamedTuple):
    """Doubled de Bruijn graph in dense-array form.

    E = edge capacity (2x spectrum capacity); node arrays have capacity 2E
    (every edge endpoint could be distinct). k is NOT stored here (it is a
    static Python value threaded separately so the pytree stays array-only).
    """

    edge_limbs: jax.Array  # [E, L] uint32 — k-mer of each edge
    edge_valid: jax.Array  # [E] bool
    tail: jax.Array  # [E] int32 node id of prefix (k-1)-mer (garbage if invalid)
    head: jax.Array  # [E] int32 node id of suffix (k-1)-mer
    n_edges: jax.Array  # [] int32
    n_nodes: jax.Array  # [] int32
    indeg: jax.Array  # [2E] int32 distinct in-edges per node
    outdeg: jax.Array  # [2E] int32 distinct out-edges per node
    out_first: jax.Array  # [2E] int32 min edge id with tail==node (E if none)
    succ_cand: jax.Array  # [2E] int32 out_first where node is simple, else -1
    # (precomputed so the successor kernel costs ONE random gather per edge
    #  instead of three — random-gather transactions dominate on TPU HBM)

    @property
    def edge_capacity(self) -> int:
        return self.edge_limbs.shape[0]


@functools.partial(jax.jit, static_argnames=("k",))
def doubled_edges(spec: Spectrum, k: int) -> tuple[jax.Array, jax.Array]:
    """Emit both orientations of each surviving canonical k-mer as edges.

    Returns (edge_limbs [2C, L], edge_valid [2C]). k odd => orientations distinct.
    """
    C = spec.limbs.shape[0]
    fwd = spec.limbs
    rev = keys.revcomp(spec.limbs, k)
    valid = jnp.arange(C, dtype=jnp.int32) < spec.n
    return (
        jnp.concatenate([fwd, rev], axis=0),
        jnp.concatenate([valid, valid], axis=0),
    )


@functools.partial(jax.jit, static_argnames=("k",))
def assign_node_ids(
    edge_limbs: jax.Array, edge_valid: jax.Array, k: int
):
    """Assign dense node ids to the distinct endpoint (k-1)-mers of all edges.

    Returns (tail [E], head [E], n_nodes [], outdeg [2E], indeg [2E]). Node
    ids are ranks in the sorted order of distinct endpoint keys, so they are
    deterministic and strand-pair-consistent regardless of edge order. Degrees
    fall out of the same endpoint sort (prefix endpoints are out-edges, suffix
    endpoints in-edges) via cumsum-diff segment counting — no separate
    segment_sum passes.
    """
    from tpu_euler.kmer.count import segment_sums_sorted

    E = edge_limbs.shape[0]
    pre = keys.prefix(edge_limbs, k)
    suf = keys.suffix(edge_limbs, k)
    endpoints = jnp.concatenate([pre, suf], axis=0)  # [2E, L]
    valid = jnp.concatenate([edge_valid, edge_valid])
    pos = jnp.arange(2 * E, dtype=jnp.int32)
    sl, sv, spos = keys.sort_by_key(endpoints, valid, pos)
    prev = jnp.roll(sl, 1, axis=0)
    is_new = (~keys.key_eq(sl, prev)).at[0].set(True) & sv
    node_id = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    n_nodes = jnp.sum(is_new.astype(jnp.int32))
    # scatter node id back to original endpoint position
    ids = jnp.zeros((2 * E,), jnp.int32).at[spos].set(
        jnp.where(sv, node_id, 2 * E - 1)
    )
    # degrees: prefix endpoints (spos < E) are out-edges, suffixes in-edges
    w_out = jnp.where(sv & (spos < E), 1, 0).astype(jnp.int32)
    w_in = jnp.where(sv & (spos >= E), 1, 0).astype(jnp.int32)
    outdeg = segment_sums_sorted(is_new, node_id, w_out, 2 * E)
    indeg = segment_sums_sorted(is_new, node_id, w_in, 2 * E)
    return ids[:E], ids[E:], n_nodes, outdeg, indeg


@functools.partial(jax.jit, static_argnames=("k",))
def build_graph(spec: Spectrum, k: int) -> DeBruijnGraph:
    """Full graph build from a (cutoff-filtered) canonical k-mer spectrum."""
    edge_limbs, edge_valid = doubled_edges(spec, k)
    E = edge_limbs.shape[0]
    tail, head, n_nodes, outdeg, indeg = assign_node_ids(edge_limbs, edge_valid, k)
    one = jnp.where(edge_valid, 1, 0).astype(jnp.int32)
    tail_c = jnp.where(edge_valid, tail, 2 * E - 1)
    # min edge id per tail node (the unique out-edge where outdeg == 1)
    eid = jnp.arange(E, dtype=jnp.int32)
    out_first = (
        jnp.full((2 * E,), E, jnp.int32)
        .at[tail_c]
        .min(jnp.where(edge_valid, eid, E))
    )
    simple = (indeg == 1) & (outdeg == 1) & (out_first < E)
    succ_cand = jnp.where(simple, out_first, -1)
    return DeBruijnGraph(
        edge_limbs=edge_limbs,
        edge_valid=edge_valid,
        tail=tail,
        head=head,
        n_edges=jnp.sum(one),
        n_nodes=n_nodes,
        indeg=indeg,
        outdeg=outdeg,
        out_first=out_first,
        succ_cand=succ_cand,
    )
