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

    E = edge capacity (2x spectrum capacity); node arrays have capacity
    ``node_cap`` (default 2E — every edge endpoint distinct, the exact worst
    case; memory-bound callers may trim, see ``assign_node_ids``). Consumers
    must bound node-id gathers by the node arrays' own shape, not 2E. k is
    NOT stored here (it is a static Python value threaded separately so the
    pytree stays array-only).
    """

    edge_limbs: jax.Array  # [E, L] uint32 — k-mer of each edge
    edge_valid: jax.Array  # [E] bool
    tail: jax.Array  # [E] int32 node id of prefix (k-1)-mer (garbage if invalid)
    head: jax.Array  # [E] int32 node id of suffix (k-1)-mer
    n_edges: jax.Array  # [] int32
    n_nodes: jax.Array  # [] int32
    indeg: jax.Array  # [node_cap] int32 distinct in-edges per node
    outdeg: jax.Array  # [node_cap] int32 distinct out-edges per node
    out_first: jax.Array  # [node_cap] int32 min edge id with tail==node (E if none)
    succ_cand: jax.Array  # [node_cap] int32 out_first where node is simple, else -1
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


@functools.partial(jax.jit, static_argnames=("k", "node_cap"))
def assign_node_ids(
    edge_limbs: jax.Array, edge_valid: jax.Array, k: int, node_cap: int = 0
):
    """Assign dense node ids to the distinct endpoint (k-1)-mers of all edges.

    Returns (tail [E], head [E], n_nodes [], outdeg [node_cap], indeg
    [node_cap]). ``node_cap`` (0 -> 2E, the exact worst case: every endpoint
    distinct) sizes the per-node arrays: in a connected assembly graph
    n_nodes ~~ E, so a caller at memory-bound scale can pass ~1.15*E and
    save half the node-array footprint (4 int32 arrays). If n_nodes exceeds
    node_cap the degree scatters silently drop — callers that trim MUST
    check the returned n_nodes against node_cap on host and fail/retry.

    The doubled graph's endpoint multiset is closed under reverse complement
    (every edge's RC is also an edge), so the distinct RAW endpoints are
    exactly {distinct canonical (k-1)-mers} x {strands} (palindromes once).
    Sorting only the 2C canonical endpoints of the FORWARD half (prefix +
    suffix per spectrum k-mer) therefore determines every id — HALF the rows
    of the naive all-raw-endpoints sort, the graph stage's dominant op.

    Node id = base(c) + strand, where base(c) = 2*rank(c) - #palindromic
    canonical keys before c (so ids stay dense), rank(c) = rank among sorted
    distinct canonical endpoint keys, and strand(m) = [m != canonical(m)]
    (palindromes collapse both strands onto base). Ids are deterministic and
    strand-pair-consistent; only id VALUES differ from the raw-rank scheme —
    a bijection of endpoints, so successor pairing, degrees and contigs are
    unchanged. Degrees fall out of the same sort via cumsum-diff segment
    counting: per canonical segment, out-strand counts (s0, s1) give
    outdeg=(s0, s1) and — since in-strand = 1 - out-strand off palindromes —
    indeg=(s1, s0) swapped; 2 segment sums total.
    """
    from tpu_euler.kmer.count import segment_sums_sorted

    E = edge_limbs.shape[0]
    C = E // 2
    node_cap = node_cap or 2 * E
    fwd = edge_limbs[:C]  # rows [C:] are revcomp(fwd) by doubled_edges layout
    valid = edge_valid[:C]
    pre = keys.prefix(fwd, k)
    suf = keys.suffix(fwd, k)

    def canon3(m):
        rc = keys.revcomp(m, k - 1)
        rc_smaller = keys.key_less(rc, m, k - 1)
        pal = keys.key_eq(m, rc)
        return jnp.where(rc_smaller[..., None], rc, m), rc_smaller, pal

    cpre, s_pre, pal_pre = canon3(pre)
    csuf, s_suf, pal_suf = canon3(suf)

    endpoints = jnp.concatenate([cpre, csuf], axis=0)  # [2C, L]
    valid2 = jnp.concatenate([valid, valid])
    pal2 = jnp.concatenate([pal_pre, pal_suf])
    # out-strand of each occurrence: pre rows are fwd-edge tails (strand s);
    # suf rows are rev-edge tails through rc (strand 1-s). Pal rows fold to 0.
    s_out2 = jnp.concatenate([s_pre, ~s_suf]) & ~pal2
    pos2 = jnp.arange(2 * C, dtype=jnp.uint32)
    payload = pos2 | (s_out2.astype(jnp.uint32) << 30) | (
        pal2.astype(jnp.uint32) << 31
    )
    sl, sv, spay = keys.sort_by_key(endpoints, valid2, payload)
    prev = jnp.roll(sl, 1, axis=0)
    is_new = (~keys.key_eq(sl, prev)).at[0].set(True) & sv
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    n_canon = jnp.sum(is_new.astype(jnp.int32))
    pal_s = spay >> 31 != 0
    s_out_s = (spay >> 30) & 1
    pos_s = (spay & jnp.uint32((1 << 30) - 1)).astype(jnp.int32)
    # dense base id: 2*rank minus # palindromic distinct ranks BEFORE this
    # one (pal_s is segment-constant, so the per-row correction term makes
    # the inclusive cumsum exclusive for every row of a palindromic segment)
    pal_seg = jnp.cumsum((is_new & pal_s).astype(jnp.int32)) - jnp.where(
        pal_s, 1, 0
    )
    base = 2 * rank - pal_seg
    n_pal = jnp.sum((is_new & pal_s).astype(jnp.int32))
    n_nodes = 2 * n_canon - n_pal

    # scatter (base<<1 | pal) back to original endpoint rows
    dest = jnp.where(sv, pos_s, 2 * C)
    packed = (base.astype(jnp.uint32) << 1) | pal_s.astype(jnp.uint32)
    back = jnp.zeros((2 * C,), jnp.uint32).at[dest].set(packed, mode="drop")
    base_pre = (back[:C] >> 1).astype(jnp.int32)
    palp = (back[:C] & 1).astype(jnp.bool_)
    base_suf = (back[C:] >> 1).astype(jnp.int32)
    pals = (back[C:] & 1).astype(jnp.bool_)

    sp = s_pre & ~palp  # strand of raw pre (pal -> 0)
    ss = s_suf & ~pals
    tail_fwd = base_pre + sp.astype(jnp.int32)
    head_fwd = base_suf + ss.astype(jnp.int32)
    tail_rev = base_suf + (~ss & ~pals).astype(jnp.int32)
    head_rev = base_pre + (~sp & ~palp).astype(jnp.int32)
    tail = jnp.concatenate([tail_fwd, tail_rev])
    head = jnp.concatenate([head_fwd, head_rev])

    # degrees: per-segment out-strand counts; indeg is the strand-swapped twin
    w0 = jnp.where(sv & (s_out_s == 0), 1, 0).astype(jnp.int32)
    w1 = jnp.where(sv & (s_out_s == 1), 1, 0).astype(jnp.int32)
    out0 = segment_sums_sorted(is_new, rank, w0, 2 * C)  # [2C] per-rank
    out1 = segment_sums_sorted(is_new, rank, w1, 2 * C)
    ridx = jnp.arange(2 * C, dtype=jnp.int32)
    rvalid = ridx < n_canon
    # per-rank pal flag + base, gathered from segment starts via scatter
    pal_rank = (
        jnp.zeros((2 * C,), jnp.bool_)
        .at[jnp.where(is_new, rank, 2 * C)]
        .set(pal_s, mode="drop")
    )
    base_rank = (
        jnp.zeros((2 * C,), jnp.int32)
        .at[jnp.where(is_new, rank, 2 * C)]
        .set(base, mode="drop")
    )
    deg_dest0 = jnp.where(rvalid, base_rank, node_cap)
    deg_dest1 = jnp.where(rvalid & ~pal_rank, base_rank + 1, node_cap)
    outdeg = (
        jnp.zeros((node_cap,), jnp.int32)
        .at[deg_dest0].set(out0, mode="drop")
        .at[deg_dest1].set(out1, mode="drop")
    )
    indeg = (
        jnp.zeros((node_cap,), jnp.int32)
        .at[deg_dest0].set(jnp.where(pal_rank, out0, out1), mode="drop")
        .at[deg_dest1].set(out0, mode="drop")
    )
    tail = jnp.where(edge_valid, tail, 0)
    head = jnp.where(edge_valid, head, 0)
    return tail, head, n_nodes, outdeg, indeg


@functools.partial(jax.jit, static_argnames=("k", "node_cap"))
def build_graph(spec: Spectrum, k: int, node_cap: int = 0) -> DeBruijnGraph:
    """Full graph build from a (cutoff-filtered) canonical k-mer spectrum.

    ``node_cap`` (0 -> exact worst case 2E) trims the four per-node arrays;
    trimming callers must verify n_nodes <= node_cap on host afterwards.
    """
    edge_limbs, edge_valid = doubled_edges(spec, k)
    E = edge_limbs.shape[0]
    node_cap = node_cap or 4 * E // 2  # = 2E; keep int for static hashing
    tail, head, n_nodes, outdeg, indeg = assign_node_ids(
        edge_limbs, edge_valid, k, node_cap
    )
    one = jnp.where(edge_valid, 1, 0).astype(jnp.int32)
    tail_c = jnp.where(edge_valid, tail, node_cap - 1)
    # min edge id per tail node (the unique out-edge where outdeg == 1);
    # invalid edges write the E sentinel, which never wins a min
    eid = jnp.arange(E, dtype=jnp.int32)
    out_first = (
        jnp.full((node_cap,), E, jnp.int32)
        .at[tail_c]
        .min(jnp.where(edge_valid, eid, E), mode="drop")
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
