"""Eulerian tour construction: successor pairing, circuit labeling, swipe merge.

Reference parity module for SURVEY.md R7-R9 — the GPU-Euler lineage's core:
(R7) per-vertex pairing of in-edges with out-edges, (R8) circuit identification,
(R9) iterative circuit merging ("swipe") until each component is covered by one
circuit. The PyCUDA reference did R7 with per-vertex threads and R8/R9 with
pointer chasing + flag-polling loops; the TPU-native recasting is:

* R7: two variadic sorts give each edge its rank among the in-edges of its head
  and a CSR of out-edges per node; pairing is ``succ[e] = out_csr[offset[head[e]]
  + inrank[e]]`` — a single gather, no atomics.
* R8: chain labels by pointer doubling — cycle edges take the min edge id on
  their cycle, path edges take their terminal edge id (offset by E so the two
  namespaces stay disjoint).
* R9: each round, EVERY non-minimal circuit merges into the minimal-label
  chain at one vertex it shares with a smaller chain, via per-vertex cyclic
  successor rotations: at each vertex the participants are one representative
  out-edge of the vertex-min chain plus one out-edge of each merging circuit
  (ordered by label), and ``succ[pred[x_i]] = x_{i+1 (mod m+1)}`` splices all
  of them into one chain in a single round. Writes never conflict (pred is
  injective; every participant belongs to exactly one vertex group) and no
  round can split a chain: every merge points to a strictly smaller label, so
  the per-round merge graph is a forest. Survivors of a round are local
  minima — adjacent circuits can't both survive — so circuits shrink
  geometrically and the ``lax.while_loop`` converges in O(log C) rounds
  (bounded by 2*log2(E)+4; exits early at the no-proposals fixed point).
  Only cycles are merge *sources* (merging two paths can oscillate); a cycle
  can merge into a path or a smaller-labeled cycle, so Eulerian components
  converge to a single circuit and path components absorb all circuits they
  touch.

Output: the successor permutation of the final tour plus (chain, pos) ranks from
Wyllie list ranking — the device-side edge order of the Eulerian circuit(s).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_euler.euler.unitigs import _log2_ceil, _safe_gather
from tpu_euler.graph.build import DeBruijnGraph


class EulerTour(NamedTuple):
    succ: jax.Array  # [E] int32 — final tour successor (-1 = path end / cut)
    chain: jax.Array  # [E] int32 — chain label (end edge id of broken chain)
    pos: jax.Array  # [E] int32 — position of edge within its chain
    length: jax.Array  # [E] int32 — chain length at each edge
    n_chains: jax.Array  # [] int32 — number of chains (circuits+paths)
    in_tour: jax.Array  # [E] bool — valid edges
    merge_rounds: jax.Array  # [] int32 — swipe rounds used (O(log C) bound)


def _pair_successors(g: DeBruijnGraph) -> jax.Array:
    """R7: pair the i-th in-edge of every node with its i-th out-edge."""
    E = g.tail.shape[0]
    inv = (~g.edge_valid).astype(jnp.uint32)
    eid = jnp.arange(E, dtype=jnp.int32)

    # out-CSR: edges sorted by tail; offset[v] = first slot of v's out-edges
    s_inv_t, s_tail, out_csr = jax.lax.sort(
        [inv, g.tail.astype(jnp.uint32), eid], num_keys=2, is_stable=True
    )
    offset = jnp.full((2 * E,), E, jnp.int32).at[
        jnp.where(s_inv_t == 0, s_tail.astype(jnp.int32), 2 * E - 1)
    ].min(eid)

    # in-rank: position of e among in-edges of head[e]
    s_inv_h, s_head, in_edges = jax.lax.sort(
        [inv, g.head.astype(jnp.uint32), eid], num_keys=2, is_stable=True
    )
    head_start = jnp.full((2 * E,), E, jnp.int32).at[
        jnp.where(s_inv_h == 0, s_head.astype(jnp.int32), 2 * E - 1)
    ].min(eid)
    inrank = jnp.zeros((E,), jnp.int32).at[in_edges].set(
        eid - head_start[jnp.clip(s_head.astype(jnp.int32), 0, 2 * E - 1)]
    )

    h = jnp.clip(g.head, 0, g.outdeg.shape[0] - 1)
    slot = offset[h] + inrank
    paired = inrank < g.outdeg[h]  # head has an out-edge to pair with
    succ = jnp.where(
        g.edge_valid & paired, out_csr[jnp.clip(slot, 0, E - 1)].astype(jnp.int32), -1
    )
    return succ


def _labels(succ: jax.Array, valid: jax.Array, rounds: int) -> tuple[jax.Array, jax.Array]:
    """R8: chain labels. Cycle edges: min edge id on cycle. Path edges: E + end id.

    Packed-state doubling ([E,3] rows: pointer, running min, terminal label) —
    one row gather per round, as in unitigs.wyllie_rank.
    """
    E = succ.shape[0]
    SENT = jnp.uint32(0xFFFFFFFF)
    eid = jnp.arange(E, dtype=jnp.uint32)
    p0 = jnp.where(succ >= 0, succ.astype(jnp.uint32), SENT)
    q0 = jnp.where(succ >= 0, succ.astype(jnp.uint32), eid)
    S0 = jnp.stack([p0, eid, q0], axis=1)

    def round_fn(_, S):
        p = S[:, 0]
        alive = p != SENT
        idx = jnp.where(alive, p, eid).astype(jnp.int32)
        rows = S[idx]
        p_new = jnp.where(alive, rows[:, 0], SENT)
        m_new = jnp.minimum(S[:, 1], jnp.where(alive, rows[:, 1], SENT))
        q_new = rows[:, 2]
        return jnp.stack([p_new, m_new, q_new], axis=1)

    S = jax.lax.fori_loop(0, rounds, round_fn, S0)
    on_cycle = (S[:, 0] != SENT) & valid
    label = jnp.where(
        on_cycle, S[:, 1].astype(jnp.int32), E + S[:, 2].astype(jnp.int32)
    )
    return jnp.where(valid, label, 2 * E), on_cycle


@functools.partial(jax.jit, static_argnames=("max_rounds",))
def eulerian_tour(g: DeBruijnGraph, max_rounds: int = 0) -> EulerTour:
    """Full tour: pair, label, swipe-merge to fixed point, rank. See module doc."""
    E = g.tail.shape[0]
    rounds = _log2_ceil(E) + 1
    eid = jnp.arange(E, dtype=jnp.int32)
    valid = g.edge_valid
    tail_c = jnp.where(valid, g.tail, 2 * E - 1)

    succ0 = _pair_successors(g)

    def merge_cond(state):
        _, changed, it = state
        return changed & (it < (max_rounds or 2 * _log2_ceil(E) + 4))

    def merge_body(state):
        succ, _, it = state
        label, on_cycle = _labels(succ, valid, rounds)

        # pred[e]: inverse of succ
        pred = jnp.full((E,), -1, jnp.int32).at[
            jnp.where(succ >= 0, succ, E)
        ].set(eid, mode="drop")

        # min label at each vertex (over out-edges)
        lmin = jnp.full((2 * E,), 2 * E, jnp.int32).at[tail_c].min(label)
        at_v = lmin[jnp.clip(g.tail, 0, 2 * E - 1)]
        # representative out-edge of the min chain at each vertex
        rep = jnp.full((2 * E,), E, jnp.int32).at[
            jnp.where(valid & (label == at_v), g.tail, 2 * E - 1)
        ].min(eid)

        # source edges: cycle edges whose label is not the vertex min;
        # ONE per source circuit (so the merge graph is a forest into
        # strictly smaller labels — no splices can split)
        cand = valid & on_cycle & (label != at_v)
        by_label = jnp.full((2 * E,), E, jnp.int32).at[
            jnp.where(cand, label, 2 * E - 1)
        ].min(eid)
        is_src = cand & (by_label[jnp.clip(label, 0, 2 * E - 1)] == eid)

        # a vertex hosts a rotation iff it has >= 1 source; its rep edge joins
        has_src = jnp.zeros((2 * E,), jnp.bool_).at[
            jnp.where(is_src, g.tail, 2 * E)
        ].set(True, mode="drop")
        is_rep = (
            valid
            & has_src[jnp.clip(g.tail, 0, 2 * E - 1)]
            & (rep[jnp.clip(g.tail, 0, 2 * E - 1)] == eid)
        )
        part = is_src | is_rep

        # per-vertex rotation order: rep first, then sources by label
        vkey = jnp.where(part, g.tail, 2 * E).astype(jnp.uint32)
        skey = jnp.where(is_rep, jnp.uint32(0), jnp.uint32(1))
        lkey = label.astype(jnp.uint32)
        sv, _, _, sx = jax.lax.sort([vkey, skey, lkey, eid], num_keys=3)
        idx = jnp.arange(E, dtype=jnp.int32)
        grp_new = (sv != jnp.roll(sv, 1)).at[0].set(True)
        gstart = jax.lax.cummax(jnp.where(grp_new, idx, -1))
        nxt_same = jnp.concatenate(
            [sv[1:] == sv[:-1], jnp.zeros((1,), jnp.bool_)]
        )
        nxt = jnp.where(
            nxt_same, jnp.roll(sx, -1), sx[jnp.clip(gstart, 0, E - 1)]
        )
        live = sv != jnp.uint32(2 * E)
        # splice: succ[pred[x_i]] = x_{i+1 (mod group)}
        px = jnp.where(live, pred[jnp.clip(sx, 0, E - 1)], -1)
        succ2 = succ.at[jnp.where(px >= 0, px, E)].set(
            jnp.where(px >= 0, nxt, -1), mode="drop"
        )
        changed = jnp.any(is_src)
        return succ2, changed, it + 1

    succ, _, n_rounds = jax.lax.while_loop(
        merge_cond, merge_body, (succ0, jnp.asarray(True), jnp.asarray(0))
    )

    # break remaining circuits at their min edge (pred of min gets -1)
    label, on_cycle = _labels(succ, valid, rounds)
    is_cyc_min = on_cycle & (label == eid)
    cut = jnp.where(succ >= 0, is_cyc_min[jnp.clip(succ, 0, E - 1)], False)
    succ_cut = jnp.where(cut & on_cycle, -1, succ)

    # Wyllie ranking (shared packed-state implementation)
    from tpu_euler.euler.unitigs import wyllie_rank

    d, end_edge = wyllie_rank(succ_cut, rounds)

    has_pred = jnp.zeros((E,), jnp.bool_).at[
        jnp.where(succ_cut >= 0, succ_cut, E)
    ].set(True, mode="drop")
    is_start = valid & ~has_pred
    start_dest = jnp.where(is_start, end_edge, E)
    len_at_end = jnp.zeros((E,), jnp.int32).at[start_dest].set(d + 1, mode="drop")
    length = jnp.where(valid, len_at_end[jnp.clip(end_edge, 0, E - 1)], 0)
    pos = jnp.where(valid, length - 1 - d, 0)

    return EulerTour(
        succ=succ_cut,
        chain=jnp.where(valid, end_edge, -1),
        pos=pos,
        length=length,
        n_chains=jnp.sum(is_start.astype(jnp.int32)),
        in_tour=valid,
        merge_rounds=n_rounds,
    )
