"""Sparse-ruling-set ranking (euler/ranking.py) vs the doubling oracle.

Random functional graphs (disjoint paths + cycles, self-loops, invalid
padding) exercise: walk capping / virtual-ruler restart rounds, ruler-free
small cycles (the compacted-doubling fallback), and the end-to-end
equivalence of ``unitig_chains_fast`` with ``unitig_chains`` on real graphs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_euler.euler import ranking
from tpu_euler.euler.unitigs import (
    _log2_ceil,
    unitig_chains,
    unitig_chains_fast,
    wyllie_rank,
)
from tpu_euler.graph.build import build_graph
from tpu_euler.kmer.count import Spectrum
from tpu_euler.kmer.keys import encode_np
from tpu_euler.reference_impl.simulate import random_genome, simulate_reads
from tpu_euler.pipeline.assemble import assemble_reads, count_spectrum
from tpu_euler.config import AssemblyConfig


def random_functional_graph(rng, E, n_paths, n_cycles, max_len, n_invalid=0):
    """Disjoint random paths and cycles over a shuffled subset of [0, E)."""
    succ = np.full(E, -1, np.int32)
    valid = np.ones(E, bool)
    perm = rng.permutation(E)
    i = 0
    for _ in range(n_paths):
        ln = int(rng.integers(1, max_len + 1))
        ids = perm[i : i + ln]
        i += ln
        for a, b in zip(ids[:-1], ids[1:]):
            succ[a] = b
    for _ in range(n_cycles):
        ln = int(rng.integers(1, max_len + 1))
        ids = perm[i : i + ln]
        i += ln
        for a, b in zip(ids[:-1], ids[1:]):
            succ[a] = b
        succ[ids[-1]] = ids[0]
    # mark leftovers invalid (isolated padding, like edge_valid=False slots)
    for e in perm[i : i + n_invalid]:
        valid[e] = False
    return succ, valid


def doubling_cycle_min(succ, t):
    """Reference: min-propagating doubling (mirrors unitigs.cut_cycles core)."""
    E = succ.shape[0]
    SENT = np.uint32(0xFFFFFFFF)
    tt = t.copy()
    tt[succ < 0] = SENT
    p = np.where(succ >= 0, succ, -1)
    m = tt.copy()
    for _ in range(_log2_ceil(E) + 1):
        alive = p >= 0
        pm = np.where(alive, m[np.clip(p, 0, E - 1)], SENT)
        m = np.minimum(m, pm)
        p = np.where(alive, p[np.clip(p, 0, E - 1)], -1)
    on_cycle = p >= 0
    return on_cycle, m


@pytest.mark.parametrize(
    "seed,E,n_paths,n_cycles,max_len",
    [
        (0, 500, 10, 5, 40),
        (1, 2000, 3, 3, 600),  # sublists longer than WALK_CAP -> restart rounds
        (2, 1000, 0, 50, 8),  # many tiny cycles -> ruler-free fallback
        (3, 800, 40, 0, 30),  # paths only
        (4, 64, 1, 1, 20),
    ],
)
def test_cycle_min_matches_doubling(seed, E, n_paths, n_cycles, max_len):
    rng = np.random.default_rng(seed)
    succ, valid = random_functional_graph(
        rng, E, n_paths, n_cycles, max_len, n_invalid=E // 10
    )
    # self-loop edge case
    free = np.flatnonzero((succ < 0) & valid)
    if free.size:
        succ[free[0]] = free[0]
    t = rng.integers(0, 2**32, size=(E, 2), dtype=np.uint32)
    res = ranking.cycle_min_ruling(
        jnp.asarray(succ), jnp.asarray(valid), jnp.asarray(t)
    )
    assert res is not None
    on_cycle, cyc_min = np.asarray(res[0]), np.asarray(res[1])

    # reference via numpy doubling (lexicographic over 2 limbs as u64)
    t64 = (t[:, 0].astype(np.uint64) << np.uint64(32)) | t[:, 1].astype(np.uint64)
    ref_cyc, ref_min = doubling_cycle_min64(succ, t64)
    np.testing.assert_array_equal(on_cycle & valid, ref_cyc & valid)
    got64 = (cyc_min[:, 0].astype(np.uint64) << np.uint64(32)) | cyc_min[
        :, 1
    ].astype(np.uint64)
    sel = on_cycle & valid
    np.testing.assert_array_equal(got64[sel], ref_min[sel])


def doubling_cycle_min64(succ, t64):
    E = succ.shape[0]
    SENT = np.uint64(0xFFFFFFFFFFFFFFFF)
    m = t64.copy()
    m[succ < 0] = SENT
    p = np.where(succ >= 0, succ, -1)
    for _ in range(_log2_ceil(E) + 1):
        alive = p >= 0
        pm = np.where(alive, m[np.clip(p, 0, E - 1)], SENT)
        m = np.minimum(m, pm)
        p = np.where(alive, p[np.clip(p, 0, E - 1)], -1)
    return p >= 0, m


@pytest.mark.parametrize(
    "seed,E,n_paths,max_len",
    [
        (0, 500, 20, 30),
        (1, 3000, 4, 700),  # forces multiple restart rounds (> WALK_CAP)
        (2, 300, 300, 1),  # all 1-chains
        (3, 1024, 7, 120),
    ],
)
def test_rank_chains_matches_wyllie(seed, E, n_paths, max_len):
    rng = np.random.default_rng(seed)
    succ, valid = random_functional_graph(
        rng, E, n_paths, 0, max_len, n_invalid=E // 8
    )
    res = ranking.rank_chains_ruling(jnp.asarray(succ), jnp.asarray(valid))
    assert res is not None
    d, end = np.asarray(res[0]), np.asarray(res[1])
    dw, endw = wyllie_rank(jnp.asarray(succ), _log2_ceil(E) + 1)
    dw, endw = np.asarray(dw), np.asarray(endw)
    np.testing.assert_array_equal(d[valid], dw[valid])
    np.testing.assert_array_equal(end[valid], endw[valid])


@pytest.mark.parametrize(
    "seed,E,n_paths,n_cycles,max_len,tbits",
    [
        (0, 600, 10, 8, 40, 32),
        (1, 3000, 2, 4, 700, 32),   # cycles longer than WALK_CAP
        (2, 1200, 0, 80, 10, 32),   # many ruler-free cycles -> patch-only
        (3, 900, 15, 15, 50, 2),    # tiny key alphabet -> multi-cut sublists
        (4, 2048, 5, 30, 90, 4),    # duplicates + medium cycles
        (5, 400, 0, 200, 2, 32),    # hundreds of 1-2 cycles incl. self-loops
    ],
)
def test_fused_rank_matches_second_walk(seed, E, n_paths, n_cycles, max_len, tbits):
    """rank_chains_with_cut (no second walk) == rank_chains_ruling on the cut
    list, across cycle-heavy / duplicate-key / orphan-generating graphs."""
    rng = np.random.default_rng(seed)
    succ, valid = random_functional_graph(
        rng, E, n_paths, n_cycles, max_len, n_invalid=E // 10
    )
    free = np.flatnonzero((succ < 0) & valid)
    for e in free[:3]:
        succ[e] = e  # self-loops
    t = rng.integers(0, 2**tbits, size=(E, 2), dtype=np.uint32)
    res = ranking.cycle_min_ruling_tables(
        jnp.asarray(succ), jnp.asarray(valid), jnp.asarray(t)
    )
    assert res is not None
    on_cycle, cyc_min, owner_off, tabs, succ_c = res
    from tpu_euler.euler.unitigs import _apply_cut

    succ_cut, is_cut = _apply_cut(jnp.asarray(succ), jnp.asarray(t), on_cycle, cyc_min)
    rr = ranking.rank_chains_with_cut(
        succ_cut, jnp.asarray(valid), is_cut, owner_off, tabs, succ_c
    )
    assert rr is not None
    d, end = np.asarray(rr[0]), np.asarray(rr[1])
    dw, endw = wyllie_rank(succ_cut, _log2_ceil(E) + 1)
    dw, endw = np.asarray(dw), np.asarray(endw)
    np.testing.assert_array_equal(d[valid], dw[valid])
    np.testing.assert_array_equal(end[valid], endw[valid])


def test_rank_chains_detects_leaked_cycle():
    rng = np.random.default_rng(7)
    succ, valid = random_functional_graph(rng, 400, 5, 2, 50)
    assert ranking.rank_chains_ruling(jnp.asarray(succ), jnp.asarray(valid)) is None


def _spectrum_from_kmers(kmers, k, capacity):
    limbs = encode_np(sorted(kmers), k)
    C = capacity
    pad = np.zeros((C - limbs.shape[0], limbs.shape[1]), np.uint32)
    return Spectrum(
        limbs=jnp.asarray(np.concatenate([limbs, pad])),
        counts=jnp.asarray(
            np.concatenate(
                [np.full(limbs.shape[0], 2, np.int32), np.zeros(C - limbs.shape[0], np.int32)]
            )
        ),
        n=jnp.asarray(limbs.shape[0], jnp.int32),
    )


@pytest.mark.parametrize("seed,glen,circular", [(0, 3000, True), (1, 2500, False)])
def test_unitig_chains_fast_end_to_end(seed, glen, circular):
    """Fast path == doubling path, field by field, on a real genome graph."""
    k = 15
    genome = random_genome(glen, seed=seed)
    reads = simulate_reads(genome, read_len=60, coverage=8, seed=seed + 1, circular=circular)
    cfg = AssemblyConfig(k=k, read_batch=256, read_len=60, spectrum_capacity=1 << 14)
    spec, _ = count_spectrum(
        np.asarray(
            jnp.asarray(
                [[{"A": 0, "C": 1, "G": 2, "T": 3}[c] for c in r] for r in reads],
                jnp.int8,
            )
        ),
        cfg,
    )
    g = build_graph(spec, k)
    ref = unitig_chains(g, k)
    got = unitig_chains_fast(g, k, min_edges=0)  # force the ruling-set path
    for name in ref._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(ref, name)),
            err_msg=name,
        )
