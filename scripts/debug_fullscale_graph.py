"""Bisect the config-5 graph/traversal OOM at exact shapes, fast.

Skips the 2.4G-window counting phase (which passes): generates the 100 Mbp
genome's k-mer set directly via exact-cover reads (each window once, 100M
windows -> one-shot count in ~1 min), then drives the staged build +
ruling-set walk + emission PIECE BY PIECE with a block_until_ready and a
print after each — the first missing print names the failing execution
(async dispatch makes tracebacks lie about OOM locations).

Usage: python scripts/debug_fullscale_graph.py [--bp 100000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_euler.utils.runtime import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def sync(label, t0, *xs):
    jax.block_until_ready(xs)
    print(f"  OK {label} (+{time.perf_counter() - t0:.2f}s)", flush=True)
    return time.perf_counter()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bp", type=int, default=100_000_000)
    args = ap.parse_args()
    G, k = args.bp, 41

    from tpu_euler.config import AssemblyConfig
    from tpu_euler.euler import ranking
    from tpu_euler.euler.extract import chains_to_contigs_device_spec
    from tpu_euler.euler.unitigs import (
        _apply_cut,
        _chains_from_rank,
        successor,
        transition_keys_spec,
    )
    from tpu_euler.graph.build import build_graph_staged
    from tpu_euler.pipeline.assemble import (
        count_spectrum,
        make_cutoff_step,
        right_size_spectrum,
    )
    from tpu_euler.reference_impl.simulate import random_genome

    t0 = time.perf_counter()
    genome = random_genome(G, seed=505)
    lut = np.full(256, 4, dtype=np.int8)
    for i, b in enumerate(b"ACGT"):
        lut[b] = i
    gc = lut[np.frombuffer((genome + genome[: k - 1 + 59]).encode(), np.uint8)]
    read_len, step = 100, 60  # step = windows/read -> exact window cover
    n_reads = -(-G // step)
    codes = np.zeros((n_reads, read_len), np.int8)
    for r0 in range(0, n_reads, 1 << 20):
        rr = np.arange(r0, min(n_reads, r0 + (1 << 20)))
        codes[rr] = gc[(rr[:, None] * step + np.arange(read_len)[None, :])]
    t0 = sync("simulate (host)", t0)

    cfg = AssemblyConfig(
        k=k, read_batch=1 << 18, read_len=read_len,
        spectrum_capacity=max(1 << 24, int(1.2 * G)),
        node_cap_factor=1.15,
    )
    acc, n_windows = count_spectrum(codes, cfg, {})
    t0 = sync(f"count ({n_windows} windows)", t0, acc.limbs)

    acc = right_size_spectrum(acc)
    cut = make_cutoff_step(cfg.min_count)(acc)
    del acc
    t0 = sync(f"cutoff (C={cut.limbs.shape[0]})", t0, cut.limbs)

    E = 2 * cut.limbs.shape[0]
    granule = 1 << 18
    node_cap = min(2 * E, -(-int(cfg.node_cap_factor * E) // granule) * granule)
    g = build_graph_staged(cut, k, node_cap, sync=True)
    spec_limbs = cut.limbs
    del cut
    n_nodes = int(g.n_nodes)
    t0 = sync(f"staged build (E={E} n_nodes={n_nodes} cap={node_cap})", t0)

    succ0 = successor(g, k)
    edge_valid = g.edge_valid
    del g
    t0 = sync("successor", t0, succ0)

    t_keys = transition_keys_spec(spec_limbs, succ0, k)
    t0 = sync("transition_keys_spec", t0, t_keys)

    # ---- ranking pieces (mirrors _run_walk with syncs) ----
    is_ruler, n_rulers = ranking._pick_rulers(succ0, edge_valid, True)
    t0 = sync(f"_pick_rulers ({int(n_rulers)} rulers)", t0, is_ruler)
    succ2 = ranking._build_succ2(succ0, is_ruler)
    t0 = sync("_build_succ2", t0, succ2)
    rows = ranking._build_rows(succ2, t_keys)
    t0 = sync("_build_rows", t0, rows)
    s_cap = ranking._cap_rows(int(n_rulers))
    owner_off = jnp.full((succ0.shape[0],), jnp.uint32(0xFFFFFFFF))
    frontier = ranking._compact_rulers(is_ruler, s_cap)
    t0 = sync("_compact_rulers", t0, frontier)
    del succ2, is_ruler
    base = 0
    S_cap = ranking._pow2(2 * s_cap)
    tabs = ranking._empty_tables(S_cap, t_keys.shape[1])
    rnd = 0
    while True:
        if base + s_cap > S_cap:
            S_cap = ranking._pow2(base + s_cap)
            tabs = ranking._grow_tables(tabs, S_cap)
        owner_off, rows, next_r, end_e, hops, mmin, capped, n_capped = (
            ranking._walk_round(
                rows, frontier, jnp.uint32(base), owner_off,
                ranking.WALK_CAP, True,
            )
        )
        t0 = sync(f"_walk_round {rnd}", t0, owner_off)
        tabs = ranking._append_tables(
            tabs, jnp.asarray(base, jnp.int32), frontier, next_r, end_e,
            hops, mmin,
        )
        base += s_cap
        n = int(n_capped)
        t0 = sync(f"_append_tables {rnd} (capped={n})", t0, tabs["elem"])
        if n == 0:
            break
        s_cap = ranking._cap_rows(n)
        frontier = capped[:s_cap]
        rnd += 1

    del rows, frontier, capped, next_r, end_e, hops, mmin  # rows is 3.4 GB
    succ_c = ranking._contract_succ(tabs["elem"], tabs["next_r"], succ0.shape[0])
    ruler_on_cycle, ruler_min = ranking._contracted_cycle_min(succ_c, tabs["mmin"])
    on_cycle, cyc_min, uncovered = ranking._broadcast_cycle(
        owner_off, ruler_on_cycle, ruler_min, succ0
    )
    n_unc = int(jnp.sum(uncovered.astype(jnp.int32)))
    t0 = sync(f"cycle tables (uncovered={n_unc})", t0, on_cycle)
    assert n_unc == 0, "exact-cover circular genome should be fully covered"

    succ, is_cut = _apply_cut(succ0, t_keys, on_cycle, cyc_min)
    del t_keys, cyc_min, ruler_on_cycle, ruler_min, uncovered
    t0 = sync("_apply_cut", t0, succ)
    m1, cut_edge = ranking._cut_tables(is_cut, owner_off, succ_c)
    D, chain_end, has_cycle = ranking._contracted_rank_cut(
        succ_c, tabs["hops"], tabs["end_e"], m1, cut_edge
    )
    d, end_edge, patch, n_patch = ranking._broadcast_rank_cut(
        owner_off, D, chain_end, edge_valid, m1
    )
    np_ = int(n_patch)
    t0 = sync(f"rank_with_cut (patch={np_})", t0, d)
    if np_:
        u_cap = ranking._pow2(np_, lo=1 << 10)
        dp, ep, leaked = ranking._patch_rank(succ, patch, d, end_edge, u_cap)
        assert not bool(leaked)
        d, end_edge = ranking._merge_patch(d, end_edge, patch, dp, ep)
        t0 = sync("patch_rank", t0, d)
    del tabs, owner_off, succ_c, m1, cut_edge, D, chain_end, patch

    chains = _chains_from_rank(edge_valid, succ, d, end_edge, on_cycle)
    t0 = sync("chains_from_rank", t0, chains.chain)
    del succ, d, end_edge, on_cycle, succ0

    contigs = chains_to_contigs_device_spec(spec_limbs, chains, k)
    t0 = sync(f"emission ({len(contigs)} contigs)", t0)
    lens = sorted(len(c) for c in contigs)
    print(f"DONE: {len(contigs)} contigs, longest {lens[-1] if lens else 0}")
    assert len(contigs) == 1 and lens[-1] == G + k - 1
    print("genome-length single contig: PASS")


if __name__ == "__main__":
    main()
