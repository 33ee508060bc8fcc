"""Sweep RULER_STRIDE x WALK_CAP for the ruling-set walk at bench scale.

The walk ladder's cost = (iterations) x (per-iteration fixed overhead +
s_cap-row gather/scatter). Total slot-iterations are ~E regardless of
stride (each element visited once), so a SMALLER stride (more rulers,
wider rounds, fewer iterations) trades bandwidth-neutral work for less
fixed overhead — until the contracted list (~E/stride) gets big enough to
hurt the doubling phase. This measures the real optimum on the chip at
config-2 scale and writes scripts/walkstride_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_euler.utils.runtime import setup_compilation_cache

setup_compilation_cache()

import jax
import numpy as np

from tpu_euler.config import AssemblyConfig
from tpu_euler.euler import ranking
from tpu_euler.euler.unitigs import _apply_cut, successor, transition_keys
from tpu_euler.pipeline.assemble import (
    count_spectrum,
    make_graph_step,
    right_size_spectrum,
)
from tpu_euler.reference_impl.simulate import random_genome, simulate_read_codes

GENOME_BP = 4_600_000
K = 31


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def run_once(succ0, edge_valid, tk):
    t0 = time.perf_counter()
    res = ranking.cycle_min_ruling_tables(succ0, edge_valid, tk)
    assert res is not None
    on_cycle, cyc_min, owner_off, tabs, succ_c = res
    sync(on_cycle)
    t_cycle = time.perf_counter() - t0
    succ, is_cut = _apply_cut(succ0, tk, on_cycle, cyc_min)
    sync(succ)
    t0 = time.perf_counter()
    rr = ranking.rank_chains_with_cut(
        succ, edge_valid, is_cut, owner_off, tabs, succ_c
    )
    assert rr is not None
    d, end_edge = rr
    sync(d)
    t_rank = time.perf_counter() - t0
    return t_cycle, t_rank, (int(d.sum()), int(end_edge.sum()))


def main():
    genome = random_genome(GENOME_BP, seed=2024)
    codes = simulate_read_codes(
        genome, read_len=100, coverage=50, seed=2025, circular=True
    )
    cfg = AssemblyConfig(
        k=K, read_batch=1 << 18, read_len=100, spectrum_capacity=1 << 23
    )
    graph_step = make_graph_step(cfg.k, cfg.min_count)
    acc, _ = count_spectrum(codes, cfg, {})
    acc = right_size_spectrum(acc)
    g, _ = graph_step(acc)
    succ0 = successor(g, cfg.k)
    tk = transition_keys(g, succ0, cfg.k)
    sync(tk)

    rows = []
    ref_digest = None
    for stride, cap in [(64, 128), (32, 128), (32, 64), (16, 64), (16, 32),
                        (8, 32), (64, 64)]:
        ranking.RULER_STRIDE, ranking.WALK_CAP = stride, cap
        # warm (compile for this config's shapes), then 3 timed
        run_once(succ0, g.edge_valid, tk)
        ts = [run_once(succ0, g.edge_valid, tk) for _ in range(3)]
        digest = ts[0][2]
        if ref_digest is None:
            ref_digest = digest
        tc = sorted(t[0] for t in ts)[1]
        tr = sorted(t[1] for t in ts)[1]
        rows.append({
            "stride": stride, "walk_cap": cap,
            "cycle_s": round(tc, 3), "rank_s": round(tr, 3),
            "total_s": round(tc + tr, 3),
            "digest_equal": digest == ref_digest,
        })
        print(json.dumps(rows[-1]), flush=True)
        assert digest == ref_digest, "ranking result changed with stride!"
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scripts", "walkstride_results.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
