"""Staged low-memory graph build + virtual-edge traversal/emission must be
bit-identical to the monolithic materialized path (graph/build.py staged
section; the SPEC config-5 memory path used by the production pipeline)."""

from __future__ import annotations

import numpy as np
import pytest

from tpu_euler.config import AssemblyConfig
from tpu_euler.euler import extract
from tpu_euler.euler.unitigs import (
    chains_from_successors_spec,
    successor,
    unitig_chains,
    unitig_chains_fast,
)
from tpu_euler.graph.build import (
    build_graph,
    build_graph_staged,
    doubled_edges,
    gather_edge_rows,
)
from tpu_euler.kmer.count import apply_cutoff
from tpu_euler.pipeline.assemble import count_spectrum
from tpu_euler.reference_impl.simulate import random_genome, simulate_reads


def _cut_spectrum(glen, k, seed, coverage=20, err=0.0, min_count=1):
    import jax.numpy as jnp

    genome = random_genome(glen, seed=seed)
    reads = simulate_reads(
        genome, read_len=80, coverage=coverage, seed=seed + 1, error_rate=err
    )
    cfg = AssemblyConfig(
        k=k, read_batch=256, read_len=80, spectrum_capacity=1 << 14
    )
    codes = np.full((len(reads), 80), 4, np.int8)
    lut = {c: i for i, c in enumerate("ACGT")}
    for r, s in enumerate(reads):
        codes[r, : len(s)] = [lut[c] for c in s]
    acc, _ = count_spectrum(codes, cfg)
    return apply_cutoff(acc, min_count)


@pytest.mark.parametrize("k,glen,seed", [(21, 1500, 3), (31, 2500, 5), (41, 1200, 7)])
def test_gather_edge_rows_matches_doubled(k, glen, seed):
    import jax.numpy as jnp

    cut = _cut_spectrum(glen, k, seed)
    el, ev = doubled_edges(cut, k)
    E = el.shape[0]
    idx = jnp.arange(E, dtype=jnp.int32)
    virt = gather_edge_rows(cut.limbs, idx, k)
    valid = np.asarray(ev)
    assert np.array_equal(np.asarray(el)[valid], np.asarray(virt)[valid])


@pytest.mark.parametrize("k,glen,seed,err", [
    (21, 2000, 11, 0.0), (31, 3000, 13, 0.004), (41, 1500, 17, 0.0),
])
def test_staged_build_bit_identical(k, glen, seed, err):
    cut = _cut_spectrum(glen, k, seed, err=err, min_count=2 if err else 1)
    g1 = build_graph(cut, k)
    g2 = build_graph_staged(cut, k)
    assert int(g1.n_nodes) == int(g2.n_nodes)
    assert int(g1.n_edges) == int(g2.n_edges)
    for name in ("edge_valid", "tail", "head", "indeg", "outdeg",
                 "out_first", "succ_cand"):
        a, b = np.asarray(getattr(g1, name)), np.asarray(getattr(g2, name))
        assert np.array_equal(a, b), f"{name} differs (k={k})"


@pytest.mark.parametrize("trim", [False, True])
def test_staged_traversal_and_emission_match(trim):
    import jax.numpy as jnp

    k = 31
    cut = _cut_spectrum(2500, k, 23)
    E = 2 * cut.limbs.shape[0]
    node_cap = ((int(1.2 * E) + 255) // 256) * 256 if trim else 0
    g1 = build_graph(cut, k)
    g2 = build_graph_staged(cut, k, node_cap)
    if trim:
        assert int(g2.n_nodes) <= node_cap  # test graphs are connected enough
    # force the ruling-set path on both (min_edges=0)
    ref = unitig_chains_fast(g1, k, min_edges=0)
    succ0 = successor(g2, k)
    got = chains_from_successors_spec(
        cut.limbs, g2.edge_valid, succ0, k, min_edges=0
    )
    for name in ref._fields:
        assert np.array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        ), f"chains.{name} differs (trim={trim})"
    c1 = extract.chains_to_contigs_device(g1, ref, k)
    c2 = extract.chains_to_contigs_device_spec(cut.limbs, got, k)
    assert c1 == c2 and len(c1) > 0
    # doubling fallback path parity too
    dbl = unitig_chains(g1, k)
    got_dbl = chains_from_successors_spec(
        cut.limbs, g2.edge_valid, succ0, k, min_edges=1 << 30
    )
    for name in dbl._fields:
        assert np.array_equal(
            np.asarray(getattr(dbl, name)), np.asarray(getattr(got_dbl, name))
        ), f"doubling chains.{name} differs"


def test_spec_emission_host_fallback_matches():
    """The spec-path host fallback (virtual edge rows gathered on device)
    equals the device path's contigs."""
    k = 21
    cut = _cut_spectrum(1800, k, 29)
    g = build_graph_staged(cut, k)
    succ0 = successor(g, k)
    chains = chains_from_successors_spec(cut.limbs, g.edge_valid, succ0, k)
    dev = extract.chains_to_contigs_device_spec(cut.limbs, chains, k)
    before = extract.HOST_FALLBACKS
    # tiny capacities + >16 chains impossible here (single contig), so use
    # the assembled set only as reference for the forced-fallback variant
    fb = extract.chains_to_contigs_device_spec(
        cut.limbs, chains, k, out_capacity=8, chain_capacity=1
    )
    assert fb == dev
