"""Eulerian tour machinery tests (SURVEY.md R7-R9 parity; section 4 invariants:
successor permutation validity, every edge used exactly once, circuit merging)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_euler.euler.tour import EulerTour, _pair_successors, eulerian_tour
from tpu_euler.graph.build import build_graph
from tpu_euler.kmer.count import count_batch
from tpu_euler.kmer.extract import extract_canonical_kmers
from tpu_euler.io.encode import encode_reads
from tpu_euler.reference_impl.simulate import random_genome, simulate_reads


def graph_from_reads(reads, k, read_len=None):
    read_len = read_len or max(len(r) for r in reads)
    codes = jnp.asarray(encode_reads(reads, read_len))
    limbs, valid = extract_canonical_kmers(codes, k)
    spec = count_batch(limbs, valid)
    return build_graph(spec, k)


def tour_arrays(g, t: EulerTour):
    valid = np.asarray(t.in_tour)
    return (
        np.asarray(t.succ),
        np.asarray(t.chain),
        np.asarray(t.pos),
        np.asarray(t.length),
        valid,
        np.asarray(g.tail),
        np.asarray(g.head),
    )


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_pairing_is_valid_partial_permutation(seed):
    genome = random_genome(500, seed=seed)
    reads = simulate_reads(genome, read_len=80, coverage=10, seed=seed + 10)
    g = graph_from_reads(reads, 21)
    succ = np.asarray(_pair_successors(g))
    valid = np.asarray(g.edge_valid)
    tail, head = np.asarray(g.tail), np.asarray(g.head)
    # succ stays within valid edges and respects adjacency
    for e in np.flatnonzero(valid):
        s = succ[e]
        if s >= 0:
            assert valid[s]
            assert tail[s] == head[e], "successor must start where e ends"
    # injectivity: no two edges share a successor
    taken = succ[succ >= 0]
    assert len(taken) == len(set(taken.tolist()))


@pytest.mark.parametrize("k,glen,seed", [(21, 800, 5), (21, 2000, 6), (31, 1500, 7)])
def test_tour_covers_every_edge_once(k, glen, seed):
    genome = random_genome(glen, seed=seed)
    reads = simulate_reads(genome, read_len=100, coverage=15, seed=seed + 20)
    g = graph_from_reads(reads, k)
    t = eulerian_tour(g)
    succ, chain, pos, length, valid, tail, head = tour_arrays(g, t)
    n_valid = valid.sum()
    # every valid edge has a chain and a unique (chain, pos) slot
    pairs = set()
    for e in np.flatnonzero(valid):
        assert 0 <= pos[e] < length[e]
        pairs.add((chain[e], pos[e]))
    assert len(pairs) == n_valid


def test_eulerian_component_single_circuit():
    """A circular genome with unique k-mers: doubled graph = 2 cycles (one per
    strand); the tour must merge each into exactly one circuit."""
    genome = random_genome(1200, seed=11)
    reads = simulate_reads(genome, read_len=100, coverage=20, seed=12, circular=True)
    g = graph_from_reads(reads, 21)
    t = eulerian_tour(g)
    assert int(t.n_chains) == 2  # forward + reverse strand circuits
    succ, chain, pos, length, valid, tail, head = tour_arrays(g, t)
    # each chain is a full walk: consecutive edges adjacent
    order = np.lexsort((pos, chain))
    ov = order[valid[order]]
    for i in range(len(ov) - 1):
        a, b = ov[i], ov[i + 1]
        if chain[a] == chain[b]:
            assert head[a] == tail[b]
    # chain length = number of distinct kmers per strand
    assert length[ov[0]] == int(g.n_edges) // 2


def test_tour_spells_genome_rotation():
    """Walk the tour edge order and spell the sequence: must be a rotation of
    the genome (or its revcomp) for a unique-kmer circular genome."""
    from tpu_euler.euler.extract import decode_bases_np
    from tpu_euler.reference_impl.simulate import rc

    k = 21
    genome = random_genome(700, seed=21)
    reads = simulate_reads(genome, read_len=80, coverage=20, seed=22, circular=True)
    g = graph_from_reads(reads, k)
    t = eulerian_tour(g)
    succ, chain, pos, length, valid, tail, head = tour_arrays(g, t)
    limbs = np.asarray(g.edge_limbs)
    lastb = np.frombuffer(b"ACGT", np.uint8)[(limbs[:, -1] & 3)]
    order = np.lexsort((pos, chain))
    ov = order[valid[order]]
    seqs = []
    for cid in np.unique(chain[ov]):
        edges = ov[chain[ov] == cid]
        first = edges[0]
        prefix = decode_bases_np(limbs[first][None, :], k - 1, k).tobytes().decode()
        s = prefix + "".join(chr(lastb[e]) for e in edges)
        seqs.append(s)
    assert len(seqs) == 2
    for s in seqs:
        body = s[: len(genome)]
        assert body in genome + genome or body in rc(genome) + rc(genome)
        assert len(s) == len(genome) + k - 1


def test_non_eulerian_graph_path_cover():
    """Linear genome (forward-only reads): unbalanced ends -> path chains; every
    edge still covered exactly once."""
    genome = random_genome(600, seed=31)
    reads = [genome[i : i + 60] for i in range(0, len(genome) - 60 + 1, 5)]
    reads.append(genome[-60:])
    g = graph_from_reads(reads, 21, read_len=60)
    t = eulerian_tour(g)
    succ, chain, pos, length, valid, tail, head = tour_arrays(g, t)
    pairs = {(chain[e], pos[e]) for e in np.flatnonzero(valid)}
    assert len(pairs) == valid.sum()
    assert int(t.n_chains) == 2  # one path per strand


def _assert_valid_tour(g, t):
    """Full tour invariants: unique (chain,pos) slots, adjacency within
    chains, succ a partial injection respecting adjacency."""
    succ, chain, pos, length, valid, tail, head = tour_arrays(g, t)
    n_valid = int(valid.sum())
    pairs = {(chain[e], pos[e]) for e in np.flatnonzero(valid)}
    assert len(pairs) == n_valid
    taken = succ[succ >= 0]
    assert len(taken) == len(set(taken.tolist()))
    for e in np.flatnonzero(valid):
        if succ[e] >= 0:
            assert tail[succ[e]] == head[e]
    order = np.lexsort((pos, chain))
    ov = order[valid[order]]
    for i in range(len(ov) - 1):
        a, b = ov[i], ov[i + 1]
        if chain[a] == chain[b]:
            assert head[a] == tail[b]


@pytest.mark.parametrize("m,seed", [(64, 41), (200, 42)])
def test_adversarial_tangent_circuits(m, seed):
    """Hundreds of circuits sharing ONE hub repeat — the O(C)-round worst case
    for swap-based swipes. The rotation merge must converge in O(log E) rounds
    with a valid every-edge-once tour."""
    k = 21
    hub = random_genome(k + 4, seed=seed)  # shared repeat >= k: common vertices
    blocks = [random_genome(40, seed=seed + 100 + i) for i in range(m)]
    genome = "".join(hub + b for b in blocks)
    # circular sliding reads so the doubled graph is Eulerian
    gg = genome + genome
    reads = [gg[i : i + 80] for i in range(0, len(genome), 7)]
    g = graph_from_reads(reads, k, read_len=80)
    t = eulerian_tour(g)
    _assert_valid_tour(g, t)
    E = int(g.edge_limbs.shape[0])
    bound = 2 * max(1, (E - 1).bit_length()) + 4
    assert int(t.merge_rounds) <= bound, (
        f"merge took {int(t.merge_rounds)} rounds (> {bound}) for {m} blocks"
    )


def test_adversarial_multi_hub_interleaved():
    """Several distinct hubs, each shared by many circuits, interleaved."""
    k = 21
    rng = np.random.default_rng(77)
    hubs = [random_genome(k + 2, seed=500 + h) for h in range(4)]
    parts = []
    for i in range(120):
        parts.append(hubs[int(rng.integers(0, 4))])
        parts.append(random_genome(30, seed=600 + i))
    genome = "".join(parts)
    gg = genome + genome
    reads = [gg[i : i + 80] for i in range(0, len(genome), 6)]
    g = graph_from_reads(reads, k, read_len=80)
    t = eulerian_tour(g)
    _assert_valid_tour(g, t)
    E = int(g.edge_limbs.shape[0])
    assert int(t.merge_rounds) <= 2 * max(1, (E - 1).bit_length()) + 4
