"""Graph/chain invariant validators must pass on well-formed graphs (SURVEY.md
section 5 sanitizer analogue)."""

import jax.numpy as jnp

from tpu_euler.euler.unitigs import unitig_chains
from tpu_euler.graph.build import build_graph
from tpu_euler.graph.validate import validate_chains, validate_graph
from tpu_euler.io.encode import encode_reads
from tpu_euler.kmer.count import count_batch
from tpu_euler.kmer.extract import extract_canonical_kmers
from tpu_euler.reference_impl.simulate import random_genome, simulate_reads


def test_validators_clean_on_real_graph():
    k = 21
    genome = random_genome(1500, seed=41)
    reads = simulate_reads(genome, read_len=90, coverage=15, seed=42, circular=True)
    codes = jnp.asarray(encode_reads(reads, 90))
    limbs, valid = extract_canonical_kmers(codes, k)
    g = build_graph(count_batch(limbs, valid), k)
    assert validate_graph(g, k) == []
    chains = unitig_chains(g, k)
    assert validate_chains(g, chains, k) == []


def test_device_emission_matches_host():
    from tpu_euler.euler.extract import chains_to_contigs, chains_to_contigs_device

    k = 21
    genome = random_genome(2200, seed=51)
    reads = simulate_reads(genome, read_len=90, coverage=18, seed=52, circular=True)
    codes = jnp.asarray(encode_reads(reads, 90))
    limbs, valid = extract_canonical_kmers(codes, k)
    g = build_graph(count_batch(limbs, valid), k)
    chains = unitig_chains(g, k)
    host = chains_to_contigs(g, chains, k)
    dev = chains_to_contigs_device(g, chains, k)
    assert dev == host
    # tiny capacities force the fallback path
    dev_fb = chains_to_contigs_device(g, chains, k, out_capacity=8, chain_capacity=1)
    assert dev_fb == host


def test_device_emission_repeat_genome():
    from tpu_euler.euler.extract import chains_to_contigs, chains_to_contigs_device

    k = 21
    rep = random_genome(150, seed=53)
    genome = (
        random_genome(500, seed=54) + rep + random_genome(400, seed=55) + rep
        + random_genome(300, seed=56)
    )
    reads = [genome[i : i + 80] for i in range(0, len(genome) - 80 + 1, 4)]
    codes = jnp.asarray(encode_reads(reads, 80))
    limbs, valid = extract_canonical_kmers(codes, k)
    g = build_graph(count_batch(limbs, valid), k)
    chains = unitig_chains(g, k)
    assert chains_to_contigs_device(g, chains, k) == chains_to_contigs(g, chains, k)
