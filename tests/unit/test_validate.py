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
