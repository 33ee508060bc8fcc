"""Distributed counting/assembly on the 8-virtual-device CPU mesh (SURVEY.md
section 4 multi-host strategy; SPEC D1-D6). Results must be bit-identical to the
single-device pipeline and the CPU oracle regardless of device count."""

import numpy as np
import pytest

import jax

from tpu_euler.config import AssemblyConfig
from tpu_euler.dist.pipeline import assemble_reads_distributed
from tpu_euler.pipeline.assemble import assemble_reads
from tpu_euler.reference_impl.oracle import assemble_oracle, count_canonical_kmers
from tpu_euler.reference_impl.simulate import random_genome, simulate_reads
from tpu_euler.verify.compare import canonical_contig_set


@pytest.fixture(scope="module")
def dataset():
    genome = random_genome(4000, seed=201)
    reads = simulate_reads(genome, read_len=100, coverage=25, seed=202, circular=True)
    return genome, reads


@pytest.mark.parametrize("n_dev", [2, 8])
def test_dist_matches_oracle_and_single(dataset, n_dev):
    _, reads = dataset
    cfg = AssemblyConfig(k=21, read_batch=128, read_len=100, spectrum_capacity=1 << 15)
    dist = assemble_reads_distributed(reads, cfg, n_devices=n_dev)
    single = assemble_reads(reads, cfg)
    oracle = assemble_oracle(reads, cfg.k)
    assert canonical_contig_set(dist.contig_strings) == oracle
    assert dist.contigs == single.contigs
    assert dist.n_distinct_kmers == single.n_distinct_kmers
    assert dist.n_kmers_counted == single.n_kmers_counted


def test_dist_counts_exact(dataset):
    """Sharded spectrum counts must equal Counter exactly (no dropped/dup keys)."""
    _, reads = dataset
    cfg = AssemblyConfig(k=31, read_batch=64, read_len=100, spectrum_capacity=1 << 15)
    dist = assemble_reads_distributed(reads, cfg, n_devices=8)
    expected_total = sum(count_canonical_kmers(reads, 31).values())
    assert dist.n_kmers_counted == expected_total


def test_dist_cutoff(dataset):
    _, reads_clean = dataset
    genome = random_genome(2500, seed=203)
    reads = simulate_reads(
        genome, read_len=100, coverage=35, seed=204, circular=True, error_rate=0.004
    )
    cfg = AssemblyConfig(
        k=21, min_count=4, read_batch=128, read_len=100, spectrum_capacity=1 << 15
    )
    dist = assemble_reads_distributed(reads, cfg, n_devices=8)
    oracle = assemble_oracle(reads, cfg.k, cfg.min_count)
    assert canonical_contig_set(dist.contig_strings) == oracle


def test_dist_overflow_detection():
    genome = random_genome(6000, seed=205)
    reads = simulate_reads(genome, read_len=100, coverage=10, seed=206)
    cfg = AssemblyConfig(k=21, read_batch=128, read_len=100, spectrum_capacity=1 << 9)
    with pytest.raises(RuntimeError, match="overflow"):
        assemble_reads_distributed(reads, cfg, n_devices=8)


def test_local_input_single_process_equivalent():
    """local_input=True (process-local feeding, SPEC D2) produces identical
    results to global-input mode in a single process."""
    from tpu_euler.config import AssemblyConfig
    from tpu_euler.dist.pipeline import assemble_reads_distributed
    from tpu_euler.reference_impl.simulate import random_genome, simulate_reads

    genome = random_genome(1200, seed=871)
    reads = simulate_reads(genome, read_len=80, coverage=15, seed=872, circular=True)
    cfg = AssemblyConfig(k=21, read_batch=32, read_len=80, spectrum_capacity=1 << 13)
    a = assemble_reads_distributed(reads, cfg, n_devices=4, local_input=True)
    b = assemble_reads_distributed(reads, cfg, n_devices=4, local_input=False)
    assert a.contigs == b.contigs
    assert a.n_reads == b.n_reads == len(reads)
    assert a.n_kmers_counted == b.n_kmers_counted
