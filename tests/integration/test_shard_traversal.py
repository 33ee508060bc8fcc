"""Fully sharded traversal (SPEC configs 4-5): identical contigs to the
replicated path and the CPU oracle on 2/4/8-device meshes."""

import numpy as np
import pytest

from tpu_euler.config import AssemblyConfig
from tpu_euler.dist.pipeline import assemble_reads_distributed
from tpu_euler.reference_impl.oracle import assemble_oracle
from tpu_euler.reference_impl.simulate import random_genome, simulate_reads
from tpu_euler.verify.compare import canonical_contig_set


@pytest.fixture(scope="module")
def dataset():
    genome = random_genome(3500, seed=801)
    reads = simulate_reads(genome, read_len=100, coverage=22, seed=802, circular=True)
    return genome, reads


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_traversal_matches_oracle(dataset, n_dev):
    _, reads = dataset
    cfg = AssemblyConfig(k=21, read_batch=128, read_len=100, spectrum_capacity=1 << 15)
    got = assemble_reads_distributed(reads, cfg, n_devices=n_dev, shard_traversal=True)
    oracle = assemble_oracle(reads, cfg.k)
    assert canonical_contig_set(got.contig_strings) == oracle


def test_sharded_equals_replicated(dataset):
    _, reads = dataset
    cfg = AssemblyConfig(k=31, read_batch=128, read_len=100, spectrum_capacity=1 << 15)
    a = assemble_reads_distributed(reads, cfg, n_devices=4, shard_traversal=True)
    b = assemble_reads_distributed(reads, cfg, n_devices=4, shard_traversal=False)
    assert a.contigs == b.contigs
    assert a.n_distinct_kmers == b.n_distinct_kmers


def test_sharded_with_cutoff_and_repeats():
    rep = random_genome(200, seed=811)
    genome = (
        random_genome(900, seed=812) + rep + random_genome(700, seed=813) + rep
        + random_genome(500, seed=814)
    )
    reads = simulate_reads(genome, read_len=100, coverage=30, seed=815,
                           error_rate=0.004, circular=False)
    cfg = AssemblyConfig(
        k=21, min_count=4, read_batch=128, read_len=100, spectrum_capacity=1 << 15
    )
    got = assemble_reads_distributed(reads, cfg, n_devices=8, shard_traversal=True)
    oracle = assemble_oracle(reads, cfg.k, min_count=4)
    assert canonical_contig_set(got.contig_strings) == oracle


def test_sharded_k41_three_limb_keys():
    """SPEC config 5 shape: k=41 (3 uint32 limbs) through the sharded path."""
    genome = random_genome(1500, seed=821)
    reads = simulate_reads(genome, read_len=120, coverage=18, seed=822, circular=True)
    cfg = AssemblyConfig(k=41, read_batch=64, read_len=120, spectrum_capacity=1 << 13)
    got = assemble_reads_distributed(reads, cfg, n_devices=8, shard_traversal=True)
    assert canonical_contig_set(got.contig_strings) == assemble_oracle(reads, 41)


def test_sharded_paired_end_reads():
    """SPEC config 4 shape: paired-end reads, graph sharded."""
    genome = random_genome(2500, seed=831)
    reads = simulate_reads(
        genome, read_len=100, coverage=25, seed=832, circular=True,
        paired=True, insert_size=280,
    )
    cfg = AssemblyConfig(k=31, read_batch=128, read_len=100, spectrum_capacity=1 << 15)
    got = assemble_reads_distributed(reads, cfg, n_devices=4, shard_traversal=True)
    assert canonical_contig_set(got.contig_strings) == assemble_oracle(reads, 31)


def test_sharded_tip_clipping_matches_oracle():
    """Tips clipped identically through the sharded path (configs 4-5 + errors)."""
    import numpy as np

    rng = np.random.default_rng(840)
    genome = random_genome(2500, seed=841)
    reads = simulate_reads(genome, read_len=100, coverage=25, seed=842, circular=True)
    for t in range(5):
        p = int(rng.integers(0, len(genome) - 100))
        junk = "".join("ACGT"[c] for c in rng.integers(0, 4, 30))
        reads.extend([(genome[p : p + 70] + junk)[:100]] * 5)
    cfg = AssemblyConfig(
        k=21, min_count=3, tip_rounds=3, read_batch=128, read_len=100,
        spectrum_capacity=1 << 15,
    )
    got = assemble_reads_distributed(reads, cfg, n_devices=8, shard_traversal=True)
    expected = assemble_oracle(reads, 21, min_count=3, tip_rounds=3)
    assert canonical_contig_set(got.contig_strings) == expected
    assert len(expected) == 1  # clean single-circle recovery
