"""Tests for the CPU oracle assembler (the ground-truth reference, SURVEY.md 2b)."""

import numpy as np
import pytest

from tpu_euler.reference_impl.oracle import assemble_oracle, canon, rc
from tpu_euler.reference_impl.simulate import random_genome, simulate_reads, PHIX174


def spell_check_circular(contig: str, genome: str, k: int) -> bool:
    """contig is a (k-1)-wrapped rotation of genome or its revcomp."""
    if len(contig) != len(genome) + k - 1:
        return False
    body, tail = contig[: len(genome)], contig[len(genome) :]
    if tail != body[: k - 1]:
        return False
    for g in (genome, rc(genome)):
        if body in g + g:
            return True
    return False


@pytest.mark.parametrize("k", [21, 31])
def test_circular_genome_single_contig(k):
    genome = random_genome(3000, seed=5)
    reads = simulate_reads(genome, read_len=100, coverage=20, seed=1, circular=True)
    contigs = assemble_oracle(reads, k)
    assert len(contigs) == 1
    (c,) = contigs
    assert spell_check_circular(c, genome, k)


def test_linear_genome_single_contig():
    k = 21
    genome = random_genome(2000, seed=9)
    # tile reads so every k-mer is covered, forward strand, linear genome
    reads = [genome[i : i + 100] for i in range(0, len(genome) - 100 + 1, 10)]
    reads.append(genome[-100:])
    contigs = assemble_oracle(reads, k)
    assert contigs == {canon(genome)}


def test_strand_symmetry():
    k = 21
    genome = random_genome(1500, seed=13)
    reads = simulate_reads(genome, read_len=80, coverage=25, seed=3, circular=False)
    fwd = assemble_oracle(reads, k)
    rev = assemble_oracle([rc(r) for r in reads], k)
    assert fwd == rev


def test_min_count_drops_error_kmers():
    k = 21
    genome = random_genome(2000, seed=21)
    clean = simulate_reads(genome, read_len=100, coverage=40, seed=2, circular=True)
    noisy = simulate_reads(
        genome, read_len=100, coverage=40, seed=2, circular=True, error_rate=0.005
    )
    base = assemble_oracle(clean, k)
    with_cutoff = assemble_oracle(noisy, k, min_count=4)
    # Errors at 0.5% with 40x coverage: true k-mers seen >>4 times, error k-mers <4.
    assert with_cutoff == base


def test_repeat_genome_breaks_into_unitigs():
    k = 21
    rep = random_genome(200, seed=31)
    a, b, c = (random_genome(400, seed=s) for s in (32, 33, 34))
    genome = a + rep + b + rep + c
    reads = [genome[i : i + 100] for i in range(len(genome) - 100 + 1)]
    contigs = assemble_oracle(reads, k)
    # The repeat forces branching: more than one contig, each a genome substring
    # (or revcomp) once the k-1 overlaps are accounted for.
    assert len(contigs) > 1
    for ctg in contigs:
        assert ctg in genome or rc(ctg) in genome


def test_phix_sized_assembly():
    k = 21
    reads = simulate_reads(PHIX174, read_len=100, coverage=30, seed=7, circular=True)
    contigs = assemble_oracle(reads, k)
    assert len(contigs) == 1
    (c,) = contigs
    assert spell_check_circular(c, PHIX174, k)
