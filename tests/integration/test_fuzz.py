"""Randomized property sweep (SURVEY.md section 4 property tests): for seeded
random parameter combinations, the TPU pipeline must equal the CPU oracle
exactly, and error-free assemblies must re-spell the genome."""

import numpy as np
import pytest

from tpu_euler.config import AssemblyConfig
from tpu_euler.pipeline.assemble import assemble_reads
from tpu_euler.reference_impl.oracle import assemble_oracle
from tpu_euler.reference_impl.simulate import random_genome, simulate_reads
from tpu_euler.verify.compare import canonical_contig_set, diff_contig_sets


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_pipeline_equals_oracle(trial):
    rng = np.random.default_rng(7000 + trial)
    glen = int(rng.integers(800, 4000))
    k = int(rng.choice([17, 21, 25, 31, 41]))
    cov = float(rng.integers(12, 35))
    err = float(rng.choice([0.0, 0.0, 0.003, 0.008]))
    min_count = 1 if err == 0.0 else int(rng.integers(3, 5))
    tips = int(rng.choice([0, 0, 2])) if err else 0
    bubbles = int(rng.choice([0, 2, 3])) if err else 0
    circular = bool(rng.integers(0, 2))
    read_len = int(rng.choice([70, 100, 140]))
    if read_len <= k:
        read_len = k + 30

    genome = random_genome(glen, seed=8000 + trial)
    reads = simulate_reads(
        genome, read_len=read_len, coverage=cov, seed=9000 + trial,
        error_rate=err, circular=circular,
    )
    cfg = AssemblyConfig(
        k=k, min_count=min_count, tip_rounds=tips, bubble_rounds=bubbles,
        read_batch=512,
        read_len=read_len, spectrum_capacity=1 << 16,
    )
    got = assemble_reads(reads, cfg)
    expected = assemble_oracle(
        reads, k, min_count, tip_rounds=tips, bubble_rounds=bubbles
    )
    extra, missing = diff_contig_sets(got.contig_strings, expected)
    assert not extra and not missing, (
        f"trial {trial} (glen={glen} k={k} cov={cov} err={err} mc={min_count} "
        f"tips={tips} bubbles={bubbles} circ={circular} rl={read_len}): "
        f"{len(extra)} extra / {len(missing)} missing contigs"
    )
    if err == 0.0 and cov >= 15:
        # error-free: contigs must be genome substrings (up to revcomp/rotation)
        from tpu_euler.reference_impl.simulate import rc

        ref = genome + genome if circular else genome
        ref_rc = rc(genome) + rc(genome) if circular else rc(genome)
        for c in got.contig_strings:
            body = c[: len(genome)] if circular else c
            assert body in ref or body in ref_rc
