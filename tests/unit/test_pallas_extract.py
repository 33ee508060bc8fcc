"""Pallas extraction kernel (interpret mode on CPU) vs the XLA path."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_euler.io.encode import encode_reads
from tpu_euler.kmer.extract import extract_canonical_kmers
from tpu_euler.kmer.pallas_extract import extract_canonical_pallas
from tpu_euler.reference_impl.simulate import random_genome, simulate_reads


@pytest.mark.parametrize("k", [21, 31, 41])
def test_pallas_matches_xla(k):
    reads = simulate_reads(random_genome(800, seed=k), read_len=100, coverage=4, seed=k)
    reads[3] = reads[3][:40] + "N" + reads[3][41:]  # an N in the middle
    reads[5] = reads[5][:55]  # short read (padded)
    codes = jnp.asarray(encode_reads(reads, 100))
    xl, xv = extract_canonical_kmers(codes, k)
    pll, pv = extract_canonical_pallas(codes, k, block_reads=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(xv))
    np.testing.assert_array_equal(
        np.asarray(pll)[np.asarray(xv)], np.asarray(xl)[np.asarray(xv)]
    )
