"""Extraction + sort-based counting vs collections.Counter (SURVEY.md section 4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_euler.io.encode import encode_reads
from tpu_euler.kmer import keys
from tpu_euler.kmer.count import (
    apply_cutoff,
    count_batch,
    empty_spectrum,
    merge_spectra,
    spectrum_overflowed,
)
from tpu_euler.kmer.extract import extract_canonical_kmers, extract_kmers
from tpu_euler.reference_impl.oracle import count_canonical_kmers
from tpu_euler.reference_impl.simulate import random_genome, simulate_reads


def spectrum_to_counter(spec, k):
    n = int(spec.n)
    seqs = keys.decode_np(np.asarray(spec.limbs)[:n], k)
    counts = np.asarray(spec.counts)[:n]
    return dict(zip(seqs, counts.tolist()))


@pytest.mark.parametrize("k", [21, 31])
def test_extract_windows_match_strings(k):
    reads = simulate_reads(random_genome(500, seed=1), read_len=60, coverage=3, seed=2)
    codes = jnp.asarray(encode_reads(reads, 60))
    limbs, valid = extract_kmers(codes, k)
    W = 60 - k + 1
    v = np.asarray(valid).reshape(len(reads), W)
    l = np.asarray(limbs).reshape(len(reads), W, -1)
    assert v.all()  # no Ns in simulated reads
    for r in range(0, len(reads), 7):
        dec = keys.decode_np(l[r], k)
        expected = [reads[r][i : i + k] for i in range(W)]
        assert dec == expected


def test_extract_masks_padding_and_N():
    k = 21
    reads = ["A" * 30 + "N" + "C" * 30, "G" * 40]  # second read shorter than 61
    codes = jnp.asarray(encode_reads(reads, 61))
    limbs, valid = extract_kmers(codes, k)
    W = 61 - k + 1
    v = np.asarray(valid).reshape(2, W)
    # read 0: windows overlapping position 30 invalid
    for w in range(W):
        overlaps_n = w <= 30 <= w + k - 1
        assert v[0, w] == (not overlaps_n)
    # read 1: windows fully inside the 40 real bases valid
    for w in range(W):
        assert v[1, w] == (w + k <= 40)


@pytest.mark.parametrize("k", [21, 31, 41])
def test_count_matches_oracle(k):
    genome = random_genome(800, seed=3)
    reads = simulate_reads(genome, read_len=100, coverage=8, seed=4)
    codes = jnp.asarray(encode_reads(reads, 100))
    limbs, valid = extract_canonical_kmers(codes, k)
    spec = count_batch(limbs, valid)
    got = spectrum_to_counter(spec, k)
    expected = dict(count_canonical_kmers(reads, k))
    assert got == expected


def test_merge_spectra_streaming_equals_one_shot():
    k = 21
    genome = random_genome(600, seed=5)
    reads = simulate_reads(genome, read_len=80, coverage=12, seed=6)
    # one-shot
    codes = jnp.asarray(encode_reads(reads, 80))
    limbs, valid = extract_canonical_kmers(codes, k)
    one = spectrum_to_counter(count_batch(limbs, valid), k)
    # streamed in batches of 16 reads
    L = keys.nlimbs(k)
    acc = empty_spectrum(4096, L)
    for i in range(0, len(reads), 16):
        batch = reads[i : i + 16]
        codes = jnp.asarray(encode_reads(batch, 80))
        bl, bv = extract_canonical_kmers(codes, k)
        acc = merge_spectra(acc, count_batch(bl, bv))
    assert not spectrum_overflowed(acc)
    assert spectrum_to_counter(acc, k) == one
    # keys are sorted
    n = int(acc.n)
    dec = keys.decode_np(np.asarray(acc.limbs)[:n], k)
    assert dec == sorted(dec)


def test_apply_cutoff():
    k = 21
    genome = random_genome(400, seed=7)
    reads = simulate_reads(genome, read_len=60, coverage=10, seed=8)
    codes = jnp.asarray(encode_reads(reads, 60))
    limbs, valid = extract_canonical_kmers(codes, k)
    spec = count_batch(limbs, valid)
    cut = apply_cutoff(spec, 3)
    expected = {s: c for s, c in count_canonical_kmers(reads, k).items() if c >= 3}
    assert spectrum_to_counter(cut, k) == expected


def test_overflow_detection():
    k = 21
    genome = random_genome(3000, seed=9)
    reads = [genome[i : i + 60] for i in range(0, 2900, 5)]
    codes = jnp.asarray(encode_reads(reads, 60))
    limbs, valid = extract_canonical_kmers(codes, k)
    L = keys.nlimbs(k)
    acc = empty_spectrum(256, L)  # deliberately too small
    acc = merge_spectra(acc, count_batch(limbs, valid))
    assert spectrum_overflowed(acc)


def test_right_size_spectrum():
    from tpu_euler.pipeline.assemble import right_size_spectrum

    spec = empty_spectrum(1 << 12, 2)
    spec = spec._replace(n=jnp.asarray(100, jnp.int32))
    small = right_size_spectrum(spec, granule=256)
    assert small.limbs.shape[0] == 256
    assert int(small.n) == 100
    # already tight: unchanged
    spec2 = spec._replace(n=jnp.asarray(4000, jnp.int32))
    assert right_size_spectrum(spec2, granule=256).limbs.shape[0] == 1 << 12


def test_merge_spectra_lean_matches_merge_spectra():
    """The memory-lean sentinel merge (config-5 OOM fix) is bit-identical to
    the general merge, including at capacity overflow and with an empty acc."""
    import numpy as np

    from tpu_euler.kmer.count import Spectrum, merge_spectra, merge_spectra_lean

    def mk(C, n, seed):
        r = np.random.default_rng(seed)
        ks = np.sort(r.choice(1 << 20, size=n, replace=False))
        limbs = np.zeros((C, 2), np.uint32)
        limbs[:n, 1] = ks
        limbs[:n, 0] = ks >> 18
        order = np.lexsort((limbs[:n, 1], limbs[:n, 0]))
        limbs[:n] = limbs[:n][order]
        counts = np.zeros(C, np.int32)
        counts[:n] = r.integers(1, 50, n)
        return Spectrum(
            jnp.asarray(limbs), jnp.asarray(counts), jnp.asarray(n, jnp.int32)
        )

    for (ca, na, cb, nb) in [(1000, 700, 900, 500), (64, 0, 64, 30), (128, 100, 64, 64)]:
        m1 = merge_spectra(mk(ca, na, 1), mk(cb, nb, 2))
        m2 = merge_spectra_lean(mk(ca, na, 1), mk(cb, nb, 2), k=31)
        n1, n2 = int(m1.n), int(m2.n)
        assert n1 == n2
        assert np.array_equal(np.asarray(m1.limbs[:n1]), np.asarray(m2.limbs[:n2]))
        assert np.array_equal(np.asarray(m1.counts[:n1]), np.asarray(m2.counts[:n2]))
