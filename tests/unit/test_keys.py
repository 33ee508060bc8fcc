"""Unit tests for the multi-limb k-mer key layer (SURVEY.md section 4: pack/unpack
roundtrip, revcomp, canonicalization, ordering)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_euler.kmer import keys

KS = [5, 15, 16, 17, 21, 31, 32, 33, 41]  # includes limb-boundary cases


def rc_str(s: str) -> str:
    comp = str.maketrans("ACGT", "TGCA")
    return s.translate(comp)[::-1]


def random_seqs(k, n, seed):
    rng = np.random.default_rng(seed)
    return ["".join("ACGT"[c] for c in rng.integers(0, 4, k)) for _ in range(n)]


@pytest.mark.parametrize("k", KS)
def test_pack_decode_roundtrip(k):
    seqs = random_seqs(k, 32, seed=k)
    limbs = keys.encode_np(seqs, k)
    assert limbs.shape == (32, keys.nlimbs(k))
    assert keys.decode_np(limbs, k) == seqs
    # pack() from codes agrees with encode_np
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    codes = np.array([[code[c] for c in s] for s in seqs], dtype=np.int32)
    packed = np.asarray(keys.pack(jnp.asarray(codes), k))
    np.testing.assert_array_equal(packed, limbs)


@pytest.mark.parametrize("k", KS)
def test_revcomp(k):
    seqs = random_seqs(k, 32, seed=100 + k)
    limbs = jnp.asarray(keys.encode_np(seqs, k))
    rc = np.asarray(keys.revcomp(limbs, k))
    assert keys.decode_np(rc, k) == [rc_str(s) for s in seqs]
    # involution
    rc2 = np.asarray(keys.revcomp(jnp.asarray(rc), k))
    np.testing.assert_array_equal(rc2, np.asarray(limbs))


@pytest.mark.parametrize("k", KS)
def test_ordering_matches_string_order(k):
    seqs = random_seqs(k, 64, seed=200 + k)
    limbs = jnp.asarray(keys.encode_np(seqs, k))
    a, b = limbs[:32], limbs[32:]
    lt = np.asarray(keys.key_less(a, b, k))
    expected = np.array([x < y for x, y in zip(seqs[:32], seqs[32:])])
    np.testing.assert_array_equal(lt, expected)


@pytest.mark.parametrize("k", [21, 31, 41])
def test_canonical(k):
    seqs = random_seqs(k, 32, seed=300 + k)
    limbs = jnp.asarray(keys.encode_np(seqs, k))
    canon, was_rc = keys.canonical(limbs, k)
    got = keys.decode_np(np.asarray(canon), k)
    expected = [min(s, rc_str(s)) for s in seqs]
    assert got == expected
    # odd k: never palindromic
    assert all(s != rc_str(s) for s in got)


@pytest.mark.parametrize("k", [5, 17, 21, 31, 33, 41])
def test_prefix_suffix(k):
    seqs = random_seqs(k, 16, seed=400 + k)
    limbs = jnp.asarray(keys.encode_np(seqs, k))
    pre = np.asarray(keys.prefix(limbs, k))
    suf = np.asarray(keys.suffix(limbs, k))
    assert keys.decode_np(pre, k - 1) == [s[:-1] for s in seqs]
    assert keys.decode_np(suf, k - 1) == [s[1:] for s in seqs]


@pytest.mark.parametrize("k", [21, 31, 41])
def test_append_base_and_last_base(k):
    seqs = random_seqs(k, 16, seed=500 + k)
    limbs = jnp.asarray(keys.encode_np(seqs, k))
    nxt = jnp.asarray(np.arange(16) % 4, dtype=jnp.int32)
    ext = np.asarray(keys.append_base(limbs, nxt, k))
    expected = [s + "ACGT"[i % 4] for i, s in enumerate(seqs)]
    assert keys.decode_np(ext, k + 1) == expected
    lb = np.asarray(keys.last_base(jnp.asarray(ext)))
    np.testing.assert_array_equal(lb, np.arange(16) % 4)


def test_sort_by_key_orders_and_pushes_invalid_last():
    k = 31
    seqs = random_seqs(k, 64, seed=7)
    limbs = jnp.asarray(keys.encode_np(seqs, k))
    valid = jnp.asarray(np.arange(64) % 4 != 0)
    payload = jnp.arange(64, dtype=jnp.int32)
    sl, sv, sp = keys.sort_by_key(limbs, valid, payload)
    sv = np.asarray(sv)
    n_valid = int(valid.sum())
    assert sv[:n_valid].all() and not sv[n_valid:].any()
    dec = keys.decode_np(np.asarray(sl)[:n_valid], k)
    assert dec == sorted(dec)
    # payload permuted consistently
    sp = np.asarray(sp)
    orig = keys.decode_np(np.asarray(limbs), k)
    for i in range(n_valid):
        assert orig[sp[i]] == dec[i]


def test_bucket_hash_spread():
    k = 31
    seqs = random_seqs(k, 4096, seed=11)
    limbs = jnp.asarray(keys.encode_np(seqs, k))
    h = np.asarray(keys.bucket_hash(limbs))
    buckets = h >> np.uint32(26)  # 64 buckets
    counts = np.bincount(buckets, minlength=64)
    assert counts.min() > 0
    assert counts.max() < 4 * 4096 // 64
