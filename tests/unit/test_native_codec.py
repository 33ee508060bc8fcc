"""Native C++ fastx codec vs the Python parser/encoder (SURVEY.md R1/R2)."""

import numpy as np
import pytest

from tpu_euler.io.encode import encode_reads, encode_reads_with_qual
from tpu_euler.io.native import encode_file_native, native_available
from tpu_euler.reference_impl.simulate import random_genome, simulate_reads

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native codec not built"
)


@pytest.fixture(scope="module")
def reads():
    genome = random_genome(1200, seed=501)
    return simulate_reads(genome, read_len=90, coverage=12, seed=502)


def test_fastq_matches_python(tmp_path, reads):
    path = tmp_path / "r.fq"
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i} extra stuff\n{r}\n+\n{'I' * len(r)}\n")
    got = encode_file_native(str(path), read_len=90)
    np.testing.assert_array_equal(got, encode_reads(reads, 90))


def test_fastq_quality_masking(tmp_path, reads):
    path = tmp_path / "q.fq"
    quals = []
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            q = ["I"] * len(r)
            q[i % len(r)] = "#"
            quals.append("".join(q))
            f.write(f"@r{i}\n{r}\n+\n{quals[-1]}\n")
    got = encode_file_native(str(path), read_len=90, min_qual=10)
    np.testing.assert_array_equal(
        got, encode_reads_with_qual(reads, quals, 90, 10)
    )


def test_fasta_multiline_and_short_filter(tmp_path):
    seqs = ["ACGTACGTAA" * 9, "TTTT", "GGGCCCAAATTT" * 5]
    path = tmp_path / "r.fa"
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n")
            for j in range(0, len(s), 25):
                f.write(s[j : j + 25] + "\n")
    got = encode_file_native(str(path), read_len=90, min_len_keep=21)
    keep = [s for s in seqs if len(s) >= 21]
    np.testing.assert_array_equal(got, encode_reads(keep, 90))


def test_padding_and_ns(tmp_path):
    seqs = ["ACGTN" + "A" * 30, "C" * 90]
    path = tmp_path / "n.fq"
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")
    got = encode_file_native(str(path), read_len=90)
    np.testing.assert_array_equal(got, encode_reads(seqs, 90))


def test_pack_codes_native_matches_numpy():
    from tpu_euler.io.encode import pack_codes_np
    from tpu_euler.io.native import native_available, pack_codes_native

    if not native_available():
        import pytest

        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(7)
    for R, L in [(1, 1), (3, 7), (17, 100), (5000, 101)]:
        codes = rng.integers(0, 5, (R, L)).astype(np.int8)
        codes[0, -1] = 4  # force an N
        p_n, m_n = pack_codes_native(codes, n_threads=4)
        p_py, m_py = pack_codes_np(codes)
        np.testing.assert_array_equal(p_n, p_py)
        np.testing.assert_array_equal(m_n, m_py)
