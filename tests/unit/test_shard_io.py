"""Byte-range file sharding (SURVEY.md D2): each host parses only its ~1/n
byte slice. Shards must partition the record set exactly — every record in
exactly one shard, whole-file order preserved across ascending shard ids —
through both the Python mmap parser and the native codec."""

import gzip

import numpy as np
import pytest

from tpu_euler.io.fastx import read_fastx, read_shard
from tpu_euler.io.native import (
    encode_file_native,
    encode_file_shard_native,
    native_available,
)
from tpu_euler.reference_impl.simulate import random_genome, simulate_reads


@pytest.fixture(scope="module")
def reads():
    genome = random_genome(1500, seed=601)
    return simulate_reads(genome, read_len=80, coverage=14, seed=602)


def _write_fq(path, reads, qual_char=None):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            q = qual_char * len(r) if qual_char else "I" * len(r)
            f.write(f"@r{i} pair/1\n{r}\n+\n{q}\n")


def _write_fa_multiline(path, reads, width=33, trailing_newline=True):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i} desc\n")
            for j in range(0, len(r), width):
                f.write(r[j : j + width] + "\n")
    if not trailing_newline:
        with open(path, "rb+") as f:
            f.seek(-1, 2)
            f.truncate()


@pytest.mark.parametrize("n_shards", [1, 2, 3, 7])
def test_fastq_shards_partition_records(tmp_path, reads, n_shards):
    path = tmp_path / "r.fq"
    _write_fq(path, reads)
    whole = list(read_fastx(path))
    parts = [list(read_shard(path, s, n_shards)) for s in range(n_shards)]
    assert sum(parts, []) == whole  # exact cover, order preserved


@pytest.mark.parametrize("n_shards", [2, 5])
def test_fastq_at_sign_quality_lines(tmp_path, reads, n_shards):
    """'@' at the start of every quality line cannot desync the resync."""
    path = tmp_path / "r.fq"
    _write_fq(path, reads, qual_char="@")
    whole = list(read_fastx(path))
    parts = [list(read_shard(path, s, n_shards)) for s in range(n_shards)]
    assert sum(parts, []) == whole


@pytest.mark.parametrize("trailing_newline", [True, False])
@pytest.mark.parametrize("n_shards", [2, 4])
def test_fasta_multiline_shards(tmp_path, reads, n_shards, trailing_newline):
    path = tmp_path / "r.fa"
    _write_fa_multiline(path, reads, trailing_newline=trailing_newline)
    whole = list(read_fastx(path))
    parts = [list(read_shard(path, s, n_shards)) for s in range(n_shards)]
    assert sum(parts, []) == whole


def test_more_shards_than_records(tmp_path):
    path = tmp_path / "tiny.fq"
    _write_fq(path, ["ACGTACGTAC", "TTGGCCAATT"])
    parts = [list(read_shard(path, s, 16)) for s in range(16)]
    assert sum(len(p) for p in parts) == 2
    assert sum(parts, []) == list(read_fastx(path))


def test_gz_falls_back_to_striding(tmp_path, reads):
    path = tmp_path / "r.fq.gz"
    with gzip.open(path, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    parts = [list(read_shard(path, s, 3)) for s in range(3)]
    assert sorted(sum(parts, [])) == sorted(read_fastx(path))


@pytest.mark.parametrize("n_shards", [1, 3])
def test_qual_shards_partition_records(tmp_path, reads, n_shards):
    """read_shard_with_qual shards by the SAME byte ranges as read_shard and
    keeps (seq, qual) pairs intact — --min-qual multi-host runs depend on
    every host resolving to identical ownership."""
    from tpu_euler.io.fastx import read_fastq_with_qual, read_shard_with_qual

    path = tmp_path / "r.fq"
    _write_fq(path, reads)
    whole = list(read_fastq_with_qual(path))
    parts = [
        list(read_shard_with_qual(path, s, n_shards)) for s in range(n_shards)
    ]
    assert sum(parts, []) == whole
    # ownership identical to the qual-less byte-range parser
    for s in range(n_shards):
        assert [(name, seq) for name, seq, _ in parts[s]] == list(
            read_shard(path, s, n_shards)
        )


def test_crlf_fastq_shard_strips_cr(tmp_path):
    """CRLF FASTQ: sharded parses must strip \\r exactly like read_fastq, or
    sharded and unsharded runs count different k-mers."""
    from tpu_euler.io.fastx import read_fastq_with_qual, read_shard_with_qual

    reads_ = ["ACGTACGTACGT", "TTGGCCAATTGG", "GGGGCCCCAAAA"]
    path = tmp_path / "crlf.fq"
    with open(path, "wb") as f:
        for i, r in enumerate(reads_):
            f.write(f"@r{i}\r\n{r}\r\n+\r\n{'I' * len(r)}\r\n".encode())
    whole = list(read_fastx(path))
    assert [s for _, s in whole] == reads_
    parts = [list(read_shard(path, s, 2)) for s in range(2)]
    assert sum(parts, []) == whole
    qparts = [list(read_shard_with_qual(path, s, 2)) for s in range(2)]
    assert [s for _, s, _ in sum(qparts, [])] == reads_
    assert all(q == "I" * len(s) for _, s, q in sum(qparts, []))
    assert sum(qparts, []) == list(read_fastq_with_qual(path))


@pytest.mark.skipif(not native_available(), reason="native codec not built")
@pytest.mark.parametrize("ext", ["fq", "fa"])
@pytest.mark.parametrize("n_shards", [1, 2, 4])
def test_native_shard_encode_concatenates_to_whole(tmp_path, reads, ext, n_shards):
    path = tmp_path / f"r.{ext}"
    if ext == "fq":
        _write_fq(path, reads)
    else:
        _write_fa_multiline(path, reads)
    whole = encode_file_native(str(path), read_len=80)
    parts = [
        encode_file_shard_native(str(path), s, n_shards, read_len=80)
        for s in range(n_shards)
    ]
    assert all(p is not None for p in parts)
    np.testing.assert_array_equal(np.concatenate(parts, axis=0), whole)


@pytest.mark.skipif(not native_available(), reason="native codec not built")
def test_native_shard_matches_python_shard(tmp_path, reads):
    from tpu_euler.io.encode import encode_reads

    path = tmp_path / "r.fq"
    _write_fq(path, reads)
    for s in range(3):
        native = encode_file_shard_native(str(path), s, 3, read_len=80)
        py = [seq for _, seq in read_shard(path, s, 3)]
        np.testing.assert_array_equal(native, encode_reads(py, 80))
