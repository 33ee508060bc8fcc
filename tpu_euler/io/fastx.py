"""FASTA/FASTQ reading and FASTA writing.

Reference counterpart: SURVEY.md R1/R11 (FASTA reader, contig writer). Parsing
is line-streamed (no whole-file string build-up) and yields batches of raw
sequences; sharded reading for data-parallel hosts takes every p-th record of q
(SPEC D2: per-host FASTQ shards without a shared filesystem coordinator).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from pathlib import Path


def _open(path: str | Path):
    path = str(path)
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"))
    return open(path)


def read_fasta(path: str | Path) -> Iterator[tuple[str, str]]:
    """Yield (name, sequence) records from a FASTA file (.gz ok)."""
    name, chunks = None, []
    with _open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(chunks)
                name, chunks = line[1:].split()[0] if len(line) > 1 else "", []
            else:
                chunks.append(line.upper())
        if name is not None:
            yield name, "".join(chunks)


def read_fastq(path: str | Path) -> Iterator[tuple[str, str]]:
    """Yield (name, sequence) records from a FASTQ file (.gz ok)."""
    with _open(path) as f:
        while True:
            hdr = f.readline()
            if not hdr:
                return
            seq = f.readline().strip().upper()
            f.readline()  # +
            f.readline()  # quals
            yield hdr.strip()[1:].split()[0] if len(hdr) > 1 else "", seq


def read_fastq_with_qual(path: str | Path) -> Iterator[tuple[str, str, str]]:
    """Yield (name, sequence, quality-string) records from a FASTQ file."""
    with _open(path) as f:
        while True:
            hdr = f.readline()
            if not hdr:
                return
            seq = f.readline().strip().upper()
            f.readline()  # +
            qual = f.readline().strip()
            yield hdr.strip()[1:].split()[0] if len(hdr) > 1 else "", seq, qual


def read_fastx(path: str | Path) -> Iterator[tuple[str, str]]:
    """Dispatch on extension: .fa/.fasta/.fna vs .fq/.fastq (.gz ok)."""
    p = str(path)
    stem = p[:-3] if p.endswith(".gz") else p
    if stem.endswith((".fq", ".fastq")):
        return read_fastq(path)
    return read_fasta(path)


def shard_byte_range(size: int, shard: int, num_shards: int) -> tuple[int, int]:
    """[begin, end) byte range of shard i of n (contiguous, covers [0, size))."""
    return size * shard // num_shards, size * (shard + 1) // num_shards


def _fq_resync(mm, size: int, off: int) -> int:
    """First FASTQ record start at/after byte ``off`` (matches the native
    codec's fq_resync: '@' line with a '+' two lines below and seq/qual length
    agreement, so '@' inside quality lines cannot fool it)."""
    if off <= 0:
        return 0
    if off >= size:
        return size
    pos = off if mm[off - 1 : off] == b"\n" else mm.find(b"\n", off) + 1
    while 0 < pos < size:
        if mm[pos : pos + 1] == b"@":
            l1 = mm.find(b"\n", pos) + 1
            l2 = mm.find(b"\n", l1) + 1 if l1 else 0
            if l2 and mm[l2 : l2 + 1] == b"+":
                l3 = mm.find(b"\n", l2) + 1
                l4 = mm.find(b"\n", l3) if l3 else -1
                l4 = l4 if l4 >= 0 else size
                if l3 and (l2 - l1) == (l4 - l3) + 1:
                    return pos
        nxt = mm.find(b"\n", pos)
        pos = nxt + 1 if nxt >= 0 else size
    return size


def _fa_resync(mm, size: int, off: int) -> int:
    """First FASTA record start ('>' at line start) at/after byte ``off``."""
    if off <= 0:
        return 0
    if off >= size:
        return size
    pos = off if mm[off - 1 : off] == b"\n" else mm.find(b"\n", off) + 1
    while 0 < pos < size:
        if mm[pos : pos + 1] == b">":
            return pos
        nxt = mm.find(b"\n", pos)
        pos = nxt + 1 if nxt >= 0 else size
    return size


def read_shard(
    path: str | Path, shard: int, num_shards: int
) -> Iterator[tuple[str, str]]:
    """Shard i of n of a file's records, for data-parallel hosts (SPEC D2).

    Plain files are sharded by BYTE RANGE: each host mmaps only its ~1/n slice
    of the file and parses the records that start inside it (resynced to
    record boundaries), so parse cost is O(file/n) per host. Gzip inputs have
    no random access and fall back to record striding (O(file) per host).
    """
    p = str(path)
    if p.endswith(".gz"):
        for i, rec in enumerate(read_fastx(p)):
            if i % num_shards == shard:
                yield rec
        return
    import mmap
    import os

    size = os.path.getsize(p)
    if size == 0:
        return
    begin, end = shard_byte_range(size, shard, num_shards)
    stem = p
    is_fq = stem.endswith((".fq", ".fastq"))
    with open(p, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        try:
            resync = _fq_resync if is_fq else _fa_resync
            b, e = resync(mm, size, begin), resync(mm, size, end)
            if is_fq:
                yield from _parse_fq_span(mm, size, b, e)
            else:
                yield from _parse_fa_span(mm, size, b, e)
        finally:
            mm.close()


def _readline_span(mm, size: int, pos: int) -> tuple[bytes, int]:
    nxt = mm.find(b"\n", pos)
    if nxt < 0:
        return mm[pos:size], size
    return mm[pos:nxt], nxt + 1


def _parse_fq_span(mm, size: int, begin: int, stop: int):
    """FASTQ records STARTING in [begin, stop) (mirrors native fq_encode_range)."""
    pos = begin
    while pos < stop:
        if mm[pos : pos + 1] != b"@":
            return
        hdr, pos = _readline_span(mm, size, pos)
        seq, pos = _readline_span(mm, size, pos)
        _, pos = _readline_span(mm, size, pos)
        _, pos = _readline_span(mm, size, pos)
        name = hdr[1:].split()[0].decode() if len(hdr) > 1 else ""
        # strip() matches read_fastq: CRLF files must not keep a trailing \r
        # (it would encode as N and desync sharded vs unsharded k-mer counts)
        yield name, seq.decode().strip().upper()


def _parse_fq_span_qual(mm, size: int, begin: int, stop: int):
    """FASTQ records STARTING in [begin, stop), with quality strings.

    The qual-aware twin of _parse_fq_span, so --min-qual runs can use
    byte-range sharding too: every host must resolve to the SAME sharding
    strategy or the per-host shards no longer partition the file.
    """
    pos = begin
    while pos < stop:
        if mm[pos : pos + 1] != b"@":
            return
        hdr, pos = _readline_span(mm, size, pos)
        seq, pos = _readline_span(mm, size, pos)
        _, pos = _readline_span(mm, size, pos)
        qual, pos = _readline_span(mm, size, pos)
        name = hdr[1:].split()[0].decode() if len(hdr) > 1 else ""
        yield name, seq.decode().strip().upper(), qual.decode().strip()


def read_shard_with_qual(
    path: str | Path, shard: int, num_shards: int
) -> Iterator[tuple[str, str, str]]:
    """FASTQ shard i of n with quality strings (SPEC D2 + --min-qual).

    Plain files are sharded by byte range (O(file/n) parse per host, resynced
    record boundaries, same ownership rule as read_shard / the native codec);
    gzip falls back to record striding — deterministically, by file type only,
    never by which codec happens to be available on a host.
    """
    p = str(path)
    if p.endswith(".gz"):
        for i, rec in enumerate(read_fastq_with_qual(p)):
            if i % num_shards == shard:
                yield rec
        return
    import mmap
    import os

    size = os.path.getsize(p)
    if size == 0:
        return
    begin, end = shard_byte_range(size, shard, num_shards)
    with open(p, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        try:
            b, e = _fq_resync(mm, size, begin), _fq_resync(mm, size, end)
            yield from _parse_fq_span_qual(mm, size, b, e)
        finally:
            mm.close()


def _parse_fa_span(mm, size: int, begin: int, stop: int):
    """FASTA records STARTING in [begin, stop); the last owned record is
    followed past ``stop`` (multi-line bodies belong to their header's shard)."""
    pos = begin
    name, chunks = None, []
    while pos < size:
        if mm[pos : pos + 1] == b">":
            if name is not None:
                yield name, "".join(chunks)
            if pos >= stop:
                return
            hdr, pos = _readline_span(mm, size, pos)
            name = hdr[1:].split()[0].decode() if len(hdr) > 1 else ""
            chunks = []
        else:
            line, pos = _readline_span(mm, size, pos)
            if name is not None:
                chunks.append(line.decode().strip().upper())
    if name is not None:
        yield name, "".join(chunks)


def batched_sequences(
    records: Iterator[tuple[str, str]], batch_size: int
) -> Iterator[list[str]]:
    """Group record sequences into fixed-size batches (last batch short)."""
    batch: list[str] = []
    for _, seq in records:
        batch.append(seq)
        if len(batch) == batch_size:
            yield batch
            batch = []
    if batch:
        yield batch


def write_fasta(path: str | Path, contigs: list[str], prefix: str = "contig") -> None:
    """Write contigs as FASTA, 80 columns, deterministic naming."""
    with open(path, "w") as f:
        for i, seq in enumerate(contigs):
            f.write(f">{prefix}_{i} len={len(seq)}\n")
            for j in range(0, len(seq), 80):
                f.write(seq[j : j + 80] + "\n")
