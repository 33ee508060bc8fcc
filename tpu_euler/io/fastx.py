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


def read_shard(
    path: str | Path, shard: int, num_shards: int
) -> Iterator[tuple[str, str]]:
    """Every num_shards-th record starting at ``shard`` (data-parallel hosts, D2)."""
    for i, rec in enumerate(read_fastx(path)):
        if i % num_shards == shard:
            yield rec


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
