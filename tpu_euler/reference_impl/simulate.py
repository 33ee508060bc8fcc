"""Deterministic genome / read simulators for tests and benchmarks.

SURVEY.md section 4 (golden files): seeded generators only — no network access
exists in the build environment, and the real phiX174 FASTA cannot be fetched, so
config 1's "phiX174" is represented by a deterministic synthetic circular genome
of the same length (5386 bp). All generators are seeded and stable across runs.
"""

from __future__ import annotations

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
_COMP = str.maketrans("ACGT", "TGCA")

PHIX_LENGTH = 5386


def rc(s: str) -> str:
    return s.translate(_COMP)[::-1]


def random_genome(length: int, seed: int = 0, circular: bool = True) -> str:
    """Seeded uniform-random genome string (A/C/G/T)."""
    rng = np.random.default_rng(seed)
    return bytes(_BASES[rng.integers(0, 4, length)]).decode()


# Deterministic stand-in for phiX174 (5386 bp circular ssDNA phage genome).
PHIX174 = random_genome(PHIX_LENGTH, seed=174, circular=True)


def simulate_reads(
    genome: str,
    read_len: int = 100,
    coverage: float = 30.0,
    seed: int = 0,
    error_rate: float = 0.0,
    circular: bool = True,
    both_strands: bool = True,
    paired: bool = False,
    insert_size: int = 300,
) -> list[str]:
    """Simulate uniform shotgun reads from a genome.

    Substitution errors only (Illumina-like), at ``error_rate`` per base.
    If ``paired``, emits read pairs (fwd mate, then revcomp mate) per fragment.
    """
    rng = np.random.default_rng(seed)
    g = genome + genome[: max(read_len, insert_size)] if circular else genome
    max_start = (len(genome)) if circular else (len(genome) - read_len + 1)
    if max_start <= 0:
        raise ValueError("genome shorter than read length")
    n_frag = int(np.ceil(coverage * len(genome) / (read_len * (2 if paired else 1))))
    reads: list[str] = []
    starts = rng.integers(0, max_start, n_frag)
    strands = rng.integers(0, 2, n_frag) if both_strands else np.zeros(n_frag, int)
    for s, st in zip(starts, strands):
        if paired:
            frag = g[s : s + insert_size]
            if len(frag) < insert_size:
                continue
            r1, r2 = frag[:read_len], rc(frag[-read_len:])
            if st:
                r1, r2 = rc(r2), rc(r1)
            reads.extend([r1, r2])
        else:
            r = g[s : s + read_len]
            if len(r) < read_len:
                continue
            reads.append(rc(r) if st else r)
    if error_rate > 0.0:
        reads = _add_errors(reads, error_rate, rng)
    return reads


def simulate_read_codes(
    genome: str,
    read_len: int = 100,
    coverage: float = 30.0,
    seed: int = 0,
    error_rate: float = 0.0,
    circular: bool = True,
    both_strands: bool = True,
) -> np.ndarray:
    """Vectorized simulator: returns an [R, read_len] int8 code matrix directly.

    Same model as simulate_reads (uniform substitution errors, random strand)
    but fully numpy — used for benchmark-scale inputs (millions of reads) where
    per-read Python string slicing would dominate the measured pipeline.
    """
    rng = np.random.default_rng(seed)
    lut = np.full(256, 4, dtype=np.int8)
    for i, b in enumerate(b"ACGT"):
        lut[b] = i
    g = lut[np.frombuffer(genome.encode(), dtype=np.uint8)]
    G = len(g)
    n_reads = int(np.ceil(coverage * G / read_len))
    max_start = G if circular else G - read_len + 1
    if max_start <= 0:
        raise ValueError("genome shorter than read length")
    starts = rng.integers(0, max_start, n_reads)
    offs = (starts[:, None] + np.arange(read_len)[None, :]) % G if circular else (
        starts[:, None] + np.arange(read_len)[None, :]
    )
    codes = g[offs]
    if both_strands:
        flip = rng.integers(0, 2, n_reads).astype(bool)
        codes[flip] = (3 - codes[flip])[:, ::-1]
    if error_rate > 0.0:
        mask = rng.random(codes.shape) < error_rate
        shift = rng.integers(1, 4, codes.shape).astype(np.int8)
        codes = np.where(mask, (codes + shift) % 4, codes)
    return codes.astype(np.int8)


def _add_errors(reads: list[str], rate: float, rng: np.random.Generator) -> list[str]:
    out = []
    for r in reads:
        arr = np.frombuffer(r.encode(), dtype=np.uint8).copy()
        mask = rng.random(len(arr)) < rate
        if mask.any():
            # substitute with a *different* base: code -> (code + 1 + u) % 4
            codes = np.zeros(len(arr), np.int64)
            for i, b in enumerate(b"ACGT"):
                codes[arr == b] = i
            shift = rng.integers(1, 4, mask.sum())
            codes[mask] = (codes[mask] + shift) % 4
            arr[mask] = _BASES[codes[mask]]
        out.append(bytes(arr).decode())
    return out
