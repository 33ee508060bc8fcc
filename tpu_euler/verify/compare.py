"""Contig-set verification (the SPEC correctness bar).

BASELINE.json: "Output contigs must match the reference assembler's contigs
(exact sequence-set equality after canonicalization)". Canonical form of a
contig is min(seq, revcomp(seq)); comparison is set equality on canonical forms.
"""

from __future__ import annotations

_COMP = str.maketrans("ACGT", "TGCA")


def _canon(s: str) -> str:
    r = s.translate(_COMP)[::-1]
    return s if s <= r else r


def canonical_contig_set(contigs) -> set[str]:
    """Canonicalize an iterable of contig str/bytes into a comparable set."""
    out = set()
    for c in contigs:
        if isinstance(c, bytes):
            c = c.decode()
        out.add(_canon(c.upper()))
    return out


def contig_sets_equal(a, b) -> bool:
    return canonical_contig_set(a) == canonical_contig_set(b)


def diff_contig_sets(a, b) -> tuple[set[str], set[str]]:
    """(only-in-a, only-in-b) after canonicalization."""
    ca, cb = canonical_contig_set(a), canonical_contig_set(b)
    return ca - cb, cb - ca
