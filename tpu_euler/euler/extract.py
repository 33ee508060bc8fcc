"""Chain -> contig sequence emission (host side).

Reference counterpart: SURVEY.md R10/R11 (tour walk + FASTA write, D2H copy then
host walk). Device arrays (chain id, position, last base, start-edge prefix) are
downloaded once; string assembly is vectorized numpy (a single scatter into one
byte buffer), not a Python walk. Canonicalization (min of sequence and reverse
complement, SPEC correctness bar) and dedup happen on host bytes.
"""

from __future__ import annotations

import numpy as np

from tpu_euler.euler.unitigs import UnitigChains
from tpu_euler.graph.build import DeBruijnGraph
from tpu_euler.kmer import keys

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
_RC_TABLE = np.zeros(256, dtype=np.uint8)
for _a, _b in zip(b"ACGT", b"TGCA"):
    _RC_TABLE[_a] = _b


def rc_bytes(seq: np.ndarray) -> np.ndarray:
    return _RC_TABLE[seq][::-1]


def decode_bases_np(limbs: np.ndarray, n_bases: int, k: int) -> np.ndarray:
    """Decode the FIRST n_bases of right-aligned 2k-bit keys. [N, L] -> [N, n_bases]."""
    N, L = limbs.shape
    out = np.empty((N, n_bases), dtype=np.uint8)
    limbs64 = limbs.astype(np.uint64)
    for i in range(n_bases):
        bit = 2 * (k - 1 - i)  # bit offset of base i from LSB
        lj = L - 1 - bit // 32
        sh = np.uint64(bit % 32)
        code = (limbs64[:, lj] >> sh) & np.uint64(3)
        out[:, i] = _BASES[code.astype(np.int64)]
    return out


def chains_to_contigs(
    g: DeBruijnGraph, chains: UnitigChains, k: int
) -> set[bytes]:
    """Assemble canonical contig byte-strings from per-edge chain assignments."""
    in_chain = np.asarray(chains.in_chain)
    idx = np.flatnonzero(in_chain)
    if idx.size == 0:
        return set()
    chain = np.asarray(chains.chain)[idx]
    pos = np.asarray(chains.pos)[idx]
    length = np.asarray(chains.length)[idx]
    limbs = np.asarray(g.edge_limbs)[idx]
    last = _BASES[(limbs[:, -1] & 3).astype(np.int64)]

    # Dense chain ids 0..n_chains-1 in deterministic (end-edge id) order.
    uchain, dense = np.unique(chain, return_inverse=True)
    n_chains = uchain.size
    # per-chain length (edges) and output offsets: contig c occupies
    # [(k-1)+len_c] bytes at offset off_c in one flat buffer.
    chain_len = np.zeros(n_chains, dtype=np.int64)
    chain_len[dense] = length
    out_len = chain_len + (k - 1)
    off = np.zeros(n_chains + 1, dtype=np.int64)
    np.cumsum(out_len, out=off[1:])
    buf = np.empty(off[-1], dtype=np.uint8)

    # last base of every edge at its position (k-1 + pos)
    buf[off[dense] + (k - 1) + pos] = last
    # (k-1)-prefix of each chain's start edge at positions 0..k-2
    starts = pos == 0
    sdense = dense[starts]
    prefixes = decode_bases_np(limbs[starts], k - 1, k)
    buf[off[sdense][:, None] + np.arange(k - 1)[None, :]] = prefixes

    contigs: set[bytes] = set()
    for c in range(n_chains):
        seq = buf[off[c] : off[c + 1]]
        fwd = seq.tobytes()
        rev = rc_bytes(seq).tobytes()
        contigs.add(fwd if fwd <= rev else rev)
    return contigs
