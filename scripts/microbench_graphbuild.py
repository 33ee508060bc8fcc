"""Microbench of graph-build internals at bench scale (C=5.24M live keys).

Times, on the chip, the candidate implementations of node-id assignment:
  - old: sort ALL 4C raw endpoints (both orientations' prefixes+suffixes)
  - new: sort 2C canonical endpoints of the fwd half (graph/build.py)
plus the shared pieces (canonicalization prep, out_first scatter-min), to
attribute build_graph's wall and verify the sort-halving claim with a tight
A/B rather than full-pipeline variance.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_euler.utils.runtime import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from tpu_euler.graph.build import assign_node_ids, build_graph, doubled_edges
from tpu_euler.kmer import keys
from tpu_euler.kmer.count import Spectrum

C = 5_242_880  # right-sized spectrum capacity at bench scale
K = 31
L = keys.nlimbs(K)
REPS = 3


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(name, fn, *args):
    sync(fn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)*1e3:8.1f} ms", flush=True)
    return min(ts)


@jax.jit
def _old_assign(edge_limbs, edge_valid):
    """Round-2 raw-endpoint sort (for A/B only)."""
    from tpu_euler.kmer.count import segment_sums_sorted

    E = edge_limbs.shape[0]
    pre = keys.prefix(edge_limbs, K)
    suf = keys.suffix(edge_limbs, K)
    endpoints = jnp.concatenate([pre, suf], axis=0)
    valid = jnp.concatenate([edge_valid, edge_valid])
    pos = jnp.arange(2 * E, dtype=jnp.int32)
    sl, sv, spos = keys.sort_by_key(endpoints, valid, pos)
    prev = jnp.roll(sl, 1, axis=0)
    is_new = (~keys.key_eq(sl, prev)).at[0].set(True) & sv
    node_id = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    n_nodes = jnp.sum(is_new.astype(jnp.int32))
    ids = jnp.zeros((2 * E,), jnp.int32).at[spos].set(
        jnp.where(sv, node_id, 2 * E - 1)
    )
    w_out = jnp.where(sv & (spos < E), 1, 0).astype(jnp.int32)
    w_in = jnp.where(sv & (spos >= E), 1, 0).astype(jnp.int32)
    outdeg = segment_sums_sorted(is_new, node_id, w_out, 2 * E)
    indeg = segment_sums_sorted(is_new, node_id, w_in, 2 * E)
    return ids[:E], ids[E:], n_nodes, outdeg, indeg


def main():
    # synthetic sorted spectrum: random sorted 62-bit canonical-ish keys
    rng = np.random.default_rng(0)
    hi = rng.integers(0, 1 << 30, size=C, dtype=np.uint64)
    lo = rng.integers(0, 1 << 32, size=C, dtype=np.uint64)
    v = np.sort((hi << np.uint64(32)) | lo)
    limbs = np.stack(
        [(v >> np.uint64(32)).astype(np.uint32), v.astype(np.uint32)], axis=-1
    )
    spec = Spectrum(
        limbs=jnp.asarray(limbs),
        counts=jnp.ones((C,), jnp.int32),
        n=jnp.asarray(C, jnp.int32),
    )

    de = jax.jit(doubled_edges, static_argnames=("k",))
    edge_limbs, edge_valid = de(spec, K)
    sync(edge_limbs)
    timeit("doubled_edges (revcomp C rows)", lambda: de(spec, K))

    timeit("assign OLD  (4C raw sort)", _old_assign, edge_limbs, edge_valid)
    an = jax.jit(assign_node_ids, static_argnames=("k",))
    timeit("assign NEW  (2C canon sort)", lambda: an(edge_limbs, edge_valid, K))

    bg = jax.jit(build_graph, static_argnames=("k",))
    timeit("build_graph full", lambda: bg(spec, K))

    # the bare sorts for reference
    E = 2 * C

    @jax.jit
    def sort4c(edge_limbs, edge_valid):
        pre = keys.prefix(edge_limbs, K)
        suf = keys.suffix(edge_limbs, K)
        endpoints = jnp.concatenate([pre, suf], axis=0)
        valid = jnp.concatenate([edge_valid, edge_valid])
        pos = jnp.arange(2 * E, dtype=jnp.int32)
        return keys.sort_by_key(endpoints, valid, pos)[0][0, 0]

    @jax.jit
    def sort2c(edge_limbs, edge_valid):
        fwd = edge_limbs[:C]
        pre = keys.prefix(fwd, K)
        suf = keys.suffix(fwd, K)
        endpoints = jnp.concatenate([pre, suf], axis=0)
        valid = jnp.concatenate([edge_valid[:C], edge_valid[:C]])
        pos = jnp.arange(2 * C, dtype=jnp.uint32)
        return keys.sort_by_key(endpoints, valid, pos)[0][0, 0]

    timeit("bare sort 4C (L+2 ops)", sort4c, edge_limbs, edge_valid)
    timeit("bare sort 2C (L+2 ops)", sort2c, edge_limbs, edge_valid)


if __name__ == "__main__":
    main()
