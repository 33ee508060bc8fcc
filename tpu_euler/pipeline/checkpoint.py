"""Stage-boundary checkpoint/resume (SURVEY.md section 5).

The reference has no checkpointing; the aux-subsystem requirement is met with
stage checkpoints at BOTH natural pipeline boundaries:

* the counted k-mer spectrum (``--save/--resume-spectrum``) — skips read
  streaming + counting;
* the built graph + unitig chains (``--save/--resume-graph``) — skips
  counting AND the graph/traversal stage; resume goes straight to contig
  emission.

Saved as .npz per host. Graph checkpoints store the valid edges compacted
(edge keys, CSR connectivity tail/head with densely remapped node ids, and
every per-edge chain field with remapped chain ids), so file size scales with
live edges, not device capacities.
"""

from __future__ import annotations

import numpy as np

from tpu_euler.kmer.count import Spectrum

FORMAT_VERSION = 1
GRAPH_FORMAT_VERSION = 1


def save_spectrum(path: str, spec: Spectrum, k: int) -> None:
    n = int(spec.n)
    np.savez_compressed(
        path,
        version=FORMAT_VERSION,
        k=k,
        n=n,
        limbs=np.asarray(spec.limbs)[:n],
        counts=np.asarray(spec.counts)[:n],
    )


def load_spectrum(path: str, capacity: int | None = None) -> tuple[Spectrum, int]:
    """Load a spectrum checkpoint; returns (spectrum padded to capacity, k)."""
    import jax.numpy as jnp

    with np.load(path) as z:
        if int(z["version"]) != FORMAT_VERSION:
            raise ValueError(f"unsupported spectrum checkpoint version {z['version']}")
        k = int(z["k"])
        n = int(z["n"])
        limbs, counts = z["limbs"], z["counts"]
    cap = capacity or max(1, n)
    if n > cap:
        raise ValueError(f"checkpoint has {n} kmers > capacity {cap}")
    L = limbs.shape[1]
    pl = np.zeros((cap, L), np.uint32)
    pc = np.zeros((cap,), np.int32)
    pl[:n], pc[:n] = limbs, counts
    return Spectrum(jnp.asarray(pl), jnp.asarray(pc), jnp.asarray(n, jnp.int32)), k


def save_graph(path: str, g, chains, k: int) -> None:
    """Checkpoint the built graph + unitig chains (valid edges, compacted)."""
    idx = np.flatnonzero(np.asarray(chains.in_chain))
    tail = np.asarray(g.tail)[idx]
    head = np.asarray(g.head)[idx]
    # densify node ids over the nodes that valid edges actually touch
    nodes, inv = np.unique(np.concatenate([tail, head]), return_inverse=True)
    np.savez_compressed(
        path,
        version=GRAPH_FORMAT_VERSION,
        k=k,
        n_nodes=nodes.size,
        edge_limbs=np.asarray(g.edge_limbs)[idx],
        tail=inv[: idx.size].astype(np.int32),
        head=inv[idx.size :].astype(np.int32),
        chain=np.searchsorted(idx, np.asarray(chains.chain)[idx]).astype(np.int32),
        pos=np.asarray(chains.pos)[idx],
        length=np.asarray(chains.length)[idx],
        is_start=np.asarray(chains.is_start)[idx],
        from_cycle=np.asarray(chains.from_cycle)[idx],
    )


def load_graph(path: str):
    """Load a graph checkpoint; returns (graph, chains, k).

    The returned graph carries edge keys + CSR connectivity (tail/head over
    densely remapped node ids); degree/out_first arrays are NOT stored (they
    are traversal intermediates — chains are already resolved) and read as
    zeros. Emission (``chains_to_contigs_device``) needs only edge keys +
    chains, which round-trip exactly.
    """
    import jax.numpy as jnp

    from tpu_euler.euler.unitigs import UnitigChains
    from tpu_euler.graph.build import DeBruijnGraph

    with np.load(path) as z:
        if int(z["version"]) != GRAPH_FORMAT_VERSION:
            raise ValueError(f"unsupported graph checkpoint version {z['version']}")
        k = int(z["k"])
        E = z["edge_limbs"].shape[0]
        g = DeBruijnGraph(
            edge_limbs=jnp.asarray(z["edge_limbs"]),
            edge_valid=jnp.ones((E,), jnp.bool_),
            tail=jnp.asarray(z["tail"]),
            head=jnp.asarray(z["head"]),
            n_edges=jnp.asarray(E, jnp.int32),
            n_nodes=jnp.asarray(int(z["n_nodes"]), jnp.int32),
            indeg=jnp.zeros((2 * E,), jnp.int32),
            outdeg=jnp.zeros((2 * E,), jnp.int32),
            out_first=jnp.zeros((2 * E,), jnp.int32),
            succ_cand=jnp.full((2 * E,), -1, jnp.int32),
        )
        chains = UnitigChains(
            chain=jnp.asarray(z["chain"]),
            pos=jnp.asarray(z["pos"]),
            length=jnp.asarray(z["length"]),
            is_start=jnp.asarray(z["is_start"]),
            from_cycle=jnp.asarray(z["from_cycle"]),
            in_chain=jnp.ones((E,), jnp.bool_),
        )
    return g, chains, k
