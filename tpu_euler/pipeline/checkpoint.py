"""Stage-boundary checkpoint/resume (SURVEY.md section 5).

The reference has no checkpointing; the aux-subsystem requirement is met with
stage checkpoints at the natural pipeline boundary: the counted k-mer spectrum
(the expensive stage at scale). Saved as .npz per host; ``--resume-spectrum``
skips read streaming entirely.
"""

from __future__ import annotations

import numpy as np

from tpu_euler.kmer.count import Spectrum

FORMAT_VERSION = 1


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
