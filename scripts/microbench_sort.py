"""Microbench: XLA variadic sort / scatter costs on the current chip.

Sizes chosen around the benchmark's counting stage (165M buffered windows,
~13M windows/batch, ~5M distinct keys) to price alternative counting plans.
"""

from __future__ import annotations

import time

from tpu_euler.utils.runtime import setup_compilation_cache

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timeit(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    return (time.perf_counter() - t0) / reps


def main():
    key = jax.random.PRNGKey(0)

    for n, ops, nkeys in [
        (165_150_720, 2, 2),
        (165_150_720, 3, 2),
        (47_185_920, 3, 2),
        (13_107_200, 2, 2),
        (13_107_200, 3, 2),
        (9_437_184, 3, 2),
    ]:
        arrs = [
            jax.random.randint(jax.random.fold_in(key, i), (n,), 0, 1 << 30).astype(
                jnp.uint32
            )
            for i in range(ops)
        ]

        f = jax.jit(lambda *a, nk=nkeys: jax.lax.sort(list(a), num_keys=nk))
        t = timeit(f, *arrs)
        print(f"sort n={n:>12,} ops={ops} num_keys={nkeys}: {t*1000:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
