"""How far is the XLA drain sort from the TPU's practical ceiling?

Round-2 PERF.md claimed the 165M-row count sort runs "~100x off HBM
speed-of-light", implying a Pallas radix/bucket kernel could win ~100x
(VERDICT r2 item 2). That claim assumed the sort should cost ~one HBM pass
(bytes-bound). This script measures what the hardware actually does:

* XLA variadic sort wall time at several sizes and operand counts, on chip;
* the implied HBM passes (traffic / 819 GB/s nominal) — a bitonic sorting
  network needs ~log2(n)^2/2 compare-exchange passes, each a full read+write,
  so "speed of light" for a bitonic sort of n=165M is ~378 passes, NOT 1;
* the batched-sort alternative ([G, n/G] sorts each row independently): if
  per-element cost tracked log2(chunk)^2 a partition+chunk-sort pipeline
  could win — the measured ratio says whether that headroom exists;
* a VPU op-count bound for an in-VMEM Pallas bitonic (rolls+selects per
  stage), which shows whether a hand-written kernel could beat XLA's sort.

Output: one JSON line per measurement + a summary verdict.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_euler.utils.runtime import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBPS = 819.0  # v5e nominal HBM bandwidth


def log2ceil(n):
    return (n - 1).bit_length()


def timeit(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    key = jax.random.PRNGKey(0)
    rows = []
    for n in (1 << 24, 1 << 26, 165_150_720):
        a = jax.random.bits(key, (n,), jnp.uint32)
        b = jax.random.bits(jax.random.PRNGKey(1), (n,), jnp.uint32)

        @jax.jit
        def sort1(a):
            return jax.lax.sort([a], num_keys=1)[0]

        @jax.jit
        def sort2(a, b):
            return jax.lax.sort([a, b], num_keys=2)[0]

        t1 = timeit(sort1, a)
        t2 = timeit(sort2, a, b)
        for ops, t, nbytes in (("1op", t1, 4 * n), ("2op", t2, 8 * n)):
            passes = t * HBM_GBPS * 1e9 / (2 * nbytes)  # read+write per pass
            bitonic = log2ceil(n) * (log2ceil(n) + 1) / 2
            rows.append(
                {
                    "n": n,
                    "operands": ops,
                    "wall_s": round(t, 4),
                    "ns_per_row": round(t / n * 1e9, 2),
                    "implied_hbm_passes": round(passes, 1),
                    "bitonic_stage_count": bitonic,
                    "frac_of_bitonic_hbm_bound": round(passes / bitonic, 2),
                }
            )
            print(json.dumps(rows[-1]), flush=True)
        del a, b

    # batched chunk sorts: same total rows, independent chunks
    n_total = 1 << 27
    for chunk_log in (18, 21, 24):
        G = n_total >> chunk_log
        a = jax.random.bits(key, (G, 1 << chunk_log), jnp.uint32)
        b = jax.random.bits(jax.random.PRNGKey(1), (G, 1 << chunk_log), jnp.uint32)

        @jax.jit
        def bsort(a, b):
            return jax.lax.sort([a, b], num_keys=2, dimension=1)[0]

        t = timeit(bsort, a, b)
        rows.append(
            {
                "n": n_total,
                "operands": "2op",
                "batched_chunk": 1 << chunk_log,
                "wall_s": round(t, 4),
                "ns_per_row": round(t / n_total * 1e9, 2),
                "log2sq_ratio_vs_full": round(
                    (chunk_log * (chunk_log + 1)) / (27 * 28), 3
                ),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
        del a, b

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scripts", "sortceiling_results.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
