"""Bisect the graph-stage compile stall on the chip (round 3).

The node-id rewrite (commit bd6ee68) made bench.py's graph program take
>13 min to compile through the axon relay. This script lowers+compiles the
graph-stage jits one at a time at bench-like capacity and prints wall times,
so the pathological sub-program can be identified.
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

from tpu_euler.graph import build
from tpu_euler.kmer.count import Spectrum, apply_cutoff

K = 31
CAP = int(sys.argv[1]) if len(sys.argv) > 1 else (1 << 20)


def compile_one(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(f"{name}: lower {t1-t0:.2f}s compile {t2-t1:.2f}s", flush=True)


def main():
    L = 2
    spec = Spectrum(
        limbs=jnp.zeros((CAP, L), jnp.uint32),
        counts=jnp.ones((CAP,), jnp.int32),
        n=jnp.asarray(CAP, jnp.int32),
    )
    compile_one("apply_cutoff", lambda s: apply_cutoff(s, 1), spec)
    el, ev = build.doubled_edges(spec, K)
    compile_one("doubled_edges", lambda s: build.doubled_edges(s, K), spec)
    compile_one(
        "assign_node_ids",
        lambda a, b: build.assign_node_ids(a, b, K),
        el, ev,
    )
    compile_one("build_graph", lambda s: build.build_graph(s, K), spec)




def main_fused():
    from tpu_euler.pipeline.assemble import make_graph_step

    L = 2
    spec = Spectrum(
        limbs=jnp.zeros((CAP, L), jnp.uint32),
        counts=jnp.ones((CAP,), jnp.int32),
        n=jnp.asarray(CAP, jnp.int32),
    )
    step = make_graph_step(K, 1)
    t0 = time.perf_counter()
    lowered = step.lower(spec)
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(f"graph_step fused: lower {t1-t0:.2f}s compile {t2-t1:.2f}s", flush=True)


if __name__ == "__main__":
    main_fused() if "--fused" in sys.argv else main()
