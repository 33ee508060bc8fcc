"""Why does the Pallas-containing fill step miss the persistent cache?

Run this twice; the second run should hit the cache for every program. With
jax_explain_cache_misses=True, jax logs the reason for any miss.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_euler.utils.runtime import setup_compilation_cache

setup_compilation_cache()

import jax

jax.config.update("jax_explain_cache_misses", True)

import logging

logging.basicConfig(level=logging.DEBUG)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)

import jax.numpy as jnp
import numpy as np

from tpu_euler.pipeline.assemble import make_extract_fill_step

K = 31
READ_LEN = 100
R = 1 << 12


def main():
    fill = make_extract_fill_step(K, READ_LEN)
    Wb = R * (READ_LEN - K + 1)
    buf = tuple(jnp.full((Wb,), jnp.uint32(0xFFFFFFFF)) for _ in range(2))
    packed = jnp.zeros((R, 26), jnp.uint32)
    nmask = jnp.zeros((R, 4), jnp.uint32)
    from tpu_euler.io.encode import pack_codes

    codes = np.full((R, READ_LEN), 0, np.int8)
    p, m = pack_codes(codes)
    buf, nw = fill(jnp.asarray(p), jnp.asarray(m), buf, jnp.asarray(0, jnp.int32))
    print("nw:", int(nw))


if __name__ == "__main__":
    main()
