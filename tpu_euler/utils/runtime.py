"""Runtime setup helpers (compilation cache, profiling hooks).

On the axon TPU tunnel every XLA program costs ~60s of remote compilation; the
persistent cache makes assembly runs after the first start in seconds. Safe to
call on any backend.
"""

from __future__ import annotations

import logging
import os

import jax

log = logging.getLogger("tpu_euler")

_DEFAULT_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def setup_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent)."""
    path = path or os.environ.get("TPU_EULER_CACHE_DIR", _DEFAULT_CACHE)
    try:
        # separate subdir per backend: CPU AOT artifacts are machine-feature
        # sensitive and must not be shared with TPU entries
        path = os.path.join(path, jax.default_backend())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is an optimization; never fail the run
        log.warning("compilation cache disabled: %s", e)
