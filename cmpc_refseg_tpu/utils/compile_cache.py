"""Persistent XLA compilation cache setup.

Over the tunneled single-chip TPU ('axon' platform) XLA compiles are the
dominant startup cost (tens of seconds to minutes for the full model).  The
JAX persistent compilation cache eliminates them across processes; tested
working on this image.  Call :func:`enable` before the first jit dispatch
(importing jax is fine, running ops is not).
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get("CMPC_JAX_CACHE_DIR",
                                            DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
