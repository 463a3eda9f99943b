"""Persistent XLA compilation cache for CLI runs.

First compiles of the DTU-shape programs take 20-60s each (and go through a
remote compile service under the axon TPU relay); caching them on disk makes
repeat train/test/bench invocations start in seconds.
"""
from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None):
    import jax
    cache_dir = cache_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
