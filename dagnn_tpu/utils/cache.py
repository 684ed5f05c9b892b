"""Persistent XLA compilation cache for the CLI drivers.

The large unrolled VAE train-step programs take many minutes to compile
through the remote TPU compiler; caching the executables on disk makes
every later process (resume, BO re-load, repeated benches) start in
seconds. Safe to call multiple times; a cache miss just compiles as usual.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "DAGNN_TPU_CACHE_DIR",
        os.path.expanduser("~/.cache/dagnn_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return path
