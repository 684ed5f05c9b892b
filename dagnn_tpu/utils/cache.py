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
    if jax.default_backend() not in ("tpu",):
        # CPU executables in this environment are compiled by the REMOTE
        # compile service on a machine with a different CPU feature set;
        # persisting and later reloading them is exactly the
        # "Machine type ... doesn't match ... could lead to SIGILL"
        # case the XLA AOT loader warns about (observed: segfaults deep
        # into long pytest runs once a driver test had enabled the cache
        # process-wide). Persist only for TPU executables.
        return path
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return path
