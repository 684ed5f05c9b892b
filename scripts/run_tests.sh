#!/usr/bin/env bash
# Canonical test runner: the full suite in ONE process.
#
# History: through round 4 this ran in TWO processes, split at
# tests/test_wavefront_vjp.py, because a single pytest process that had
# accumulated ~200 XLA:CPU compilations segfaulted inside
# backend_compile_and_load on the next large scan compile (faulthandler
# trace: LLVM JIT under pxla._cached_compilation; the same compile passes
# standalone in any order; reproduced with the axon remote-compile relay
# both on and off — an XLA:CPU executable-accumulation issue, not this
# framework). Root-caused to live-executable accumulation: conftest.py now
# drops jax's compiled-program caches between test MODULES
# (jax.clear_caches(), autouse module fixture), which bounds the live
# executable count and lets the whole suite run in one process (verified:
# the unsplit suite segfaulted at 91% without the fixture and passes with
# it, same machine, same session).
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q "$@"
