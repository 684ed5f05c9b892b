#!/usr/bin/env bash
# Canonical test runner for this environment.
#
# Environment quirk worked around here (outside the framework): a single
# pytest process that has accumulated ~200 XLA:CPU compilations
# segfaults inside backend_compile_and_load on the next large
# grad-program compile (tests/test_wavefront_vjp, which passes standalone
# in any order; reproduced with the axon remote-compile relay BOTH on and
# off, so it is an in-process XLA:CPU issue, not the relay). Until the
# XLA-side cause is isolated, the suite runs in two processes split at
# that file.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q --ignore=tests/test_wavefront_vjp.py "$@"
python -m pytest tests/test_wavefront_vjp.py -q "$@"
