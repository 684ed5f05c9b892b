#!/usr/bin/env bash
# Canonical test runner for this environment.
#
# Two environment quirks worked around here (both outside the framework):
#
# 1. CPU executables can be compiled by the axon remote-compile relay on a
#    machine with a different CPU feature set; XLA's AOT loader warns this
#    "could lead to execution errors such as SIGILL".
#    PALLAS_AXON_REMOTE_COMPILE=0 compiles CPU programs locally (read by
#    sitecustomize at interpreter start, so it must be in the env, not
#    set from conftest).
# 2. A single pytest process that has accumulated ~200 XLA:CPU
#    compilations segfaults inside backend_compile_and_load on the next
#    large grad-program compile (tests/test_wavefront_vjp, which passes
#    standalone in any order). Until the XLA-side cause is isolated, the
#    suite runs in two processes split at that file.
set -e
cd "$(dirname "$0")/.."
export PALLAS_AXON_REMOTE_COMPILE=0
python -m pytest tests/ -q --ignore=tests/test_wavefront_vjp.py "$@"
python -m pytest tests/test_wavefront_vjp.py -q "$@"
