"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding/collective logic is
validated on a host-platform mesh exactly as the driver's dryrun does.

The axon environment registers a TPU backend via sitecustomize and forces
``jax_platforms`` — plain env vars are not enough, so we override through
jax.config before any backend is touched.

TPU tier: ``DAGNN_TPU_TESTS=1 pytest -m tpu`` skips the CPU override and
runs the tpu-marked subset (tests/test_tpu.py) on the real chip.
"""

import os

TPU_TIER = os.environ.get("DAGNN_TPU_TESTS") == "1"

if not TPU_TIER:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_TIER:
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process spawn etc.)")
    config.addinivalue_line(
        "markers", "tpu: requires a real TPU chip (DAGNN_TPU_TESTS=1)")


def pytest_collection_modifyitems(config, items):
    import pytest
    if TPU_TIER:
        skip = pytest.mark.skip(reason="TPU tier: only -m tpu tests run")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(reason="needs DAGNN_TPU_TESTS=1 + real chip")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free accumulated XLA:CPU executables between test modules.

    A single pytest process that accumulates ~200 XLA:CPU compilations
    segfaults inside `backend_compile_and_load` on a later large scan
    compile (faulthandler trace: LLVM JIT under pxla _cached_compilation;
    the same compile passes standalone in any order, and it reproduces
    with the axon remote-compile relay both on and off — an XLA:CPU
    executable-accumulation issue, not this framework and not the relay).
    Dropping the compiled-program caches between modules keeps the live
    executable count bounded and lets the whole suite run in ONE process
    (previously split in two by scripts/run_tests.sh).
    """
    yield
    jax.clear_caches()
