"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding/collective logic is
validated on a host-platform mesh exactly as the driver's dryrun does.

The axon environment registers a TPU backend via sitecustomize and forces
``jax_platforms`` — plain env vars are not enough, so we override through
jax.config before any backend is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
