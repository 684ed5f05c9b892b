"""Device-mesh construction and multi-host initialization.

TPU-native replacement for the reference's single-process DataParallel
device management (reference: ogbg-code/tg/data_parallel.py:24-50).

Single host: a Mesh over the visible chips. Multi host: initialize the
JAX distributed runtime (`init_distributed`) and build a HYBRID mesh
(`make_hybrid_mesh`) whose outer 'dp' axis spans hosts over DCN and whose
inner axis (e.g. 'ep' edge partitioning) stays within a host's chips so
its per-row collectives ride ICI (SURVEY.md §5.8).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime for multi-host execution.

    Arguments default from the standard environment (JAX_COORDINATOR_ADDRESS
    / JAX_NUM_PROCESSES / JAX_PROCESS_ID, also honoring cloud-TPU
    auto-detection when all are None). Safe to call once per process,
    before any other JAX API touches the backend.
    """
    kw = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kw["coordinator_address"] = (coordinator_address or
                                     os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kw["num_processes"] = int(num_processes or
                                  os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID") is not None:
        kw["process_id"] = int(process_id if process_id is not None
                               else os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kw)


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("dp",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    arr = np.asarray(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def make_hybrid_mesh(
    dp: Optional[int] = None,
    ep: Optional[int] = None,
    axis_names: Sequence[str] = ("dp", "ep"),
) -> Mesh:
    """2-axis (dp, ep) mesh laid out so 'ep' is intra-host (ICI) and 'dp'
    crosses hosts (DCN) when running multi-process.

    Defaults: ep = chips per host, dp = number of hosts (multi-process) or
    whatever dp*ep covers the local devices (single-process). The
    edge-partition wavefront exchanges a boundary row every scan step —
    that axis must sit on ICI; data parallelism syncs once per step and
    tolerates DCN latency.
    """
    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    if ep is None:
        ep = n_local
    if dp is None:
        dp = (n_proc if n_proc > 1 else max(1, len(jax.devices()) // ep))
    if n_proc > 1:
        try:
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(1, ep),
                dcn_mesh_shape=(dp, 1),
                devices=jax.devices())
            return Mesh(arr, tuple(axis_names))
        except ValueError:
            # non-TPU backends have no slice topology (e.g. the Gloo CPU
            # backend in tests): group devices by owning process instead
            if dp % n_proc != 0:
                raise ValueError(f"dp={dp} not a multiple of {n_proc} hosts")
            rows = []
            for pi in range(n_proc):
                local = [d for d in jax.devices() if d.process_index == pi]
                per = dp // n_proc
                if len(local) < per * ep:
                    raise ValueError(
                        f"process {pi} has {len(local)} devices < {per * ep}")
                rows += [local[j * ep:(j + 1) * ep] for j in range(per)]
            return Mesh(np.asarray(rows), tuple(axis_names))
    devs = jax.devices()[: dp * ep]
    if len(devs) < dp * ep:
        raise ValueError(f"need {dp * ep} devices, have {len(devs)}")
    return Mesh(np.asarray(devs).reshape(dp, ep), tuple(axis_names))
