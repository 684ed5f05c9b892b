"""Device-mesh construction.

TPU-native replacement for the reference's single-process DataParallel
device management (reference: ogbg-code/tg/data_parallel.py:24-50): a
jax.sharding.Mesh over all visible chips (or an explicit device list), with
a data-parallel 'dp' axis today and room for 'mp' model axes as kernels
grow multi-chip (SURVEY.md §5.8 plan).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


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
