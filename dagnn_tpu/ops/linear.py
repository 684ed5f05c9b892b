"""Minimal explicit-parameter linear layer with torch-compatible layout.

Parameters are plain dicts {"w": [out, in], "b": [out]} so weights can be
compared against / loaded from the reference's torch modules one-to-one in
parity tests. Initialization reproduces torch.nn.Linear defaults
(kaiming-uniform fan_in => U(-1/sqrt(in), 1/sqrt(in)) for both w and b).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Initializer = jax.nn.initializers.Initializer


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_dim) if in_dim > 0 else 0.0
    p = {"w": jax.random.uniform(kw, (out_dim, in_dim), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return p


def linear(params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ params["w"].T
    if "b" in params:
        y = y + params["b"]
    return y
