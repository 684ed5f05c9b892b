"""GRU cell with torch-compatible parameter layout.

Replaces the reference's cuDNN-backed nn.GRUCell (reference:
ogbg-code/model/dagnn.py:80-81, dvae/models_pyg.py:37-43). XLA fuses the
three gates into large matmuls; per-level batching keeps them MXU-shaped.

Gate math is identical to torch.nn.GRUCell:
    r = sigmoid(x W_ir^T + b_ir + h W_hr^T + b_hr)
    z = sigmoid(x W_iz^T + b_iz + h W_hz^T + b_hz)
    n = tanh  (x W_in^T + b_in + r * (h W_hn^T + b_hn))
    h' = (1 - z) * n + z * h
with stacked weights w_ih = [W_ir; W_iz; W_in] ([3H, In]) etc., so torch
state dicts load directly in parity tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gru_init(key, in_dim: int, hidden_dim: int, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    bound = 1.0 / np.sqrt(hidden_dim)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {
        "w_ih": u(ks[0], (3 * hidden_dim, in_dim)),
        "w_hh": u(ks[1], (3 * hidden_dim, hidden_dim)),
        "b_ih": u(ks[2], (3 * hidden_dim,)),
        "b_hh": u(ks[3], (3 * hidden_dim,)),
    }


def gru_cell(params, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """One GRU step. x: [..., In], h: [..., H] -> [..., H]."""
    gi = x @ params["w_ih"].T + params["b_ih"]
    gh = h @ params["w_hh"].T + params["b_hh"]
    H = h.shape[-1]
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h
