"""Graph readouts: masked segment pooling over graph ids.

TPU-native equivalents of PyG's global_{max,mean,add}_pool used by the
reference readout (reference: ogbg-code/model/dagnn.py:88-93,184-202), plus
the self-attention pool.

Note on the reference's attention pool (dagnn.py:114-117): it applies
softmax over the LAST dim of an [N, 1] score tensor, which is identically
1.0 — making it exactly global_add_pool. ``attn_compat=True`` (default)
reproduces that behavior for parity; ``attn_compat=False`` applies the
evidently intended per-graph segment softmax.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dagnn_tpu.ops.linear import linear
from dagnn_tpu.ops.segment import segment_sum, segment_max, segment_softmax


def pool_nodes(
    h: jnp.ndarray,
    graph_id: jnp.ndarray,
    num_graphs: int,
    kind: str,
    mask: Optional[jnp.ndarray] = None,
    attn_params=None,
    attn_compat: bool = True,
) -> jnp.ndarray:
    """Pool node states [N, D] into per-graph [num_graphs, D].

    mask selects which nodes participate (e.g. only final-level nodes for
    the reference's out_pool over output nodes). Pad nodes carry
    graph_id == num_graphs and are dropped by an extra segment.
    """
    segs = num_graphs + 1
    if kind in ("add", "sum"):
        out = segment_sum(h, graph_id, segs, mask)
    elif kind == "max":
        out = segment_max(h, graph_id, segs, mask)
    elif kind == "mean":
        s = segment_sum(h, graph_id, segs, mask)
        ones = jnp.ones(h.shape[:1], h.dtype)
        cnt = segment_sum(ones, graph_id, segs, mask)
        out = s / jnp.maximum(cnt, 1.0)[:, None]
    elif kind == "attn":
        scores = linear(attn_params, h)[..., 0]
        if attn_compat:
            # softmax over a length-1 axis == 1.0 (reference dagnn.py:116)
            weights = jnp.ones_like(scores)
        else:
            weights = segment_softmax(scores, graph_id, segs, mask)
        out = segment_sum(h * weights[:, None], graph_id, segs, mask)
    else:
        raise ValueError(f"unknown pool kind {kind}")
    return out[:num_graphs]
