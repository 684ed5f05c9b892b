"""Segment ops over per-level edge groups.

These are the TPU-native replacement for the reference's torch_scatter /
``torch_geometric.utils.softmax`` dependency (reference:
ogbg-code/model/dagnn.py:5,13,307-310): per-destination segment sum/max and
segment softmax.  Because the level schedule assigns every edge a LOCAL
destination slot within its level, segments span only [0, num_slots) — small,
dense, and static — instead of all N nodes.

The XLA path below (sort-free one-hot-free scatter-add) is the correctness
reference; `dagnn_tpu.ops.pallas` provides fused kernels with identical
semantics for the hot path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Matches torch_geometric.utils.softmax's denominator epsilon.
_SOFTMAX_EPS = 1e-16


def segment_sum(
    values: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Sum `values` rows into `num_segments` buckets. Masked rows contribute 0."""
    if mask is not None:
        values = jnp.where(_bcast(mask, values), values, 0)
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_max(
    values: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Per-segment max; empty segments yield 0 (PyG `aggr='max'` fills 0 for
    nodes with no incoming edges after the wavefront edge selection)."""
    neg = jnp.finfo(values.dtype).min
    if mask is not None:
        values = jnp.where(_bcast(mask, values), values, neg)
    out = jax.ops.segment_max(values, segment_ids, num_segments=num_segments,
                              indices_are_sorted=indices_are_sorted)
    # jax fills empty segments with -inf; fully masked segments produce `neg`.
    return jnp.where(out <= neg, 0, out)


def segment_softmax(
    scores: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Numerically stable per-segment softmax over edge scores.

    Matches torch_geometric.utils.softmax: subtract the per-segment max,
    exponentiate, normalize by (sum + 1e-16). Masked edges get weight 0 and
    do not affect real edges' normalization.
    """
    neg = jnp.finfo(scores.dtype).min
    masked_scores = scores if mask is None else jnp.where(_bcast(mask, scores), scores, neg)
    seg_max = jax.ops.segment_max(masked_scores, segment_ids, num_segments=num_segments,
                                  indices_are_sorted=indices_are_sorted)
    seg_max = jnp.where(seg_max <= neg, 0, seg_max)  # empty/fully-masked segments
    shifted = masked_scores - seg_max[segment_ids]
    expd = jnp.exp(shifted)
    if mask is not None:
        expd = jnp.where(_bcast(mask, expd), expd, 0)
    denom = jax.ops.segment_sum(expd, segment_ids, num_segments=num_segments,
                                indices_are_sorted=indices_are_sorted)
    return expd / (denom[segment_ids] + _SOFTMAX_EPS)


def edge_softmax_aggregate(
    scores: jnp.ndarray,
    values: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """softmax(scores) per destination segment, then weighted-sum `values`.

    The fused core of AttnConv/SelfAttnConv/MultAttnConv message passing
    (reference: ogbg-code/model/dagnn.py:307-310, 366-373, 399-406):
    SDDMM-scored segment softmax + SpMM aggregate. This signature is the
    stable seam the Pallas kernel implements.

    Args:
        scores: [E_l] per-edge attention logits.
        values: [E_l, H] per-edge message values (gathered source states).
        segment_ids: [E_l] local destination slots in [0, num_segments).
        num_segments: number of destination slots (level width + 1 pad slot).
        mask: [E_l] validity.

    Returns:
        [num_segments, H] aggregated messages.
    """
    alpha = segment_softmax(scores, segment_ids, num_segments, mask,
                            indices_are_sorted=indices_are_sorted)
    weighted = values * alpha[:, None]
    if mask is not None:
        weighted = jnp.where(mask[:, None], weighted, 0)
    return jax.ops.segment_sum(weighted, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def _bcast(mask: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    while mask.ndim < like.ndim:
        mask = mask[..., None]
    return mask
