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


# --- densified segment ops -------------------------------------------------
#
# At wavefront-row sizes (Ke ~ hundreds, num_segments ~ chunk width) the
# segment ops can be expressed as one-hot matmuls that run on the MXU —
# no scatter in forward OR backward (the transpose of a matmul is a matmul).
# This is the TPU-native formulation of torch_scatter's job.

def one_hot_segments(segment_ids: jnp.ndarray, num_segments: int,
                     mask: Optional[jnp.ndarray] = None,
                     dtype=jnp.float32) -> jnp.ndarray:
    """P [E, S] with P[e, seg(e)] = 1 (0 for masked edges)."""
    P = jax.nn.one_hot(segment_ids, num_segments, dtype=dtype)
    if mask is not None:
        P = P * mask.astype(dtype)[:, None]
    return P


def dense_segment_sum(values, P):
    return P.T @ values


def dense_segment_max(scores, P):
    """Per-segment max of scalar scores; empty segments -> 0."""
    neg = jnp.finfo(scores.dtype).min
    sm = jnp.where(P.T > 0, scores[None, :], neg)
    out = jnp.max(sm, axis=1)
    return jnp.where(out <= neg, 0, out)


def dense_segment_max_vec(values, P):
    """Per-segment max of vector values [E, H]; empty segments -> 0."""
    neg = jnp.finfo(values.dtype).min
    sm = jnp.where(P[:, :, None] > 0, values[:, None, :], neg)  # [E, S, H]
    out = jnp.max(sm, axis=0)
    return jnp.where(out <= neg, 0, out)


def dense_edge_softmax_aggregate(scores, values, segment_ids, P):
    """softmax-per-segment + weighted sum, all as one-hot matmuls.

    Matches edge_softmax_aggregate bit-for-bit up to float reassociation
    (same max-subtraction and +1e-16 denominator).
    """
    out_dtype = values.dtype
    scores = scores.astype(jnp.float32)  # stable exp/normalize in f32
    Pf = P.astype(jnp.float32)
    seg_max = dense_segment_max(scores, Pf)
    gate = Pf @ jnp.ones((P.shape[1],), jnp.float32)  # edge mask as float
    e = jnp.exp(scores - seg_max[segment_ids]) * gate
    denom = Pf.T @ e
    alpha = (e / (denom[segment_ids] + _SOFTMAX_EPS)).astype(out_dtype)
    return P.T @ (values * alpha[:, None])
