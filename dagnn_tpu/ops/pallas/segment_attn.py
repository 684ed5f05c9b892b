"""Pallas TPU kernel: fused per-row edge-attention aggregation.

One kernel performs the whole segment-softmax + SpMM pipeline for a
wavefront row — the op family the reference delegates to torch_scatter +
torch_geometric.utils.softmax (reference: ogbg-code/model/dagnn.py:307-310):

    P      = one_hot(dst) * mask            (built in-kernel via iota)
    segmax = max_e P[e,s] ? score[e]        (masked column max)
    e      = exp(score - segmax[dst]) * mask
    alpha  = e / (P^T e)[dst]
    out    = P^T (alpha * values)           (MXU matmul)

Everything stays VMEM-resident for the row (Ke x S one-hot ~ <1MB at
bench shapes); both matmuls hit the MXU. Backward is a custom VJP using
the same densified math in XLA (matmul transposes are matmuls — no
scatter anywhere).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-16


def _kernel(scores_ref, values_ref, dst_ref, mask_ref, out_ref):
    scores = scores_ref[:]            # [Ke, 1] f32
    values = values_ref[:]            # [Ke, H]
    dst = dst_ref[:]                  # [Ke, 1] i32
    mask = mask_ref[:]                # [Ke, 1] f32
    ke = scores.shape[0]
    s = out_ref.shape[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (ke, s), 1)
    P = jnp.where(col == dst, 1.0, 0.0) * mask            # [Ke, S]

    neg = jnp.finfo(jnp.float32).min
    sm = jnp.where(P > 0, scores, neg)                    # [Ke, S]
    seg_max = jnp.max(sm, axis=0, keepdims=True)          # [1, S]
    seg_max = jnp.where(seg_max <= neg, 0.0, seg_max)
    hp = jax.lax.Precision.HIGHEST
    my_max = jnp.dot(P, seg_max.T, preferred_element_type=jnp.float32,
                     precision=hp)  # [Ke, 1]

    e = jnp.exp(scores - my_max) * mask                   # [Ke, 1]
    denom = jnp.dot(P.T, e, preferred_element_type=jnp.float32,
                    precision=hp)  # [S, 1]
    my_denom = jnp.dot(P, denom, preferred_element_type=jnp.float32,
                       precision=hp)  # [Ke, 1]
    alpha = e / (my_denom + _EPS)

    out_ref[:] = jnp.dot(P.T, values * alpha,
                         preferred_element_type=jnp.float32, precision=hp)


def _forward(scores, values, dst, mask, num_slots: int, interpret: bool):
    ke, h = values.shape
    out_shape = jax.ShapeDtypeStruct((num_slots, h), jnp.float32)
    fn = pl.pallas_call(
        _kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    return fn(
        scores.astype(jnp.float32).reshape(ke, 1),
        values.astype(jnp.float32),
        dst.astype(jnp.int32).reshape(ke, 1),
        mask.astype(jnp.float32).reshape(ke, 1),
    ).astype(values.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def pallas_edge_softmax_aggregate(scores, values, dst, mask,
                                  num_slots: int, interpret: bool = False):
    """Fused softmax-per-segment + weighted segment sum.

    Same contract as ops.segment.edge_softmax_aggregate; `interpret=True`
    runs the kernel in the Pallas interpreter (CPU tests)."""
    return _forward(scores, values, dst, mask, num_slots, interpret)


def _fwd(scores, values, dst, mask, num_slots, interpret):
    out = _forward(scores, values, dst, mask, num_slots, interpret)
    return out, (scores, values, dst, mask)


def _bwd(num_slots, interpret, res, g):
    scores, values, dst, mask = res
    f32 = jnp.float32
    m = mask.astype(f32)
    P = jax.nn.one_hot(dst, num_slots, dtype=f32) * m[:, None]
    sv = scores.astype(f32)
    neg = jnp.finfo(f32).min
    sm = jnp.where(P > 0, sv[:, None], neg)
    seg_max = jnp.max(sm, axis=0)
    seg_max = jnp.where(seg_max <= neg, 0.0, seg_max)
    e = jnp.exp(sv - P @ seg_max) * m
    denom = P.T @ e
    alpha = e / (P @ denom + _EPS)                       # [Ke]

    gf = g.astype(f32)
    vf = values.astype(f32)
    # d values = alpha * (P @ g)
    g_rows = P @ gf                                       # [Ke, H]
    d_values = (alpha[:, None] * g_rows).astype(values.dtype)
    # d alpha_e = <g_seg(e), v_e>
    d_alpha = jnp.sum(g_rows * vf, axis=-1)               # [Ke]
    # softmax jacobian within each segment:
    # d score_e = alpha_e * (d_alpha_e - sum_{e' in seg} alpha_e' d_alpha_e')
    seg_dot = P.T @ (alpha * d_alpha)                     # [S]
    d_scores = (alpha * (d_alpha - P @ seg_dot)).astype(scores.dtype)
    return d_scores, d_values, None, None


pallas_edge_softmax_aggregate.defvjp(_fwd, _bwd)
