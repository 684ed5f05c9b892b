"""Per-level predecessor aggregation — the framework's kernel family.

The reference implements five PyG MessagePassing convs (reference:
ogbg-code/model/dagnn.py:232-409): AggConv (sum/max), GatedSumConv,
SelfAttnConv, AttnConv (additive query-key attention), MultAttnConv
(multiplicative).  Here each is a pure function over one wavefront level's
gathered edge arrays:

    value_src [Ke, H]   message values (source states, already gathered)
    key_src   [Ke, A]   attention keys (source states or inputs)
    query     [Kn, Dq]  per-destination-slot queries (level-local)
    edge_dst  [Ke]      local destination slot of each edge
    edge_emb  [Ke, A]   encoded edge attributes (optional, added to keys
                        for attention kinds / to values for sum kinds,
                        matching dagnn.py:247-248,271-272,298-299,367-368)

Scoring decomposes the reference's ``attn_lin([q_i, k_j])`` into a per-slot
query part + per-edge key part (linear in each), so the query projection runs
once per destination instead of once per edge — SDDMM-style.  Segment softmax
+ weighted segment sum run over level-local slots (see ops/segment.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from dagnn_tpu.ops.linear import linear, linear_init
from dagnn_tpu.ops.segment import (
    segment_sum,
    segment_max,
    edge_softmax_aggregate,
    one_hot_segments,
    dense_segment_sum,
    dense_edge_softmax_aggregate,
)

AGG_KINDS = ("add", "max", "gated_sum", "self_attn", "attn", "mattn")


@dataclasses.dataclass(frozen=True)
class AggregatorSpec:
    """Static configuration of one aggregator instance.

    kind: one of AGG_KINDS.
    value_dim: dim of aggregated values (reference ``pred_dim``).
    key_dim: dim of attention keys (reference ``attn_dim``); ignored for
        sum kinds.
    query_dim: dim of the attention query (reference ``attn_q_dim``);
        only for attn/mattn.
    num_rels: >1 enables the per-aggregator one-hot edge encoder.
    mapper_bias: bias on the gated-sum mapper (dagnn.py:264; the D-VAE
        variant disables it so padded zeros map to zeros).
    """

    kind: str
    value_dim: int
    key_dim: int = 0
    query_dim: int = 0
    num_rels: int = 1
    mapper_bias: bool = True
    out_dim: int = 0  # gated_sum output dim; 0 -> value_dim (square, canonical)

    @property
    def gated_out_dim(self) -> int:
        return self.out_dim or self.value_dim

    @property
    def wea(self) -> bool:
        return self.num_rels > 1

    @property
    def edge_emb_dim(self) -> int:
        # attention kinds encode edges into key space, sum kinds into value space
        return self.key_dim if self.kind in ("self_attn", "attn", "mattn") else self.value_dim


def aggregator_init(key, spec: AggregatorSpec, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    p = {}
    if spec.wea:
        p["edge_encoder"] = linear_init(ks[0], spec.num_rels, spec.edge_emb_dim, dtype=dtype)
    if spec.kind == "gated_sum":
        p["gate"] = linear_init(ks[1], spec.value_dim, spec.gated_out_dim, dtype=dtype)
        p["mapper"] = linear_init(
            ks[2], spec.value_dim, spec.gated_out_dim, bias=spec.mapper_bias, dtype=dtype
        )
    elif spec.kind == "self_attn":
        p["attn_lin"] = linear_init(ks[1], spec.key_dim, 1, dtype=dtype)
    elif spec.kind == "attn":
        # single [1, Dq + A] weight, torch-layout-compatible with
        # reference attn_lin (dagnn.py:359); sliced into q/k parts at apply
        p["attn_lin"] = linear_init(ks[1], spec.query_dim + spec.key_dim, 1, dtype=dtype)
    elif spec.kind == "mattn":
        p["attn_linl"] = linear_init(ks[1], spec.query_dim, spec.query_dim, dtype=dtype)
        p["attn_linr"] = linear_init(ks[2], spec.key_dim, spec.query_dim, dtype=dtype)
    elif spec.kind not in ("add", "max"):
        raise ValueError(f"unknown aggregator kind {spec.kind}")
    return p


def encode_edges(params, spec: AggregatorSpec, edge_attr: Optional[jnp.ndarray]):
    """Apply this aggregator's one-hot edge encoder (dagnn.py:238,261,287)."""
    if not spec.wea or edge_attr is None:
        return None
    return linear(params["edge_encoder"], edge_attr)


def aggregate_level(
    params,
    spec: AggregatorSpec,
    value_src: jnp.ndarray,
    edge_dst: jnp.ndarray,
    edge_mask: jnp.ndarray,
    num_slots: int,
    key_src: Optional[jnp.ndarray] = None,
    query: Optional[jnp.ndarray] = None,
    edge_emb: Optional[jnp.ndarray] = None,
    sorted_ids: bool = True,
    impl: str = "dense",
) -> jnp.ndarray:
    """Aggregate one level's messages into [num_slots, value_dim].

    num_slots should be Kn + 1 (one extra pad segment); callers slice [:Kn].
    impl="dense" runs segment ops as one-hot MXU matmuls (scatter-free in
    forward and backward); "scatter" uses jax.ops.segment_* (the semantics
    reference). Vector segment-max always uses the scatter path (its dense
    form would materialize [E, S, H]).
    """
    P = one_hot_segments(edge_dst, num_slots, edge_mask,
                         value_src.dtype) if impl == "dense" else None

    if spec.kind in ("add", "max", "gated_sum"):
        v = value_src if edge_emb is None else value_src + edge_emb
        if spec.kind == "add":
            if P is not None:
                return dense_segment_sum(v, P)
            return segment_sum(v, edge_dst, num_slots, edge_mask,
                               indices_are_sorted=sorted_ids)
        if spec.kind == "max":
            return segment_max(v, edge_dst, num_slots, edge_mask,
                               indices_are_sorted=sorted_ids)
        g = jax.nn.sigmoid(linear(params["gate"], v))
        m = linear(params["mapper"], v)
        if P is not None:
            return dense_segment_sum(g * m, P)
        return segment_sum(g * m, edge_dst, num_slots, edge_mask,
                           indices_are_sorted=sorted_ids)

    k = key_src if key_src is not None else value_src
    if edge_emb is not None:
        k = k + edge_emb

    if spec.kind == "self_attn":
        scores = linear(params["attn_lin"], k)[..., 0]
    elif spec.kind == "attn":
        w = params["attn_lin"]["w"]  # [1, Dq + A]
        dq = spec.query_dim
        q_scores = query @ w[:, :dq].T + params["attn_lin"]["b"]  # [Kn, 1]
        k_scores = k @ w[:, dq:].T  # [Ke, 1]
        scores = (q_scores[edge_dst] + k_scores)[..., 0]
    elif spec.kind == "mattn":
        ql = linear(params["attn_linl"], query)  # [Kn, Dq]
        kr = linear(params["attn_linr"], k)  # [Ke, Dq]
        scores = jnp.sum(ql[edge_dst] * kr, axis=-1)
    else:
        raise ValueError(f"unknown aggregator kind {spec.kind}")

    if impl == "pallas":
        from dagnn_tpu.ops.pallas import pallas_edge_softmax_aggregate
        import jax as _jax
        interp = _jax.default_backend() != "tpu"
        return pallas_edge_softmax_aggregate(scores, value_src, edge_dst,
                                             edge_mask, num_slots, interp)
    if P is not None:
        return dense_edge_softmax_aggregate(scores, value_src, edge_dst, P)
    return edge_softmax_aggregate(scores, value_src, edge_dst, num_slots,
                                  edge_mask, indices_are_sorted=sorted_ids)
