"""Node-input encoders.

Mirrors the reference encoder family:
  * ``ast``  — type/attr/depth embedding sum (reference: ogbg-code/utils.py:6-28)
  * ``ast2`` — type/attr only (reference: ogbg-code/utils2.py:6-28)
  * ``bag``  — EmbeddingBag-sum over token-id lists (dagnn.py:218-223)
  * ``onehot``/None — features used as-is (dvae pipeline passes one-hot x)

Embedding tables init N(0, 1), matching torch.nn.Embedding defaults.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EncoderSpec:
    kind: str = "identity"          # identity | ast | ast2 | bag
    emb_dim: int = 0
    num_nodetypes: int = 0
    num_nodeattributes: int = 0
    max_depth: int = 20
    vocab_size: int = 0             # bag encoder


def encoder_init(key, spec: EncoderSpec, dtype=jnp.float32):
    if spec.kind == "identity":
        return {}
    ks = jax.random.split(key, 3)
    n = lambda k, rows: jax.random.normal(k, (rows, spec.emb_dim), dtype)
    if spec.kind in ("ast", "ast2"):
        p = {
            "type_emb": n(ks[0], spec.num_nodetypes),
            "attr_emb": n(ks[1], spec.num_nodeattributes),
        }
        if spec.kind == "ast":
            p["depth_emb"] = n(ks[2], spec.max_depth + 1)
        return p
    if spec.kind == "bag":
        return {"emb": n(ks[0], spec.vocab_size)}
    raise ValueError(f"unknown encoder kind {spec.kind}")


def encode(
    params,
    spec: EncoderSpec,
    x: jnp.ndarray,
    node_depth: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Encode raw node inputs into [N, emb_dim] float embeddings.

    ast/ast2: x is [N, 2] int (type id, attr id); depth clipped to max_depth
    (utils.py:27: ``torch.clamp(depth, 0, max_depth)`` equivalent).
    bag: x is [N, T] int token ids with 0 padding summed away is NOT the
    torch semantics (EmbeddingBag sums all ids) — callers pass exact lists.
    identity: x returned unchanged (cast to float).
    """
    if spec.kind == "identity":
        return x.astype(jnp.float32) if not jnp.issubdtype(x.dtype, jnp.floating) else x
    if spec.kind in ("ast", "ast2"):
        # SMALL tables (type ~98 rows, depth ~21) look up via one-hot
        # matmul: the gather's VJP is a scatter-add costing ~14ns/row on
        # TPU (~280us/table/step at TOK shapes) while the one-hot path's
        # backward is a [rows, N]x[N, emb] MXU matmul (~6us); the big attr
        # table stays a gather (its one-hot matmul would be 61 GMAC)
        def small_lookup(table, idx):
            oh = jax.nn.one_hot(idx, table.shape[0], dtype=table.dtype)
            return oh @ table

        out = small_lookup(params["type_emb"], x[:, 0]) \
            + params["attr_emb"][x[:, 1]]
        if spec.kind == "ast":
            d = jnp.clip(node_depth.reshape(-1), 0, spec.max_depth)
            out = out + small_lookup(params["depth_emb"], d)
        return out
    if spec.kind == "bag":
        return params["emb"][x].sum(axis=-2)
    raise ValueError(f"unknown encoder kind {spec.kind}")
