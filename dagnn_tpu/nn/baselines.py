"""Baseline GNNs over the full (possibly cyclic) augmented edge set.

TPU-native equivalents of the reference's OGB baselines (reference:
ogbg-code/model/conv.py:10-239 GIN/GCN ± virtual node wrapped by
model/gnn.py:11-94; model/gnn2.py:15-240 GGNN_Simple/GGNN/GAT;
tg/gated_graph_conv.py custom GatedGraphConv). All message passing runs
over the flat edge arrays of a DAGBatch (no wavefront — these are
round-based GNNs), using sorted segment ops.

BatchNorm note: the reference GIN MLP uses torch BatchNorm1d with running
stats; here BN uses masked batch statistics in both train and eval (no
running-state plumbing yet) — a documented deviation that does not change
the model family.

Trivial baselines (reference ogbg-code/model/baselines.py:8-120) are pure
functions at the bottom of this module.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dagnn_tpu.dag.batch import DAGBatch
from dagnn_tpu.nn.encoders import EncoderSpec, encoder_init, encode
from dagnn_tpu.nn.readout import pool_nodes
from dagnn_tpu.ops.gru import gru_cell, gru_init
from dagnn_tpu.ops.linear import linear, linear_init
from dagnn_tpu.ops.segment import segment_sum, segment_softmax


@dataclasses.dataclass(frozen=True)
class MPNNConfig:
    gnn_type: str = "gin"        # gin | gcn | gat | ggnn
    num_layers: int = 5
    emb_dim: int = 300
    dropout: float = 0.5
    residual: bool = False
    jk: str = "last"             # last | sum
    virtual_node: bool = False
    graph_pooling: str = "mean"
    num_vocab: int = 5002
    max_seq_len: int = 5
    num_class: int = 0
    num_rels: int = 2
    heads: int = 1               # gat
    timesteps: int = 5           # ggnn
    # Note: the reference GGNN's "weight_dropout" is dead code — the
    # F.dropout call at tg/gated_graph_conv.py:52 is out-of-place at
    # __init__ with its result discarded (the assignment is commented
    # out), so no dropout ever reaches the weights at runtime. We
    # deliberately reproduce the effective behavior (none).
    encoder: EncoderSpec = EncoderSpec()


def mpnn_init(key, cfg: MPNNConfig, dtype=jnp.float32) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 256))
    d = cfg.emb_dim
    p: Dict[str, Any] = {"encoder": encoder_init(next(ks), cfg.encoder, dtype)}
    layers = []
    for _ in range(cfg.num_layers):
        lp: Dict[str, Any] = {"edge_encoder": linear_init(next(ks), cfg.num_rels, d, dtype=dtype)}
        if cfg.gnn_type == "gin":
            lp["mlp1"] = linear_init(next(ks), d, 2 * d, dtype=dtype)
            lp["mlp2"] = linear_init(next(ks), 2 * d, d, dtype=dtype)
            lp["bn_scale"] = jnp.ones(2 * d, dtype)
            lp["bn_bias"] = jnp.zeros(2 * d, dtype)
            lp["eps"] = jnp.zeros((), dtype)
        elif cfg.gnn_type == "gcn":
            lp["linear"] = linear_init(next(ks), d, d, dtype=dtype)
            lp["root_emb"] = jax.random.normal(next(ks), (d,), dtype)
        elif cfg.gnn_type == "gat":
            h = cfg.heads
            lp["w"] = linear_init(next(ks), d, d, bias=False, dtype=dtype)
            lp["att_src"] = jax.random.normal(next(ks), (h, d // h), dtype) * 0.1
            lp["att_dst"] = jax.random.normal(next(ks), (h, d // h), dtype) * 0.1
        elif cfg.gnn_type == "ggnn":
            lp["step_w"] = [linear_init(next(ks), d, d, bias=False, dtype=dtype)
                            for _ in range(cfg.timesteps)]
            lp["gru"] = gru_init(next(ks), d, d, dtype)
        else:
            raise ValueError(cfg.gnn_type)
        # post-layer BN (gnn.py applies BN after each conv)
        lp["out_bn_scale"] = jnp.ones(d, dtype)
        lp["out_bn_bias"] = jnp.zeros(d, dtype)
        layers.append(lp)
    p["layers"] = layers

    if cfg.virtual_node:
        p["vn_emb"] = jnp.zeros((d,), dtype)
        # Sequential(Linear, BN, ReLU, Linear, BN, ReLU) per VN update
        # (conv.py:189-190)
        p["vn_mlps"] = [
            {"l1": linear_init(next(ks), d, 2 * d, dtype=dtype),
             "bn1_scale": jnp.ones(2 * d, dtype),
             "bn1_bias": jnp.zeros(2 * d, dtype),
             "l2": linear_init(next(ks), 2 * d, d, dtype=dtype),
             "bn2_scale": jnp.ones(d, dtype),
             "bn2_bias": jnp.zeros(d, dtype)}
            for _ in range(cfg.num_layers - 1)
        ]

    if cfg.gnn_type == "ggnn":
        # GGNN gated readout (gnn2.py:33-41): sigmoid(l([h,x])) * tanh(r([h,x]))
        p["cls_l"] = linear_init(next(ks), 2 * d, d, dtype=dtype)
        p["cls_r"] = linear_init(next(ks), 2 * d, d, dtype=dtype)

    if cfg.graph_pooling == "attention":
        p["pool_attn"] = linear_init(next(ks), d, 1, dtype=dtype)

    if cfg.num_class > 0:
        p["head"] = linear_init(next(ks), d, cfg.num_class, dtype=dtype)
    else:
        hw, hb = [], []
        for _ in range(cfg.max_seq_len):
            h = linear_init(next(ks), d, cfg.num_vocab, dtype=dtype)
            hw.append(h["w"]); hb.append(h["b"])
        p["head"] = {"w": jnp.stack(hw), "b": jnp.stack(hb)}
    return p


def _masked_bn(x, mask, scale, bias, eps=1e-5):
    m = mask.astype(x.dtype)[:, None]
    cnt = jnp.maximum(m.sum(), 1.0)
    mean = (x * m).sum(0) / cnt
    var = (((x - mean) ** 2) * m).sum(0) / cnt
    return ((x - mean) * jax.lax.rsqrt(var + eps) * scale + bias) * m


def _conv(lp, cfg: MPNNConfig, h, batch: DAGBatch, n1: int):
    src = jnp.asarray(batch.edge_src_flat)
    dst = jnp.asarray(batch.edge_dst_flat)
    emask = jnp.asarray(batch.edge_mask_flat)
    ea = jnp.asarray(batch.edge_attr).astype(h.dtype)
    ee = linear(lp["edge_encoder"], ea)
    nmask = jnp.asarray(batch.node_mask)

    if cfg.gnn_type == "gin":
        msg = jax.nn.relu(h[src] + ee)
        agg = segment_sum(msg, dst, n1, emask)
        z = linear(lp["mlp1"], (1 + lp["eps"]) * h + agg)
        z = _masked_bn(z, nmask, lp["bn_scale"], lp["bn_bias"])
        return linear(lp["mlp2"], jax.nn.relu(z))
    if cfg.gnn_type == "gcn":
        hw = linear(lp["linear"], h)
        ones = emask.astype(h.dtype)
        deg = segment_sum(ones, src, n1) + 1.0     # conv.py:53 deg over row
        dis = jnp.where(deg > 0, deg ** -0.5, 0.0)
        norm = dis[src] * dis[dst]
        msg = norm[:, None] * jax.nn.relu(hw[src] + ee)
        agg = segment_sum(msg, dst, n1, emask)
        return agg + jax.nn.relu(hw + lp["root_emb"]) / deg[:, None]
    if cfg.gnn_type == "gat":
        hds = cfg.heads
        dh = cfg.emb_dim // hds
        hw = linear(lp["w"], h).reshape(n1, hds, dh)
        a_src = (hw * lp["att_src"][None]).sum(-1)  # [N, H]
        a_dst = (hw * lp["att_dst"][None]).sum(-1)
        scores = jax.nn.leaky_relu(a_src[src] + a_dst[dst], 0.2)  # [E, H]
        out = []
        for k in range(hds):
            alpha = segment_softmax(scores[:, k], dst, n1, emask)
            out.append(segment_sum(hw[src, k] * alpha[:, None], dst, n1, emask))
        return jnp.concatenate(out, -1)
    if cfg.gnn_type == "ggnn":
        hh = h
        for t in range(cfg.timesteps):
            msg = linear(lp["step_w"][t], hh)[src] + ee
            agg = segment_sum(msg, dst, n1, emask)
            hh = gru_cell(lp["gru"], agg, hh)
        return hh
    raise ValueError(cfg.gnn_type)


def mpnn_forward(params, cfg: MPNNConfig, batch: DAGBatch,
                 rng: Optional[jax.Array] = None, train: bool = False):
    """Node embedding stack + pooling + heads (gnn.py:11-94 skeleton)."""
    x = encode(params["encoder"], cfg.encoder, batch.x,
               batch.extras.get("node_depth"))
    x = jnp.where(jnp.asarray(batch.node_mask)[:, None], x, 0)
    n1 = x.shape[0]
    G = batch.num_graph_slots
    gid = jnp.asarray(batch.graph_id)
    nmask = jnp.asarray(batch.node_mask)

    vn = None
    if cfg.virtual_node:
        vn = jnp.broadcast_to(params["vn_emb"], (G + 1, cfg.emb_dim))

    # real-graph mask for VN batch norms (pad slots excluded)
    gmask = jnp.concatenate([jnp.asarray(batch.graph_mask),
                             jnp.zeros((1,), bool)]) \
        if cfg.virtual_node else None

    hs = [x]
    h = x
    for li, lp in enumerate(params["layers"]):
        if vn is not None:
            h = h + vn[gid]
        h_in = h  # pre-conv state (VN message added) — conv.py:204 h_list
        h2 = _conv(lp, cfg, h_in, batch, n1)
        h2 = _masked_bn(h2, nmask, lp["out_bn_scale"], lp["out_bn_bias"])
        if li < cfg.num_layers - 1:
            h2 = jax.nn.relu(h2)
        if train and cfg.dropout > 0 and rng is not None:
            rng, k = jax.random.split(rng)
            keep = 1 - cfg.dropout
            h2 = h2 * jax.random.bernoulli(k, keep, h2.shape) / keep
        if cfg.residual:
            h2 = h2 + h_in
        if vn is not None and li < cfg.num_layers - 1:
            # VN update pools the PRE-conv states (conv.py:223)
            pooled = segment_sum(h_in, gid, G + 1, nmask) + vn
            mlp = params["vn_mlps"][li]
            z = linear(mlp["l1"], pooled)
            z = jax.nn.relu(_masked_bn(z, gmask, mlp["bn1_scale"],
                                       mlp["bn1_bias"]))
            z = linear(mlp["l2"], z)
            z = jax.nn.relu(_masked_bn(z, gmask, mlp["bn2_scale"],
                                       mlp["bn2_bias"]))
            if train and cfg.dropout > 0 and rng is not None:
                rng, k = jax.random.split(rng)
                keep = 1 - cfg.dropout
                z = z * jax.random.bernoulli(k, keep, z.shape) / keep
            vn = vn + z if cfg.residual else z
        h = h2
        hs.append(h)

    h_node = sum(hs[1:]) if cfg.jk == "sum" else hs[-1]

    if cfg.gnn_type == "ggnn":
        hx = jnp.concatenate([h_node, x], -1)
        h_node = jax.nn.sigmoid(linear(params["cls_l"], hx)) * jnp.tanh(
            linear(params["cls_r"], hx))
        pool_kind = "add"
    else:
        pool_kind = {"attention": "attn"}.get(cfg.graph_pooling, cfg.graph_pooling)

    out = pool_nodes(h_node, gid, G, pool_kind, mask=nmask,
                     attn_params=params.get("pool_attn"), attn_compat=False)

    head = params["head"]
    if cfg.num_class > 0:
        return linear(head, out)
    return jnp.einsum("gd,svd->gsv", out, head["w"]) + head["b"][None]


# --- trivial baselines (reference model/baselines.py) ----------------------

def guess_node_one_token(batch: DAGBatch, attridx2vocabidx: Dict[int, int],
                         num_vocab: int, max_seq_len: int) -> np.ndarray:
    """Predict position 0 as the attr-token of the node after each root
    (baselines.py:8-43): one-hot where mappable, zeros elsewhere."""
    depth = np.asarray(batch.extras["node_depth"]).reshape(-1)
    roots = np.flatnonzero((depth == 0) & np.asarray(batch.node_mask))
    G = batch.num_graph_slots
    out = np.zeros((G, max_seq_len, num_vocab), np.float32)
    x = np.asarray(batch.x)
    gid = np.asarray(batch.graph_id)
    for r in roots:
        g = gid[r]
        if g >= G or r + 1 >= len(gid) or gid[r + 1] != g:
            continue
        attr = int(x[r + 1, 1])
        if attr in attridx2vocabidx:
            out[g, 0, attridx2vocabidx[attr]] = 1.0
    return out


def guess_tokens_by_occurrence(batch: DAGBatch, attridx2vocabidx: Dict[int, int],
                               num_vocab: int, max_seq_len: int,
                               min_occ: int = 2) -> np.ndarray:
    """Predict the per-graph most frequent mappable attr tokens
    (baselines.py:45-88)."""
    G = batch.num_graph_slots
    out = np.full((G, max_seq_len, num_vocab), -1.0, np.float32)
    x = np.asarray(batch.x)
    gid = np.asarray(batch.graph_id)
    nmask = np.asarray(batch.node_mask)
    for g in range(int(batch.n_graph)):
        sel = (gid == g) & nmask
        counts = np.zeros(num_vocab, np.int64)
        for attr in x[sel, 1]:
            v = attridx2vocabidx.get(int(attr))
            if v is not None:
                counts[v] += 1
        for j in range(max_seq_len):
            tok = int(np.argmax(counts))
            if counts[tok] >= min_occ:
                out[g, j, tok] = 1.0
            counts[tok] = 0
    return out


def perfect_model(batch: DAGBatch, num_vocab: int, max_seq_len: int) -> np.ndarray:
    """Oracle upper bound: one-hot of the true y_arr (baselines.py:90-120)."""
    G = batch.num_graph_slots
    out = np.zeros((G, max_seq_len, num_vocab), np.float32)
    y = np.asarray(batch.y["y_arr"])
    for g in range(int(batch.n_graph)):
        for j in range(max_seq_len):
            out[g, j, int(y[g, j])] = 1.0
    return out
