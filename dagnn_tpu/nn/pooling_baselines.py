"""Hierarchical / sort-pooling baseline GNNs (static-shape, mask-based).

TPU-native re-designs of the reference's pooling baselines (reference:
ogbg-code/model/gnn2.py:243-440 DGCNN, :453-563 DiffPoolGNN, :585-650 UNet,
:654-728 SAGPoolGNN; ogbg-code/model/asap.py ASAP). The reference relies on
PyG ops that FILTER nodes/edges to data-dependent shapes (topk_pool,
SAGPooling, ASAPooling) — impossible under XLA's static-shape compilation.
Here every pooling stage keeps the full [N] node axis and narrows a boolean
KEEP MASK instead: dropped nodes are zeroed and excluded from segment ops,
edges with a dropped endpoint are masked. Results are equivalent up to the
documented deviations:

  * UNet: no A^2 adjacency augmentation between depths (PyG GraphUNet
    augment_adj) — edges are reused masked.
  * ASAP: cluster fitness + attention follow ASAPooling, but the pooled
    graph keeps the original edges restricted to retained nodes instead of
    the S^T A S reconnection.
  * BatchNorm uses masked batch statistics (same policy as nn/baselines.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from dagnn_tpu.dag.batch import DAGBatch
from dagnn_tpu.nn.encoders import EncoderSpec, encoder_init, encode
from dagnn_tpu.ops.linear import linear, linear_init
from dagnn_tpu.ops.segment import segment_sum, segment_max, segment_softmax


@dataclasses.dataclass(frozen=True)
class HPoolConfig:
    kind: str = "dgcnn"          # dgcnn | diffpool | unet | sagpool | asap
    emb_dim: int = 300
    num_vocab: int = 5002
    max_seq_len: int = 5
    num_class: int = 0
    num_rels: int = 2
    encoder: EncoderSpec = EncoderSpec()
    dropout: float = 0.5
    # dgcnn / unet (gnn2.py:247-250, :586-592)
    num_layers: int = 3
    k: int = 30                   # sort-pool size
    hidden: int = 32              # dgcnn latent width (gnn2.py:256)
    conv1d_channels: tuple = (16, 32)
    conv1d_kw: int = 5
    # diffpool (gnn2.py:463-487)
    max_nodes: int = 1000         # dense per-graph node cap
    # sagpool / asap
    pooling_ratio: float = 0.5    # gnn2.py:654; asap.py ratio=0.8
    asap_hidden: int = 300

    @property
    def total_latent_dim(self) -> int:
        # dgcnn latent dims: [hidden]*num_layers + [1] (gnn2.py:257)
        return self.hidden * self.num_layers + 1

    @property
    def dense_dim(self) -> int:
        d = (self.k - 2) // 2 + 1
        return (d - self.conv1d_kw + 1) * self.conv1d_channels[1]


# ---------------------------------------------------------------------------
# shared mask-based primitives


def _graph_starts(gid, G, nmask):
    """Start index of each graph's contiguous node range."""
    counts = segment_sum(nmask.astype(jnp.int32), gid, G + 1)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts).astype(jnp.int32)])
    return starts[:-1], counts  # [G+1], [G+1]


def _ranks_by_score(score, gid, G, keep):
    """Rank (0 = best) of each node within its graph by descending score,
    counting only currently-kept nodes; dropped/pad nodes rank last."""
    n1 = score.shape[0]
    s = jnp.where(keep, score, -jnp.inf)
    order = jnp.lexsort((-s, gid))          # stable: (graph, score desc)
    starts, _ = _graph_starts(gid, G, keep)
    # position within the graph block among KEPT nodes: pad/dropped nodes of
    # a graph sort after its kept ones, so rank = sorted position - start
    g_sorted = gid[order]
    all_starts, _ = _graph_starts(gid, G, jnp.ones_like(keep))
    rank_sorted = jnp.arange(n1, dtype=jnp.int32) - all_starts[g_sorted]
    # dropped nodes within the graph still occupy later positions -> their
    # rank >= kept count, which the caller's threshold excludes
    ranks = jnp.zeros(n1, jnp.int32).at[order].set(rank_sorted)
    return ranks, order


def topk_mask(score, gid, G, ratio, keep):
    """Per-graph top-ceil(ratio*kept) mask (TopKPooling/SAGPooling select)."""
    ranks, _ = _ranks_by_score(score, gid, G, keep)
    _, counts = _graph_starts(gid, G, keep)
    quota = jnp.ceil(ratio * counts.astype(jnp.float32)).astype(jnp.int32)
    return keep & (ranks < quota[gid])


def _edge_keep(batch: DAGBatch, keep):
    src = jnp.asarray(batch.edge_src_flat)
    dst = jnp.asarray(batch.edge_dst_flat)
    em = jnp.asarray(batch.edge_mask_flat) & keep[src] & keep[dst]
    return src, dst, em


def _gcn_conv(lp, h, src, dst, em, n1, act=None):
    """Classic GCNConv: D^-1/2 (A+I) D^-1/2 X W (PyG GCNConv semantics)."""
    hw = linear(lp, h)
    ones = em.astype(h.dtype)
    deg = segment_sum(ones, dst, n1) + 1.0
    dis = deg ** -0.5
    msg = (dis[src] * dis[dst])[:, None] * hw[src]
    return segment_sum(msg, dst, n1, em) + hw * (1.0 / deg)[:, None]


def _graph_conv_mean(lp, h, src, dst, em, n1, edge_weight=None):
    """PyG GraphConv(aggr='mean'): W1 x + W2 mean_j(w_ij x_j)."""
    w = em.astype(h.dtype) if edge_weight is None else edge_weight * em
    msg = w[:, None] * h[src]
    s = segment_sum(msg, dst, n1, em)
    cnt = jnp.maximum(segment_sum(w, dst, n1, em), 1.0)
    return linear(lp["root"], h) + linear(lp["rel"], s / cnt[:, None])


def _masked_bn(x, mask, scale, bias, eps=1e-5):
    m = mask.astype(x.dtype)[..., None]
    cnt = jnp.maximum(m.sum(), 1.0)
    mean = (x * m).reshape(-1, x.shape[-1]).sum(0) / cnt
    var = (((x - mean) ** 2) * m).reshape(-1, x.shape[-1]).sum(0) / cnt
    return ((x - mean) * jax.lax.rsqrt(var + eps) * scale + bias) * m


def _gmp_gap(h, gid, G, keep):
    mx = segment_max(h, gid, G + 1, keep)[:G]
    s = segment_sum(h, gid, G + 1, keep)[:G]
    cnt = jnp.maximum(segment_sum(keep.astype(h.dtype), gid, G + 1)[:G], 1.0)
    return jnp.concatenate([mx, s / cnt[:, None]], -1)


def _heads_init(ks, cfg: HPoolConfig, in_dim, dtype):
    if cfg.num_class > 0:
        return linear_init(next(ks), in_dim, cfg.num_class, dtype=dtype)
    hw, hb = [], []
    for _ in range(cfg.max_seq_len):
        h = linear_init(next(ks), in_dim, cfg.num_vocab, dtype=dtype)
        hw.append(h["w"]); hb.append(h["b"])
    return {"w": jnp.stack(hw), "b": jnp.stack(hb)}


def _apply_heads(head, cfg: HPoolConfig, out):
    if cfg.num_class > 0:
        return linear(head, out)
    return jnp.einsum("gd,svd->gsv", out, head["w"]) + head["b"][None]


# ---------------------------------------------------------------------------
# DGCNN: GCN stack -> global sort pool -> 1d convs (gnn2.py:243-360)


def _sort_pool(h, sort_key, gid, G, nmask, k):
    """Top-k nodes per graph by sort_key desc, features in rank order,
    zero-padded (PyG global_sort_pool)."""
    n1 = h.shape[0]
    s = jnp.where(nmask, sort_key, -jnp.inf)
    order = jnp.lexsort((-s, gid))
    starts, counts = _graph_starts(gid, G, jnp.ones_like(nmask))
    j = jnp.arange(k, dtype=jnp.int32)
    gpos = starts[:G, None] + j[None]                      # [G, k]
    _, kept_counts = _graph_starts(gid, G, nmask)
    valid = j[None] < jnp.minimum(kept_counts[:G, None], k)
    flat = order[jnp.clip(gpos, 0, n1 - 1)]
    return h[flat] * valid[..., None].astype(h.dtype)      # [G, k, D]


def _dgcnn_stack_init(ks, cfg: HPoolConfig, in_dim, dtype):
    dims = [cfg.hidden] * cfg.num_layers + [1]
    convs, prev = [], in_dim
    for d in dims:
        convs.append(linear_init(next(ks), prev, d, dtype=dtype))
        prev = d
    return convs


def _dgcnn_stack(convs, h, src, dst, em, n1):
    outs = []
    for lp in convs:
        h = jnp.tanh(_gcn_conv(lp, h, src, dst, em, n1))
        outs.append(h)
    return jnp.concatenate(outs, -1)  # [N, total_latent_dim]


def _conv1d_head_init(ks, cfg: HPoolConfig, dtype):
    c1, c2 = cfg.conv1d_channels
    return {
        # conv1: kernel = total_latent_dim, stride same -> per-node linear
        "c1": linear_init(next(ks), cfg.total_latent_dim, c1, dtype=dtype),
        "c2w": jax.random.normal(next(ks), (cfg.conv1d_kw, c1, c2), dtype)
               * math.sqrt(2.0 / (cfg.conv1d_kw * c1)),
        "c2b": jnp.zeros(c2, dtype),
    }


def _conv1d_head(p, pooled, cfg: HPoolConfig):
    """[G, k, D] -> conv1(k=D,s=D) -> relu -> maxpool(2,2) -> conv2 -> relu
    -> flatten (gnn2.py:327-339)."""
    G, k, _ = pooled.shape
    z = jax.nn.relu(linear(p["c1"], pooled))              # [G, k, c1]
    z = z[:, : (k // 2) * 2].reshape(G, k // 2, 2, -1).max(2)
    # valid conv over length with window kw
    z = jax.lax.conv_general_dilated(
        z, p["c2w"], (1,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC")) + p["c2b"]
    z = jax.nn.relu(z)
    return z.reshape(G, -1)                                # [G, dense_dim]


# ---------------------------------------------------------------------------
# DiffPool: dense SAGE blocks + soft cluster assignment (gnn2.py:453-563)


def _dense_from_batch(x, gid, G, nmask, nmax):
    n1 = x.shape[0]
    starts, _ = _graph_starts(gid, G, jnp.ones_like(nmask))
    pos = jnp.arange(n1, dtype=jnp.int32) - starts[gid]
    ok = nmask & (pos < nmax) & (gid < G)
    g = jnp.where(ok, gid, G)
    p = jnp.where(ok, pos, 0)
    dense = jnp.zeros((G + 1, nmax) + x.shape[1:], x.dtype)
    dense = dense.at[g, p].set(jnp.where(ok[:, None], x, 0))
    dmask = jnp.zeros((G + 1, nmax), bool).at[g, p].set(ok)
    return dense[:G], dmask[:G], pos, ok


def _dense_adj(batch: DAGBatch, gid, pos, ok, G, nmax, dtype):
    src = jnp.asarray(batch.edge_src_flat)
    dst = jnp.asarray(batch.edge_dst_flat)
    em = jnp.asarray(batch.edge_mask_flat) & ok[src] & ok[dst]
    g = jnp.where(em, gid[src], G)
    adj = jnp.zeros((G + 1, nmax, nmax), dtype)
    adj = adj.at[g, pos[src], pos[dst]].add(em.astype(dtype))
    return adj[:G]


def _dense_sage_init(ks, in_dim, out, dtype):
    return {"rel": linear_init(next(ks), in_dim, out, dtype=dtype),
            "root": linear_init(next(ks), in_dim, out, dtype=dtype),
            "bn_s": jnp.ones(out, dtype), "bn_b": jnp.zeros(out, dtype)}


def _dense_sage(lp, x, adj, mask):
    deg = jnp.maximum(adj.sum(-1, keepdims=True), 1.0)
    out = linear(lp["rel"], adj @ x / deg) + linear(lp["root"], x)
    return out


def _dense_gnn_init(ks, in_dim, hidden, out, dtype):
    return [_dense_sage_init(ks, in_dim, hidden, dtype),
            _dense_sage_init(ks, hidden, hidden, dtype),
            _dense_sage_init(ks, hidden, out, dtype)]


def _dense_gnn(block, x, adj, mask):
    outs = []
    for lp in block:
        x = jax.nn.relu(_dense_sage(lp, x, adj, mask))
        x = _masked_bn(x, mask, lp["bn_s"], lp["bn_b"])
        outs.append(x)
    return jnp.concatenate(outs, -1)   # [G, n, 2*hidden+out]


def _diff_pool(x, adj, s, mask=None):
    s = jax.nn.softmax(s, -1)
    if mask is not None:
        s = s * mask[..., None].astype(s.dtype)
    x2 = jnp.einsum("gnc,gnd->gcd", s, x)
    adj2 = jnp.einsum("gnc,gnm,gmd->gcd", s, adj, s)
    return x2, adj2


# ---------------------------------------------------------------------------
# init / forward dispatch


def hpool_init(key, cfg: HPoolConfig, dtype=jnp.float32) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 512))
    d = cfg.emb_dim
    p: Dict[str, Any] = {"encoder": encoder_init(next(ks), cfg.encoder, dtype)}

    if cfg.kind == "dgcnn":
        p["convs"] = _dgcnn_stack_init(ks, cfg, d + cfg.num_rels, dtype)
        p["conv1d"] = _conv1d_head_init(ks, cfg, dtype)
        p["head"] = _heads_init(ks, cfg, cfg.dense_dim, dtype)
    elif cfg.kind == "unet":
        # GraphUNet(depth=4, ratios .9/.7/.6/.5, out=total_latent_dim):
        # in-conv, 4x (gPool + GCN d->d), 3 up GCN d->d + final d->out
        p["in_gcn"] = linear_init(next(ks), d + cfg.num_rels, d, dtype=dtype)
        p["down"] = [{
            "p": jax.random.normal(next(ks), (d,), dtype) / math.sqrt(d),
            "gcn": linear_init(next(ks), d, d, dtype=dtype)}
            for _ in range(4)]
        p["up"] = [linear_init(next(ks), d, d, dtype=dtype) for _ in range(3)] \
            + [linear_init(next(ks), d, cfg.total_latent_dim, dtype=dtype)]
        p["conv1d"] = _conv1d_head_init(ks, cfg, dtype)
        p["head"] = _heads_init(ks, cfg, cfg.dense_dim, dtype)
    elif cfg.kind == "diffpool":
        c1 = math.ceil(0.25 * cfg.max_nodes)
        c2 = math.ceil(0.25 * c1)
        w = 3 * d  # 2*hidden + embedding, all = emb_dim
        p["gnn1_pool"] = _dense_gnn_init(ks, d, d, c1, dtype)
        p["gnn1_embed"] = _dense_gnn_init(ks, d, d, d, dtype)
        p["gnn2_pool"] = _dense_gnn_init(ks, w, d, c2, dtype)
        p["gnn2_embed"] = _dense_gnn_init(ks, w, d, d, dtype)
        p["gnn3_embed"] = _dense_gnn_init(ks, w, d, d, dtype)
        p["lin1"] = linear_init(next(ks), w, d, dtype=dtype)
        p["head"] = _heads_init(ks, cfg, d, dtype)
    elif cfg.kind == "sagpool":
        p["convs"] = [linear_init(next(ks), d, d, dtype=dtype)
                      for _ in range(cfg.num_layers)]
        p["scores"] = [linear_init(next(ks), d, 1, dtype=dtype)
                       for _ in range(cfg.num_layers)]
        p["lin1"] = linear_init(next(ks), 2 * d, d, dtype=dtype)
        p["lin2"] = linear_init(next(ks), d, d, dtype=dtype)
        p["head"] = _heads_init(ks, cfg, d, dtype)
    elif cfg.kind == "asap":
        h = cfg.asap_hidden
        p["conv1"] = {"root": linear_init(next(ks), d, h, dtype=dtype),
                      "rel": linear_init(next(ks), d, h, dtype=dtype)}
        p["convs"] = [{"root": linear_init(next(ks), h, h, dtype=dtype),
                       "rel": linear_init(next(ks), h, h, dtype=dtype)}
                      for _ in range(cfg.num_layers - 1)]
        p["pools"] = [{
            "att": linear_init(next(ks), 2 * h, 1, dtype=dtype),
            "gnn_score": {  # LEConv for fitness
                "w1": linear_init(next(ks), h, 1, dtype=dtype),
                "w2": linear_init(next(ks), h, 1, dtype=dtype),
                "w3": linear_init(next(ks), h, 1, dtype=dtype)},
        } for _ in range(cfg.num_layers // 2)]
        p["lin1"] = linear_init(next(ks), cfg.num_layers * h, h, dtype=dtype)
        p["head"] = _heads_init(ks, cfg, h, dtype)
    else:
        raise ValueError(cfg.kind)
    return p


def _edge_feat_concat(x, batch: DAGBatch, n1):
    """DGCNN prologue: concat per-node sums of incident edge attrs
    (gnn2.py:309-315 scatters each edge's feature to BOTH endpoints)."""
    if batch.edge_attr is None:
        return x
    src = jnp.asarray(batch.edge_src_flat)
    dst = jnp.asarray(batch.edge_dst_flat)
    em = jnp.asarray(batch.edge_mask_flat)
    ea = jnp.asarray(batch.edge_attr).astype(x.dtype)
    pooled = segment_sum(ea, src, n1, em) + segment_sum(ea, dst, n1, em)
    return jnp.concatenate([x, pooled], -1)


def hpool_forward(params, cfg: HPoolConfig, batch: DAGBatch,
                  rng: Optional[jax.Array] = None, train: bool = False):
    x = encode(params["encoder"], cfg.encoder, batch.x,
               batch.extras.get("node_depth"))
    nmask = jnp.asarray(batch.node_mask)
    x = jnp.where(nmask[:, None], x, 0)
    n1 = x.shape[0]
    G = batch.num_graph_slots
    gid = jnp.asarray(batch.graph_id)

    def drop(v, r):
        if train and cfg.dropout > 0 and r is not None:
            keep = 1 - cfg.dropout
            return v * jax.random.bernoulli(r, keep, v.shape) / keep
        return v

    if cfg.kind == "dgcnn":
        h = _edge_feat_concat(x, batch, n1)
        src, dst, em = _edge_keep(batch, nmask)
        h = _dgcnn_stack(params["convs"], h, src, dst, em, n1)
        pooled = _sort_pool(h, h[:, -1], gid, G, nmask, cfg.k)
        out = _conv1d_head(params["conv1d"], pooled, cfg)
        return _apply_heads(params["head"], cfg, out)

    if cfg.kind == "unet":
        h = _edge_feat_concat(x, batch, n1)
        src, dst, em0 = _edge_keep(batch, nmask)
        h = _gcn_conv(params["in_gcn"], h, src, dst, em0, n1)
        ratios = (0.9, 0.7, 0.6, 0.5)
        keep = nmask
        skips, keeps = [], []
        for i, dp in enumerate(params["down"]):
            skips.append(h); keeps.append(keep)
            # gPool: score = x.p/|p|, keep top-ratio, gate by tanh(score)
            y = h @ dp["p"] / jnp.linalg.norm(dp["p"])
            keep = topk_mask(y, gid, G, ratios[i], keep)
            h = h * (jnp.tanh(y) * keep.astype(h.dtype))[:, None]
            em = jnp.asarray(batch.edge_mask_flat) & keep[src] & keep[dst]
            h = jax.nn.relu(_gcn_conv(dp["gcn"], h, src, dst, em, n1))
        for i in range(3, -1, -1):
            # unpool is free under masking: dropped rows are already zero
            res, rkeep = skips[i], keeps[i]
            h = res * rkeep.astype(h.dtype)[:, None] + h
            em = jnp.asarray(batch.edge_mask_flat) & rkeep[src] & rkeep[dst]
            h = _gcn_conv(params["up"][3 - i], h, src, dst, em, n1)
            if i > 0:
                h = jax.nn.relu(h)
            keep = rkeep
        pooled = _sort_pool(h, h[:, -1], gid, G, nmask, cfg.k)
        out = _conv1d_head(params["conv1d"], pooled, cfg)
        return _apply_heads(params["head"], cfg, out)

    if cfg.kind == "diffpool":
        nm = cfg.max_nodes
        dx, dmask, pos, ok = _dense_from_batch(x, gid, G, nmask, nm)
        adj = _dense_adj(batch, gid, pos, ok, G, nm, x.dtype)
        gm = jnp.asarray(batch.graph_mask)
        s = _dense_gnn_last(params["gnn1_pool"], dx, adj, dmask)
        z = _dense_gnn(params["gnn1_embed"], dx, adj, dmask)
        z, adj = _diff_pool(z, adj, s, dmask)
        # pooled levels are dense per graph, but PAD GRAPH slots must stay
        # out of the masked-BN statistics
        cmask = jnp.broadcast_to(gm[:, None], z.shape[:2])
        s = _dense_gnn_last(params["gnn2_pool"], z, adj, cmask)
        z2 = _dense_gnn(params["gnn2_embed"], z, adj, cmask)
        z2, adj = _diff_pool(z2, adj, s)
        z3 = _dense_gnn(params["gnn3_embed"], z2, adj,
                        jnp.broadcast_to(gm[:, None], z2.shape[:2]))
        out = z3.mean(1)
        out = jax.nn.relu(linear(params["lin1"], out))
        return _apply_heads(params["head"], cfg, out)

    if cfg.kind == "sagpool":
        src, dst, _ = _edge_keep(batch, nmask)
        keep = nmask
        h = x
        xs = None
        for i in range(cfg.num_layers):
            em = jnp.asarray(batch.edge_mask_flat) & keep[src] & keep[dst]
            h = jax.nn.relu(_gcn_conv(params["convs"][i], h, src, dst, em, n1))
            score = _gcn_conv(params["scores"][i], h, src, dst, em, n1)[:, 0]
            keep = topk_mask(score, gid, G, cfg.pooling_ratio, keep)
            h = h * (jnp.tanh(score) * keep.astype(h.dtype))[:, None]
            blk = _gmp_gap(h, gid, G, keep)
            xs = blk if xs is None else xs + blk
        out = jax.nn.relu(linear(params["lin1"], xs))
        if rng is not None:
            rng, k = jax.random.split(rng)
            out = drop(out, k)
        out = jax.nn.relu(linear(params["lin2"], out))
        return _apply_heads(params["head"], cfg, out)

    if cfg.kind == "asap":
        src, dst, _ = _edge_keep(batch, nmask)
        keep = nmask
        h = jax.nn.relu(_graph_conv_mean(
            params["conv1"], x, src, dst,
            jnp.asarray(batch.edge_mask_flat) & keep[src] & keep[dst], n1))
        gs = [_mean_pool(h, gid, G, keep)]
        pool_i = 0
        for i, cp in enumerate(params["convs"]):
            em = jnp.asarray(batch.edge_mask_flat) & keep[src] & keep[dst]
            h = jax.nn.relu(_graph_conv_mean(cp, h, src, dst, em, n1))
            gs.append(_mean_pool(h, gid, G, keep))
            if i % 2 == 0 and i < len(params["convs"]) - 1:
                pp = params["pools"][pool_i]; pool_i += 1
                h, keep = _asap_pool(pp, cfg, h, src, dst, em, keep, gid, G, n1)
        out = jax.nn.relu(linear(params["lin1"], jnp.concatenate(gs, -1)))
        if rng is not None:
            rng, k = jax.random.split(rng)
            out = drop(out, k)
        return _apply_heads(params["head"], cfg, out)

    raise ValueError(cfg.kind)


def _dense_gnn_last(block, x, adj, mask):
    """Run a dense GNN block and return only its final layer's output
    (cluster-assignment logits use the out-width layer, gnn2.py:523-529
    GNN(..., lin=True) applies a linear over the concat; we use the final
    conv directly — same width, one fused map)."""
    for lp in block[:-1]:
        x = jax.nn.relu(_dense_sage(lp, x, adj, mask))
        x = _masked_bn(x, mask, lp["bn_s"], lp["bn_b"])
    return _dense_sage(block[-1], x, adj, mask)


def _mean_pool(h, gid, G, keep):
    s = segment_sum(h, gid, G + 1, keep)[:G]
    cnt = jnp.maximum(segment_sum(keep.astype(h.dtype), gid, G + 1)[:G], 1.0)
    return s / cnt[:, None]


def _asap_pool(pp, cfg: HPoolConfig, h, src, dst, em, keep, gid, G, n1):
    """ASAPooling: 1-hop cluster attention -> LEConv fitness -> top-ratio
    keep; pooled nodes carry their cluster representation scaled by fitness
    (asap.py via torch_geometric.nn.ASAPooling)."""
    # master query m_i = max over {i} U in-neighbors of h_j
    m = segment_max(h[src], dst, n1, em)
    m = jnp.maximum(m, h)                      # include self
    # attention over cluster members (edges + self loop)
    cat = jnp.concatenate([m[dst], h[src]], -1)
    e_score = jax.nn.leaky_relu(linear(pp["att"], cat)[:, 0], 0.2)
    self_score = jax.nn.leaky_relu(
        linear(pp["att"], jnp.concatenate([m, h], -1))[:, 0], 0.2)
    # softmax over {self} U neighbors: shift by segment max including self
    mx = jnp.maximum(segment_max(e_score, dst, n1, em), self_score)
    ee = jnp.where(em, jnp.exp(e_score - mx[dst]), 0.0)
    se = jnp.exp(self_score - mx)
    denom = segment_sum(ee, dst, n1, em) + se
    hc = (segment_sum(ee[:, None] * h[src], dst, n1, em)
          + se[:, None] * h) / denom[:, None]
    # LEConv fitness: W1 x_i + sum_j (W2 x_i - W3 x_j) over in-neighbors
    deg = segment_sum(em.astype(h.dtype), dst, n1)
    a = linear(pp["gnn_score"]["w1"], hc)[:, 0]
    b = deg * linear(pp["gnn_score"]["w2"], hc)[:, 0]
    c = segment_sum(linear(pp["gnn_score"]["w3"], hc)[src, 0], dst, n1, em)
    fitness = jax.nn.sigmoid(a + b - c)
    keep2 = topk_mask(fitness, gid, G, cfg.pooling_ratio, keep)
    h2 = hc * (fitness * keep2.astype(h.dtype))[:, None]
    return h2, keep2
