"""Hierarchical / sort-pooling baseline GNNs (static-shape, mask-based).

TPU-native re-designs of the reference's pooling baselines (reference:
ogbg-code/model/gnn2.py:243-440 DGCNN, :453-563 DiffPoolGNN, :585-650 UNet,
:654-728 SAGPoolGNN; ogbg-code/model/asap.py ASAP). The reference relies on
PyG ops that FILTER nodes/edges to data-dependent shapes (topk_pool,
SAGPooling, ASAPooling) — impossible under XLA's static-shape compilation.

Two static-shape strategies replace them, chosen per model:

- SPARSE + KEEP MASK (DGCNN, SAGPool): the full [N] node axis is kept and
  pooling narrows a boolean mask; dropped nodes are zeroed and excluded
  from segment ops, edges with a dropped endpoint are masked. Exact:
  PyG's filter+relabel only renames indices.
- DENSE PER-GRAPH (DiffPool, UNet, ASAP): graphs are padded to a static
  [G, n_dense] node axis with a dense (weighted) adjacency, so the ops the
  sparse view cannot express stay exact: UNet's (A+I)^2 adjacency
  augmentation between depths (PyG GraphUNet.augment_adj) and ASAP's
  S^T A S cluster reconnection (both batched matmuls at static shapes).

All five are golden-tested against the ACTUAL reference files executing
through tests/pyg_shim.py + pyg_shim_layers.py (PyG-1.6 layer surface).
Known semantic notes (verbatim-execution verified):

- DiffPool's BatchNorms flatten the DENSE [G, n, c] batch — train-mode
  statistics include the zero padding rows (gnn2.py:543-549). Reproduced;
  the only residual gap is that our static n_dense may exceed the
  reference's per-batch max node count, adding more zero rows to the
  statistics (goldens pin n_dense to the batch max; real corpora bucket).
- ASAPooling runs with add_self_loops=False: the reconnected adjacency
  has its diagonal removed; GraphConv(aggr='mean') divides by in-edge
  COUNT (PyG scatter-mean), with messages edge-weight scaled.
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
    # diffpool cluster-count base (gnn2.py:456 max_nodes=1000)
    max_nodes: int = 1000
    # static per-graph node cap for the DENSE models (diffpool/unet/asap);
    # the reference's to_dense_batch uses the batch max — set loaders'
    # buckets accordingly
    dense_nodes: int = 256
    # sagpool / asap
    pooling_ratio: float = 0.5    # gnn2.py:654; asap.py ratio=0.8
    asap_ratio: float = 0.8
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
# shared sparse mask-based primitives


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
    g_sorted = gid[order]
    all_starts, _ = _graph_starts(gid, G, jnp.ones_like(keep))
    rank_sorted = jnp.arange(n1, dtype=jnp.int32) - all_starts[g_sorted]
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


def _gcn_conv(lp, h, src, dst, em, n1, keep=None):
    """PyG GCNConv (fill 1): D^-1/2 (A+I) D^-1/2 X W + b. `keep` masks the
    self-loop term for dropped nodes."""
    hw = h @ lp["w"].T
    ones = em.astype(h.dtype)
    deg = segment_sum(ones, dst, n1) + 1.0
    dis = deg ** -0.5
    msg = (dis[src] * dis[dst])[:, None] * hw[src]
    out = segment_sum(msg, dst, n1, em) + hw * (1.0 / deg)[:, None]
    if keep is not None:
        out = out * keep.astype(h.dtype)[:, None]
    if "b" in lp:
        out = out + lp["b"]
    return out


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
    # flatten channel-major ([G, c2, L] order) like torch's
    # conv1d_res.view(G, -1) — the head weights index this layout
    return z.transpose(0, 2, 1).reshape(G, -1)             # [G, dense_dim]


# ---------------------------------------------------------------------------
# dense per-graph machinery (diffpool / unet / asap)


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


def _dense_topk(score, dmask, ratio):
    """Per-graph top-ceil(ratio*kept) over the dense node axis."""
    s = jnp.where(dmask, score, -jnp.inf)
    order = jnp.argsort(-s, axis=1)
    ranks = jnp.zeros_like(order).at[
        jnp.arange(s.shape[0])[:, None], order].set(
        jnp.broadcast_to(jnp.arange(s.shape[1])[None], s.shape))
    quota = jnp.ceil(
        ratio * dmask.sum(1).astype(jnp.float32)).astype(jnp.int32)
    return dmask & (ranks < quota[:, None])


def _dense_gcn(lp, x, adj, dmask, fill):
    """GCNConv on a dense weighted adjacency: D^-1/2 (A + fill*I) D^-1/2
    X W + b (PyG gcn_norm; fill 2 = improved, GraphUNet's convs)."""
    m = dmask.astype(x.dtype)
    A = adj * m[:, :, None] * m[:, None, :]
    eye = jnp.eye(adj.shape[1], dtype=x.dtype)[None] * fill * m[:, :, None]
    A = A + eye
    deg = A.sum(-1)
    dis = jnp.where(deg > 0, deg ** -0.5, 0.0)
    An = dis[:, :, None] * A * dis[:, None, :]
    out = An @ (x @ lp["w"].T)
    if "b" in lp:
        out = out + lp["b"]
    return out * m[:, :, None]


# --------------------------------------------------------------- DiffPool


def _dense_sage_init(ks, in_dim, out, dtype):
    # PyG DenseSAGEConv: lin_rel has NO bias, lin_root has the bias
    return {"rel": linear_init(next(ks), in_dim, out, bias=False,
                               dtype=dtype),
            "root": linear_init(next(ks), in_dim, out, dtype=dtype),
            "bn_s": jnp.ones(out, dtype), "bn_b": jnp.zeros(out, dtype)}


def _dense_sage(lp, x, adj, mask):
    deg = jnp.maximum(adj.sum(-1, keepdims=True), 1.0)
    out = linear(lp["rel"], adj @ x / deg) + linear(lp["root"], x)
    if mask is not None:
        out = out * mask[..., None].astype(x.dtype)
    return out


def _dense_bn_all(x, scale, bias, eps=1e-5):
    """BatchNorm over the FLATTENED dense batch — the reference flattens
    [G, n, c] to [G*n, c] (gnn2.py:543-549), so train-mode statistics
    include the zero padding rows. Reproduced exactly."""
    flat = x.reshape(-1, x.shape[-1])
    mean = flat.mean(0)
    var = ((flat - mean) ** 2).mean(0)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _dense_gnn_init(ks, in_dim, hidden, out, dtype, lin=False):
    p = {"convs": [_dense_sage_init(ks, in_dim, hidden, dtype),
                   _dense_sage_init(ks, hidden, hidden, dtype),
                   _dense_sage_init(ks, hidden, out, dtype)]}
    if lin:
        p["lin"] = linear_init(next(ks), 2 * hidden + out, out, dtype=dtype)
    return p


def _dense_gnn(block, x, adj, mask):
    """gnn2.py:524-562 GNN: 3x (DenseSAGE -> relu -> BN), concat; with
    lin=True a final relu(linear(concat))."""
    outs = []
    for lp in block["convs"]:
        x = jax.nn.relu(_dense_sage(lp, x, adj, mask))
        x = _dense_bn_all(x, lp["bn_s"], lp["bn_b"])
        outs.append(x)
    x = jnp.concatenate(outs, -1)   # [G, n, 2*hidden+out]
    if "lin" in block:
        x = jax.nn.relu(linear(block["lin"], x))
    return x


def _diff_pool(x, adj, s, mask=None):
    s = jax.nn.softmax(s, -1)
    if mask is not None:
        m = mask[..., None].astype(s.dtype)
        x, s = x * m, s * m
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
        # GraphUNet(emb+num_rels, emb, total_latent_dim, depth=4,
        # ratios .9/.7/.6/.5) — gnn2.py:591; all convs improved GCN
        p["down"] = ([linear_init(next(ks), d + cfg.num_rels, d,
                                  dtype=dtype)]
                     + [linear_init(next(ks), d, d, dtype=dtype)
                        for _ in range(4)])
        p["pool_w"] = [jax.random.normal(next(ks), (d,), dtype)
                       / math.sqrt(d) for _ in range(4)]
        p["up"] = [linear_init(next(ks), d, d, dtype=dtype)
                   for _ in range(3)] \
            + [linear_init(next(ks), d, cfg.total_latent_dim, dtype=dtype)]
        p["conv1d"] = _conv1d_head_init(ks, cfg, dtype)
        p["head"] = _heads_init(ks, cfg, cfg.dense_dim, dtype)
    elif cfg.kind == "diffpool":
        c1 = math.ceil(0.25 * cfg.max_nodes)
        c2 = math.ceil(0.25 * c1)
        w = 3 * d  # 2*hidden + embedding, all = emb_dim
        p["gnn1_pool"] = _dense_gnn_init(ks, d, d, c1, dtype, lin=True)
        p["gnn1_embed"] = _dense_gnn_init(ks, d, d, d, dtype)
        p["gnn2_pool"] = _dense_gnn_init(ks, w, d, c2, dtype, lin=True)
        p["gnn2_embed"] = _dense_gnn_init(ks, w, d, d, dtype)
        p["gnn3_embed"] = _dense_gnn_init(ks, w, d, d, dtype)
        p["lin1"] = linear_init(next(ks), w, d, dtype=dtype)
        p["head"] = _heads_init(ks, cfg, d, dtype)
    elif cfg.kind == "sagpool":
        p["convs"] = [linear_init(next(ks), d, d, dtype=dtype)
                      for _ in range(cfg.num_layers)]
        # SAGPooling's scorer is a GraphConv(d -> 1, aggr=add) in PyG 1.6
        p["scores"] = [{"rel": linear_init(next(ks), d, 1, dtype=dtype),
                       "root": linear_init(next(ks), d, 1, bias=False,
                                           dtype=dtype)}
                       for _ in range(cfg.num_layers)]
        p["lin1"] = linear_init(next(ks), 2 * d, d, dtype=dtype)
        p["lin2"] = linear_init(next(ks), d, d, dtype=dtype)
        p["head"] = _heads_init(ks, cfg, d, dtype)
    elif cfg.kind == "asap":
        h = cfg.asap_hidden
        p["conv1"] = {"root": linear_init(next(ks), d, h, bias=False,
                                          dtype=dtype),
                      "rel": linear_init(next(ks), d, h, dtype=dtype)}
        p["convs"] = [{"root": linear_init(next(ks), h, h, bias=False,
                                           dtype=dtype),
                       "rel": linear_init(next(ks), h, h, dtype=dtype)}
                      for _ in range(cfg.num_layers - 1)]
        p["pools"] = [{
            "lin": linear_init(next(ks), h, h, dtype=dtype),
            "att": linear_init(next(ks), 2 * h, 1, dtype=dtype),
            # LEConv fitness: lin1/lin3 biased, lin2 not
            "le1": linear_init(next(ks), h, 1, dtype=dtype),
            "le2": linear_init(next(ks), h, 1, bias=False, dtype=dtype),
            "le3": linear_init(next(ks), h, 1, dtype=dtype),
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
        # dense so the inter-depth (A+I)^2 augmentation is exact
        nm = cfg.dense_nodes
        h0 = _edge_feat_concat(x, batch, n1)
        dx, dmask, pos, ok = _dense_from_batch(h0, gid, G, nmask, nm)
        adj = _dense_adj(batch, gid, pos, ok, G, nm, x.dtype)
        ratios = (0.9, 0.7, 0.6, 0.5)
        h = jax.nn.relu(_dense_gcn(params["down"][0], dx, adj, dmask, 2.0))
        keep = dmask
        skips = [(h, adj, keep)]
        for i in range(4):
            # augment_adj: (A~ + I)^2, diagonal removed (GraphUNet)
            m = keep.astype(h.dtype)
            A = adj * m[:, :, None] * m[:, None, :]
            A = A + jnp.eye(nm, dtype=h.dtype)[None] * m[:, :, None]
            A = jnp.einsum("gij,gjk->gik", A, A)
            A = A * (1.0 - jnp.eye(nm, dtype=h.dtype)[None])
            # TopKPooling: score = tanh(x.w/|w|), gate, filter
            w = params["pool_w"][i]
            y = jnp.tanh(h @ w / jnp.linalg.norm(w))
            keep = _dense_topk(y, keep, ratios[i])
            km = keep.astype(h.dtype)
            h = h * (y * km)[..., None]
            adj = A * km[:, :, None] * km[:, None, :]
            h = jax.nn.relu(_dense_gcn(params["down"][i + 1], h, adj,
                                       keep, 2.0))
            if i < 3:
                skips.append((h, adj, keep))
        for i in range(4):
            res, radj, rkeep = skips[3 - i]
            # unpool: kept slots retain their dense positions
            h = res + h * keep[..., None].astype(h.dtype)
            keep = rkeep
            h = _dense_gcn(params["up"][i], h, radj, keep, 2.0)
            if i < 3:
                h = jax.nn.relu(h)
        # back to sort-pool over the dense axis (zero-pad when k > n_dense)
        y = jnp.where(dmask, h[..., -1], -jnp.inf)
        kk = min(cfg.k, nm)
        order = jnp.argsort(-y, axis=1)[:, :kk]
        pooled = jnp.take_along_axis(h, order[..., None], axis=1)
        valid = jnp.take_along_axis(dmask, order, axis=1)
        j = jnp.arange(kk)[None]
        valid = valid & (j < dmask.sum(1, keepdims=True))
        pooled = pooled * valid[..., None].astype(h.dtype)
        if kk < cfg.k:
            pooled = jnp.pad(pooled, ((0, 0), (0, cfg.k - kk), (0, 0)))
        out = _conv1d_head(params["conv1d"], pooled, cfg)
        return _apply_heads(params["head"], cfg, out)

    if cfg.kind == "diffpool":
        nm = cfg.dense_nodes
        dx, dmask, pos, ok = _dense_from_batch(x, gid, G, nmask, nm)
        adj = _dense_adj(batch, gid, pos, ok, G, nm, x.dtype)
        s = _dense_gnn(params["gnn1_pool"], dx, adj, dmask)
        z = _dense_gnn(params["gnn1_embed"], dx, adj, dmask)
        z, adj = _diff_pool(z, adj, s, dmask)
        s = _dense_gnn(params["gnn2_pool"], z, adj, None)
        z2 = _dense_gnn(params["gnn2_embed"], z, adj, None)
        z2, adj = _diff_pool(z2, adj, s)
        z3 = _dense_gnn(params["gnn3_embed"], z2, adj, None)
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
            h = jax.nn.relu(
                _gcn_conv(params["convs"][i], h, src, dst, em, n1,
                          keep=keep))
            sc = params["scores"][i]
            score = (linear(sc["rel"], segment_sum(h[src], dst, n1, em))
                     + h @ sc["root"]["w"].T)[:, 0]
            score = jnp.tanh(score)
            keep = topk_mask(score, gid, G, cfg.pooling_ratio, keep)
            h = h * (score * keep.astype(h.dtype))[:, None]
            blk = _gmp_gap(h, gid, G, keep)
            xs = blk if xs is None else xs + blk
        out = jax.nn.relu(linear(params["lin1"], xs))
        if rng is not None:
            rng, k = jax.random.split(rng)
            out = drop(out, k)
        out = jax.nn.relu(linear(params["lin2"], out))
        return _apply_heads(params["head"], cfg, out)

    if cfg.kind == "asap":
        nm = cfg.dense_nodes
        dx, dmask, pos, ok = _dense_from_batch(x, gid, G, nmask, nm)
        adj = _dense_adj(batch, gid, pos, ok, G, nm, x.dtype)
        gm = jnp.asarray(batch.graph_mask)

        def gconv(cp, h, A, keep, use_weights):
            m = keep.astype(h.dtype)
            Am = A * m[:, :, None] * m[:, None, :]
            W = Am if use_weights else (Am > 0).astype(h.dtype)
            s = jnp.einsum("gij,gjd->gid", W.transpose(0, 2, 1), h)
            cnt = jnp.maximum((Am > 0).sum(1), 1).astype(h.dtype)
            s = s / cnt[..., None]
            out = linear(cp["rel"], s) + h @ cp["root"]["w"].T
            return out * m[..., None]

        h = jax.nn.relu(gconv(params["conv1"], dx, adj, dmask, False))
        keep = dmask

        def meanpool(h, keep):
            cnt = jnp.maximum(keep.sum(1).astype(h.dtype), 1.0)
            return (h * keep[..., None].astype(h.dtype)).sum(1) \
                / cnt[:, None]

        gs = [meanpool(h, keep)]
        edge_w = None   # None = unweighted (first pools see binary adj)
        pool_i = 0
        n_convs = cfg.num_layers - 1
        for i in range(n_convs):
            h = jax.nn.relu(gconv(params["convs"][i], h, adj, keep,
                                  edge_w is not None))
            gs.append(meanpool(h, keep))
            if i % 2 == 0 and i < n_convs - 1:
                pp = params["pools"][pool_i]; pool_i += 1
                h, adj, keep = _asap_pool_dense(pp, cfg, h, adj, keep)
                edge_w = True
        out = jax.nn.relu(linear(params["lin1"], jnp.concatenate(gs, -1)))
        if rng is not None:
            rng, k = jax.random.split(rng)
            out = drop(out, k)
        return _apply_heads(params["head"], cfg, out)

    raise ValueError(cfg.kind)


def _asap_pool_dense(pp, cfg: HPoolConfig, h, adj, keep):
    """ASAPooling (PyG 1.6.3, GNN=None, add_self_loops=False) on the dense
    per-graph adjacency:

      A~ = A + I (weight-1 self loops); x_q_i = lin(max_{j: A~_ji>0} x_j);
      alpha_ij = softmax_i(LeakyReLU(att([x_q_i, x_j]), 0.2)) over A~ edges;
      cluster x_i = sum_j alpha_ij x_j; fitness = sigmoid(LEConv(x, A~));
      keep top-ratio, scale by fitness; A_pool = S^T A~ S, diag removed.
    """
    G, nm, d = h.shape
    m = keep.astype(h.dtype)
    A = adj * m[:, :, None] * m[:, None, :]
    A = A + jnp.eye(nm, dtype=h.dtype)[None] * m[:, :, None]
    E = (A > 0)

    # master query: max over in-neighborhood (incl self via the loop) —
    # scanned over the source axis to keep memory at O(G*n*d) instead of
    # materializing the [G, j, i, d] candidate tensor
    neg = jnp.finfo(h.dtype).min

    def _mm_body(carry, ji):
        Ej, hj = ji                                          # [G,i], [G,d]
        cand = jnp.where(Ej[..., None], hj[:, None, :], neg)
        return jnp.maximum(carry, cand), None

    xq0 = jnp.full((G, nm, d), neg, h.dtype)
    xq, _ = jax.lax.scan(_mm_body, xq0,
                         (E.transpose(1, 0, 2), h.transpose(1, 0, 2)))
    xq = jnp.where(E.any(1)[..., None], xq, 0.0)
    xq = linear(pp["lin"], xq)

    # attention scores per (j -> i) pair over A~'s support
    scores = jax.nn.leaky_relu(
        jnp.einsum("gid,d->gi", xq, pp["att"]["w"][0, :d])[:, None, :]
        + jnp.einsum("gjd,d->gj", h, pp["att"]["w"][0, d:])[:, :, None]
        + pp["att"]["b"][0], 0.2)                           # [G,j,i]
    scores = jnp.where(E, scores, neg)
    alpha = jax.nn.softmax(scores, axis=1)
    alpha = jnp.where(E, alpha, 0.0)                        # S[j,i]
    hc = jnp.einsum("gji,gjd->gid", alpha, h)

    # LEConv fitness on A~ (unweighted support): lin3(x_i) +
    # sum_j 1[A~_ji] (lin1(x)_i - lin2(x)_j)
    a = linear(pp["le1"], hc)[..., 0]
    b = linear(pp["le2"], hc)[..., 0]
    indeg = E.sum(1).astype(h.dtype)
    fit = (linear(pp["le3"], hc)[..., 0] + indeg * a
           - jnp.einsum("gji,gj->gi", E.astype(h.dtype), b))
    fitness = jax.nn.sigmoid(fit)

    keep2 = _dense_topk(fitness, keep, cfg.asap_ratio)
    km = keep2.astype(h.dtype)
    h2 = hc * (fitness * km)[..., None]
    # reconnection: S columns restricted to kept clusters
    S = alpha * km[:, None, :]
    A2 = jnp.einsum("gji,gjk,gkl->gil", S, A, S)
    A2 = A2 * (1.0 - jnp.eye(nm, dtype=h.dtype)[None])
    return h2, A2, keep2
