"""Numpy oracle: literal transcription of the reference DAGNN *semantics*
(ogbg-code/model/dagnn.py:128-215 + conv classes :232-409), used as the
golden model for parity tests of the scan-based TPU implementation.

Implements the per-level Python-loop algorithm directly (edge masking per
level, per-destination softmax over the level's edge subset, sequential GRU
stack, readout branches) with the SAME parameter pytrees as dagnn_tpu.
Deliberately slow and simple.
"""

import numpy as np


def np_linear(p, x):
    y = x @ np.asarray(p["w"]).T
    if "b" in p:
        y = y + np.asarray(p["b"])
    return y


def np_gru(p, x, h):
    gi = x @ np.asarray(p["w_ih"]).T + np.asarray(p["b_ih"])
    gh = h @ np.asarray(p["w_hh"]).T + np.asarray(p["b_hh"])
    H = h.shape[-1]
    sig = lambda a: 1.0 / (1.0 + np.exp(-a))
    r = sig(gi[:, :H] + gh[:, :H])
    z = sig(gi[:, H:2*H] + gh[:, H:2*H])
    n = np.tanh(gi[:, 2*H:] + r * gh[:, 2*H:])
    return (1 - z) * n + z * h


def np_segment_softmax(scores, seg):
    out = np.zeros_like(scores)
    for s in np.unique(seg):
        m = seg == s
        e = np.exp(scores[m] - scores[m].max())
        out[m] = e / (e.sum() + 1e-16)
    return out


def np_aggregate(p, spec, values, dst, num_nodes, keys=None, query_per_dst=None,
                 edge_attr=None):
    """Aggregate messages into a dense [num_nodes, dim] array (PyG propagate
    with aggr='add'/'max' over an edge subset)."""
    ee = None
    if spec.wea and edge_attr is not None:
        ee = np_linear(p["edge_encoder"], edge_attr)

    if spec.kind in ("add", "max", "gated_sum"):
        v = values if ee is None else values + ee
        if spec.kind == "gated_sum":
            sig = lambda a: 1.0 / (1.0 + np.exp(-a))
            v = sig(np_linear(p["gate"], v)) * np_linear(p["mapper"], v)
        out = np.zeros((num_nodes, v.shape[-1]), v.dtype)
        if spec.kind == "max":
            neg = np.full((num_nodes, v.shape[-1]), -np.inf, v.dtype)
            np.maximum.at(neg, dst, v)
            neg[np.isinf(neg)] = 0.0
            return neg
        np.add.at(out, dst, v)
        return out

    k = keys if keys is not None else values
    if ee is not None:
        k = k + ee
    if spec.kind == "self_attn":
        scores = np_linear(p["attn_lin"], k)[:, 0]
    elif spec.kind == "attn":
        q = query_per_dst[dst]
        scores = np_linear(p["attn_lin"], np.concatenate([q, k], -1))[:, 0]
    elif spec.kind == "mattn":
        q = query_per_dst[dst]
        scores = (np_linear(p["attn_linl"], q) * np_linear(p["attn_linr"], k)).sum(-1)
    else:
        raise ValueError(spec.kind)
    alpha = np_segment_softmax(scores, dst)
    out = np.zeros((num_nodes, values.shape[-1]), values.dtype)
    np.add.at(out, dst, values * alpha[:, None])
    return out


def np_encode(p, spec, x, node_depth=None):
    if spec.kind == "identity":
        return np.asarray(x, dtype=np.float32)
    if spec.kind in ("ast", "ast2"):
        out = np.asarray(p["type_emb"])[x[:, 0]] + np.asarray(p["attr_emb"])[x[:, 1]]
        if spec.kind == "ast":
            d = np.clip(np.asarray(node_depth).reshape(-1), 0, spec.max_depth)
            out = out + np.asarray(p["depth_emb"])[d]
        return out
    raise ValueError(spec.kind)


def np_pool(h, graph_id, num_graphs, kind, mask, attn_params=None):
    out = []
    for g in range(num_graphs):
        m = (graph_id == g) & mask
        hg = h[m]
        if hg.shape[0] == 0:
            out.append(np.zeros(h.shape[-1], h.dtype))
        elif kind == "max":
            out.append(hg.max(0))
        elif kind == "mean":
            out.append(hg.mean(0))
        elif kind in ("add", "sum"):
            out.append(hg.sum(0))
        elif kind == "attn":
            # reference bug-compatible: weights are identically 1 (dagnn.py:114-117)
            out.append(hg.sum(0))
        else:
            raise ValueError(kind)
    return np.stack(out)


def oracle_dagnn_forward(params, cfg, src, dst, x_raw, graph_id, num_graphs,
                         edge_attr=None, node_depth=None,
                         level_fwd=None, level_rev=None):
    """Reference-faithful forward. Returns the same head outputs as
    dagnn_tpu.nn.dagnn_forward (without dropout)."""
    params = jax_to_np(params)
    N = x_raw.shape[0]
    x = np_encode(params["encoder"], cfg.encoder, x_raw, node_depth)
    levels = [np.asarray(level_fwd), np.asarray(level_rev)]
    H = cfg.hidden_dim
    h = [[np.zeros((N, H), np.float32) for _ in range(cfg.num_layers)]
         for _ in cfg.dirs]

    for di, d in enumerate(cfg.dirs):
        tgt, other = (dst, src) if d == 0 else (src, dst)
        # shared-AggConv quirk (dagnn.py:74-75): the reverse pass's shared
        # forward-flow conv aggregates into edge TARGETS, so the level rows
        # read back zero — reproduce by dropping every edge (see
        # DAGNNConfig.ref_shared_agg_quirk)
        rev_noop = d == 1 and cfg.reverse_agg_noop
        lv = levels[d]
        for li in range(int(lv.max()) + 1 if N else 0):
            layer = np.flatnonzero(lv == li)
            inp = x[layer]
            if li > 0:
                eids = (np.zeros(0, int) if rev_noop
                        else np.flatnonzero(np.isin(tgt, layer)))
                e_dst = tgt[eids]
                e_src = other[eids]
                ea = edge_attr[eids] if (cfg.w_edge_attr and edge_attr is not None
                                         and cfg.num_rels > 1) else None
            ps_common = None
            if cfg.agg_x and li > 0:
                spec0 = cfg.aggregator_spec(0)
                kw = {}
                if cfg.agg_attn:
                    kw = dict(keys=x[e_src], query_per_dst=x)
                ps = np_aggregate(params["aggr"][di][0], spec0, x[e_src], e_dst, N,
                                  edge_attr=ea, **kw)[layer]
                if ps.shape[-1] < H:
                    ps = np.concatenate([ps, np.zeros((ps.shape[0], H - ps.shape[-1]), ps.dtype)], -1)
                ps_common = ps
            for i in range(cfg.num_layers):
                if li == 0:
                    ps_h = np.zeros((inp.shape[0], H), np.float32)
                elif cfg.agg_x:
                    ps_h = ps_common
                else:
                    spec = cfg.aggregator_spec(i)
                    kw = {}
                    if cfg.agg_attn:
                        if cfg.agg_attn_x:
                            kw = dict(keys=x[e_src], query_per_dst=x)
                        else:
                            q = h[di][i - 1] if i > 0 else x
                            kw = dict(keys=h[di][i][e_src], query_per_dst=q)
                    ps_h = np_aggregate(params["aggr"][di][i], spec, h[di][i][e_src],
                                        e_dst, N, edge_attr=ea, **kw)[layer]
                if cfg.recurr:
                    inp = np_gru(params["cells"][di][i], inp, ps_h)
                else:
                    inp = np_linear(params["cells"][di][i],
                                    np.concatenate([inp, ps_h], -1))
                h[di][i][layer] += inp

    out_fwd_mask = levels[1] == 0  # sinks (rev-level 0)
    out_rev_mask = levels[0] == 0  # sources
    all_mask = np.ones(N, bool)
    pool = lambda hh, m: np_pool(hh, graph_id, num_graphs, cfg.out_pool, m,
                                 params.get("pool_attn"))
    if cfg.bidirectional and not cfg.out_pool_all:
        parts = []
        for di, m in enumerate([out_fwd_mask, out_rev_mask]):
            hcat = np.concatenate(([x] if cfg.out_wx else []) + h[di], -1)
            parts.append(pool(hcat, m))
        out = np.concatenate(parts, -1)
    else:
        layers = [h[di][l] for di in range(len(cfg.dirs)) for l in range(cfg.num_layers)]
        hcat = np.concatenate(([x] if cfg.out_wx else []) + layers, -1)
        out = pool(hcat, all_mask if cfg.out_pool_all else out_fwd_mask)

    head = params["head"]
    if cfg.num_class > 0:
        return np_linear(head, out)
    if cfg.num_vocab == 1:
        return np.maximum(np_linear(head, out), 0)
    w, b = np.asarray(head["w"]), np.asarray(head["b"])
    return np.einsum("gd,svd->gsv", out, w) + b[None]


def jax_to_np(tree):
    if isinstance(tree, dict):
        return {k: jax_to_np(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [jax_to_np(v) for v in tree]
    return np.asarray(tree)
