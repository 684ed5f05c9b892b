"""D-VAE baseline variants: DVAE_GCN, DVAE_fast, DVAE_DeepGMG.

TPU-native equivalents of the remaining reference baselines over the padded
dense (types [B, max_n], adj [B, max_n, max_n], nv [B]) graph views used by
vae/dvae.py:

  * DVAE_GCN (reference dvae/models.py:887-983): `levels` rounds of a
    directed-GCN propagation replace the sequential GRU encoder; decoder and
    loss are the base D-VAE's. The reference sweeps vertices IN INDEX ORDER
    within each level and overwrites states in place, so later vertices see
    already-updated predecessors (Gauss-Seidel); reproduced faithfully.
  * DVAE_fast (models.py:1097-1180): base D-VAE encoder + the S-VAE GRU
    decoder (grud over a constant h0 sequence, per-step type logits + a
    max_n-1-wide edge head).
  * DVAE_DeepGMG (models.py:1182-1546): DeepGMG adapted to DAGs — per-round
    Jacobi message passing with per-round GRU cells and an edge-direction
    bit, gated graph states (gs = 2*hs), teacher-forced loss that alternates
    add-vertex NLL, add-edge stop BCE, and select-node NLL while true edges
    are inserted in descending predecessor order (adjlist .pop()).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from dagnn_tpu.ops.gru import gru_cell, gru_init
from dagnn_tpu.ops.linear import linear, linear_init
from dagnn_tpu.vae.dvae import (DVAEConfig, dvae_base_init, dvae_teacher_loss,
                                dvae_encode_sequential, kld, reparameterize,
                                _mlp2)


# ---------------------------------------------------------------------------
# DVAE_GCN


@dataclasses.dataclass(frozen=True)
class DVAEGCNConfig:
    max_n: int
    nvt: int
    hs: int = 501
    nz: int = 56
    levels: int = 3
    bidirectional: bool = False   # ignore edge directions in the GCN
    start_type: int = 0
    end_type: int = 1
    beta: float = 0.005
    eps_scale: float = 0.01

    def base(self) -> DVAEConfig:
        """Decoder config: base D-VAE decoder, unidirectional
        (models.py:887 passes bidirectional only to the GCN side)."""
        return DVAEConfig(max_n=self.max_n, nvt=self.nvt, hs=self.hs,
                          nz=self.nz, bidirectional=False,
                          start_type=self.start_type, end_type=self.end_type,
                          beta=self.beta, eps_scale=self.eps_scale)


def dvae_gcn_init(key, cfg: DVAEGCNConfig, dtype=jnp.float32) -> Dict[str, Any]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    base = dvae_base_init(k1, cfg.base(), dtype)
    p = {"dec": base["dec"]}
    p["gconv"] = [linear_init(jax.random.fold_in(k2, lv),
                              cfg.nvt if lv == 0 else cfg.hs, cfg.hs,
                              dtype=dtype)
                  for lv in range(cfg.levels)]
    p["fc1"] = linear_init(k3, cfg.hs, cfg.nz, dtype=dtype)
    p["fc2"] = linear_init(k4, cfg.hs, cfg.nz, dtype=dtype)
    return p


def dvae_gcn_encode(params, cfg: DVAEGCNConfig, types, adj, nv):
    """Directed-GCN encoder (models.py:907-971): per level lv and vertex v,
    Hv = ReLU(W_lv(x_v/(d_in(v)+1) + sum_u pred x_u /
    sqrt((d_out(u)+1)(d_in(v)+1)))); graph state = sum of final states over
    inner vertices 1..nv-2. Level 0 reads STATIC type one-hots (parallel
    over vertices); deeper levels read H_forward which the reference
    overwrites during its index-order sweep, so later vertices see already-
    updated predecessors (Gauss-Seidel) — reproduced with a per-vertex
    loop."""
    dtype = jnp.float32
    adj = adj.astype(dtype)
    vrange = jnp.arange(cfg.max_n)[None, :]
    in_graph = (vrange < nv[:, None]).astype(dtype)
    adj = adj * in_graph[:, :, None] * in_graph[:, None, :]

    if cfg.bidirectional:
        und = jnp.clip(adj + jnp.swapaxes(adj, 1, 2), 0, 1)
        deg_dst = und.sum(1)          # symmetric degree
        deg_src = deg_dst
        nbr = und                     # nbr[:, u, v] = u sends to v
    else:
        deg_dst = adj.sum(1)          # indegree of target
        deg_src = adj.sum(2)          # outdegree of source
        nbr = adj

    # norm[b, u, v] = nbr / sqrt((deg_src(u)+1)(deg_dst(v)+1))
    norm = nbr / jnp.sqrt((deg_src[:, :, None] + 1.0)
                          * (deg_dst[:, None, :] + 1.0))

    X = jax.nn.one_hot(types, cfg.nvt, dtype=dtype) * in_graph[..., None]
    # level 0: parallel (features are static types)
    lvl0 = X / (deg_dst[..., None] + 1.0) + jnp.einsum("buv,bud->bvd", norm, X)
    H = jax.nn.relu(linear(params["gconv"][0], lvl0)) * in_graph[..., None]
    # deeper levels: Gauss-Seidel sweep in vertex-index order
    for lv in range(1, cfg.levels):
        for v in range(cfg.max_n):
            self_term = H[:, v] / (deg_dst[:, v, None] + 1.0)
            pred_term = (norm[:, :, v, None] * H).sum(1)
            hv = jax.nn.relu(linear(params["gconv"][lv], self_term + pred_term))
            hv = jnp.where((v < nv)[:, None], hv, H[:, v])
            H = H.at[:, v].set(hv)
    m = ((vrange >= 1) & (vrange < (nv - 1)[:, None])).astype(dtype)
    hg = (H * m[..., None]).sum(1)
    return linear(params["fc1"], hg), linear(params["fc2"], hg)


def dvae_gcn_loss(params, cfg: DVAEGCNConfig, types, adj, nv, rng,
                  training=True):
    mu, logvar = dvae_gcn_encode(params, cfg, types, adj, nv)
    z = reparameterize(rng, mu, logvar, cfg.eps_scale, training)
    recon, _ = dvae_teacher_loss(params["dec"], cfg.base(), z, types, adj, nv)
    k = kld(mu, logvar)
    return recon + cfg.beta * k, recon, k


# ---------------------------------------------------------------------------
# DVAE_fast


def dvae_fast_init(key, cfg: DVAEConfig, dtype=jnp.float32) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    p = dvae_base_init(k1, cfg, dtype)
    ks = iter(jax.random.split(k2, 8))
    p["grud_seq"] = gru_init(next(ks), cfg.hs, cfg.hs, dtype)
    p["add_vertex_seq"] = {
        "l1": linear_init(next(ks), cfg.hs, cfg.hs, dtype=dtype),
        "l2": linear_init(next(ks), cfg.hs, cfg.nvt, dtype=dtype)}
    p["add_edges_seq"] = {
        "l1": linear_init(next(ks), cfg.hs, cfg.hs, dtype=dtype),
        "l2": linear_init(next(ks), cfg.hs, cfg.max_n - 1, dtype=dtype)}
    return p


def _dvae_fast_scores(params, cfg: DVAEConfig, z):
    """S-VAE style decoder (models.py:1112-1118): GRU over a constant
    relu(fc3(z)) input sequence of length max_n-1."""
    h0 = jax.nn.relu(linear(params["dec"]["fc3"], z))
    T = cfg.max_n - 1
    h_in = jnp.broadcast_to(h0[:, None], (len(z), T, cfg.hs))
    hcur = jnp.zeros((len(z), cfg.hs), z.dtype)
    outs = []
    for t in range(T):
        hcur = gru_cell(params["grud_seq"], h_in[:, t], hcur)
        outs.append(hcur)
    outs = jnp.stack(outs, 1)
    type_scores = _mlp2(params["add_vertex_seq"], outs)
    edge_scores = jax.nn.sigmoid(_mlp2(params["add_edges_seq"], outs))
    return type_scores, edge_scores


def dvae_fast_loss(params, cfg: DVAEConfig, types, adj, nv, rng,
                   training=True):
    """CE over teacher types (START pads) + BCE over transposed-adjacency
    rows + beta*KLD (models.py:1120-1137)."""
    mu, logvar = dvae_encode_sequential(params, cfg, types, adj, nv)
    z = reparameterize(rng, mu, logvar, cfg.eps_scale, training)
    type_scores, edge_scores = _dvae_fast_scores(params, cfg, z)
    B, T = type_scores.shape[:2]
    vr = jnp.arange(1, cfg.max_n)[None, :]
    teacher = jnp.where(vr < nv[:, None], types[:, 1:], cfg.start_type)
    logp = jax.nn.log_softmax(type_scores, -1)
    ce = -jnp.sum(jnp.take_along_axis(logp, teacher[..., None], -1))
    # true edges: adjacency transposed [1:, :-1], zero beyond nv
    tgt = jnp.swapaxes(adj, 1, 2)[:, 1:, :-1].astype(z.dtype)
    tgt = tgt * (vr < nv[:, None])[..., None]
    es = jnp.clip(edge_scores, 1e-7, 1 - 1e-7)
    bce = -jnp.sum(tgt * jnp.log(es) + (1 - tgt) * jnp.log(1 - es))
    recon = ce + bce
    k = kld(mu, logvar)
    return recon + cfg.beta * k, recon, k


# ---------------------------------------------------------------------------
# DVAE_DeepGMG


@dataclasses.dataclass(frozen=True)
class DeepGMGConfig:
    max_n: int
    nvt: int
    hs: int = 501
    nz: int = 56
    Td: int = 3                   # decode message-passing rounds
    Te: int = 3                   # encode message-passing rounds
    bidirectional: bool = False
    start_type: int = 0
    end_type: int = 1
    beta: float = 0.005
    eps_scale: float = 0.01

    @property
    def gs(self) -> int:
        return 2 * self.hs


def deepgmg_init(key, cfg: DeepGMGConfig, dtype=jnp.float32) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 64))
    hs, gs = cfg.hs, cfg.gs
    p: Dict[str, Any] = {
        "grue": [gru_init(next(ks), 2 * hs, hs, dtype) for _ in range(cfg.Te)],
        "grud": [gru_init(next(ks), 2 * hs, hs, dtype) for _ in range(cfg.Td)],
        "fe": linear_init(next(ks), 2 * hs + 1, 2 * hs, dtype=dtype),
        "fc1": linear_init(next(ks), gs, cfg.nz, dtype=dtype),
        "fc2": linear_init(next(ks), gs, cfg.nz, dtype=dtype),
        "fc3": linear_init(next(ks), cfg.nz, gs, dtype=dtype),
        "finit": linear_init(next(ks), cfg.nvt + gs, hs, dtype=dtype),
        "add_vertex": linear_init(next(ks), gs, cfg.nvt, dtype=dtype),
        "add_edge": linear_init(next(ks), gs + hs, 1, dtype=dtype),
        "select_node": linear_init(next(ks), 2 * hs, 1, dtype=dtype),
        "gate": linear_init(next(ks), hs, gs, dtype=dtype),
        "mapper": linear_init(next(ks), hs, gs, bias=False, dtype=dtype),
        "gate_init": linear_init(next(ks), hs, gs, dtype=dtype),
        "mapper_init": linear_init(next(ks), hs, gs, bias=False, dtype=dtype),
    }
    return p


def _gmg_propagate(p, cfg: DeepGMGConfig, H, adj, count, cells):
    """Jacobi message-passing rounds (models.py:1287-1350): per round t,
    Av = sum over neighbors of fe([H_nbr, dir_bit, Hv]); Hv' = GRU_t(Av, Hv).
    Nodes with no neighbors (or beyond count) keep their state."""
    vmask = (jnp.arange(cfg.max_n)[None, :] < count[:, None]).astype(H.dtype)
    A = adj * vmask[:, :, None] * vmask[:, None, :]
    for t, cell in enumerate(cells):
        def messages(pred_adj, direction_bit):
            # pred_adj[:, u, v] = 1 when u sends to v
            src = jnp.broadcast_to(H[:, :, None, :],
                                   (H.shape[0], cfg.max_n, cfg.max_n, cfg.hs))
            tgt = jnp.broadcast_to(H[:, None, :, :], src.shape)
            dirb = jnp.full(src.shape[:-1] + (1,), direction_bit, H.dtype)
            m = linear(p["fe"], jnp.concatenate([src, dirb, tgt], -1))
            return (m * pred_adj[..., None]).sum(1)  # [B, max_n, 2hs]

        Av = messages(A, 1.0)
        if cfg.bidirectional:
            Av = Av + messages(jnp.swapaxes(A, 1, 2), 0.0)
        has_nbr = (A.sum(1) + (A.sum(2) if cfg.bidirectional else 0)) > 0
        Hn = gru_cell(cell, Av.reshape(-1, 2 * cfg.hs),
                      H.reshape(-1, cfg.hs)).reshape(H.shape)
        keep = (has_nbr & (vmask > 0))[..., None]
        H = jnp.where(keep, Hn, H)
    return H


def _gmg_graph_state(p, cfg: DeepGMGConfig, H, count, init=False,
                     exclude_last=False):
    """Gated-sum graph state over current vertices (models.py:1377-1398)."""
    idx = jnp.arange(cfg.max_n)[None, :]
    hi = count[:, None] - (1 if exclude_last else 0)
    m = (idx < hi).astype(H.dtype)
    g = p["gate_init" if init else "gate"]
    mp = p["mapper_init" if init else "mapper"]
    h = jax.nn.sigmoid(linear(g, H)) * linear(mp, H)
    return (h * m[..., None]).sum(1)  # [B, gs]


def _gmg_init_v(p, cfg: DeepGMGConfig, H, types_oh, count, v, Hg=None):
    """finit([one_hot(type), graph-state]) for vertex v (models.py:1268-1285);
    Hg defaults to the init-gated state excluding v itself."""
    if Hg is None:
        Hg = _gmg_graph_state(p, cfg, H, count, init=True, exclude_last=True)
    hv = linear(p["finit"], jnp.concatenate([types_oh[:, v], Hg], -1))
    active = (v < count)[:, None]
    return H.at[:, v].set(jnp.where(active, hv, H[:, v]))


def deepgmg_encode(params, cfg: DeepGMGConfig, types, adj, nv):
    B = types.shape[0]
    dtype = jnp.float32
    types_oh = jax.nn.one_hot(types, cfg.nvt, dtype=dtype)
    adj = adj.astype(dtype)
    H = jnp.zeros((B, cfg.max_n, cfg.hs), dtype)
    zero_g = jnp.zeros((B, cfg.gs), dtype)
    for v in range(cfg.max_n):
        H = _gmg_init_v(params, cfg, H, types_oh, nv, v, Hg=zero_g)
    H = _gmg_propagate(params, cfg, H, adj, nv, params["grue"])
    hg = _gmg_graph_state(params, cfg, H, nv)
    return linear(params["fc1"], hg), linear(params["fc2"], hg)


def deepgmg_loss(params, cfg: DeepGMGConfig, types, adj_true, nv, rng,
                 training=True):
    """Teacher-forced loss (models.py:1488-1546): per added vertex,
    add-vertex NLL; then per edge slot k (descending predecessor order),
    add-edge stop BCE over still-active graphs + select-node NLL."""
    mu, logvar = deepgmg_encode(params, cfg, types, adj_true, nv)
    z = reparameterize(rng, mu, logvar, cfg.eps_scale, training)

    B = types.shape[0]
    dtype = z.dtype
    vrange = jnp.arange(cfg.max_n)[None, :]
    teacher = jnp.where(vrange < nv[:, None], types, cfg.start_type)
    types_oh = jax.nn.one_hot(teacher, cfg.nvt, dtype=dtype)
    adj_true = adj_true.astype(dtype)

    H0 = jnp.tanh(linear(params["fc3"], z))
    H = jnp.zeros((B, cfg.max_n, cfg.hs), dtype)
    H = H.at[:, 0].set(linear(params["finit"],
                              jnp.concatenate([types_oh[:, 0], H0], -1)))
    adj = jnp.zeros_like(adj_true)
    count = jnp.minimum(jnp.ones_like(nv), nv)  # 1 vertex (or 0 for empty)

    res = jnp.zeros((), dtype)
    for v in range(1, cfg.max_n):
        H = _gmg_propagate(params, cfg, H, adj, count, params["grud"])
        Hg = _gmg_graph_state(params, cfg, H, count)
        logits = linear(params["add_vertex"], Hg)
        logp = jax.nn.log_softmax(logits, -1)
        res = res + logp[jnp.arange(B), teacher[:, v]].sum()

        grow = (teacher[:, v] != cfg.start_type)
        count = count + grow.astype(count.dtype)
        H = _gmg_init_v(params, cfg, H, types_oh, count, v)

        # true in-edges of v, consumed in DESCENDING predecessor order
        # (igraph adjlist + .pop(), models.py:1512-1537)
        indeg = adj_true[:, :v, v].sum(-1)
        for k in range(v + 1):
            # graphs still in graph_idx: ALL at k=0 (incl. padded ones,
            # which contribute a stop-BCE, models.py:1517-1525), then those
            # that added an edge last round
            in_loop = indeg >= k
            # the reference's while loop EXITS once no graph remains —
            # iterations past the batch max in-degree never run, so their
            # propagation must not mutate H (models.py:1516 `while
            # graph_idx:`); gate batch-wide
            entered = in_loop.any()
            H_new = _gmg_propagate(params, cfg, H, adj, count,
                                   params["grud"])
            H = jnp.where(entered, H_new, H)
            Hg = _gmg_graph_state(params, cfg, H, count)
            Hv = H[:, v]
            add_logit = linear(params["add_edge"],
                               jnp.concatenate([Hg, Hv], -1))[:, 0]
            add_truth = (indeg > k).astype(dtype)
            bce = jax.nn.softplus(add_logit) - add_truth * add_logit
            res = res - jnp.sum(jnp.where(in_loop, bce, 0.0))
            if k == v:
                break
            # select-node NLL for graphs that do add an edge this round:
            # target = k-th largest remaining predecessor
            sel_in = jnp.concatenate(
                [H[:, :v], jnp.broadcast_to(Hv[:, None], (B, v, cfg.hs))], -1)
            sel_logits = linear(params["select_node"], sel_in)[..., 0]  # [B, v]
            has_edge = indeg > k
            # k-th largest predecessor index: rank predecessors descending
            pred_bits = adj_true[:, :v, v]  # [B, v]
            desc_rank = jnp.cumsum(pred_bits[:, ::-1], axis=1)[:, ::-1]
            # desc_rank[b, u] = 1 + #preds >= u; k-th pop has desc_rank == k+1
            target_oh = (pred_bits > 0) & (desc_rank == k + 1)
            logp_sel = jax.nn.log_softmax(sel_logits, -1)
            ell = (logp_sel * target_oh.astype(dtype)).sum(-1)
            res = res + jnp.sum(jnp.where(has_edge, ell, 0.0))
            # insert that edge and continue
            u_oh = target_oh.astype(dtype) * has_edge[:, None].astype(dtype)
            adj = adj.at[:, :v, v].add(u_oh)

    recon = -res
    k_ = kld(mu, logvar)
    return recon + cfg.beta * k_, recon, k_
