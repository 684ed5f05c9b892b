"""Numpy oracle for the D-VAE teacher-forced loss: literal per-graph
transcription of the reference decode-loss algorithm
(dvae/models_pyg.py:398-456 with _ipropagate_to variants), including its
quirks (layer-0 message reuse, dense pad-slot softmax, padded-graph loss
contributions). Used to validate dagnn_tpu.vae.dvae_teacher_loss.
"""

import numpy as np

from oracle_dagnn import np_linear, np_gru, jax_to_np


def sig(a):
    return 1.0 / (1.0 + np.exp(-a))


def one_hot(i, n):
    v = np.zeros(n, np.float32)
    v[i] = 1.0
    return v


class G:
    """Partial graph during decoding (igraph stand-in)."""

    def __init__(self, max_n, num_layers, hs):
        self.types = []            # vertex types in order
        self.adj = np.zeros((max_n, max_n), np.float32)
        self.H = [dict() for _ in range(num_layers)]  # layer -> {v: state}
        self.hs = hs

    @property
    def vcount(self):
        return len(self.types)

    def preds(self, v):
        return [int(u) for u in np.flatnonzero(self.adj[:, v]) if u < self.vcount]


def update_v(dec, cfg, graphs, v, H0=None, attn=None):
    """_ipropagate_to over the list of active graphs."""
    act = [g for g in graphs if g.vcount > v]
    if not act:
        return
    if H0 is not None:
        H0 = H0[[i for i, g in enumerate(graphs) if g.vcount > v]]
    X = np.stack([one_hot(g.types[v], cfg.nvt) for g in act])
    Hv = X
    H = H0
    for l in range(cfg.num_layers):
        if H is None:
            # aggregate layer-0 states of predecessors (only at l == 0,
            # reused afterwards — the reference's H-not-None reuse)
            preds = [g.preds(v) for g in act]
            max_p = max(len(p) for p in preds)
            if max_p == 0:
                H = np.zeros((len(act), cfg.hs), np.float32)
            else:
                if cfg.dec_agg == "gated_sum":
                    rows = []
                    for g, ps in zip(act, preds):
                        z = [np.concatenate([g.H[0][u], one_hot(u, cfg.max_n)])
                             if cfg.vid else g.H[0][u] for u in ps]
                        z += [np.zeros(cfg.vs, np.float32)] * (max_p - len(ps))
                        z = np.stack(z)
                        h = sig(np_linear(dec["gate_f"][0], z)) * np_linear(dec["mapper_f"][0], z)
                        rows.append(h.sum(0))
                    H = np.stack(rows)
                else:  # dense attention with pad-slot softmax
                    rows = []
                    for gi, (g, ps) in enumerate(zip(act, preds)):
                        keys, vals = [], []
                        for u in ps:
                            k = (np.concatenate([g.H[0][u], one_hot(u, cfg.max_n)])
                                 if cfg.vid else g.H[0][u])
                            keys.append(k)
                            vals.append(g.H[0][u])
                        kd = cfg.vs
                        keys += [np.zeros(kd, np.float32)] * (max_p - len(ps))
                        vals += [np.zeros(cfg.hs, np.float32)] * (max_p - len(ps))
                        K = np.stack(keys)
                        V = np.stack(vals)
                        q = X[gi]
                        scores = np_linear(attn["attn_lin"],
                                           np.concatenate(
                                               [np.tile(q, (max_p, 1)), K], -1))[:, 0]
                        e = np.exp(scores - scores.max())
                        a = e / e.sum()
                        rows.append((a[:, None] * V).sum(0))
                    H = np.stack(rows)
        Hv = np_gru(dec["grud"][l], Hv, H)
        for i, g in enumerate(act):
            g.H[l][v] = Hv[i]


def state_of(g, cfg, v):
    if v >= g.vcount:
        return np.zeros(cfg.hs, np.float32)
    return g.H[cfg.num_layers - 1][v]


def graph_state(g, cfg):
    if cfg.bn:
        return sum(g.H[cfg.num_layers - 1][i] for i in range(g.vcount))
    return g.H[cfg.num_layers - 1][g.vcount - 1]


def oracle_teacher_loss(dec_params, cfg, z, types, adj_true, nv, attn_params=None):
    dec = jax_to_np(dec_params)
    attn = jax_to_np(attn_params) if attn_params is not None else None
    B = z.shape[0]
    H0 = np.tanh(np_linear(dec["fc3"], np.asarray(z)))
    graphs = [G(cfg.max_n, cfg.num_layers, cfg.hs) for _ in range(B)]
    for g in graphs:
        g.types.append(cfg.start_type)
    update_v(dec, cfg, graphs, 0, H0=H0, attn=attn)

    res = 0.0
    for v in range(1, cfg.max_n):
        true_types = [int(types[b, v]) if v < nv[b] else cfg.start_type
                      for b in range(B)]
        Hg = np.stack([graph_state(g, cfg) for g in graphs])
        logits = np_linear(dec["add_vertex"]["l2"],
                           np.maximum(np_linear(dec["add_vertex"]["l1"], Hg), 0))
        logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
        res += sum(logp[b, true_types[b]] for b in range(B))
        # reference adds the vertex only when true type != START (pad marker)
        for b, g in enumerate(graphs):
            if true_types[b] != cfg.start_type:
                g.types.append(true_types[b])
        update_v(dec, cfg, graphs, v, attn=attn)

        scores = []
        for vi in range(v - 1, -1, -1):
            Hvi = np.stack([state_of(g, cfg, vi) for g in graphs])
            H = np.stack([state_of(g, cfg, v) for g in graphs])
            inp = (np.concatenate([Hvi, H, H0], -1) if cfg.bn
                   else np.concatenate([Hvi, H], -1))
            s = np_linear(dec["add_edge"]["l2"],
                          np.maximum(np_linear(dec["add_edge"]["l1"], inp), 0))[:, 0]
            scores.append(s)
            for b, g in enumerate(graphs):
                if v < nv[b] and adj_true[b, vi, v] > 0:
                    g.adj[vi, v] = 1.0
            update_v(dec, cfg, graphs, v, attn=attn)
        logits = np.stack(scores[::-1], 1)  # [B, v]
        tgt = np.zeros_like(logits)
        for b in range(B):
            if v < nv[b]:
                tgt[b] = adj_true[b, :v, v]
        p = sig(logits)
        bce = -(tgt * np.log(p + 1e-12) + (1 - tgt) * np.log(1 - p + 1e-12)).sum()
        res -= bce
    return -res


# ---------------------------------------------------------------------------
# Host-driven reference decoder: parity oracle for the jitted
# dagnn_tpu.vae.dvae.dvae_decode (rng split order matches exactly).
# Lived in vae/dvae.py through round 2; moved here because production code
# only ever runs the jitted path.

import jax
import jax.numpy as jnp

from dagnn_tpu.ops.linear import linear
from dagnn_tpu.vae.dvae import (DVAEConfig, decoder_update_v, _graph_state,
                                _mlp2, _edge_score_logits)


def dvae_decode_host(dec, cfg: DVAEConfig, z, rng=None, stochastic=True,
                     attn_params=None):
    """Host-driven reference implementation of `dvae_decode` (kept for
    parity testing; the rng split order matches the jitted path exactly).
    """
    B = z.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    H0 = jnp.tanh(linear(dec["fc3"], z))
    types = np.full((B, cfg.max_n), cfg.start_type, np.int32)
    adj = np.zeros((B, cfg.max_n, cfg.max_n), np.float32)
    nv = np.full(B, 1, np.int32)
    finished = np.zeros(B, bool)

    state = jnp.zeros((cfg.num_layers, B, cfg.max_n, cfg.hs), z.dtype)
    types_oh = jax.nn.one_hot(jnp.asarray(types), cfg.nvt, dtype=z.dtype)
    state = decoder_update_v(dec, cfg, state, types_oh, jnp.asarray(adj),
                             jnp.asarray(nv), 0, H0=H0, attn_params=attn_params)

    for idx in range(1, cfg.max_n):
        if idx == cfg.max_n - 1:
            new_types = np.full(B, cfg.end_type, np.int32)
        else:
            Hg = _graph_state(cfg, state, jnp.asarray(nv))
            logits = _mlp2(dec["add_vertex"], Hg)
            rng, k = jax.random.split(rng)
            if stochastic:
                new_types = np.asarray(jax.random.categorical(k, logits))
            else:
                new_types = np.asarray(jnp.argmax(logits, -1))
        grow = ~finished
        types[grow, idx] = new_types[grow]
        nv[grow] = idx + 1
        types_oh = jax.nn.one_hot(jnp.asarray(types), cfg.nvt, dtype=z.dtype)
        state = decoder_update_v(dec, cfg, state, types_oh, jnp.asarray(adj),
                                 jnp.asarray(nv), idx, attn_params=attn_params)

        just_ended = grow & (new_types == cfg.end_type)
        for b in np.flatnonzero(just_ended):
            # connect loose ends to the END vertex (models_pyg.py:383-390)
            outdeg = adj[b, :idx, :].sum(-1)
            loose = np.flatnonzero(outdeg == 0)
            adj[b, loose, idx] = 1.0
            finished[b] = True
        if just_ended.any():
            state = decoder_update_v(dec, cfg, state, types_oh, jnp.asarray(adj),
                                     jnp.asarray(nv), idx, attn_params=attn_params)

        for vi in range(idx - 1, -1, -1):
            Hvi = np.asarray(state[-1][:, vi])
            H = np.asarray(state[-1][:, idx])
            logits = _edge_score_logits(dec, cfg, jnp.asarray(Hvi), jnp.asarray(H), H0)
            prob = np.asarray(jax.nn.sigmoid(logits))
            rng, k = jax.random.split(rng)
            if stochastic:
                dec_bits = np.asarray(jax.random.uniform(k, prob.shape)) < prob
            else:
                dec_bits = prob > 0.5
            add = dec_bits & ~finished & (nv > idx)
            adj[add, vi, idx] = 1.0
            state = decoder_update_v(dec, cfg, state, types_oh, jnp.asarray(adj),
                                     jnp.asarray(nv), idx, attn_params=attn_params)
    return types, adj, nv
