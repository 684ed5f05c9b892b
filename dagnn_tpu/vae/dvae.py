"""D-VAE scaffolding: autoregressive DAG decoder, teacher-forced loss,
sequential baseline encoder, stochastic decoding.

TPU-native re-design of the reference VAE family (reference:
dvae/models_pyg.py:17-736 DVAE_PYG / DVAE_BN_PYG; igraph twins in
dvae/models.py). Graphs are dense padded tensors — types [B, max_n] int,
adjacency [B, max_n, max_n] (adj[b, i, j] = edge i->j), true vertex count
nv [B] — the natural TPU layout for these tiny DAGs (max_n 8-10), replacing
per-graph igraph objects and Python state dicts.

Reference quirks reproduced exactly (they shape the loss values):
  * multi-layer propagation aggregates predecessors ONLY at layer 0 and
    reuses that message for upper layers (models_pyg.py:166-180: `H` is
    assigned inside `if H is None` and never reset per layer);
  * the dense attention softmax runs over max-predecessor-count padded
    slots including zero-vector pads (dvae/dagnn.py:362-369), so the
    denominator includes (P - n_pred) * exp(score(q, 0)); we reproduce it in
    closed form with static shapes;
  * padded (finished) graphs still contribute add-vertex log-likelihood at
    START_TYPE and edge BCE against all-zero targets
    (models_pyg.py:409-456).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dagnn_tpu.ops.gru import gru_cell, gru_init
from dagnn_tpu.ops.linear import linear, linear_init


@dataclasses.dataclass(frozen=True)
class DVAEConfig:
    max_n: int
    nvt: int
    hs: int = 501
    nz: int = 56
    num_layers: int = 1
    bidirectional: bool = False
    vid: bool = True              # concat one-hot vertex id to predecessor states
    bn: bool = False              # BN family: sum graph state, H0 in edge scorer
    dec_agg: str = "gated_sum"    # decoder aggregation: gated_sum | attn | self_attn
    pred_source: str = "h"        # aggregate predecessor 'h' or one-hot 'x' (DVAE_BN aggx)
    start_type: int = 0
    end_type: int = 1
    beta: float = 0.005
    eps_scale: float = 0.01

    @property
    def vs(self) -> int:
        return self.hs + self.max_n if self.vid else self.hs

    @property
    def gs(self) -> int:
        return self.hs

    @property
    def gated_in_dim(self) -> int:
        if self.pred_source == "x":
            return self.nvt
        return self.vs


def dvae_decoder_init(key, cfg: DVAEConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """Decoder-side parameters (models_pyg.py:42-70)."""
    ks = iter(jax.random.split(key, 64))
    p: Dict[str, Any] = {
        "fc3": linear_init(next(ks), cfg.nz, cfg.hs, dtype=dtype),
        "add_vertex": {
            "l1": linear_init(next(ks), cfg.hs, cfg.hs * 2, dtype=dtype),
            "l2": linear_init(next(ks), cfg.hs * 2, cfg.nvt, dtype=dtype),
        },
        "grud": [gru_init(next(ks), cfg.nvt if l == 0 else cfg.hs, cfg.hs, dtype)
                 for l in range(cfg.num_layers)],
        # gated-sum gate/mapper pairs; shared encoder<->decoder in the
        # reference (models_pyg.py:57-70). mapper bias-free so padded zeros
        # map to zeros.
        "gate_f": [linear_init(next(ks), cfg.gated_in_dim, cfg.hs, dtype=dtype)
                   for _ in range(cfg.num_layers)],
        "mapper_f": [linear_init(next(ks), cfg.gated_in_dim, cfg.hs, bias=False, dtype=dtype)
                     for _ in range(cfg.num_layers)],
        "gate_b": [linear_init(next(ks), cfg.gated_in_dim, cfg.hs, dtype=dtype)
                   for _ in range(cfg.num_layers)],
        "mapper_b": [linear_init(next(ks), cfg.gated_in_dim, cfg.hs, bias=False, dtype=dtype)
                     for _ in range(cfg.num_layers)],
    }
    if cfg.bn:
        # BN edge scorer includes H0: Linear(3hs, hs) -> ReLU -> Linear(hs, 1)
        # (models_pyg.py:552-557)
        p["add_edge"] = {
            "l1": linear_init(next(ks), cfg.hs * 3, cfg.hs, dtype=dtype),
            "l2": linear_init(next(ks), cfg.hs, 1, dtype=dtype),
        }
    else:
        # Linear(2hs, 4hs) -> ReLU -> Linear(4hs, 1) (models_pyg.py:50-54)
        p["add_edge"] = {
            "l1": linear_init(next(ks), cfg.hs * 2, cfg.hs * 4, dtype=dtype),
            "l2": linear_init(next(ks), cfg.hs * 4, 1, dtype=dtype),
        }
    return p


def dvae_base_init(key, cfg: DVAEConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """Full base D-VAE (sequential GRU encoder + decoder + latent heads)."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    p = {"dec": dvae_decoder_init(k1, cfg, dtype)}
    p["grue_f"] = [gru_init(jax.random.fold_in(k2, l),
                            cfg.nvt if l == 0 else cfg.hs, cfg.hs, dtype)
                   for l in range(cfg.num_layers)]
    p["grue_b"] = [gru_init(jax.random.fold_in(k3, l),
                            cfg.nvt if l == 0 else cfg.hs, cfg.hs, dtype)
                   for l in range(cfg.num_layers)]
    p["fc1"] = linear_init(k4, cfg.gs, cfg.nz, dtype=dtype)
    p["fc2"] = linear_init(k5, cfg.gs, cfg.nz, dtype=dtype)
    if cfg.bidirectional:
        p["hg_unify"] = linear_init(k6, cfg.gs * 2 * cfg.num_layers, cfg.gs, dtype=dtype)
    return p


def _mlp2(p, x, act=jax.nn.relu):
    return linear(p["l2"], act(linear(p["l1"], x)))


def _vid_eye(cfg: DVAEConfig, B: int, dtype):
    return jnp.broadcast_to(jnp.eye(cfg.max_n, dtype=dtype), (B, cfg.max_n, cfg.max_n))


def _attn_score(attn_p, q, k):
    """Additive attention score via decomposed attn_lin([q, k]) (see
    nn/aggregators.py). q: [B, Dq]; k: [B, P, Dk] -> [B, P]."""
    w = attn_p["attn_lin"]["w"]  # [1, Dq + Dk]
    dq = q.shape[-1]
    qs = q @ w[:, :dq].T + attn_p["attn_lin"]["b"]  # [B, 1]
    ks = k @ w[:, dq:].T  # [B, P, 1]
    return qs + ks[..., 0]  # [B, P]


def dec_aggregate(dec, cfg: DVAEConfig, state0, pred_mask, X_q,
                  types_onehot=None, attn_params=None, direction="f"):
    """Gated/attention aggregation of predecessor states for one vertex.

    state0: [B, max_n, hs] layer-0 vertex states; pred_mask: [B, max_n]
    0/1 predecessor indicator; X_q: [B, nvt] query (one-hot of the target's
    type). Reproduces the dense padded-softmax semantics described in the
    module docstring.
    """
    B = state0.shape[0]
    dtype = state0.dtype
    m = pred_mask.astype(dtype)
    n_pred = m.sum(-1)  # [B]

    vals = types_onehot if cfg.pred_source == "x" else state0  # [B, P, *]

    if cfg.dec_agg == "gated_sum":
        z = vals
        if cfg.vid and cfg.pred_source == "h":
            z = jnp.concatenate([vals, _vid_eye(cfg, B, dtype)], -1)
        gate = dec[f"gate_{direction}"][0]
        mapper = dec[f"mapper_{direction}"][0]
        h = jax.nn.sigmoid(linear(gate, z)) * linear(mapper, z)
        return (h * m[..., None]).sum(1)  # [B, hs]

    if "attn" in cfg.dec_agg:
        assert attn_params is not None, "attention decoder params required"
        keys = state0
        if cfg.vid:
            keys = jnp.concatenate([state0, _vid_eye(cfg, B, dtype)], -1)
        s = _attn_score(attn_params, X_q, keys)  # [B, P]
        s_pad = _attn_score(attn_params, X_q, jnp.zeros((B, 1, keys.shape[-1]), dtype))[:, 0]
        p_eff = jnp.max(n_pred)  # width of the reference's padded row
        n_pad = p_eff - n_pred  # [B] zero-vector slots in each row
        neg = jnp.finfo(dtype).min
        s_real = jnp.where(m > 0, s, neg)
        mx_real = jnp.max(s_real, axis=-1)
        mx = jnp.where(n_pad > 0, jnp.maximum(mx_real, s_pad), mx_real)
        # rows with neither preds nor pads (p_eff == 0): neutral max so no
        # inf/NaN enters unselected where-branches (it would poison grads)
        mx = jnp.where(n_pred + n_pad > 0, mx, 0.0)
        shift = jnp.where(m > 0, s - mx[:, None], 0.0)
        e_real = jnp.where(m > 0, jnp.exp(shift), 0.0)
        pad_shift = jnp.where(n_pad > 0, s_pad - mx, 0.0)
        pad_term = jnp.where(n_pad > 0, n_pad * jnp.exp(pad_shift), 0.0)
        denom = e_real.sum(-1) + pad_term
        denom = jnp.where(denom == 0, 1.0, denom)
        alpha = e_real / denom[:, None]
        out = (alpha[..., None] * state0).sum(1)
        return jnp.where((p_eff > 0), out, jnp.zeros_like(out))

    raise ValueError(f"unknown decoder aggregation {cfg.dec_agg}")


def decoder_update_v(dec, cfg: DVAEConfig, state, types_oh, adj, nv, v,
                     H0=None, attn_params=None):
    """_update_iv equivalent (models_pyg.py:247-250): recompute vertex v's
    states through the grud stack from current predecessors.

    state: [L, B, max_n, hs]; adj: [B, max_n, max_n] partial adjacency.
    Inactive graphs (v >= nv) keep their previous state.
    """
    X = types_oh[:, v]  # [B, nvt]
    active = (v < nv)[:, None]
    if H0 is None:
        H = dec_aggregate(dec, cfg, state[0], adj[:, :, v], X,
                          types_onehot=types_oh, attn_params=attn_params)
    else:
        H = H0
    Hv = X
    for l in range(cfg.num_layers):
        Hv = gru_cell(dec["grud"][l], Hv, H)
        state = state.at[l, :, v].set(jnp.where(active, Hv, state[l, :, v]))
    return state


def _graph_state(cfg: DVAEConfig, state, vcount):
    """Decode-time graph state (models_pyg.py:294-309 / BN sum variant
    :573-590): last added vertex's top-layer state, or the sum of all
    current vertices' states for BN."""
    top = state[-1]  # [B, max_n, hs]
    B = top.shape[0]
    if cfg.bn:
        idx = jnp.arange(cfg.max_n)[None, :]
        m = (idx < vcount[:, None]).astype(top.dtype)
        return (top * m[..., None]).sum(1)
    last = jnp.clip(vcount - 1, 0, cfg.max_n - 1)
    return top[jnp.arange(B), last]


def _edge_score_logits(dec, cfg: DVAEConfig, Hvi, H, H0):
    if cfg.bn:
        inp = jnp.concatenate([Hvi, H, H0], -1)
    else:
        inp = jnp.concatenate([Hvi, H], -1)
    return _mlp2(dec["add_edge"], inp)[..., 0]


def kld(mu, logvar):
    return -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar))


def reparameterize(rng, mu, logvar, eps_scale=0.01, training=True):
    if not training:
        return mu
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, std.shape, std.dtype) * eps_scale
    return mu + eps * std


def dvae_teacher_loss(dec, cfg: DVAEConfig, z, types, adj_true, nv,
                      attn_params=None, unroll: bool = False):
    """Teacher-forced reconstruction log-likelihood (models_pyg.py:398-456).

    types: [B, max_n] int vertex types (garbage beyond nv); adj_true:
    [B, max_n, max_n]; nv: [B] true vertex counts. Returns (recon_loss,
    aux dict). Caller adds beta * KLD.

    Default path is a lax.scan over vertex steps (inner scan over edge
    steps, masked) — the unrolled O(max_n^2) trace takes >10 minutes to
    compile through the TPU compiler at hs=501; the scan compiles in
    seconds and matches the unrolled oracle (tests/test_vae.py).
    """
    if not unroll and cfg.max_n > 1:
        return _dvae_teacher_loss_scan(dec, cfg, z, types, adj_true, nv,
                                       attn_params)
    B = z.shape[0]
    types_oh_true = jax.nn.one_hot(types, cfg.nvt, dtype=z.dtype)
    H0 = jnp.tanh(linear(dec["fc3"], z))

    # teacher types: START_TYPE marks padding beyond nv (models_pyg.py:409-412)
    vrange = jnp.arange(cfg.max_n)[None, :]
    in_graph = vrange < nv[:, None]
    teacher_types = jnp.where(in_graph, types, cfg.start_type)
    types_oh = jax.nn.one_hot(teacher_types, cfg.nvt, dtype=z.dtype)

    state = jnp.zeros((cfg.num_layers, B, cfg.max_n, cfg.hs), z.dtype)
    adj = jnp.zeros_like(adj_true, dtype=z.dtype)
    state = decoder_update_v(dec, cfg, state, types_oh, adj, nv, 0, H0=H0,
                             attn_params=attn_params)

    res = jnp.zeros((), z.dtype)
    for v in range(1, cfg.max_n):
        vcount = jnp.minimum(v, nv)
        Hg = _graph_state(cfg, state, vcount)
        type_logits = _mlp2(dec["add_vertex"], Hg)
        logp = jax.nn.log_softmax(type_logits, axis=-1)
        res = res + logp[jnp.arange(B), teacher_types[:, v]].sum()

        state = decoder_update_v(dec, cfg, state, types_oh, adj, nv, v,
                                 attn_params=attn_params)

        scores = []
        active_v = (v < nv).astype(z.dtype)
        for vi in range(v - 1, -1, -1):
            Hvi = jnp.where((vi < nv)[:, None], state[-1][:, vi], 0.0)
            H = jnp.where((v < nv)[:, None], state[-1][:, v], 0.0)
            logits = _edge_score_logits(dec, cfg, Hvi, H, H0)  # [B]
            scores.append(logits)
            # add true edge vi -> v where present, then re-propagate
            has_edge = adj_true[:, vi, v].astype(z.dtype) * active_v
            adj = adj.at[:, vi, v].set(has_edge)
            state = decoder_update_v(dec, cfg, state, types_oh, adj, nv, v,
                                     attn_params=attn_params)
        logits = jnp.stack(scores[::-1], axis=1)  # [B, v] col vi
        target = adj_true[:, :v, v].astype(z.dtype) * active_v[:, None]
        # BCE with sum reduction, incl. padded graphs vs all-zero targets
        bce = jnp.sum(
            jax.nn.softplus(logits) - target * logits
        )
        res = res - bce

    return -res, {}


def _dvae_teacher_loss_scan(dec, cfg: DVAEConfig, z, types, adj_true, nv,
                            attn_params=None):
    """Scan form of the teacher loss: identical step sequence to the
    unrolled oracle (add-vertex NLL -> propagate -> per-edge score, add
    true edge, re-propagate, descending vi), with the inner edge loop
    padded to max_n-1 masked steps (the extra re-propagations leave adj
    untouched and are idempotent)."""
    B = z.shape[0]
    types_oh_true = jax.nn.one_hot(types, cfg.nvt, dtype=z.dtype)
    H0 = jnp.tanh(linear(dec["fc3"], z))

    vrange = jnp.arange(cfg.max_n)[None, :]
    in_graph = vrange < nv[:, None]
    teacher_types = jnp.where(in_graph, types, cfg.start_type)
    types_oh = jax.nn.one_hot(teacher_types, cfg.nvt, dtype=z.dtype)
    adj_true_f = adj_true.astype(z.dtype)

    state = jnp.zeros((cfg.num_layers, B, cfg.max_n, cfg.hs), z.dtype)
    adj = jnp.zeros_like(adj_true_f)
    state = decoder_update_v(dec, cfg, state, types_oh, adj, nv, 0, H0=H0,
                             attn_params=attn_params)
    barange = jnp.arange(B)

    def edge_step(carry, k):
        state, adj, res, v = carry
        vi = v - 1 - k
        valid = vi >= 0
        vic = jnp.maximum(vi, 0)
        active_v = (v < nv).astype(z.dtype)
        Hvi = jnp.where((vic < nv)[:, None], state[-1][:, vic], 0.0)
        H = jnp.where((v < nv)[:, None], state[-1][:, v], 0.0)
        logits = _edge_score_logits(dec, cfg, Hvi, H, H0)  # [B]
        has_edge = adj_true_f[:, vic, v] * active_v
        adj = adj.at[:, vic, v].set(
            jnp.where(valid, has_edge, adj[:, vic, v]))
        state = decoder_update_v(dec, cfg, state, types_oh, adj, nv, v,
                                 attn_params=attn_params)
        bce = jnp.sum(jax.nn.softplus(logits) - has_edge * logits)
        res = res - jnp.where(valid, bce, 0.0)
        return (state, adj, res, v), None

    def vertex_step(carry, v):
        state, adj, res = carry
        vcount = jnp.minimum(v, nv)
        Hg = _graph_state(cfg, state, vcount)
        type_logits = _mlp2(dec["add_vertex"], Hg)
        logp = jax.nn.log_softmax(type_logits, axis=-1)
        res = res + logp[barange, teacher_types[:, v]].sum()
        state = decoder_update_v(dec, cfg, state, types_oh, adj, nv, v,
                                 attn_params=attn_params)
        (state, adj, res, _), _ = jax.lax.scan(
            edge_step, (state, adj, res, v), jnp.arange(cfg.max_n - 1))
        return (state, adj, res), None

    res0 = jnp.zeros((), z.dtype)
    (_, _, res), _ = jax.lax.scan(
        vertex_step, (state, adj, res0), jnp.arange(1, cfg.max_n))
    return -res, {}


def dvae_encode_sequential(params, cfg: DVAEConfig, types, adj, nv):
    """Base D-VAE encoder (models_pyg.py:117-184, 312-321): sequential
    gated-sum propagation in vertex order (vertices are topologically
    ordered by construction), optional reverse pass, graph state from the
    last (resp. first) vertex — or the BN sum over inner vertices."""
    B = types.shape[0]
    dtype = jnp.float32
    types_oh = jax.nn.one_hot(types, cfg.nvt, dtype=dtype)
    dec = params["dec"]

    def run(direction):
        rev = direction == "b"
        state = jnp.zeros((cfg.num_layers, B, cfg.max_n, cfg.hs), dtype)
        order = range(cfg.max_n - 1, -1, -1) if rev else range(cfg.max_n)
        grue = params["grue_b"] if rev else params["grue_f"]
        first = True
        for v in order:
            X = types_oh[:, v]
            active = (v < nv)[:, None]
            if first:
                H = jnp.zeros((B, cfg.hs), dtype)
                first = False
            else:
                pred_mask = adj[:, v, :] if rev else adj[:, :, v]
                H = dec_aggregate(dec, cfg, state[0], pred_mask, X,
                                  types_onehot=types_oh,
                                  direction=direction)
            Hv = X
            for l in range(cfg.num_layers):
                Hv = gru_cell(grue[l], Hv, H)
                state = state.at[l, :, v].set(jnp.where(active, Hv, state[l, :, v]))
        return state

    state_f = run("f")
    if cfg.bn:
        # BN graph state: sum over inner vertices 1..nv-2 (models_pyg.py:721-729)
        idx = jnp.arange(cfg.max_n)[None, :]
        m = ((idx >= 1) & (idx < (nv - 1)[:, None])).astype(dtype)
        hg = (state_f[-1] * m[..., None]).sum(1)
        if cfg.bidirectional:
            state_b = run("b")
            hg_b = (state_b[-1] * m[..., None]).sum(1)
            hg = linear(params["hg_unify"], jnp.concatenate([hg, hg_b], -1))
    else:
        last = jnp.clip(nv - 1, 0, cfg.max_n - 1)
        hg = state_f[-1][jnp.arange(B), last]
        if cfg.bidirectional:
            state_b = run("b")
            hg_b = state_b[-1][:, 0]
            hg = linear(params["hg_unify"], jnp.concatenate([hg, hg_b], -1))
    return linear(params["fc1"], hg), linear(params["fc2"], hg)


def _decode_body(dec, cfg: DVAEConfig, z, rng, stochastic, attn_params):
    """Device-resident decode: the entire max_n-step autoregression traced
    into one XLA program (unrolled — max_n is small and static), all
    conditional updates as masks. Bit-identical to `dvae_decode_host`
    (same rng split order) but with zero host round-trips.
    """
    B = z.shape[0]
    H0 = jnp.tanh(linear(dec["fc3"], z))
    types = jnp.full((B, cfg.max_n), cfg.start_type, jnp.int32)
    adj = jnp.zeros((B, cfg.max_n, cfg.max_n), jnp.float32)
    nv = jnp.full((B,), 1, jnp.int32)
    finished = jnp.zeros((B,), bool)

    state = jnp.zeros((cfg.num_layers, B, cfg.max_n, cfg.hs), z.dtype)
    types_oh = jax.nn.one_hot(types, cfg.nvt, dtype=z.dtype)
    state = decoder_update_v(dec, cfg, state, types_oh, adj, nv, 0, H0=H0,
                             attn_params=attn_params)
    vrange = jnp.arange(cfg.max_n)

    for idx in range(1, cfg.max_n):
        if idx == cfg.max_n - 1:
            new_types = jnp.full((B,), cfg.end_type, jnp.int32)
        else:
            Hg = _graph_state(cfg, state, nv)
            logits = _mlp2(dec["add_vertex"], Hg)
            rng, k = jax.random.split(rng)
            if stochastic:
                new_types = jax.random.categorical(k, logits).astype(jnp.int32)
            else:
                new_types = jnp.argmax(logits, -1).astype(jnp.int32)
        grow = ~finished
        types = types.at[:, idx].set(jnp.where(grow, new_types, types[:, idx]))
        nv = jnp.where(grow, idx + 1, nv)
        types_oh = jax.nn.one_hot(types, cfg.nvt, dtype=z.dtype)
        state = decoder_update_v(dec, cfg, state, types_oh, adj, nv, idx,
                                 attn_params=attn_params)

        # connect loose ends to a freshly sampled END vertex
        # (models_pyg.py:383-390): vertices < idx with out-degree 0
        just_ended = grow & (new_types == cfg.end_type)
        loose = (adj.sum(-1) == 0.0) & (vrange[None, :] < idx)  # [B, max_n]
        wire = just_ended[:, None] & loose
        adj = adj.at[:, :, idx].set(jnp.where(wire, 1.0, adj[:, :, idx]))
        finished = finished | just_ended
        # re-propagate (idempotent for graphs whose adj column is unchanged)
        state = decoder_update_v(dec, cfg, state, types_oh, adj, nv, idx,
                                 attn_params=attn_params)

        for vi in range(idx - 1, -1, -1):
            Hvi = state[-1][:, vi]
            H = state[-1][:, idx]
            logits = _edge_score_logits(dec, cfg, Hvi, H, H0)  # [B]
            prob = jax.nn.sigmoid(logits)
            rng, k = jax.random.split(rng)
            if stochastic:
                bits = jax.random.uniform(k, prob.shape) < prob
            else:
                bits = prob > 0.5
            add = bits & ~finished & (nv > idx)
            adj = adj.at[:, vi, idx].set(jnp.where(add, 1.0, adj[:, vi, idx]))
            state = decoder_update_v(dec, cfg, state, types_oh, adj, nv, idx,
                                     attn_params=attn_params)
    return types, adj, nv


_decode_jit = jax.jit(_decode_body, static_argnames=("cfg", "stochastic"))


def dvae_decode(dec, cfg: DVAEConfig, z, rng=None, stochastic=True,
                attn_params=None):
    """Stochastic/greedy decoding (models_pyg.py:338-396), device-resident:
    one jitted dispatch for the whole batch of decodes. Returns
    (types [B, max_n] np, adj [B, max_n, max_n] np, nv [B] np). Finished
    graphs get their loose ends connected to the END vertex.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    types, adj, nv = _decode_jit(dec, cfg, jnp.asarray(z), rng, stochastic,
                                 attn_params)
    return np.asarray(types), np.asarray(adj), np.asarray(nv)
