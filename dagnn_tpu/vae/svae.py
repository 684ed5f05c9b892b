"""S-VAE baselines: string/sequence VAEs over flattened DAG encodings.

Equivalent of the reference SVAE / SVAE_oneshot (reference:
dvae/models.py:18-240): each DAG becomes a [max_n-1, nvt + max_n-1] tensor —
row j encodes vertex j+1 as one-hot(type) ++ incoming-connection bits from
vertices 0..max_n-2 (the decode_*_to_tensor codec, dvae/util.py:114-133).
SVAE runs a GRU over the rows (optionally bidirectional, hg_unify merge);
the decoder feeds relu(fc3(z)) as a constant input sequence to a GRU and
reads per-step type logits + edge probabilities. SVAE_oneshot swaps both
for MLPs over the flattened tensor. Loss = CE(types) + BCE(edges) +
beta * KLD (models.py:138-148).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from dagnn_tpu.data.na import NAGraph
from dagnn_tpu.ops.gru import gru_cell, gru_init
from dagnn_tpu.ops.linear import linear, linear_init
from dagnn_tpu.vae.dvae import kld, reparameterize


@dataclasses.dataclass(frozen=True)
class SVAEConfig:
    max_n: int
    nvt: int
    hs: int = 501
    nz: int = 56
    bidirectional: bool = False
    oneshot: bool = False
    start_type: int = 0
    end_type: int = 1
    beta: float = 0.005
    eps_scale: float = 0.01

    @property
    def xs(self) -> int:
        return self.nvt + self.max_n - 1

    @property
    def steps(self) -> int:
        return self.max_n - 1


def graph_to_string_tensor(g: NAGraph, cfg: SVAEConfig) -> np.ndarray:
    """NAGraph -> [max_n-1, xs] row encoding; padding rows use the START
    type bit (models.py:88-105 _collate_fn semantics)."""
    out = np.zeros((cfg.steps, cfg.xs), np.float32)
    out[:, cfg.start_type] = 1.0  # padding marker, overwritten for real rows
    n = g.num_nodes
    for j in range(1, min(n, cfg.max_n)):
        row = out[j - 1]
        row[:] = 0.0
        row[int(g.types[j])] = 1.0
        preds = np.flatnonzero(np.asarray(g.adj)[: cfg.max_n - 1, j])
        row[cfg.nvt + preds] = 1.0
    return out


def svae_init(key, cfg: SVAEConfig, dtype=jnp.float32) -> Dict:
    ks = iter(jax.random.split(key, 16))
    p: Dict = {
        "fc1": linear_init(next(ks), cfg.hs, cfg.nz, dtype=dtype),
        "fc2": linear_init(next(ks), cfg.hs, cfg.nz, dtype=dtype),
        "fc3": linear_init(next(ks), cfg.nz, cfg.hs, dtype=dtype),
    }
    if cfg.oneshot:
        flat = cfg.steps * cfg.xs
        p["enc1"] = linear_init(next(ks), flat, 2 * flat, dtype=dtype)
        p["enc2"] = linear_init(next(ks), 2 * flat, cfg.hs, dtype=dtype)
        p["dec1"] = linear_init(next(ks), cfg.hs, 2 * cfg.hs, dtype=dtype)
        p["dec2"] = linear_init(next(ks), 2 * cfg.hs, flat, dtype=dtype)
    else:
        p["grue"] = gru_init(next(ks), cfg.xs, cfg.hs, dtype)
        if cfg.bidirectional:
            p["grue_b"] = gru_init(next(ks), cfg.xs, cfg.hs, dtype)
            p["hg_unify"] = linear_init(next(ks), 2 * cfg.hs, cfg.hs, dtype=dtype)
        p["grud"] = gru_init(next(ks), cfg.hs, cfg.hs, dtype)
        p["add_vertex"] = {
            "l1": linear_init(next(ks), cfg.hs, cfg.hs, dtype=dtype),
            "l2": linear_init(next(ks), cfg.hs, cfg.nvt, dtype=dtype),
        }
        p["add_edges"] = {
            "l1": linear_init(next(ks), cfg.hs, cfg.hs, dtype=dtype),
            "l2": linear_init(next(ks), cfg.hs, cfg.max_n - 1, dtype=dtype),
        }
    return p


def _run_gru(gp, xs):
    """GRU over [B, T, X]; returns final hidden [B, H] and all outputs."""
    B = xs.shape[0]
    h0 = jnp.zeros((B, gp["w_hh"].shape[1]), xs.dtype)

    def step(h, x):
        h = gru_cell(gp, x, h)
        return h, h

    h, outs = jax.lax.scan(step, h0, jnp.swapaxes(xs, 0, 1))
    return h, jnp.swapaxes(outs, 0, 1)


def svae_encode(p, cfg: SVAEConfig, G: jnp.ndarray):
    """G: [B, max_n-1, xs] -> (mu, logvar)."""
    if cfg.oneshot:
        hg = jax.nn.relu(linear(p["enc2"], jax.nn.relu(
            linear(p["enc1"], G.reshape(G.shape[0], -1)))))
    else:
        hg, _ = _run_gru(p["grue"], G)
        if cfg.bidirectional:
            hb, _ = _run_gru(p["grue_b"], G[:, ::-1])
            hg = linear(p["hg_unify"], jnp.concatenate([hg, hb], -1))
    return linear(p["fc1"], hg), linear(p["fc2"], hg)


def _decode_scores(p, cfg: SVAEConfig, z):
    h0 = jax.nn.relu(linear(p["fc3"], z))
    if cfg.oneshot:
        s = linear(p["dec2"], jax.nn.relu(linear(p["dec1"], h0)))
        s = s.reshape(len(z), cfg.steps, cfg.xs)
        return s[:, :, : cfg.nvt], jax.nn.sigmoid(s[:, :, cfg.nvt:])
    h_in = jnp.broadcast_to(h0[:, None], (len(z), cfg.steps, cfg.hs))
    _, outs = _run_gru(p["grud"], h_in)
    types = linear(p["add_vertex"]["l2"],
                   jax.nn.relu(linear(p["add_vertex"]["l1"], outs)))
    edges = jax.nn.sigmoid(linear(p["add_edges"]["l2"],
                                  jax.nn.relu(linear(p["add_edges"]["l1"], outs))))
    return types, edges


def svae_loss(p, cfg: SVAEConfig, G: jnp.ndarray, rng, training=True):
    """CE types + BCE edges + beta*KLD (models.py:138-148)."""
    mu, logvar = svae_encode(p, cfg, G)
    z = reparameterize(rng, mu, logvar, cfg.eps_scale, training)
    type_scores, edge_scores = _decode_scores(p, cfg, z)
    true_types = jnp.argmax(G[:, :, : cfg.nvt], -1)
    logp = jax.nn.log_softmax(type_scores, -1)
    ce = -jnp.sum(jnp.take_along_axis(logp, true_types[..., None], -1))
    true_edges = G[:, :, cfg.nvt:]
    es = jnp.clip(edge_scores, 1e-7, 1 - 1e-7)
    bce = -jnp.sum(true_edges * jnp.log(es) + (1 - true_edges) * jnp.log(1 - es))
    recon = ce + bce
    k = kld(mu, logvar)
    return recon + cfg.beta * k, recon, k


def svae_decode(p, cfg: SVAEConfig, z, rng=None, stochastic=True) -> List[NAGraph]:
    """Sample graphs from latents (construct_igraph, models.py:150-186)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    type_scores, edge_scores = _decode_scores(p, cfg, z)
    type_probs = np.asarray(jax.nn.softmax(type_scores, -1))
    edge_probs = np.asarray(edge_scores)
    host = np.random.default_rng(
        int(jax.random.randint(rng, (), 0, np.iinfo(np.int32).max)))
    out = []
    for gi in range(len(z)):
        types = [cfg.start_type]
        adj = np.zeros((cfg.max_n, cfg.max_n), np.uint8)
        for vj in range(1, cfg.max_n):
            if vj == cfg.max_n - 1:
                t = cfg.end_type
            elif stochastic:
                t = int(host.choice(cfg.nvt, p=type_probs[gi, vj - 1]))
            else:
                t = int(np.argmax(type_scores[gi, vj - 1]))
            types.append(t)
            if t == cfg.end_type:
                outdeg = adj[: vj, :].sum(-1)
                for v in np.flatnonzero(outdeg == 0):
                    adj[v, vj] = 1
                break
            for ek in range(vj):
                pe = edge_probs[gi, vj - 1, ek]
                if (host.random() < pe) if stochastic else (pe > 0.5):
                    adj[ek, vj] = 1
        n = len(types)
        out.append(NAGraph(types=np.asarray(types, np.int32),
                           adj=adj[:n, :n]))
    return out
