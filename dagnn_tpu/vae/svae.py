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
    # GraphRNN decoder (reference SVAE_GraphRNN, models.py:240-338): graph-
    # level GRU emits per-vertex states; a second edge-level GRU rolls over
    # the connection bits of each vertex. bfs additionally re-orders nodes by
    # a random BFS at collate time and widens rows to nvt+max_n
    # (SVAE_GraphRNN_BFS, models.py:338-460).
    graphrnn: bool = False
    bfs: bool = False
    start_type: int = 0
    end_type: int = 1
    beta: float = 0.005
    eps_scale: float = 0.01

    @property
    def xs(self) -> int:
        return self.nvt + (self.max_n if self.bfs else self.max_n - 1)

    @property
    def steps(self) -> int:
        return self.max_n if self.bfs else self.max_n - 1

    @property
    def edge_bits(self) -> int:
        return self.xs - self.nvt


def graph_to_string_tensor(g: NAGraph, cfg: SVAEConfig,
                           rng: "np.random.Generator" = None) -> np.ndarray:
    """NAGraph -> [steps, xs] row encoding; padding rows use the START
    type bit (models.py:88-105 _collate_fn semantics). With cfg.bfs, nodes
    are first permuted by a random BFS over the undirected skeleton and all
    max_n rows (incl. the start node) are emitted
    (SVAE_GraphRNN_BFS._collate_fn, models.py:400-420)."""
    out = np.zeros((cfg.steps, cfg.xs), np.float32)
    out[:, cfg.start_type] = 1.0  # padding marker, overwritten for real rows
    n = g.num_nodes
    adj = np.asarray(g.adj)
    types = np.asarray(g.types)
    if cfg.bfs:
        order = _random_bfs_order(adj[:n, :n], rng or np.random.default_rng())
        adj = adj[np.ix_(order, order)]
        types = types[order]
        for j in range(min(n, cfg.max_n)):
            row = out[j]
            row[:] = 0.0
            row[int(types[j])] = 1.0
            preds = np.flatnonzero(adj[: cfg.max_n, j])
            row[cfg.nvt + preds] = 1.0
        return out
    for j in range(1, min(n, cfg.max_n)):
        row = out[j - 1]
        row[:] = 0.0
        row[int(types[j])] = 1.0
        preds = np.flatnonzero(adj[: cfg.max_n - 1, j])
        row[cfg.nvt + preds] = 1.0
    return out


def _random_bfs_order(adj: np.ndarray, rng) -> np.ndarray:
    """Random-start BFS over the undirected skeleton (models.py:360-377);
    unreached nodes (disconnected) are appended in index order."""
    n = adj.shape[0]
    und = (adj + adj.T) > 0
    seen = np.zeros(n, bool)
    order = []
    queue = [int(rng.integers(n))]
    while queue:
        cur = queue.pop(0)
        if seen[cur]:
            continue
        seen[cur] = True
        order.append(cur)
        for x in np.flatnonzero(und[cur]):
            if not seen[x]:
                queue.append(int(x))
    order.extend(int(i) for i in np.flatnonzero(~seen))
    return np.asarray(order)


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
    elif cfg.graphrnn:
        p["grue"] = gru_init(next(ks), cfg.xs, cfg.hs, dtype)
        if cfg.bidirectional:
            p["grue_b"] = gru_init(next(ks), cfg.xs, cfg.hs, dtype)
            p["hg_unify"] = linear_init(next(ks), 2 * cfg.hs, cfg.hs, dtype=dtype)
        p["grud"] = gru_init(next(ks), cfg.xs, cfg.hs, dtype)       # graph level
        p["grud_edge"] = gru_init(next(ks), 1, cfg.hs, dtype)       # edge level
        p["add_vertex"] = {
            "l1": linear_init(next(ks), cfg.hs, cfg.hs, dtype=dtype),
            "l2": linear_init(next(ks), cfg.hs, cfg.nvt, dtype=dtype),
        }
        p["add_edge"] = {
            "l1": linear_init(next(ks), cfg.hs, cfg.hs, dtype=dtype),
            "l2": linear_init(next(ks), cfg.hs, 1, dtype=dtype),
        }
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


def _run_gru(gp, xs, h0=None):
    """GRU over [B, T, X]; returns final hidden [B, H] and all outputs."""
    B = xs.shape[0]
    if h0 is None:
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


def _graphrnn_scores(p, cfg: SVAEConfig, z, G):
    """Teacher-forced GraphRNN decoder scores (models.py:301-330): a graph-
    level GRU over the shifted true rows emits per-vertex states; per vertex
    an edge-level GRU rolls over the shifted true connection bits."""
    B, T, E = len(z), cfg.steps, cfg.edge_bits
    h0 = jax.nn.relu(linear(p["fc3"], z))
    g_in = jnp.concatenate([jnp.zeros((B, 1, cfg.xs), z.dtype), G[:, :-1]], 1)
    _, g_out = _run_gru(p["grud"], g_in, h0)            # [B, T, hs]
    types = _mlp2r(p["add_vertex"], g_out)              # [B, T, nvt]
    # edge level: batch = (graph, vertex); init hidden = that vertex's state
    h0_e = g_out.reshape(B * T, cfg.hs)
    bits = G[:, :, cfg.nvt:]
    e_in = jnp.concatenate([jnp.zeros((B, T, 1), z.dtype), bits[:, :, :-1]], 2)
    e_in = e_in.reshape(B * T, E, 1)
    _, e_out = _run_gru(p["grud_edge"], e_in, h0_e)     # [B*T, E, hs]
    edges = jax.nn.sigmoid(_mlp2r(p["add_edge"], e_out))[..., 0]
    return types, edges.reshape(B, T, E)


def _mlp2r(mp, x):
    return linear(mp["l2"], jax.nn.relu(linear(mp["l1"], x)))


def svae_loss(p, cfg: SVAEConfig, G: jnp.ndarray, rng, training=True):
    """CE types + BCE edges + beta*KLD (models.py:138-148)."""
    mu, logvar = svae_encode(p, cfg, G)
    z = reparameterize(rng, mu, logvar, cfg.eps_scale, training)
    if cfg.graphrnn:
        type_scores, edge_scores = _graphrnn_scores(p, cfg, z, G)
    else:
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


def _graphrnn_sample(p, cfg: SVAEConfig, z, rng):
    """Autoregressive GraphRNN sampling (models.py:255-296): sampled types
    and edge bits are fed back as the next inputs. Returns one-hot type
    scores and 0/1 edge bits (the constructor then thresholds)."""
    B, E = len(z), cfg.edge_bits
    h = jax.nn.relu(linear(p["fc3"], z))
    row = jnp.zeros((B, cfg.xs), z.dtype)
    g_cell = jax.jit(lambda x, h: gru_cell(p["grud"], x, h))
    e_cell = jax.jit(lambda x, h: gru_cell(p["grud_edge"], x, h))
    tscores, escores = [], []
    for vi in range(cfg.steps):
        h = g_cell(row, h)
        logits = _mlp2r(p["add_vertex"], h)
        rng, k = jax.random.split(rng)
        t = jax.random.categorical(k, logits)
        t_oh = jax.nn.one_hot(t, cfg.nvt, dtype=z.dtype)
        he = h
        e_in = jnp.zeros((B, 1), z.dtype)
        bits = []
        for ej in range(E):
            he = e_cell(e_in, he)
            pe = jax.nn.sigmoid(_mlp2r(p["add_edge"], he))[:, 0]
            rng, k = jax.random.split(rng)
            bit = jax.random.bernoulli(k, pe).astype(z.dtype)
            bits.append(bit)
            e_in = bit[:, None]
        bits = jnp.stack(bits, -1)                      # [B, E]
        tscores.append(t_oh)
        escores.append(bits)
        row = jnp.concatenate([t_oh, bits], -1)
    return jnp.stack(tscores, 1), jnp.stack(escores, 1)


def svae_decode(p, cfg: SVAEConfig, z, rng=None, stochastic=True) -> List[NAGraph]:
    """Sample graphs from latents (construct_igraph, models.py:150-186).
    GraphRNN variants sample autoregressively then construct
    deterministically from the sampled one-hots/bits (models.py:297-299);
    the BFS variant clips edge bits to ej < vj so the result stays a DAG."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if cfg.graphrnn:
        type_scores, edge_scores = _graphrnn_sample(p, cfg, z, rng)
        stochastic = False
    else:
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
                # row index: bfs rows cover all vertices incl. the start node
                t = int(np.argmax(type_scores[gi, vj if cfg.bfs else vj - 1]))
            types.append(t)
            if t == cfg.end_type:
                outdeg = adj[: vj, :].sum(-1)
                for v in np.flatnonzero(outdeg == 0):
                    adj[v, vj] = 1
                break
            for ek in range(vj):
                pe = edge_probs[gi, vj if cfg.bfs else vj - 1, ek]
                if (host.random() < pe) if stochastic else (pe > 0.5):
                    adj[ek, vj] = 1
        n = len(types)
        out.append(NAGraph(types=np.asarray(types, np.int32),
                           adj=adj[:n, :n]))
    return out
