"""Golden parity vs the ACTUAL pooling baselines (gnn2.py DGCNN /
DiffPoolGNN / UNet / SAGPoolGNN and asap.py ASAP), executing the reference
files verbatim through pyg_shim + pyg_shim_layers.

This closes the last transcription-level model families from the round-4
verdict, including the two previously-documented deviations now
eliminated: UNet's (A+I)^2 adjacency augmentation between depths and
ASAP's S^T A S cluster reconnection both run exactly (dense per-graph
batched matmuls at static shapes on the framework side).
"""

import os

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not mounted")

import dataclasses
import importlib.util
import types

import torch
import jax

from dagnn_tpu.dag.batch import PadConfig, collate
from dagnn_tpu.nn.encoders import EncoderSpec
from dagnn_tpu.nn.pooling_baselines import (HPoolConfig, hpool_init,
                                            hpool_forward)

from pyg_shim import load_reference_gnn2
from test_dagnn import random_dag_graph


@pytest.fixture(scope="module")
def ref_mods():
    return load_reference_gnn2()


@pytest.fixture(scope="module")
def ref_ast_encoder_cls():
    spec = importlib.util.spec_from_file_location(
        "ref_utils_pool", f"{REF}/ogbg-code/utils.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m.ASTNodeEncoder


def _t(a):
    return torch.tensor(np.asarray(a, np.float32))


def _set_lin(tlin, p):
    tlin.weight.data = _t(p["w"])
    if getattr(tlin, "bias", None) is not None and "b" in p:
        tlin.bias.data = _t(p["b"])


def _set_encoder(ne, enc):
    ne.type_encoder.weight.data = _t(enc["type_emb"])
    ne.attribute_encoder.weight.data = _t(enc["attr_emb"])
    ne.depth_encoder.weight.data = _t(enc["depth_emb"])


def _set_heads(tmodel, head):
    w, b = np.asarray(head["w"]), np.asarray(head["b"])
    for i, lin in enumerate(tmodel.graph_pred_linear_list):
        lin.weight.data = _t(w[i])
        lin.bias.data = _t(b[i])


def _set_gcn(tconv, p):
    tconv.weight.data = _t(np.asarray(p["w"]).T)   # ours [out,in]; PyG [in,out]
    if tconv.bias is not None and "b" in p:
        tconv.bias.data = _t(p["b"])


def _set_conv1d(tm, p):
    # conv1d_params1: Conv1d(1, c1, D, D) == per-node linear over D block
    c1w = np.asarray(p["c1"]["w"])                 # [c1, D]
    tm.conv1d_params1.weight.data = _t(c1w[:, None, :])
    tm.conv1d_params1.bias.data = _t(p["c1"]["b"])
    # conv1d_params2: Conv1d(c1, c2, kw, 1); ours [kw, c1, c2]
    c2w = np.asarray(p["c2w"])
    tm.conv1d_params2.weight.data = _t(c2w.transpose(2, 1, 0))
    tm.conv1d_params2.bias.data = _t(p["c2b"])


def _make_batch(rng, d, nearmax=10):
    graphs = []
    for n in (7, nearmax, 6):
        g = random_dag_graph(rng, n, d)
        # unique attr ids per graph: structurally symmetric nodes with
        # identical features produce EXACT pooling-score ties, whose
        # resolution is sort-order-dependent (torch vs jnp argsort) —
        # distinct features make every score generically unique
        g.x = np.stack([rng.integers(0, 9, n),
                        rng.permutation(11)[:n]], 1).astype(np.int32)
        g.extras["node_depth"] = rng.integers(0, 7, n).astype(np.int32)
        e = g.num_edges
        src2 = np.concatenate([g.edge_src, g.edge_dst])
        dst2 = np.concatenate([g.edge_dst, g.edge_src])
        ea = np.zeros((2 * e, 2), np.float32)
        ea[:e, 0] = 1
        ea[e:, 1] = 1
        g.edge_src, g.edge_dst, g.edge_attr = src2, dst2, ea
        graphs.append(g)
    off = np.cumsum([0] + [g.num_nodes for g in graphs])
    src = np.concatenate([g.edge_src + o for g, o in zip(graphs, off)])
    dst = np.concatenate([g.edge_dst + o for g, o in zip(graphs, off)])
    tG = types.SimpleNamespace(
        x=torch.tensor(np.concatenate([g.x for g in graphs]),
                       dtype=torch.long),
        edge_index=torch.tensor(np.stack([src, dst]), dtype=torch.long),
        edge_attr=_t(np.concatenate([g.edge_attr for g in graphs])),
        node_depth=torch.tensor(
            np.concatenate([g.extras["node_depth"] for g in graphs]),
            dtype=torch.long).reshape(-1, 1),
        batch=torch.tensor(np.concatenate(
            [np.full(g.num_nodes, i) for i, g in enumerate(graphs)]),
            dtype=torch.long),
    )
    pad = PadConfig(max_nodes=int(off[-1]), max_edges=len(src) + 1,
                    max_graphs=3, max_levels=1, nodes_per_level=1,
                    edges_per_level=1)
    return graphs, tG, collate(graphs, pad, build_schedules=False)


def _run(tmodel, tG):
    tmodel.train()   # parity mode: batch-stat BN, dropout configured 0
    with torch.no_grad():
        return torch.stack(tmodel(tG), dim=1).numpy()


def _enc_cfg(d):
    return EncoderSpec("ast", emb_dim=d, num_nodetypes=9,
                       num_nodeattributes=11, max_depth=4)


def test_dgcnn_matches_reference(ref_mods, ref_ast_encoder_cls):
    gnn2, _, _ = ref_mods
    rng = np.random.default_rng(21)
    d, k = 12, 12
    cfg = HPoolConfig(kind="dgcnn", emb_dim=d, num_vocab=7, max_seq_len=2,
                      num_rels=2, num_layers=3, k=k, hidden=8, dropout=0.0,
                      encoder=_enc_cfg(d))
    params = hpool_init(jax.random.PRNGKey(11), cfg)
    graphs, tG, batch = _make_batch(rng, d)

    tm = gnn2.DGCNN(7, 2, ref_ast_encoder_cls(d, 9, 11, 4), d, 2,
                    num_layers=3, k=k)
    tm.hidden_dim = 8  # field is informational post-init
    # rebuild conv widths to hidden=8 like our config
    import pyg_shim_layers as L
    tm.latent_dim = [8, 8, 8, 1]
    tm.total_latent_dim = sum(tm.latent_dim)
    tm.conv_params = torch.nn.ModuleList(
        [L.GCNConv(d + 2, 8), L.GCNConv(8, 8), L.GCNConv(8, 8),
         L.GCNConv(8, 1)])
    tm.conv1d_params1 = torch.nn.Conv1d(1, 16, tm.total_latent_dim,
                                        tm.total_latent_dim)
    _set_encoder(tm.node_encoder, params["encoder"])
    for l, lp in enumerate(params["convs"]):
        _set_gcn(tm.conv_params[l], lp)
    _set_conv1d(tm, params["conv1d"])
    _set_heads(tm, params["head"])
    want = _run(tm, tG)

    got = np.asarray(hpool_forward(params, cfg, batch))
    np.testing.assert_allclose(got[: len(graphs)], want,
                               atol=3e-5, rtol=3e-4)


def test_sagpool_matches_reference(ref_mods, ref_ast_encoder_cls):
    gnn2, _, _ = ref_mods
    rng = np.random.default_rng(22)
    d = 12
    cfg = HPoolConfig(kind="sagpool", emb_dim=d, num_vocab=7, max_seq_len=2,
                      num_layers=3, pooling_ratio=0.5, dropout=0.0,
                      encoder=_enc_cfg(d))
    params = hpool_init(jax.random.PRNGKey(12), cfg)
    graphs, tG, batch = _make_batch(rng, d)

    tm = gnn2.SAGPoolGNN(7, 2, ref_ast_encoder_cls(d, 9, 11, 4), d,
                         num_layers=3, dropout_ratio=0.0)
    _set_encoder(tm.node_encoder, params["encoder"])
    _set_gcn(tm.conv1, params["convs"][0])
    for l in range(2):
        _set_gcn(tm.convs[l], params["convs"][l + 1])
    pools = [tm.pool1] + list(tm.pools)
    for l, pool in enumerate(pools):
        _set_lin(pool.gnn.lin_rel, params["scores"][l]["rel"])
        _set_lin(pool.gnn.lin_root, params["scores"][l]["root"])
    _set_lin(tm.lin1, params["lin1"])
    _set_lin(tm.lin2, params["lin2"])
    _set_heads(tm, params["head"])
    want = _run(tm, tG)

    got = np.asarray(hpool_forward(params, cfg, batch))
    np.testing.assert_allclose(got[: len(graphs)], want,
                               atol=3e-5, rtol=3e-4)


def test_diffpool_matches_reference(ref_mods, ref_ast_encoder_cls):
    gnn2, _, _ = ref_mods
    rng = np.random.default_rng(23)
    d = 12
    graphs, tG, batch = _make_batch(rng, d)
    nmax = max(g.num_nodes for g in graphs)
    cfg = HPoolConfig(kind="diffpool", emb_dim=d, num_vocab=7, max_seq_len=2,
                      max_nodes=16, dense_nodes=nmax, dropout=0.0,
                      encoder=_enc_cfg(d))
    params = hpool_init(jax.random.PRNGKey(13), cfg)

    tm = gnn2.DiffPoolGNN(7, 2, ref_ast_encoder_cls(d, 9, 11, 4), d,
                          max_nodes=16)
    _set_encoder(tm.node_encoder, params["encoder"])

    def set_gnn(tgnn, block):
        for i, lp in enumerate(block["convs"], start=1):
            conv = getattr(tgnn, f"conv{i}")
            _set_lin(conv.lin_rel, lp["rel"])
            _set_lin(conv.lin_root, lp["root"])
            bn = getattr(tgnn, f"bn{i}")
            bn.weight.data = _t(lp["bn_s"])
            bn.bias.data = _t(lp["bn_b"])
        if "lin" in block:
            _set_lin(tgnn.lin, block["lin"])

    set_gnn(tm.gnn1_pool, params["gnn1_pool"])
    set_gnn(tm.gnn1_embed, params["gnn1_embed"])
    set_gnn(tm.gnn2_pool, params["gnn2_pool"])
    set_gnn(tm.gnn2_embed, params["gnn2_embed"])
    set_gnn(tm.gnn3_embed, params["gnn3_embed"])
    _set_lin(tm.lin1, params["lin1"])
    _set_heads(tm, params["head"])
    want = _run(tm, tG)

    got = np.asarray(hpool_forward(params, cfg, batch))
    np.testing.assert_allclose(got[: len(graphs)], want,
                               atol=5e-5, rtol=5e-4)


def test_unet_matches_reference(ref_mods, ref_ast_encoder_cls):
    gnn2, _, _ = ref_mods
    rng = np.random.default_rng(24)
    d, k = 12, 12
    graphs, tG, batch = _make_batch(rng, d)
    nmax = max(g.num_nodes for g in graphs)
    # num_layers only sets total_latent_dim = hidden*num_layers + 1 here
    # (the UNet depth is fixed at 4 like the reference, gnn2.py:591)
    cfg = HPoolConfig(kind="unet", emb_dim=d, num_vocab=7, max_seq_len=2,
                      num_rels=2, num_layers=3, k=k, hidden=8,
                      dense_nodes=nmax, dropout=0.0, encoder=_enc_cfg(d))
    params = hpool_init(jax.random.PRNGKey(14), cfg)

    tm = gnn2.UNet(7, 2, ref_ast_encoder_cls(d, 9, 11, 4), d, 2, 4, k=k)
    # shrink to our hidden=8 latent head (total_latent_dim = 3*8+1 = 25)
    import pyg_shim_layers as L
    tm.latent_dim = [8, 8, 8, 1]
    tm.total_latent_dim = sum(tm.latent_dim)
    tm.unet = L.GraphUNet(d + 2, d, tm.total_latent_dim, depth=4,
                          pool_ratios=[0.9, 0.7, 0.6, 0.5])
    tm.conv1d_params1 = torch.nn.Conv1d(1, 16, tm.total_latent_dim,
                                        tm.total_latent_dim)
    _set_encoder(tm.node_encoder, params["encoder"])
    for i, lp in enumerate(params["down"]):
        _set_gcn(tm.unet.down_convs[i], lp)
    for i, w in enumerate(params["pool_w"]):
        tm.unet.pools[i].weight.data = _t(np.asarray(w)[None])
    for i, lp in enumerate(params["up"]):
        _set_gcn(tm.unet.up_convs[i], lp)
    _set_conv1d(tm, params["conv1d"])
    _set_heads(tm, params["head"])
    want = _run(tm, tG)

    assert cfg.total_latent_dim == tm.total_latent_dim
    got = np.asarray(hpool_forward(params, cfg, batch))
    np.testing.assert_allclose(got[: len(graphs)], want,
                               atol=5e-5, rtol=5e-4)


def test_asap_matches_reference(ref_mods, ref_ast_encoder_cls):
    _, asap_mod, _ = ref_mods
    rng = np.random.default_rng(25)
    d = 12
    graphs, tG, batch = _make_batch(rng, d)
    nmax = max(g.num_nodes for g in graphs)
    cfg = HPoolConfig(kind="asap", emb_dim=d, num_vocab=7, max_seq_len=2,
                      num_layers=3, asap_hidden=d, asap_ratio=0.8,
                      dense_nodes=nmax, dropout=0.0, encoder=_enc_cfg(d))
    params = hpool_init(jax.random.PRNGKey(15), cfg)

    tm = asap_mod.ASAP(7, 2, ref_ast_encoder_cls(d, 9, 11, 4), d,
                       num_layers=3, hidden=d, ratio=0.8, dropout=0.0)
    _set_encoder(tm.node_encoder, params["encoder"])
    _set_lin(tm.conv1.lin_rel, params["conv1"]["rel"])
    _set_lin(tm.conv1.lin_root, params["conv1"]["root"])
    for l, cp in enumerate(params["convs"]):
        _set_lin(tm.convs[l].lin_rel, cp["rel"])
        _set_lin(tm.convs[l].lin_root, cp["root"])
    for l, pp in enumerate(params["pools"]):
        pool = tm.pools[l]
        _set_lin(pool.lin, pp["lin"])
        _set_lin(pool.att, pp["att"])
        _set_lin(pool.gnn_score.lin1, pp["le1"])
        _set_lin(pool.gnn_score.lin2, pp["le2"])
        _set_lin(pool.gnn_score.lin3, pp["le3"])
    _set_lin(tm.lin1, params["lin1"])
    _set_heads(tm, params["head"])
    # eval(): asap.py:69 HARDCODES F.dropout(p=0.5, training=self.training)
    # — unlike the other baselines there is no dropout knob to zero; ASAP
    # has no BatchNorms, so eval() only disables that dropout
    tm.eval()
    with torch.no_grad():
        want = torch.stack(tm(tG), dim=1).numpy()

    got = np.asarray(hpool_forward(params, cfg, batch))
    np.testing.assert_allclose(got[: len(graphs)], want,
                               atol=5e-5, rtol=5e-4)
