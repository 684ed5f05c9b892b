"""Golden parity vs the ACTUAL OGB baseline GNNs (model/conv.py +
model/gnn.py): GIN / GCN, with and without virtual node, full model
(AST encoder -> conv stack with batch norms -> pooling -> token heads).

Reference runs in train() mode with drop_ratio=0 so the BatchNorms use
batch statistics (matching the framework's masked batch norm; the padded
batch's masks exclude pad rows, reproducing the unpadded statistics).
"""

import os

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not mounted")

import importlib.util
import types

import torch
import jax
import jax.numpy as jnp

from dagnn_tpu.dag.batch import collate
from dagnn_tpu.nn.baselines import MPNNConfig, mpnn_init, mpnn_forward
from dagnn_tpu.nn.encoders import EncoderSpec

from pyg_shim import load_reference_baseline_gnn
from test_dagnn import random_dag_graph


@pytest.fixture(scope="module")
def ref_gnn():
    return load_reference_baseline_gnn()


@pytest.fixture(scope="module")
def ref_ast_encoder_cls():
    spec = importlib.util.spec_from_file_location(
        "ref_utils_bl", f"{REF}/ogbg-code/utils.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m.ASTNodeEncoder


def _t(a):
    return torch.tensor(np.asarray(a, np.float32))


def _set_lin(tlin, p):
    tlin.weight.data = _t(p["w"])
    if getattr(tlin, "bias", None) is not None and "b" in p:
        tlin.bias.data = _t(p["b"])


def _set_bn(bn, scale, bias):
    bn.weight.data = _t(scale)
    bn.bias.data = _t(bias)


def _copy(tmodel, params, cfg):
    enc = params["encoder"]
    ne = tmodel.gnn_node.node_encoder
    ne.type_encoder.weight.data = _t(enc["type_emb"])
    ne.attribute_encoder.weight.data = _t(enc["attr_emb"])
    ne.depth_encoder.weight.data = _t(enc["depth_emb"])
    for l, lp in enumerate(params["layers"]):
        conv = tmodel.gnn_node.convs[l]
        _set_lin(conv.edge_encoder, lp["edge_encoder"])
        if cfg.gnn_type == "gin":
            _set_lin(conv.mlp[0], lp["mlp1"])
            _set_bn(conv.mlp[1], lp["bn_scale"], lp["bn_bias"])
            _set_lin(conv.mlp[3], lp["mlp2"])
            conv.eps.data = _t(lp["eps"]).reshape(1)
        else:
            _set_lin(conv.linear, lp["linear"])
            conv.root_emb.weight.data = _t(lp["root_emb"]).reshape(1, -1)
        _set_bn(tmodel.gnn_node.batch_norms[l],
                lp["out_bn_scale"], lp["out_bn_bias"])
    if cfg.virtual_node:
        for l, mlp in enumerate(params["vn_mlps"]):
            seq = tmodel.gnn_node.mlp_virtualnode_list[l]
            _set_lin(seq[0], mlp["l1"])
            _set_bn(seq[1], mlp["bn1_scale"], mlp["bn1_bias"])
            _set_lin(seq[3], mlp["l2"])
            _set_bn(seq[4], mlp["bn2_scale"], mlp["bn2_bias"])
    w, b = np.asarray(params["head"]["w"]), np.asarray(params["head"]["b"])
    for i, lin in enumerate(tmodel.graph_pred_linear_list):
        lin.weight.data = _t(w[i])
        lin.bias.data = _t(b[i])


@pytest.mark.parametrize("gnn_type,vn", [("gin", False), ("gin", True),
                                         ("gcn", False), ("gcn", True)])
def test_matches_actual_reference_baseline(ref_gnn, ref_ast_encoder_cls,
                                           gnn_type, vn):
    rng = np.random.default_rng(77)
    d = 12
    cfg = MPNNConfig(gnn_type=gnn_type, num_layers=3, emb_dim=d,
                     dropout=0.0, virtual_node=vn, num_vocab=7,
                     max_seq_len=2, graph_pooling="mean",
                     encoder=EncoderSpec("ast", emb_dim=d, num_nodetypes=9,
                                         num_nodeattributes=11,
                                         max_depth=4))
    graphs = []
    for n in (6, 9, 5):
        g = random_dag_graph(rng, n, d)
        g.x = np.stack([rng.integers(0, 9, n),
                        rng.integers(0, 11, n)], 1).astype(np.int32)
        g.extras["node_depth"] = rng.integers(0, 7, n).astype(np.int32)
        graphs.append(g)
    params = mpnn_init(jax.random.PRNGKey(41), cfg)

    enc_t = ref_ast_encoder_cls(d, 9, 11, 4)
    tmodel = ref_gnn.GNN(cfg.num_vocab, cfg.max_seq_len, enc_t,
                         num_layer=cfg.num_layers, emb_dim=d,
                         gnn_type=gnn_type, virtual_node=vn,
                         drop_ratio=0.0, graph_pooling="mean")
    _copy(tmodel, params, cfg)
    tmodel.train()  # batch-stat BN; dropout is 0

    off = np.cumsum([0] + [g.num_nodes for g in graphs])
    src = np.concatenate([g.edge_src + o for g, o in zip(graphs, off)])
    dst = np.concatenate([g.edge_dst + o for g, o in zip(graphs, off)])
    G = types.SimpleNamespace(
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
    with torch.no_grad():
        want = torch.stack(tmodel(G), dim=1).numpy()

    batch = collate(graphs)
    got = np.asarray(mpnn_forward(params, cfg, batch))
    np.testing.assert_allclose(got[: len(graphs)], want,
                               atol=3e-5, rtol=3e-4)
