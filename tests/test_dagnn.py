"""DAGNN model parity tests: scan implementation vs literal numpy oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dagnn_tpu.dag.batch import DAGGraph, PadConfig, collate
from dagnn_tpu.nn.dagnn import DAGNNConfig, dagnn_init, dagnn_forward
from dagnn_tpu.nn.encoders import EncoderSpec

from oracle_dagnn import oracle_dagnn_forward


def random_dag_graph(rng, n, f, num_rels=2, p=0.35, seed_y=0):
    perm = rng.permutation(n)
    src, dst = [], []
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < p:
                src.append(perm[i]); dst.append(perm[j])
    if not src:  # ensure at least one edge
        src, dst = [perm[0]], [perm[1]]
    e = len(src)
    ea = np.zeros((e, num_rels), np.float32)
    ea[np.arange(e), rng.integers(0, num_rels, e)] = 1.0
    return DAGGraph(
        num_nodes=n,
        edge_src=np.array(src), edge_dst=np.array(dst),
        x=rng.normal(size=(n, f)).astype(np.float32),
        edge_attr=ea,
    )


def batch_inputs(graphs):
    """Unpadded concatenation for the oracle."""
    off = np.cumsum([0] + [g.num_nodes for g in graphs])
    src = np.concatenate([g.edge_src + o for g, o in zip(graphs, off)])
    dst = np.concatenate([g.edge_dst + o for g, o in zip(graphs, off)])
    x = np.concatenate([g.x for g in graphs])
    ea = np.concatenate([g.edge_attr for g in graphs])
    gid = np.concatenate([np.full(g.num_nodes, i) for i, g in enumerate(graphs)])
    for g in graphs:
        g.ensure_levels()
    lf = np.concatenate([g.level_fwd for g in graphs])
    lr = np.concatenate([g.level_rev for g in graphs])
    return src, dst, x, ea, gid, lf, lr


CONFIGS = [
    dict(agg="attn_h"),
    dict(agg="attn_h", bidirectional=False),
    dict(agg="attn_h", out_pool_all=False),
    dict(agg="attn_h", out_pool_all=False, bidirectional=False),
    dict(agg="attn_h", out_wx=False),
    dict(agg="attn_x"),
    dict(agg="mattn_h"),
    dict(agg="self_attn_h"),
    dict(agg="self_attn_x"),
    dict(agg="gated_sum"),
    dict(agg="gated_sum", mapper_bias=False),
    dict(agg="add"),
    dict(agg="max"),
    dict(agg="attn_h", w_edge_attr=False),
    dict(agg="attn_h", recurr=False),
    dict(agg="attn_x", agg_x=True, emb_dim=6, hidden_dim=9),
    dict(agg="add", agg_x=True, emb_dim=6, hidden_dim=9),
    dict(agg="gated_sum", agg_x=True, emb_dim=6, hidden_dim=9),
    dict(agg="attn_h", out_pool="mean"),
    dict(agg="attn_h", out_pool="add"),
    dict(agg="attn_h", out_pool="attn"),
    dict(agg="attn_h", num_class=7),
    dict(agg="attn_h", num_vocab=1),
]


@pytest.mark.parametrize("overrides", CONFIGS, ids=lambda o: "-".join(f"{k}={v}" for k, v in o.items()))
def test_forward_matches_oracle(overrides):
    rng = np.random.default_rng(42)
    f = overrides.get("emb_dim", 8)
    cfg = DAGNNConfig(
        num_vocab=overrides.pop("num_vocab", 11),
        max_seq_len=3,
        emb_dim=f,
        hidden_dim=overrides.pop("hidden_dim", 8),
        num_rels=2,
        num_layers=2,
        encoder=EncoderSpec("identity"),
        **{k: v for k, v in overrides.items() if k != "emb_dim"},
    )
    graphs = [random_dag_graph(rng, n, f) for n in (6, 9, 4)]
    params = dagnn_init(jax.random.PRNGKey(0), cfg)

    src, dst, x, ea, gid, lf, lr = batch_inputs(graphs)
    want = oracle_dagnn_forward(params, cfg, src, dst, x, gid, len(graphs),
                                edge_attr=ea, level_fwd=lf, level_rev=lr)

    batch = collate(graphs)
    got = np.asarray(dagnn_forward(params, cfg, batch))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


def test_forward_padding_invariance():
    """Padding the batch (extra level slots, node slots, graphs) must not
    change outputs for real graphs."""
    rng = np.random.default_rng(7)
    cfg = DAGNNConfig(num_vocab=5, max_seq_len=2, emb_dim=6, hidden_dim=6,
                      encoder=EncoderSpec("identity"))
    graphs = [random_dag_graph(rng, 7, 6), random_dag_graph(rng, 5, 6)]
    params = dagnn_init(jax.random.PRNGKey(1), cfg)

    tight = collate(graphs)
    pad = PadConfig(max_nodes=64, max_edges=96, max_graphs=5,
                    max_levels=12, nodes_per_level=16, edges_per_level=24)
    loose = collate(graphs, pad)
    out_t = np.asarray(dagnn_forward(params, cfg, tight))
    out_l = np.asarray(dagnn_forward(params, cfg, loose))
    np.testing.assert_allclose(out_l[:2], out_t, atol=1e-5, rtol=1e-4)


def test_forward_jit_and_garbage_row_inert():
    rng = np.random.default_rng(8)
    cfg = DAGNNConfig(num_vocab=5, max_seq_len=2, emb_dim=6, hidden_dim=6,
                      encoder=EncoderSpec("identity"))
    graphs = [random_dag_graph(rng, 6, 6)]
    params = dagnn_init(jax.random.PRNGKey(2), cfg)
    batch = collate(graphs)
    fwd = jax.jit(lambda p, b: dagnn_forward(p, cfg, b))
    out1 = np.asarray(fwd(params, batch))
    # poison the garbage row; outputs must not move
    poisoned = batch._replace(x=batch.x.at[-1].set(1e6) if hasattr(batch.x, "at")
                              else _poison(batch.x))
    out2 = np.asarray(fwd(params, poisoned))
    np.testing.assert_allclose(out1, out2, atol=0, rtol=0)


def _poison(x):
    x = np.array(x, copy=True)
    x[-1] = 1e6
    return x


def test_ast_encoder_forward():
    rng = np.random.default_rng(9)
    enc = EncoderSpec("ast", emb_dim=6, num_nodetypes=10, num_nodeattributes=12, max_depth=4)
    cfg = DAGNNConfig(num_vocab=5, max_seq_len=2, emb_dim=6, hidden_dim=6, encoder=enc)
    g = random_dag_graph(rng, 6, 6)
    g.x = rng.integers(0, 10, size=(6, 2)).astype(np.int32)
    g.x[:, 1] = rng.integers(0, 12, size=6)
    g.extras["node_depth"] = rng.integers(0, 9, size=6).astype(np.int32)
    params = dagnn_init(jax.random.PRNGKey(3), cfg)
    batch = collate([g])
    out = np.asarray(dagnn_forward(params, cfg, batch))
    assert out.shape == (1, 2, 5)
    assert np.isfinite(out).all()

    src, dst, x, ea, gid, lf, lr = batch_inputs([g])
    want = oracle_dagnn_forward(params, cfg, src, dst, g.x, gid, 1,
                                edge_attr=ea, node_depth=g.extras["node_depth"],
                                level_fwd=lf, level_rev=lr)
    np.testing.assert_allclose(out, want, atol=2e-5, rtol=2e-4)
