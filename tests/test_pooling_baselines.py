"""Hierarchical/sort pooling baselines: shapes, masking, top-k semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dagnn_tpu.dag.batch import DAGGraph, PadConfig, collate
from dagnn_tpu.nn.encoders import EncoderSpec
from dagnn_tpu.nn.pooling_baselines import (HPoolConfig, hpool_init,
                                            hpool_forward, topk_mask)

KINDS = ["dgcnn", "unet", "diffpool", "sagpool", "asap"]


def _graphs(n_graphs=4, seed=0):
    rng = np.random.default_rng(seed)
    gs = []
    for i in range(n_graphs):
        n = int(rng.integers(5, 20))
        src, dst = [], []
        for a in range(n):
            for b in range(a + 1, n):
                if rng.random() < 0.25:
                    src.append(a); dst.append(b)
        if not src:
            src, dst = [0], [1]
        e = len(src)
        gs.append(DAGGraph(
            num_nodes=n, edge_src=np.array(src), edge_dst=np.array(dst),
            x=np.stack([rng.integers(0, 9, n), rng.integers(0, 11, n)], 1),
            edge_attr=rng.integers(0, 2, (e, 2)).astype(np.float32),
            extras={"node_depth": rng.integers(0, 5, n)},
            y={"y_arr": rng.integers(0, 20, 5).astype(np.int32)},
        ))
    return gs


def _cfg(kind):
    return HPoolConfig(
        kind=kind, emb_dim=16, num_vocab=20, max_seq_len=5, num_rels=2,
        dropout=0.0, k=10, hidden=8, num_layers=3, max_nodes=24,
        asap_hidden=16,
        encoder=EncoderSpec("ast", emb_dim=16, num_nodetypes=9,
                            num_nodeattributes=11, max_depth=20),
    )


@pytest.mark.parametrize("kind", KINDS)
def test_forward_shape_and_pad_invariance(kind):
    gs = _graphs()
    batch = collate(_graphs(), build_schedules=False)
    cfg = _cfg(kind)
    params = hpool_init(jax.random.PRNGKey(0), cfg)
    fwd = jax.jit(lambda p, b: hpool_forward(p, cfg, b))
    out = fwd(params, jax.tree.map(jnp.asarray, batch))
    assert out.shape == (batch.num_graph_slots, 5, 20)
    assert np.isfinite(np.asarray(out)).all()

    # adding padding (extra node/edge slots; graph slots too except for
    # diffpool) must not change outputs. Diffpool is graph-pad-SENSITIVE
    # by reference semantics: its BatchNorms flatten the dense [G, n, c]
    # batch (gnn2.py:543-549), so extra all-zero graph blocks shift the
    # train-mode statistics — exactly as they would upstream.
    extra_g = 0 if kind == "diffpool" else 2
    pad = PadConfig(max_nodes=batch.num_node_slots + 32,
                    max_edges=int(batch.edge_src_flat.shape[0]) + 32 - 1,
                    max_graphs=batch.num_graph_slots + extra_g,
                    max_levels=1, nodes_per_level=1, edges_per_level=1)
    batch2 = collate(_graphs(), pad, build_schedules=False)
    out2 = fwd(params, jax.tree.map(jnp.asarray, batch2))
    g = int(batch.n_graph)
    np.testing.assert_allclose(np.asarray(out)[:g], np.asarray(out2)[:g],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("kind", KINDS)
def test_gradients_flow(kind):
    batch = collate(_graphs(), build_schedules=False)
    cfg = _cfg(kind)
    params = hpool_init(jax.random.PRNGKey(1), cfg)

    def loss(p):
        out = hpool_forward(p, cfg, jax.tree.map(jnp.asarray, batch))
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


def test_topk_mask_semantics():
    # two graphs: sizes 4 and 3, contiguous ids
    gid = jnp.array([0, 0, 0, 0, 1, 1, 1, 2])  # last is pad (G=2)
    nmask = jnp.array([1, 1, 1, 1, 1, 1, 1, 0], bool)
    score = jnp.array([0.1, 0.9, 0.5, 0.3, 2.0, 1.0, 3.0, 9.9])
    keep = topk_mask(score, gid, 2, 0.5, nmask)
    # graph 0: ceil(0.5*4)=2 -> nodes 1 (0.9) and 2 (0.5)
    # graph 1: ceil(0.5*3)=2 -> nodes 6 (3.0) and 4 (2.0)
    np.testing.assert_array_equal(
        np.asarray(keep), [False, True, True, False, True, False, True, False])
    # iterated pooling halves again within the kept set:
    # g0 kept {1, 2}, quota ceil(0.5*2)=1 -> node 1; g1 kept {4, 6} -> node 6
    keep2 = topk_mask(score, gid, 2, 0.5, keep)
    np.testing.assert_array_equal(
        np.asarray(keep2),
        [False, True, False, False, False, False, True, False])
