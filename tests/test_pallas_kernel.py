"""Pallas fused attention-aggregate kernel: parity + gradients (interpret
mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from dagnn_tpu.ops.pallas import pallas_edge_softmax_aggregate
from dagnn_tpu.ops.segment import edge_softmax_aggregate


def make(ke=40, s=16, h=12, seed=0):
    rng = np.random.default_rng(seed)
    scores = jnp.asarray(rng.normal(size=ke).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(ke, h)).astype(np.float32))
    dst = jnp.asarray(np.sort(rng.integers(0, s, ke)).astype(np.int32))
    mask = jnp.asarray(rng.random(ke) > 0.2)
    return scores, vals, dst, mask, s


def test_kernel_matches_reference():
    scores, vals, dst, mask, s = make()
    want = edge_softmax_aggregate(scores, vals, dst, s, mask)
    got = pallas_edge_softmax_aggregate(scores, vals, dst, mask, s, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


def test_kernel_grads_match_reference():
    scores, vals, dst, mask, s = make(seed=3)

    def loss_ref(sc, v):
        return jnp.sum(edge_softmax_aggregate(sc, v, dst, s, mask) ** 2)

    def loss_pal(sc, v):
        return jnp.sum(pallas_edge_softmax_aggregate(sc, v, dst, mask, s, True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(scores, vals)
    g_pal = jax.grad(loss_pal, argnums=(0, 1))(scores, vals)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_kernel_in_model_path():
    """segment_impl='pallas' end-to-end through the DAGNN forward."""
    import dataclasses
    from dagnn_tpu.dag.batch import collate
    from dagnn_tpu.nn.dagnn import DAGNNConfig, dagnn_init, dagnn_forward
    from dagnn_tpu.nn.encoders import EncoderSpec
    from test_dagnn import random_dag_graph

    rng = np.random.default_rng(0)
    graphs = [random_dag_graph(rng, 7, 6)]
    base = DAGNNConfig(num_vocab=5, max_seq_len=2, emb_dim=6, hidden_dim=6,
                       encoder=EncoderSpec("identity"))
    params = dagnn_init(jax.random.PRNGKey(0), base)
    batch = collate(graphs)
    out_dense = dagnn_forward(params, base, batch)
    cfgp = dataclasses.replace(base, segment_impl="pallas")
    out_pal = dagnn_forward(params, cfgp, batch)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_dense),
                               atol=1e-5, rtol=1e-4)
