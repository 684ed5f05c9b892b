"""Gradient correctness of the write-once custom VJP wavefront pass."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree
import pytest

from dagnn_tpu.dag.batch import collate
from dagnn_tpu.nn.dagnn import DAGNNConfig, dagnn_init, dagnn_forward
from dagnn_tpu.nn.encoders import EncoderSpec

from test_dagnn import random_dag_graph


def make(cfg_kw, seed=0):
    rng = np.random.default_rng(seed)
    cfg = DAGNNConfig(num_vocab=7, max_seq_len=2, emb_dim=5, hidden_dim=6,
                      encoder=EncoderSpec("identity"), **cfg_kw)
    graphs = [random_dag_graph(rng, 7, 5), random_dag_graph(rng, 5, 5)]
    params = dagnn_init(jax.random.PRNGKey(3), cfg)
    batch = collate(graphs)
    return cfg, params, batch


@pytest.mark.parametrize("cfg_kw", [
    dict(agg="attn_h"),
    dict(agg="gated_sum", bidirectional=False),
    dict(agg="max"),
    dict(agg="attn_h", vid_dim=0, out_pool_all=False),
])
def test_grad_matches_finite_difference(cfg_kw):
    cfg, params, batch = make(cfg_kw)
    target = jax.random.normal(jax.random.PRNGKey(9), (2, 2, 7))

    def loss(p):
        out = dagnn_forward(p, cfg, batch)[:2]
        return jnp.sum((out - target) ** 2)

    g = jax.grad(loss)(params)
    l0 = float(loss(params))
    eps = 1e-3

    flat, unravel = ravel_pytree(params)
    gflat, _ = ravel_pytree(g)
    rng = np.random.default_rng(0)
    idxs = rng.choice(flat.shape[0], size=24, replace=False)
    for i in idxs:
        f2 = flat.at[i].add(eps)
        f1 = flat.at[i].add(-eps)
        fd = (float(loss(unravel(f2))) - float(loss(unravel(f1)))) / (2 * eps)
        got = float(gflat[i])
        assert abs(fd - got) < 2e-2 + 0.05 * abs(fd), (i, fd, got)


def test_grad_wrt_inputs():
    """Gradients flow to node features through the pre-gathered streams."""
    cfg, params, batch = make(dict(agg="attn_h"))

    def loss_x(x):
        b = batch._replace(x=x)
        return jnp.sum(dagnn_forward(params, cfg, b) ** 2)

    gx = jax.grad(loss_x)(jnp.asarray(batch.x))
    assert np.isfinite(np.asarray(gx)).all()
    assert float(jnp.abs(gx[:int(batch.n_node)]).sum()) > 0
    # garbage row gets no gradient
    np.testing.assert_allclose(np.asarray(gx[-1]), 0.0)
