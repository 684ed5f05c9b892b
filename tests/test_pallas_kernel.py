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


# ---------------------------------------------------------------------------
# fused row kernels: residual-stream backward vs in-kernel recompute
# ---------------------------------------------------------------------------

def _row_setup(dtype, seed=0, kn=8, ke=14, kt=10, emb=8, h=8, r=3, nl=2):
    from dagnn_tpu.ops.pallas.row_step import flatten_row_weights
    rng = np.random.default_rng(seed)

    def t(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32), dtype)

    aggr, cells = [], []
    qdims = [emb] + [h] * (nl - 1)
    for l in range(nl):
        aggr.append({
            "attn_lin": {"w": t(1, qdims[l] + h), "b": t(1)},
            "edge_encoder": {"w": t(h, r), "b": t(h)},
        })
        cells.append({"w_ih": t(3 * h, qdims[l]), "w_hh": t(3 * h, h),
                      "b_ih": t(3 * h), "b_hh": t(3 * h)})
    weights = flatten_row_weights(aggr, cells, qdims, True)
    xin = t(kn, emb)
    vals = t(ke, nl * h)
    ea = t(ke, r)
    edst = jnp.asarray(np.sort(rng.integers(0, kn, ke)).astype(np.int32))
    emask = jnp.asarray((rng.random(ke) > 0.2).astype(np.float32))
    nmask = jnp.asarray((rng.random(kn) > 0.1).astype(np.float32))
    g = t(kn, nl * h)
    tg = t(kt, nl * h)
    tdst = jnp.asarray(rng.integers(0, kn, kt).astype(np.int32))
    tmask = jnp.asarray((rng.random(kt) > 0.3).astype(np.float32))
    return ((True, h, nl), xin, vals, ea, edst, emask, nmask, weights,
            g, tg, tdst, tmask)


def test_row_backward_res_stream_is_bitwise_recompute():
    """fused_row_backward(res=<streams>) must produce BITWISE-identical
    outputs to the res=None in-kernel forward recompute: the backward
    rebuilds k and h_n from the vals/agg streams with the forward's exact
    expressions, so any drift between the forward math and the rebuild is
    a bug this test catches directly (not via loose TPU grad tolerances)."""
    from dagnn_tpu.ops.pallas.row_step import (fused_row_forward,
                                               fused_row_backward)
    for dtype in (jnp.float32, jnp.bfloat16):
        (st, xin, vals, ea, edst, emask, nmask, weights,
         g, tg, tdst, tmask) = _row_setup(dtype)
        outs, *res = fused_row_forward(st, True, xin, vals, ea, edst, emask,
                                       nmask, weights, emit_res=True)
        out_res = fused_row_backward(st, True, xin, vals, ea, edst, emask,
                                     nmask, weights, g, tg, tdst, tmask,
                                     res=tuple(res))
        out_rec = fused_row_backward(st, True, xin, vals, ea, edst, emask,
                                     nmask, weights, g, tg, tdst, tmask,
                                     res=None)
        for a, b, name in zip(out_res[:3], out_rec[:3],
                              ("dx", "dvals", "dea")):
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                err_msg=f"{name} ({dtype.__name__})")
        assert set(out_res[3]) == set(out_rec[3])
        for k in out_res[3]:
            np.testing.assert_array_equal(
                np.asarray(out_res[3][k], np.float32),
                np.asarray(out_rec[3][k], np.float32),
                err_msg=f"dw[{k}] ({dtype.__name__})")
