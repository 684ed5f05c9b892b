"""Execution-mode equivalence: bf16 compute and stacked-direction scan.

Both are pure execution-layout/precision options on the same model; they
must reproduce the f32 / per-direction results (exactly for stacking, to
bf16 tolerance for the dtype).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from dagnn_tpu.dag.batch import PadConfig, collate
from dagnn_tpu.nn.dagnn import DAGNNConfig, dagnn_init, dagnn_forward
from test_dagnn import random_dag_graph


def _setup(agg="attn_h", **kw):
    rng = np.random.default_rng(7)
    graphs = [random_dag_graph(rng, n, 12) for n in (9, 14, 6, 11)]
    batch = collate(graphs, PadConfig.for_graphs(graphs))
    cfg = DAGNNConfig(
        num_vocab=20, max_seq_len=3, emb_dim=12, hidden_dim=16,
        num_rels=2, num_layers=2, bidirectional=True, agg=agg,
        encoder=dataclasses.replace(
            DAGNNConfig().encoder, kind="identity", emb_dim=12),
        **kw)
    params = dagnn_init(jax.random.PRNGKey(0), cfg)
    return cfg, params, batch


def test_bf16_matches_f32_within_tolerance():
    cfg, params, batch = _setup()
    out32 = dagnn_forward(params, cfg, batch)
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    out16 = dagnn_forward(params, cfg16, batch)
    assert out16.dtype == out32.dtype  # readout/heads stay f32
    scale = float(jnp.max(jnp.abs(out32))) + 1e-6
    rel = float(jnp.max(jnp.abs(out16 - out32))) / scale
    assert rel < 0.05, f"bf16 deviates {rel:.3f} from f32"


def test_stacked_dirs_matches_sequential():
    for agg in ("attn_h", "gated_sum", "add"):
        cfg, params, batch = _setup(agg=agg)
        out_seq = dagnn_forward(params, cfg, batch)
        cfg_st = dataclasses.replace(cfg, stack_dirs=True)
        out_st = dagnn_forward(params, cfg_st, batch)
        np.testing.assert_allclose(np.asarray(out_st), np.asarray(out_seq),
                                   rtol=1e-5, atol=1e-5)


def test_stacked_dirs_gradients_match():
    # shared-aggregator case (add) exercises the summed-gradient path
    # through the in-graph stack of one underlying parameter tree
    for agg in ("attn_h", "add"):
        cfg, params, batch = _setup(agg=agg)

        def loss(p, c):
            out = dagnn_forward(p, c, batch)
            return jnp.sum(out ** 2)

        g_seq = jax.grad(loss)(params, cfg)
        g_st = jax.grad(loss)(params, dataclasses.replace(cfg, stack_dirs=True))
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
            g_seq, g_st)


def test_stagger_invariance():
    """Stagger packing is a pure schedule-layout change: forward results
    must match the aligned layout exactly (same arithmetic per node)."""
    rng = np.random.default_rng(3)
    graphs = [random_dag_graph(rng, n, 12) for n in (9, 14, 6, 11)]
    cfg = DAGNNConfig(
        num_vocab=20, max_seq_len=3, emb_dim=12, hidden_dim=16,
        num_rels=2, num_layers=2, bidirectional=True, agg="attn_h",
        encoder=dataclasses.replace(
            DAGNNConfig().encoder, kind="identity", emb_dim=12))
    params = dagnn_init(jax.random.PRNGKey(0), cfg)
    b0 = collate(graphs, PadConfig.for_graphs(graphs, chunk_size=8))
    b1 = collate(graphs, PadConfig.for_graphs(graphs, chunk_size=8, stagger=1))
    o0 = dagnn_forward(params, cfg, b0)
    o1 = dagnn_forward(params, cfg, b1)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               rtol=1e-5, atol=1e-6)
