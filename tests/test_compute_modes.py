"""Execution-mode equivalence: bf16 compute and schedule-layout options.

Pure execution-layout/precision options on the same model must reproduce
the f32 / aligned-layout results (exactly for layout, to bf16 tolerance
for the dtype). (A stacked-direction vmapped scan existed through round 2;
it measured 5x slower on TPU and was removed along with its tests.)
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


def test_gather_readout_matches_segment_pool():
    """The host-precomputed out-slot gather readout must equal the
    segment-pool readout (exercised by zeroing the out_slots fields)."""
    for pool in ("max", "mean", "add", "attn"):
        cfg, params, batch = _setup(out_pool=pool, out_pool_all=False)
        out_gather = dagnn_forward(params, cfg, batch)
        stripped = batch._replace(out_slots_fwd=None, out_slots_mask_fwd=None,
                                  out_slots_rev=None, out_slots_mask_rev=None)
        out_seg = dagnn_forward(params, cfg, stripped)
        np.testing.assert_allclose(np.asarray(out_gather),
                                   np.asarray(out_seg),
                                   rtol=1e-5, atol=1e-5)


def test_fused_interpret_matches_dense():
    """The fused Pallas row kernels (interpret mode off-TPU) must match the
    dense XLA path — forward and gradients (covers the layer-packed layout
    and the vals residual stream)."""
    cfg, params, batch = _setup(out_pool_all=False)
    cfg_f = dataclasses.replace(cfg, segment_impl="fused")
    out_d = dagnn_forward(params, cfg, batch)
    out_f = dagnn_forward(params, cfg_f, batch)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d),
                               rtol=1e-5, atol=1e-5)

    def loss(p, c):
        return jnp.sum(dagnn_forward(p, c, batch) ** 2)

    g_d = jax.grad(loss)(params, cfg)
    g_f = jax.grad(loss)(params, cfg_f)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
        g_d, g_f)


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


def test_nearfar_layouts_match_plain():
    """NEAR/FAR-aware schedules (dag/schedule.py nearfar: "regions" far-only
    gather + in-kernel near routing; "tgonly" near gradients on the reverse
    scan carry) are pure execution-layout changes: forward and gradients
    must match the plain layout on the fused path (merged + unmerged) and
    the dense path (which falls back to scatter accumulation). Kept as an
    A/B option: on v5e the plain layout measures faster at the TOK bench
    shape (see PLAN.md round-5 notes), but the machinery is the base for
    pair-scheduled kernels and stays correctness-covered here."""
    from dagnn_tpu.dag.batch import PadConfig as _PC

    rng = np.random.default_rng(11)
    graphs = [random_dag_graph(rng, n, 12) for n in (9, 14, 6, 11)]
    pad0 = _PC.for_graphs(graphs, chunk_size=8, edge_budget=24, stagger=2)
    b0 = collate(graphs, pad0)
    cfg = DAGNNConfig(
        num_vocab=20, max_seq_len=3, emb_dim=12, hidden_dim=16,
        num_rels=2, num_layers=2, bidirectional=True, agg="attn_h",
        segment_impl="fused",
        encoder=dataclasses.replace(DAGNNConfig().encoder,
                                    kind="identity", emb_dim=12))
    params = dagnn_init(jax.random.PRNGKey(0), cfg)
    o0 = dagnn_forward(params, cfg, b0)

    def loss(p, c, b):
        return jnp.sum(dagnn_forward(p, c, b) ** 2)

    g0 = jax.grad(loss)(params, cfg, b0)
    for nearfar in ("regions", "tgonly", ("regions", "tgonly")):
        b1 = collate(graphs, dataclasses.replace(pad0, nearfar=nearfar))
        for c in (cfg, dataclasses.replace(cfg, bidirectional=False),
                  dataclasses.replace(cfg, segment_impl="dense")):
            p = params if c.bidirectional else dagnn_init(
                jax.random.PRNGKey(0), c)
            o1 = dagnn_forward(p, c, b1)
            want = (o0 if c is cfg else dagnn_forward(p, c, b0))
            np.testing.assert_allclose(np.asarray(o1), np.asarray(want),
                                       rtol=2e-5, atol=2e-5,
                                       err_msg=f"{nearfar} fwd")
            g1 = jax.grad(loss)(p, c, b1)
            gw = (g0 if c is cfg else jax.grad(loss)(p, c, b0))
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
                g1, gw)
