"""Edge-partitioned execution: equivalence with single-device wavefront."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dagnn_tpu.dag.batch import PadConfig, collate
from dagnn_tpu.nn.dagnn import DAGNNConfig, dagnn_init, dagnn_node_states
from dagnn_tpu.nn.encoders import EncoderSpec
from dagnn_tpu.parallel.edge_partition import partition_schedule, make_ep_forward
from dagnn_tpu.parallel.mesh import make_mesh

from test_dagnn import random_dag_graph


@pytest.mark.parametrize("n_dev", [2, 4])
def test_ep_matches_single_device(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(0)
    cfg = DAGNNConfig(num_vocab=5, max_seq_len=2, emb_dim=8, hidden_dim=8,
                      bidirectional=False, encoder=EncoderSpec("identity"))
    graphs = [random_dag_graph(rng, n, 8) for n in (9, 7, 12)]
    pad = PadConfig.for_graphs(graphs, chunk_size=8)
    batch = collate(graphs, pad)
    params = dagnn_init(jax.random.PRNGKey(0), cfg)

    # single-device reference states
    x, h_ref = dagnn_node_states(params, cfg, batch)

    mesh = make_mesh(n_dev, ("ep",))
    psched = partition_schedule(batch.fwd, n_dev)
    fwd = make_ep_forward(cfg, mesh)
    pdir = {"aggr": params["aggr"][0], "cells": params["cells"][0]}
    h_ep = fwd(pdir, jnp.asarray(x),
               jnp.asarray(batch.edge_attr), jax.tree.map(jnp.asarray, psched))

    np.testing.assert_allclose(np.asarray(h_ep), np.asarray(h_ref[0]),
                               atol=1e-5, rtol=1e-4)


def test_partition_schedule_covers_all_edges():
    rng = np.random.default_rng(1)
    graphs = [random_dag_graph(rng, 15, 4) for _ in range(3)]
    pad = PadConfig.for_graphs(graphs, chunk_size=8)
    batch = collate(graphs, pad)
    ps = partition_schedule(batch.fwd, 4)
    # every real edge appears exactly once across devices
    ids = ps.edge_id[ps.edge_mask]
    orig = batch.fwd.edge_id[batch.fwd.edge_mask]
    assert sorted(ids.tolist()) == sorted(orig.tolist())
    # local dst slots within [0, w)
    w = batch.fwd.node_ids.shape[1] // 4
    assert (ps.edge_dst[ps.edge_mask] < w).all()


# ---------------------------------------------------------------------------
# Sharded-state scheme (training path)
# ---------------------------------------------------------------------------

from dagnn_tpu.parallel.edge_partition import (
    partition_schedule_sharded, ep_readout_aux, make_ep_train_step)
from dagnn_tpu.nn.dagnn import dagnn_forward
from dagnn_tpu.train.losses import tok_loss
from dagnn_tpu.train.optim import make_optimizer


def _ep_setup(rng, n_dev, bidirectional=True, out_pool="max"):
    cfg = DAGNNConfig(num_vocab=7, max_seq_len=2, emb_dim=8, hidden_dim=8,
                      num_rels=2, num_layers=2, bidirectional=bidirectional,
                      agg="attn_h", out_pool=out_pool,
                      encoder=EncoderSpec("identity", emb_dim=8))
    graphs = [random_dag_graph(rng, n, 8) for n in (9, 7, 12, 10)]
    for i, g in enumerate(graphs):
        g.y = {"y_arr": rng.integers(0, 7, 2)}
    pad = PadConfig.for_graphs(graphs, chunk_size=2 * n_dev)
    batch = collate(graphs, pad)
    params = dagnn_init(jax.random.PRNGKey(0), cfg)
    return cfg, graphs, batch, params


@pytest.mark.parametrize("n_dev,out_pool", [(2, "max"), (4, "max"),
                                            (2, "attn")])
def test_ep_sharded_train_step_matches_single_device(n_dev, out_pool):
    """out_pool="attn" exercises the EP mapping of the reference's attn
    pool (== add pool with constant weights, see make_ep_train_step)."""
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(3)
    cfg, graphs, batch, params = _ep_setup(rng, n_dev, out_pool=out_pool)

    def loss_head(logits, y, gmask):
        return tok_loss(logits, y["y_arr"], gmask)

    # single-device reference loss + one optimizer step
    opt = make_optimizer(lr=1e-2, clip=0.25)
    opt_state = opt.init(params)

    def ref_loss(p, b):
        return loss_head(dagnn_forward(p, cfg, b), b.y, b.graph_mask)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params, batch)

    # sharded-state EP step
    eps_f, st_f = partition_schedule_sharded(batch.fwd, n_dev)
    eps_r, st_r = partition_schedule_sharded(batch.rev, n_dev)
    eps_dirs = (eps_f, eps_r)
    aux = ep_readout_aux(batch, eps_dirs, cfg)
    mesh = make_mesh(n_dev, ("ep",))
    step = make_ep_train_step(cfg, mesh, (st_f, st_r), loss_head, opt)
    p2, s2, loss = step(params, opt_state, jnp.asarray(batch.x),
                        jnp.asarray(batch.edge_attr),
                        jax.tree.map(jnp.asarray, eps_dirs),
                        jax.tree.map(jnp.asarray, aux),
                        jax.tree.map(jnp.asarray, batch.y),
                        jnp.asarray(batch.graph_mask))
    assert abs(float(loss) - float(ref_l)) < 1e-4, (float(loss), float(ref_l))

    # gradient parity: apply reference grads with the same optimizer
    ref_updates, _ = opt.update(ref_g, opt.init(params), params)
    ref_p2 = jax.tree.map(lambda a, u: a + u, params, ref_updates)
    errs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p2, ref_p2)
    assert max(jax.tree.leaves(errs)) < 1e-4, errs


def test_ep_sharded_memory_shrinks():
    """Own+halo buffer is strictly smaller than the replicated buffer."""
    rng = np.random.default_rng(4)
    graphs = [random_dag_graph(rng, 20, 6) for _ in range(4)]
    pad = PadConfig.for_graphs(graphs, chunk_size=8)
    batch = collate(graphs, pad)
    R, Kn = batch.fwd.node_ids.shape
    for D in (2, 4):
        eps, st = partition_schedule_sharded(batch.fwd, D)
        local = st.rows * st.own_w + st.halo
        assert local < R * Kn, (local, R * Kn)


def test_ep_dp_two_axis_mesh():
    """(dp, ep) 2-axis mesh: 2 dp groups x 2-way edge partitioning; loss
    must equal the mean of the two groups' single-device losses."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    n_ep, n_dp = 2, 2
    rng = np.random.default_rng(5)
    cfg = DAGNNConfig(num_vocab=7, max_seq_len=2, emb_dim=8, hidden_dim=8,
                      num_rels=2, num_layers=2, bidirectional=True,
                      agg="attn_h", out_pool="max",
                      encoder=EncoderSpec("identity", emb_dim=8))
    params = dagnn_init(jax.random.PRNGKey(0), cfg)

    def loss_head(logits, y, gmask):
        return tok_loss(logits, y["y_arr"], gmask)

    group_losses, stacked = [], []
    pad = None
    for gi in range(n_dp):
        graphs = [random_dag_graph(rng, n, 8) for n in (9, 7, 12, 10)]
        for g in graphs:
            g.y = {"y_arr": rng.integers(0, 7, 2)}
        if pad is None:
            # one shared PadConfig so per-group shapes agree
            pad = PadConfig.for_graphs(graphs, chunk_size=2 * n_ep)
            import dataclasses as _dc
            pad = _dc.replace(pad, max_nodes=pad.max_nodes + 16,
                              max_edges=pad.max_edges + 32,
                              max_levels=pad.max_levels + 4,
                              edges_per_level=pad.edges_per_level + 16,
                              tgrad_per_level=0)
        batch = collate(graphs, pad)
        ref = loss_head(dagnn_forward(params, cfg, batch), batch.y,
                        batch.graph_mask)
        group_losses.append(float(ref))
        eps_f, st_f = partition_schedule_sharded(batch.fwd, n_ep)
        eps_r, st_r = partition_schedule_sharded(batch.rev, n_ep)
        aux = ep_readout_aux(batch, (eps_f, eps_r), cfg)
        stacked.append((batch, (eps_f, eps_r), aux, (st_f, st_r)))

    # pin static widths so both groups compile to identical shapes
    from dagnn_tpu.parallel.edge_partition import ep_widths_of
    widths = {}
    for _, (ef, er), _, (stf, str_) in stacked:
        widths = ep_widths_of(ef, stf, widths)
        widths = ep_widths_of(er, str_, widths)
    stacked2 = []
    for b, _, _, _ in stacked:
        ef, stf = partition_schedule_sharded(b.fwd, n_ep, widths=widths)
        er, str_ = partition_schedule_sharded(b.rev, n_ep, widths=widths)
        aux = ep_readout_aux(b, (ef, er), cfg)
        stacked2.append((b, (ef, er), aux, (stf, str_)))
    stacked = stacked2

    eps_stack = jax.tree.map(lambda *a: np.stack(a), *[st[1] for st in stacked])
    aux_stack = jax.tree.map(lambda *a: np.stack(a), *[st[2] for st in stacked])
    x_stack = np.stack([st[0].x for st in stacked])
    ea_stack = np.stack([st[0].edge_attr for st in stacked])
    y_stack = jax.tree.map(lambda *a: np.stack(a), *[st[0].y for st in stacked])
    gm_stack = np.stack([st[0].graph_mask for st in stacked])

    from dagnn_tpu.parallel.mesh import make_hybrid_mesh
    mesh = make_hybrid_mesh(dp=n_dp, ep=n_ep)
    opt = make_optimizer(lr=1e-2, clip=0.25)
    step = make_ep_train_step(cfg, mesh, stacked[0][3], loss_head, opt,
                              axis="ep", dp_axis="dp")
    _, _, loss = step(params, opt.init(params),
                      jnp.asarray(x_stack), jnp.asarray(ea_stack),
                      jax.tree.map(jnp.asarray, eps_stack),
                      jax.tree.map(jnp.asarray, aux_stack),
                      jax.tree.map(jnp.asarray, y_stack),
                      jnp.asarray(gm_stack))
    expect = float(np.mean(group_losses))
    assert abs(float(loss) - expect) < 1e-4, (float(loss), expect)


# ---------------------------------------------------------------------------
# Boundary-exchange lanes: deterministic urgent (span-1) / deferred (span>=2)
# ---------------------------------------------------------------------------

def _layered_graph(n_levels, half, long_skip=0):
    """Layered DAG, width = 2*half per level, one scan row per level
    (chunk_size == width, single graph). 'Spine' columns [0, half) feed
    all of level l+1 — every spine slot is read one row later (URGENT
    halo entries). With long_skip > 1, 'long' columns [half, 2*half) are
    read ONLY by level l+long_skip's long columns — their halo entries
    span long_skip rows (DEFERRED); their level stays l via a spine
    in-edge."""
    from dagnn_tpu.dag.batch import DAGGraph
    width = 2 * half
    n = n_levels * width
    src, dst = [], []
    for l in range(n_levels - 1):
        for a in range(half):                 # spine -> whole next level
            for b in range(width):
                src.append(l * width + a)
                dst.append((l + 1) * width + b)
    if long_skip > 1:
        for l in range(n_levels - long_skip):
            for a in range(half, width):      # long -> long, skip rows
                for b in range(half, width):
                    src.append(l * width + a)
                    dst.append((l + long_skip) * width + b)
    rng = np.random.default_rng(0)
    ea = np.eye(2, dtype=np.float32)[rng.integers(0, 2, len(src))]
    return DAGGraph(num_nodes=n, edge_src=np.array(src),
                    edge_dst=np.array(dst), edge_attr=ea,
                    x=rng.normal(size=(n, 8)).astype(np.float32),
                    y={"y_arr": rng.integers(0, 7, 2)})


@pytest.mark.parametrize("long_skip,expect_deferred", [(0, False),
                                                       (3, True)])
def test_exchange_lane_classification_and_parity(long_skip, expect_deferred):
    n_dev = 4
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    g = _layered_graph(6, n_dev, long_skip)
    pad = PadConfig.for_graphs([g], chunk_size=2 * n_dev)
    batch = collate([g], pad)
    eps_f, st_f = partition_schedule_sharded(batch.fwd, n_dev)
    # span-1 edges cross devices (all-to-all layers) -> urgent entries
    assert st_f.has_urgent and int(eps_f.u_send_mask.sum()) > 0
    d_cnt = int(eps_f.d_send_mask.sum())
    assert (d_cnt > 0) == expect_deferred, d_cnt

    cfg = DAGNNConfig(num_vocab=7, max_seq_len=2, emb_dim=8, hidden_dim=8,
                      num_rels=2, num_layers=2, bidirectional=True,
                      agg="attn_h", out_pool="max",
                      encoder=EncoderSpec("identity", emb_dim=8))
    params = dagnn_init(jax.random.PRNGKey(1), cfg)

    def loss_head(logits, y, gmask):
        return tok_loss(logits, y["y_arr"], gmask)

    ref = float(loss_head(dagnn_forward(params, cfg, batch), batch.y,
                          batch.graph_mask))
    eps_r, st_r = partition_schedule_sharded(batch.rev, n_dev)
    aux = ep_readout_aux(batch, (eps_f, eps_r), cfg)
    mesh = make_mesh(n_dev, ("ep",))
    opt = make_optimizer(lr=1e-2, clip=0.25)
    step = make_ep_train_step(cfg, mesh, (st_f, st_r), loss_head, opt)
    _, _, loss = step(params, opt.init(params), jnp.asarray(batch.x),
                      jnp.asarray(batch.edge_attr),
                      jax.tree.map(jnp.asarray, (eps_f, eps_r)),
                      jax.tree.map(jnp.asarray, aux),
                      jax.tree.map(jnp.asarray, batch.y),
                      jnp.asarray(batch.graph_mask))
    assert abs(float(loss) - ref) < 1e-4, (float(loss), ref)
