"""Pair-scheduled wavefront (dag/pair.py + ops/pallas/pair_step.py).

Pairing two consecutive scan rows into one kernel call is a pure
execution-layout change: forward results and gradients must match the
per-row merged path on the same schedules. The plan builder's invariants
(edge coverage, intra-pair classification, transpose-buffer slots) are
checked structurally as well.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from dagnn_tpu.dag.batch import PadConfig, collate
from dagnn_tpu.dag.pair import build_pair_plan
from dagnn_tpu.nn.dagnn import (DAGNNConfig, dagnn_init, dagnn_forward,
                                pair_applicable)
from test_dagnn import random_dag_graph


def _graphs(seed=11, sizes=(9, 14, 6, 11)):
    rng = np.random.default_rng(seed)
    return [random_dag_graph(rng, n, 12) for n in sizes]


def _pads(graphs, **kw):
    pad0 = PadConfig.for_graphs(graphs, chunk_size=8, edge_budget=24,
                                stagger=2, **kw)
    if pad0.max_levels % 2:
        pad0 = dataclasses.replace(pad0, max_levels=pad0.max_levels + 1)
    return pad0, dataclasses.replace(pad0, pair=1)


def _cfg(**kw):
    return DAGNNConfig(
        num_vocab=20, max_seq_len=3, emb_dim=12, hidden_dim=16,
        num_rels=2, num_layers=2, bidirectional=True, agg="attn_h",
        segment_impl="fused",
        encoder=dataclasses.replace(DAGNNConfig().encoder,
                                    kind="identity", emb_dim=12), **kw)


def test_pair_plan_invariants():
    graphs = _graphs()
    _, padp = _pads(graphs)
    b = collate(graphs, padp)
    plan = b.pair
    assert plan is not None
    for s, d in ((b.fwd, 0), (b.rev, 1)):
        # every real edge appears exactly once in the pair layout,
        # identified by its original edge id
        ref = sorted(np.asarray(s.edge_id)[np.asarray(s.edge_mask)])
        w = plan.widths
        eo = [0, w["keA"][0], w["keA"][0] + w["keA"][1],
              w["keA"][0] + w["keA"][1] + w["keB"][0]]
        # direction d owns blocks A_d and B_d
        offs = {0: (slice(eo[0], eo[1]), slice(eo[2], eo[3])),
                1: (slice(eo[1], eo[2]), slice(eo[3], None))}[d]
        got = []
        for ssl in offs:
            m = np.asarray(plan.emask)[:, ssl]
            got += list(np.asarray(plan.eid)[:, ssl][m])
        assert sorted(got) == ref
    # intra-pair entries: nsrc valid <-> inside a B block beyond its far
    # region, and transpose slots never point at an intra-pair edge
    w = plan.widths
    U = plan.acc_unit
    P = plan.edst.shape[0]
    assert plan.teslot.max() <= P * U
    tm = np.asarray(plan.tmask)
    assert (np.asarray(plan.teslot)[tm] < P * U).all()
    # every real non-intra-pair edge has exactly one transpose slot
    n_near = int((np.asarray(plan.nsrc) < b.fwd.node_ids.shape[1]).sum())
    n_real = int(np.asarray(plan.emask).sum())
    assert int(tm.sum()) == n_real - n_near


def test_pair_matches_merged_forward_and_grads():
    """pair=1 (pair plan on the standard packing) and pair=2 (pair-affine
    row packer, a different but equally valid antichain packing) must both
    reproduce the per-row merged path's forward and gradients."""
    graphs = _graphs()
    pad0, padp = _pads(graphs)
    b0 = collate(graphs, pad0)
    cfg = _cfg()
    assert not pair_applicable(cfg, b0)
    params = dagnn_init(jax.random.PRNGKey(0), cfg)
    o0 = dagnn_forward(params, cfg, b0)

    def loss(p, b):
        return jnp.sum(dagnn_forward(p, cfg, b) ** 2)

    g0 = jax.grad(loss)(params, b0)
    for pair in (1, 2, 3):
        b1 = collate(graphs, dataclasses.replace(
            padp, pair=pair,
            # pair-affine packing can shift per-row maxima; re-derive
            # exact widths for the affine modes
            **({"edges_per_level": None, "tgrad_per_level": None}
               if pair >= 2 else {})))
        assert pair_applicable(cfg, b1)
        o1 = dagnn_forward(params, cfg, b1)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"pair={pair}")
        g1 = jax.grad(loss)(params, b1)
        jax.tree.map(
            lambda a, c: np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=5e-4, atol=5e-5),
            g1, g0)


def test_pair_matches_plain_bf16_and_no_ea():
    graphs = _graphs(seed=5, sizes=(13, 7, 10, 8))
    pad0, padp = _pads(graphs)
    b0 = collate(graphs, pad0)
    b1 = collate(graphs, padp)
    for c in (_cfg(compute_dtype="bfloat16"), _cfg(w_edge_attr=False),
              _cfg(out_pool="mean")):
        params = dagnn_init(jax.random.PRNGKey(1), c)
        o0 = dagnn_forward(params, c, b0)
        o1 = dagnn_forward(params, c, b1)
        tol = 3e-2 if c.compute_dtype == "bfloat16" else 2e-5
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                                   rtol=tol, atol=tol)


def test_pair_plan_requires_even_levels():
    graphs = _graphs()
    pad = PadConfig.for_graphs(graphs, chunk_size=8)
    b = collate(graphs, pad)
    if b.fwd.node_ids.shape[0] % 2 == 0:
        build_pair_plan(b.fwd, b.rev)  # fine
    else:
        import pytest
        with pytest.raises(ValueError):
            build_pair_plan(b.fwd, b.rev)
