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
