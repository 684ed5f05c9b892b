"""NA/BN data layer tests: codecs, roundtrips, validity, real-corpus load."""

import os
import numpy as np
import pytest

from dagnn_tpu.data import (
    parse_enas_row,
    parse_bn_row,
    graph_to_enas_row,
    graph_to_bn_adj_str,
    na_graph_to_dag,
    load_enas,
    is_valid_dag,
    is_valid_enas,
    is_valid_bn,
    synthetic_bn_rows,
)
from dagnn_tpu.dag.batch import collate

ENAS_PATH = "/root/reference/dvae/data/final_structures6.txt"

ROW = "[[4], [0, 1], [3, 1, 0], [3, 0, 1, 1], [1, 1, 1, 1, 1], [2, 1, 1, 0, 1, 1]]"


def test_parse_enas_structure():
    g = parse_enas_row(ROW)
    assert g.num_nodes == 8
    assert g.types[0] == 0 and g.types[-1] == 1
    np.testing.assert_array_equal(g.types[1:-1], [6, 2, 5, 5, 3, 4])
    # chain edges present
    for i in range(7):
        if i < 6:
            assert g.adj[i, i + 1] == 1
    # op1 ([0,1]) has flag j=0 set -> edge 0 -> 2
    assert g.adj[0, 2] == 1
    assert is_valid_enas(g)


def test_enas_roundtrip():
    g = parse_enas_row(ROW)
    row2 = graph_to_enas_row(g)
    g2 = parse_enas_row(str(row2))
    np.testing.assert_array_equal(g.types, g2.types)
    np.testing.assert_array_equal(g.adj, g2.adj)


def test_parse_bn_offsets():
    # row 0 has no flags -> from input; flags index from vertex j+1
    row = "[[0], [1, 1], [2, 0, 0], [3, 0, 1, 0]]"
    g = parse_bn_row(row)
    assert g.adj[0, 1] == 1          # orphan -> input
    assert g.adj[1, 2] == 1          # flag j=0 -> vertex 1 -> vertex 2
    assert g.adj[0, 3] == 1          # row 2 orphan
    assert g.adj[2, 4] == 1          # row 3 flag j=1 -> vertex 2 -> 4
    # loose ends (3, 4) -> output
    assert g.adj[3, 5] == 1 and g.adj[4, 5] == 1


def test_bn_adj_str_order():
    rows = synthetic_bn_rows(5, seed=3)
    for r in rows:
        import ast
        row, y = ast.literal_eval(r)
        g = parse_bn_row(row)
        g.y = y
        s = graph_to_bn_adj_str(g)
        assert len(s.split()) == 64
        assert is_valid_bn(g, nvt=10)


def test_validity_checkers():
    g = parse_enas_row(ROW)
    assert is_valid_dag(g)
    # break: make a node unreachable
    g.adj[0, 2] = 0
    g.adj[1, 2] = 0
    # vertex 2 has no in-edges now
    assert not is_valid_dag(g)


def test_dag_conversion_and_collate():
    g = parse_enas_row(ROW)
    dag = na_graph_to_dag(g, num_vertex_type=8)
    assert dag.x.shape == (8, 8)
    assert dag.x.sum() == 8  # one-hot
    batch = collate([dag, dag])
    assert int(batch.n_graph) == 2
    # topological order respected
    lv = np.zeros(8, int)
    for l in range(int(batch.fwd.num_levels)):
        for k in range(batch.fwd.nodes_per_level):
            if batch.fwd.node_mask[l, k]:
                lv[batch.fwd.node_ids[l, k] % 8] = l
    s, d = g.edges()
    assert (lv[s] < lv[d]).all()


@pytest.mark.skipif(not os.path.exists(ENAS_PATH), reason="reference data absent")
def test_load_real_enas_subset():
    train, test, args = load_enas(ENAS_PATH, burn_in=1000, max_count=200)
    assert args.num_vertex_type == 8 and args.max_n == 8
    assert len(train) == 180 and len(test) == 20
    for g in train[:20]:
        assert is_valid_enas(g)
        assert 0.0 < g.y < 1.0
