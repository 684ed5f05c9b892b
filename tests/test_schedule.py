"""Level-schedule and collation tests."""

import numpy as np

from dagnn_tpu.dag.topo import topo_levels
from dagnn_tpu.dag.schedule import build_level_schedule
from dagnn_tpu.dag.batch import DAGGraph, PadConfig, collate


def diamond():
    # 0 -> {1, 2} -> 3
    return np.array([0, 0, 1, 2]), np.array([1, 2, 3, 3])


def test_schedule_diamond():
    src, dst = diamond()
    lv = topo_levels(src, dst, 4)
    s = build_level_schedule(src, dst, lv, 4)
    assert s.max_levels == 3
    assert s.nodes_per_level == 2
    assert s.edges_per_level == 2
    # level 0: node 0; level 1: nodes 1, 2; level 2: node 3
    assert s.node_ids[0, 0] == 0 and not s.node_mask[0, 1]
    np.testing.assert_array_equal(sorted(s.node_ids[1].tolist()), [1, 2])
    assert s.node_ids[2, 0] == 3
    # level-1 edges: sources both 0; level-2 edges: sources {1,2}, local dst 0
    np.testing.assert_array_equal(s.edge_src[1], [0, 0])
    np.testing.assert_array_equal(sorted(s.edge_src[2].tolist()), [1, 2])
    np.testing.assert_array_equal(s.edge_dst[2], [0, 0])
    assert s.edge_mask.sum() == 4


def test_schedule_roundtrip_messages():
    """Replaying the schedule must deliver exactly the original edge set."""
    rng = np.random.default_rng(1)
    for trial in range(10):
        n = int(rng.integers(2, 40))
        perm = rng.permutation(n)
        src, dst = [], []
        for i in range(n):
            for j in range(i + 1, n):
                if rng.random() < 0.25:
                    src.append(perm[i]); dst.append(perm[j])
        src = np.array(src, dtype=np.int64)
        dst = np.array(dst, dtype=np.int64)
        if src.size == 0:
            continue
        lv = topo_levels(src, dst, n)
        s = build_level_schedule(src, dst, lv, n)
        seen = set()
        for l in range(s.max_levels):
            for k in range(s.edges_per_level):
                if s.edge_mask[l, k]:
                    u = int(s.edge_src[l, k])
                    slot = int(s.edge_dst[l, k])
                    v = int(s.node_ids[l, slot])
                    eid = int(s.edge_id[l, k])
                    assert (src[eid], dst[eid]) == (u, v)
                    assert lv[v] == l
                    seen.add(eid)
        assert seen == set(range(len(src)))
        # every node appears exactly once
        ids = s.node_ids[s.node_mask]
        assert sorted(ids.tolist()) == list(range(n))


def make_graph(src, dst, n, f=3, seed=0):
    rng = np.random.default_rng(seed)
    return DAGGraph(
        num_nodes=n,
        edge_src=src,
        edge_dst=dst,
        x=rng.normal(size=(n, f)).astype(np.float32),
        edge_attr=rng.normal(size=(len(src), 2)).astype(np.float32),
        y={"label": np.asarray(seed, dtype=np.int32)},
    )


def test_collate_two_graphs():
    s1, d1 = diamond()
    g1 = make_graph(s1, d1, 4, seed=1)
    g2 = make_graph(np.array([0, 1]), np.array([1, 2]), 3, seed=2)
    b = collate([g1, g2])
    assert b.x.shape[0] == b.num_node_slots + 1
    assert b.n_node == 7 and b.n_edge == 6 and b.n_graph == 2
    # graph ids
    np.testing.assert_array_equal(b.graph_id[:7], [0, 0, 0, 0, 1, 1, 1])
    # batch level 0 holds sources of both graphs: nodes {0, 4}
    lv0 = set(b.fwd.node_ids[0][b.fwd.node_mask[0]].tolist())
    assert lv0 == {0, 4}
    # output nodes (sinks): node 3 of g1, node 6 (=2+4) of g2
    assert set(np.flatnonzero(b.out_mask_fwd).tolist()) == {3, 6}
    assert set(np.flatnonzero(b.out_mask_rev).tolist()) == {0, 4}
    # features preserved
    np.testing.assert_allclose(b.x[:4], g1.x)
    np.testing.assert_allclose(b.x[4:7], g2.x)
    np.testing.assert_array_equal(b.y["label"], [1, 2])


def test_collate_padding_buckets():
    s1, d1 = diamond()
    g1 = make_graph(s1, d1, 4, seed=1)
    pad = PadConfig(
        max_nodes=16, max_edges=16, max_graphs=4,
        max_levels=8, nodes_per_level=8, edges_per_level=8,
    )
    b = collate([g1], pad)
    assert b.x.shape == (17, 3)
    assert b.fwd.node_ids.shape == (8, 8)
    assert b.graph_mask.tolist() == [True, False, False, False]
    # pad node ids point at the garbage row
    assert (b.fwd.node_ids[~b.fwd.node_mask] == 16).all()
    assert (b.fwd.edge_src[~b.fwd.edge_mask] == 16).all()
    assert (b.fwd.edge_dst[~b.fwd.edge_mask] == 8).all()


def test_schedule_edge_budget_and_balance():
    """Budget row-splitting + degree balancing preserve the message set and
    respect per-row budgets wherever a node's in-degree allows."""
    rng = np.random.default_rng(7)
    # skewed DAG: a level of hub nodes with many predecessors
    src, dst = [], []
    n = 60
    for v in range(20, 40):          # level-1 hubs
        for u in rng.choice(20, size=int(rng.integers(1, 16)), replace=False):
            src.append(u); dst.append(v)
    for v in range(40, 60):          # level-2 light nodes
        src.append(int(rng.integers(20, 40))); dst.append(v)
    src, dst = np.array(src), np.array(dst)
    lv = topo_levels(src, dst, n)
    base = build_level_schedule(src, dst, lv, n)
    s = build_level_schedule(src, dst, lv, n, nodes_per_level=8, edge_budget=24)

    # same message set either way
    def messages(sch):
        out = set()
        for l in range(sch.max_levels):
            for k in range(sch.edges_per_level):
                if sch.edge_mask[l, k]:
                    out.add((int(sch.edge_src[l, k]),
                             int(sch.node_ids[l, int(sch.edge_dst[l, k])])))
        return out

    assert messages(base) == messages(s)
    assert sorted(s.node_ids[s.node_mask].tolist()) == list(range(n))
    # budget respected up to single-node indegree (unsplittable)
    max_indeg = int(np.bincount(dst).max())
    assert s.edge_mask.sum(axis=1).max() <= max(24 + max_indeg, max_indeg)
    # rows only ever mix nodes of ONE topological level
    row_lvls = np.where(s.node_mask, lv[s.node_ids.clip(max=n - 1)], -1)
    for r in range(s.max_levels):
        lvls = set(row_lvls[r][s.node_mask[r]].tolist())
        assert len(lvls) <= 1
    # sources precede their edge's row
    node_row = np.full(n, -1)
    rows, pos = np.nonzero(s.node_mask)
    node_row[s.node_ids[rows, pos]] = rows
    er, ek = np.nonzero(s.edge_mask)
    assert (node_row[s.edge_src[er, ek]] < er).all()


def test_collate_edge_budget_pad_roundtrip():
    """PadConfig measured with a budget must fit its own collate."""
    rng = np.random.default_rng(3)
    graphs = []
    for i in range(6):
        nn = int(rng.integers(4, 30))
        src, dst = [], []
        for a in range(nn):
            for b in range(a + 1, nn):
                if rng.random() < 0.3:
                    src.append(a); dst.append(b)
        if not src:
            src, dst = [0], [1]
        graphs.append(make_graph(np.array(src), np.array(dst), nn, seed=i))
    pad = PadConfig.for_graphs(graphs, chunk_size=8, edge_budget=12)
    assert pad.edge_budget == 12
    b = collate(graphs, pad)
    assert b.fwd.edge_mask.sum() == b.n_edge
    assert b.rev.edge_mask.sum() == b.n_edge
