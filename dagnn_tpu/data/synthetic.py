"""Synthetic AST-like DAG generator.

Produces ogbg-code2-shaped workloads (type/attr ids, node depth, AST +
next-token edges with one-hot edge types, 5-subtoken targets) for
benchmarks, compile checks, and scaling runs without the 450k-graph
download. Mirrors the statistics the TOK driver consumes
(reference: ogbg-code/main_pyg.py:209-236, utils2.py:31-79).
"""

from __future__ import annotations

from typing import List

import numpy as np

from dagnn_tpu.dag.batch import DAGGraph


def synthetic_ast(rng: np.random.Generator, num_nodes: int,
                  num_types: int = 98, num_attrs: int = 10030,
                  vocab: int = 5002, seq_len: int = 5,
                  extra_edge_p: float = 0.0,
                  targets: str = "random") -> DAGGraph:
    """One AST-like DAG: a random tree (each node's parent is a smaller id)
    plus next-token chain edges over leaves, 2-way one-hot edge types."""
    n = num_nodes
    parents = np.zeros(n, dtype=np.int64)
    if n > 1:
        parents[1:] = (rng.random(n - 1) * np.arange(1, n)) // 1
    src = parents[1:]
    dst = np.arange(1, n, dtype=np.int64)
    etype = np.zeros(len(src), dtype=np.int64)  # AST edges: type 0

    # next-token chain over leaves (type-1 edges), like augment_edge2
    is_parent = np.zeros(n, bool)
    is_parent[parents[1:]] = True
    leaves = np.flatnonzero(~is_parent)
    if len(leaves) > 1:
        src = np.concatenate([src, leaves[:-1]])
        dst = np.concatenate([dst, leaves[1:]])
        etype = np.concatenate([etype, np.ones(len(leaves) - 1, dtype=np.int64)])

    ea = np.zeros((len(src), 2), np.float32)
    ea[np.arange(len(src)), etype] = 1.0

    x = np.stack([
        rng.integers(0, num_types, n),
        rng.integers(0, num_attrs, n),
    ], axis=1).astype(np.int32)
    depth = np.zeros(n, np.int32)
    for i in range(1, n):
        depth[i] = depth[parents[i]] + 1

    if targets == "structural":
        # deterministic functions of graph structure/features, so valid/test
        # metrics measure GENERALIZATION (random targets cap at
        # memorization): root type, deepest node's type, clipped max depth,
        # majority leaf type, leaf count (mod vocab) — a mix of
        # feature-readout, structural, and counting difficulty
        deepest = int(np.argmax(depth))
        leaf_types = x[leaves, 0] if len(leaves) else x[:1, 0]
        y_arr = np.array([
            int(x[0, 0]),
            int(x[deepest, 0]),
            min(int(depth.max()), vocab - 1),
            int(np.bincount(leaf_types).argmax()),
            len(leaves) % vocab,
        ][:seq_len], dtype=np.int32)
    else:
        y_arr = rng.integers(0, vocab, seq_len).astype(np.int32)
    g = DAGGraph(
        num_nodes=n,
        edge_src=src,
        edge_dst=dst,
        x=x,
        edge_attr=ea,
        extras={"node_depth": depth},
        y={"y_arr": y_arr},
    )
    g.ensure_levels()
    return g


def synthetic_ast_batch(seed: int, num_graphs: int, mean_nodes: int = 125,
                        **kw) -> List[DAGGraph]:
    rng = np.random.default_rng(seed)
    sizes = np.maximum(2, rng.poisson(mean_nodes, num_graphs))
    return [synthetic_ast(rng, int(s), **kw) for s in sizes]
