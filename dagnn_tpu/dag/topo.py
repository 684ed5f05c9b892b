"""Topological leveling of DAGs (host-side, numpy).

Semantics match the reference DAG core (reference: src/utils_dag.py:8-76):
every node is assigned the earliest level such that all of its predecessors
sit in strictly earlier levels ("wavefront" / Kahn leveling).  The reference
implements this with an O(levels * E) boolean-mask loop; here we use a
CSR-based vectorized Kahn frontier expansion.

All functions take edges as two int arrays (src, dst) with nodes named
0..n-1, and are pure host-side preprocessing — never traced by JAX.
"""

from __future__ import annotations

import numpy as np


def _ranges(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Vectorized concatenation of arange(s, e) for many (s, e) pairs."""
    lens = ends - starts
    keep = lens > 0
    starts, ends, lens = starts[keep], ends[keep], lens[keep]
    if len(starts) == 0:
        return np.empty(0, dtype=np.int64)
    total = int(lens.sum())
    out = np.ones(total, dtype=np.int64)
    pos = np.zeros(len(starts), dtype=np.int64)
    np.cumsum(lens[:-1], out=pos[1:])
    out[pos] = starts
    out[pos[1:]] -= ends[:-1] - 1
    return np.cumsum(out)


def topo_levels(src: np.ndarray, dst: np.ndarray, num_nodes: int) -> np.ndarray:
    """Assign each node its topological level (earliest wavefront).

    Equivalent to the reference ``top_sort`` (src/utils_dag.py:8-35): level 0
    contains all nodes with no predecessors; level k contains nodes whose
    predecessors all live in levels < k, with at least one in level k-1.

    Args:
        src: [E] int array of edge sources.
        dst: [E] int array of edge destinations.
        num_nodes: number of nodes (nodes are 0..num_nodes-1).

    Returns:
        [num_nodes] int32 array of levels.

    Raises:
        ValueError: if the graph contains a cycle.
    """
    if num_nodes == 0:
        return np.zeros(0, dtype=np.int32)
    src = np.asarray(src, dtype=np.int64).ravel()
    dst = np.asarray(dst, dtype=np.int64).ravel()

    # native C path (csrc/dagcore.cpp) when available — identical semantics
    from dagnn_tpu.dag import native
    out = native.native_topo_levels(src, dst, num_nodes)
    if out is not None:
        return out

    indeg = np.bincount(dst, minlength=num_nodes).astype(np.int64)
    level = np.zeros(num_nodes, dtype=np.int32)
    frontier = np.flatnonzero(indeg == 0)
    if frontier.size == 0:
        raise ValueError("graph has no source nodes: not a DAG")

    # CSR adjacency (out-edges sorted by source) for frontier expansion.
    order = np.argsort(src, kind="stable")
    d_sorted = dst[order]
    counts = np.bincount(src[order], minlength=num_nodes)
    offsets = np.zeros(num_nodes + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])

    n_done = frontier.size
    cur = 0
    while frontier.size > 0:
        idx = _ranges(offsets[frontier], offsets[frontier + 1])
        if idx.size == 0:
            break
        nbrs = d_sorted[idx]
        np.subtract.at(indeg, nbrs, 1)
        new_frontier = np.unique(nbrs[indeg[nbrs] == 0])
        cur += 1
        level[new_frontier] = cur
        n_done += new_frontier.size
        frontier = new_frontier

    if n_done != num_nodes:
        raise ValueError("graph contains a cycle: topological leveling failed")
    return level


def assert_topo_order(src: np.ndarray, dst: np.ndarray, level: np.ndarray) -> None:
    """Validate that every edge goes from a strictly earlier level.

    Equivalent to the reference ``assert_order`` (src/utils_dag.py:55-67) but
    vectorized: an edge (u, v) is consistent iff level[u] < level[v].
    """
    src = np.asarray(src)
    dst = np.asarray(dst)
    level = np.asarray(level)
    if src.size == 0:
        return
    bad = level[src] >= level[dst]
    if bad.any():
        i = int(np.flatnonzero(bad)[0])
        raise AssertionError(
            f"edge ({src[i]}->{dst[i]}) violates topological order: "
            f"level[{src[i]}]={level[src[i]]} >= level[{dst[i]}]={level[dst[i]]}"
        )


def longest_path_length(src: np.ndarray, dst: np.ndarray, num_nodes: int) -> int:
    """Length (in edges) of the longest path in the DAG.

    The reference computes this as max of the forward topo level
    (ogb/io/read_graph_pyg.py:54); leveling by earliest wavefront makes the
    max level exactly the longest path length.
    """
    if num_nodes == 0:
        return 0
    return int(topo_levels(src, dst, num_nodes).max())


def reverse_levels(src: np.ndarray, dst: np.ndarray, num_nodes: int) -> np.ndarray:
    """Levels of the reverse DAG (edges flipped), for bidirectional passes.

    Equivalent to the reference's second top_sort over swapped edge_index
    (src/utils_dag.py:42-43).
    """
    return topo_levels(dst, src, num_nodes)
