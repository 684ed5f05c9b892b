"""Level schedules: the static-shape wavefront execution plan for batched DAGs.

The reference model re-derives, per forward pass and per topo level, the node
set of the level by boolean masking and the incoming-edge subset by an
O(|level| * E) Python loop (reference: ogbg-code/model/dagnn.py:146-157).
Here that work is done ONCE at preprocessing time, producing dense,
statically-shaped arrays that a `lax.scan` consumes directly on TPU:

  node_ids  [L, Kn]  global node id of every node in each level (pad = n_pad)
  edge_src  [L, Ke]  message-source node id of every edge whose target is in
                     the level (pad = n_pad, which indexes a garbage row)
  edge_dst  [L, Ke]  LOCAL slot (column of node_ids) of the edge's target
                     within its level (pad = Kn) — segment ops per level then
                     run over [0, Kn] segments instead of all N nodes
  edge_id   [L, Ke]  original edge index, to gather per-edge attributes
                     (pad = e_pad)

plus boolean masks.  A reverse-direction schedule is the same structure built
from the reversed edge set (reference: src/utils_dag.py:42-43).

ROWS vs LEVELS: scan rows have a fixed width Kn (``nodes_per_level``). A
topological level WIDER than Kn is split across consecutive rows — legal
because nodes within a level are mutually independent (their predecessors
are in strictly earlier levels, hence strictly earlier rows). This keeps the
scan step shape uniform while wasting O(Kn) padding per level instead of
O(max-width) per level: for skewed width profiles (AST batches) this is the
difference between ~8%% and ~92%% padding compute.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class LevelSchedule(NamedTuple):
    """Wavefront plan for one direction of a (batched) DAG. All numpy/jnp.

    Shapes: L = padded level count, Kn = padded max nodes/level,
    Ke = padded max edges/level.

    The execution layout is LEVEL-SORTED: node states live in a flat
    [L*Kn (+1 garbage), H] buffer where row l*Kn + k is slot k of level l.
    Per-level writes are contiguous dynamic-update-slices (no scatter);
    cross-level reads gather via `edge_src_slot`. `node_slot` maps global
    node ids back to slots for readout. Edges are sorted by destination
    slot within each level so segment ops see sorted ids.
    """

    node_ids: np.ndarray   # [L, Kn] int32, pad = n_pad (graph-node id space)
    node_mask: np.ndarray  # [L, Kn] bool
    edge_src: np.ndarray   # [L, Ke] int32 — source NODE id, pad = n_pad
    edge_src_slot: np.ndarray  # [L, Ke] int32 — source flat SLOT, pad = L*Kn
    edge_dst: np.ndarray   # [L, Ke] int32 (local slot in [0, Kn], pad = Kn)
    edge_id: np.ndarray    # [L, Ke] int32
    edge_mask: np.ndarray  # [L, Ke] bool
    node_slot: np.ndarray  # [n_pad + 1] int32 — flat slot of each node, pad = L*Kn
    num_levels: np.ndarray  # [] int32 — true level count (<= L)
    # TRANSPOSE schedule (consumed only by the custom backward): for each row
    # r, the edges whose message-SOURCE node sits in row r — i.e. the edges
    # through which gradient flows back INTO row r's outputs. Lets the
    # backward replace its per-step scatter-add with a contiguous per-edge
    # gradient buffer + gather (sources are in strictly earlier rows than
    # their edges, so when the reverse scan reaches row r every consuming
    # edge's gradient has already been written).
    # Optional: absent (None) for schedules that never run the custom
    # backward, e.g. the device-partitioned re-chunking in parallel/.
    tgrad_eslot: Optional[np.ndarray] = None  # [L, Kt] int32 — flat edge slot (row*Ke+col), pad = L*Ke
    tgrad_dst: Optional[np.ndarray] = None    # [L, Kt] int32 — local source slot in [0, Kn], pad = Kn
    tgrad_mask: Optional[np.ndarray] = None   # [L, Kt] bool
    # NEAR/FAR layout (built with nearfar=True): edges whose source sits in
    # the IMMEDIATELY preceding row ("near", ~54% of TOK edges under the
    # critical-path packer) occupy the TAIL of each row's edge slots
    # ([far_width, far_width+near_count)); far edges the head. The fused
    # scan then (a) gathers only the far predecessor states from the state
    # buffer — near states are routed in-kernel from the previous row's
    # outputs via a one-hot matmul — and (b) excludes near edges from the
    # transpose schedule: their gradients ride the reverse-scan carry as a
    # dense [Kn, L*H] block instead of the edge-grad buffer round-trip.
    # Gathered-row counts (the binding cost of the wavefront on TPU) drop
    # by the near fraction on both sides.
    # far width is carried as an EMPTY [far_width, 0] array so it stays a
    # static shape under jax.tree.map(jnp.asarray, batch) / jit tracing
    # (an int leaf would become a traced scalar); read via .far_w
    far_width: Optional[np.ndarray] = None    # [far_width, 0] sentinel; far slots = [0, far_w)
    edge_nsrc: Optional[np.ndarray] = None    # [L, Ke] int32 — near edges' source slot in the PREVIOUS row ([0, Kn)); far/pad = Kn

    @property
    def far_w(self) -> Optional[int]:
        return None if self.far_width is None else int(self.far_width.shape[0])

    @property
    def max_levels(self) -> int:
        return self.node_ids.shape[0]

    @property
    def nodes_per_level(self) -> int:
        return self.node_ids.shape[1]

    @property
    def edges_per_level(self) -> int:
        return self.edge_src.shape[1]

    @property
    def tgrad_per_level(self) -> int:
        return 0 if self.tgrad_eslot is None else self.tgrad_eslot.shape[1]


def pack_rows(
    level: np.ndarray,
    rdepth: np.ndarray,
    msg_src: np.ndarray,
    msg_dst: np.ndarray,
    kn: int,
    edge_budget: int,
    tg_budget: int = 0,
    pair_affine: bool = False,
    _native: bool = True,
) -> np.ndarray:
    """Critical-path list scheduling: per-NODE scan-row assignment.

    Generalizes stagger_offsets: a scan row may hold ANY antichain of the
    batched DAG (every predecessor in a strictly earlier row), not just
    (level + per-graph offset) slices. Rows are filled front-to-back from a
    ready heap prioritized by REMAINING depth (the opposite direction's
    topo level), so deep chains never starve behind shallow graphs — the
    classic critical-path heuristic. Capacities per row: kn nodes and
    edge_budget incoming edges (a node carries its whole in-degree).

    On the TOK bench batch this reaches the depth lower bound with ~0.97
    node / ~0.95 edge fill vs 0.63/0.48 for per-graph stagger — scan rows
    drop 125 -> 82 and pad compute by ~35%.

    pair_affine biases the fill of ODD rows toward nodes that became
    ready during the previous row (i.e. nodes with >=1 predecessor in row
    r-1): those are taken first among equal remaining depth, so more
    edges land INSIDE (2p, 2p+1) pairs where the pair-scheduled kernels
    (dag/pair.py) route them in-kernel instead of through the state
    buffer. True/1 = near candidates win only depth TIES (critical-path
    row bound provably unchanged); an int > 1 allows near candidates up
    to `pair_affine - 1` levels SHALLOWER than the deepest ready node
    (can add rows on adversarial depth profiles — callers should check
    the resulting row count and fall back).

    Returns [n] int64 row ids, usable as the `level` input of
    build_level_schedule (it satisfies the same precedence invariant).
    """
    import heapq

    n = level.size
    if n == 0:
        return np.zeros(0, np.int64)
    msg_src = np.asarray(msg_src, np.int64).ravel()
    msg_dst = np.asarray(msg_dst, np.int64).ravel()
    rdepth = np.asarray(rdepth, np.int64).ravel()

    # native fast path (csrc/dagcore.cpp dag_pack_rows): identical pop
    # order and stash bound — the heap loop dominates host collation
    # at production batch sizes otherwise (~60ms/direction at TOK shapes)
    if _native and not pair_affine:
        from dagnn_tpu.dag.native import native_pack_rows
        out = native_pack_rows(rdepth, msg_src, msg_dst, n, kn,
                               edge_budget, tg_budget)
        if out is not None:
            return out
    indeg = np.bincount(msg_dst, minlength=n)
    if int(indeg.max(initial=0)) > edge_budget:
        raise ValueError(
            f"edge_budget={edge_budget} < max in-degree {int(indeg.max())}")
    # third capacity: OUT-edges sourced per row (the width of the backward
    # transpose schedule, whose padded gather cost is paid at MAX width —
    # without this cap, packed root-heavy rows blow Kt to ~2.5x the mean)
    outdeg = np.bincount(msg_src, minlength=n)
    if tg_budget and int(outdeg.max(initial=0)) > tg_budget:
        tg_budget = int(outdeg.max())
    npreds = indeg.copy()
    order = np.argsort(msg_src, kind="stable")
    d_sorted = msg_dst[order]
    ostart = np.searchsorted(msg_src[order], np.arange(n + 1))

    row = np.full(n, -1, np.int64)
    ready = [(-int(rdepth[u]), u) for u in range(n) if npreds[u] == 0]
    heapq.heapify(ready)
    pending: dict = {}
    r = 0
    placed = 0
    while placed < n:
        drained = pending.pop(r, ())
        near: list = []
        if pair_affine and r % 2 == 1:
            # nodes readied during row r-1 have >=1 predecessor there —
            # the intra-pair candidates; kept in their own heap so they
            # win depth TIES against older ready nodes
            near = [(-int(rdepth[u]), u) for u in drained]
            heapq.heapify(near)
        else:
            for u in drained:
                heapq.heappush(ready, (-int(rdepth[u]), u))
        nc = ec = tc = 0
        stash = []
        slack = max(int(pair_affine) - 1, 0)
        while (ready or near) and nc < kn:
            if near and (not ready or near[0][0] <= ready[0][0] + slack):
                pri, u = heapq.heappop(near)
            else:
                pri, u = heapq.heappop(ready)
            if (ec + indeg[u] > edge_budget
                    or (tg_budget and tc + outdeg[u] > tg_budget)):
                # over budget for THIS row; retry next row (bounded probe
                # so one fat node cannot stall scanning the whole heap)
                stash.append((pri, u))
                if len(stash) > 64:
                    break
                continue
            row[u] = r
            nc += 1
            ec += int(indeg[u])
            tc += int(outdeg[u])
            placed += 1
            for ei in range(ostart[u], ostart[u + 1]):
                v = d_sorted[ei]
                npreds[v] -= 1
                if npreds[v] == 0:
                    pending.setdefault(r + 1, []).append(v)
        for it in stash:
            heapq.heappush(ready, it)
        for it in near:
            heapq.heappush(ready, it)
        r += 1
    return row


def stagger_offsets(
    level: np.ndarray,
    node_graph: np.ndarray,
    num_graphs: int,
    kn: int,
    edge_budget: int = 0,
    edge_dst: Optional[np.ndarray] = None,
    _native: bool = True,
) -> np.ndarray:
    """Per-graph level offsets that pack a batch's wavefront densely.

    Batched DAGs are independent, so graph g's level l may execute in ANY
    scan row as long as its own levels stay strictly ordered — adding a
    per-graph constant offset to `level` preserves every dependency. The
    reference aligns all graphs at level 0 (implicit in its per-level
    masking, ogbg-code/model/dagnn.py:146-157), which leaves deep graphs'
    narrow tail levels nearly empty. Here we choose offsets greedily
    (deepest graph first, then best-fit start position) to minimise the
    total padded row count: Σ_l rows(level l) under the same row-split
    policy as `build_level_schedule` (node chunking by `kn`, optional
    `edge_budget` splitting).

    Args:
        level: [n] topo level of each node (graph-local or batch — equal).
        node_graph: [n] graph index of each node.
        num_graphs: number of graphs.
        kn: scan-row node width (chunk size).
        edge_budget: row-split edge budget (0 = node-count splits only).
        edge_dst: [E] global message-target node id per edge (for the
            edge-budget term; ignored when edge_budget == 0).

    Returns:
        [num_graphs] int64 offsets; staggered level = level + off[graph].
    """
    level = np.asarray(level, dtype=np.int64).ravel()
    node_graph = np.asarray(node_graph, dtype=np.int64).ravel()
    if num_graphs <= 1 or level.size == 0:
        return np.zeros(max(num_graphs, 1), dtype=np.int64)

    # native fast path (csrc/dagcore.cpp dag_stagger_offsets): identical
    # greedy + tie-breaking — this loop dominates host collation otherwise
    if _native:
        from dagnn_tpu.dag.native import native_stagger_offsets
        offs = native_stagger_offsets(level, node_graph, num_graphs, kn,
                                      edge_budget, edge_dst)
        if offs is not None:
            return offs

    # per-graph (width, edge-load) profiles over graph-local levels
    depth = np.zeros(num_graphs, dtype=np.int64)
    np.maximum.at(depth, node_graph, level + 1)
    max_d = int(depth.max())
    prof_w = np.zeros((num_graphs, max_d), dtype=np.int64)
    np.add.at(prof_w, (node_graph, level), 1)
    prof_e = np.zeros((num_graphs, max_d), dtype=np.int64)
    if edge_budget and edge_dst is not None and len(edge_dst):
        ed = np.asarray(edge_dst, dtype=np.int64).ravel()
        np.add.at(prof_e, (node_graph[ed], level[ed]), 1)

    def rows_of(w, ev):
        r = np.maximum((w + kn - 1) // kn, (w > 0).astype(np.int64))
        if edge_budget:
            be = (ev + edge_budget - 1) // edge_budget
            r = np.maximum(r, np.minimum(np.maximum(w, 1), be) * (w > 0))
        return r

    cap = int(depth.sum()) + max_d + 1
    W = np.zeros(cap, dtype=np.int64)
    Ev = np.zeros(cap, dtype=np.int64)
    R = np.zeros(cap, dtype=np.int64)
    offs = np.zeros(num_graphs, dtype=np.int64)
    length = 0

    order = np.lexsort((np.arange(num_graphs), -prof_w.sum(1), -depth))
    from numpy.lib.stride_tricks import sliding_window_view
    for g in order:
        d = int(depth[g])
        if d == 0:
            continue
        w, ev = prof_w[g, :d], prof_e[g, :d]
        L = length
        winW = sliding_window_view(W[: L + d], d)[: L + 1]
        winE = sliding_window_view(Ev[: L + d], d)[: L + 1]
        winR = sliding_window_view(R[: L + d], d)[: L + 1]
        cost = rows_of(winW + w, winE + ev).sum(1) - winR.sum(1)
        delta = int(np.argmin(cost))
        offs[g] = delta
        W[delta: delta + d] += w
        Ev[delta: delta + d] += ev
        R[delta: delta + d] = rows_of(W[delta: delta + d], Ev[delta: delta + d])
        length = max(length, delta + d)
    return offs


def build_level_schedule(
    msg_src: np.ndarray,
    msg_dst: np.ndarray,
    level: np.ndarray,
    num_nodes: int,
    edge_id: Optional[np.ndarray] = None,
    n_pad: Optional[int] = None,
    e_pad: Optional[int] = None,
    max_levels: Optional[int] = None,
    nodes_per_level: Optional[int] = None,
    edges_per_level: Optional[int] = None,
    tgrad_per_level: Optional[int] = None,
    balance: bool = True,
    edge_budget: Optional[int] = None,
    nearfar: bool = False,
    far_width: Optional[int] = None,
) -> LevelSchedule:
    """Build the dense wavefront schedule for one direction.

    Args:
        msg_src: [E] message-source node of each edge (the predecessor whose
            state is aggregated). For the forward direction this is the edge
            source; for the reverse direction, the edge destination.
        msg_dst: [E] message-target node of each edge.
        level: [num_nodes] topo level of each node in THIS direction
            (level of msg_dst strictly greater than level of msg_src).
        num_nodes: real node count.
        edge_id: [E] original edge indices (defaults to arange).
        n_pad: padding node id (defaults to num_nodes — callers should ensure
            node arrays have a garbage row at this index).
        e_pad: padding edge id (defaults to E).
        max_levels / nodes_per_level / edges_per_level: static shape targets;
            defaults to the exact maxima of this graph.
        balance: permute nodes WITHIN each level (legal: level peers are
            mutually independent) so per-row edge loads even out — serpentine
            assignment by descending (in+out) degree. Shrinks the padded row
            edge width Ke from the skewed max toward the level mean; pure
            layout change, node-space results identical.
        edge_budget: when set, levels whose edge count exceeds
            rows*edge_budget are split into EXTRA rows (beyond the node-count
            minimum) targeting ~edge_budget edges per row — trades scan
            length for row width on degree-heavy levels.
        nearfar: near/far-aware modes (see LevelSchedule field docs).
            True / "regions": far edges at row slots [0, far_width), near
            edges (source in the immediately preceding row) after them;
            `edge_nsrc` carries the near sources' previous-row slots; the
            transpose schedule covers FAR edges only with flat slots in a
            [num_rows * far_width] buffer. Total row width far+near can
            EXCEED the plain max-edges width when far-heavy and near-heavy
            rows coexist — use "tgonly" for such directions.
            "tgonly": plain edge layout (row width unchanged, far_width
            None), but `edge_nsrc` is still emitted and the transpose
            schedule still excludes near edges (flat slots in the full
            [num_rows * Ke] buffer) — the backward rides near gradients on
            the scan carry while the forward gathers full rows.
        far_width: static far-region width ("regions" only); defaults to
            the exact per-batch max. `edges_per_level` is the TOTAL width.
    """
    msg_src = np.asarray(msg_src, dtype=np.int64).ravel()
    msg_dst = np.asarray(msg_dst, dtype=np.int64).ravel()
    level = np.asarray(level, dtype=np.int64).ravel()
    E = msg_src.shape[0]
    if edge_id is None:
        edge_id = np.arange(E, dtype=np.int64)
    if n_pad is None:
        n_pad = num_nodes
    if e_pad is None:
        e_pad = E

    num_levels = int(level.max()) + 1 if num_nodes > 0 else 0

    # --- nodes: sort by (level, node id); slot = rank within level ---
    node_order = np.lexsort((np.arange(num_nodes), level))
    sorted_levels = level[node_order]
    lvl_counts = np.bincount(sorted_levels, minlength=num_levels)
    kn = int(lvl_counts.max()) if num_levels > 0 else 0
    lvl_starts = np.zeros(num_levels + 1, dtype=np.int64)
    np.cumsum(lvl_counts, out=lvl_starts[1:])
    # local slot of each node within its level
    slot_sorted = np.arange(num_nodes) - lvl_starts[sorted_levels]
    node_slot = np.empty(num_nodes, dtype=np.int64)
    node_slot[node_order] = slot_sorted

    # --- rows: split levels into fixed-width chunks of Kn ---
    Kn = nodes_per_level if nodes_per_level is not None else max(kn, 1)
    rows_per_level = np.maximum((lvl_counts + Kn - 1) // Kn, 1)
    if edge_budget and E > 0:
        lvl_edges = np.bincount(level[msg_dst], minlength=num_levels)
        by_edges = (lvl_edges + edge_budget - 1) // edge_budget
        rows_per_level = np.maximum(
            rows_per_level, np.minimum(np.maximum(lvl_counts, 1), by_edges))
    row_base = np.zeros(num_levels + 1, dtype=np.int64)
    np.cumsum(rows_per_level, out=row_base[1:])
    num_rows = int(row_base[-1]) if num_levels > 0 else 0
    if balance and E > 0 and num_nodes > 0:
        # serpentine by descending degree: rank nodes within each level by
        # (in+out) degree, deal them across the level's rows alternating
        # direction each pass — near-optimal max-load partition, and node
        # positions stay contiguous (pos = pass index < Kn).
        load = (np.bincount(msg_dst, minlength=num_nodes)
                + np.bincount(msg_src, minlength=num_nodes))
        border = np.lexsort((np.arange(num_nodes), -load, level))
        rank = np.arange(num_nodes) - lvl_starts[level[border]]
        r_lvl = rows_per_level[level[border]]
        pass_, pip = np.divmod(rank, r_lvl)
        row_in_lvl = np.where(pass_ % 2 == 0, pip, r_lvl - 1 - pip)
        node_row = np.empty(num_nodes, dtype=np.int64)
        node_pos = np.empty(num_nodes, dtype=np.int64)
        node_row[border] = row_base[level[border]] + row_in_lvl
        node_pos[border] = pass_
    elif num_nodes:
        # id-order chunking (also the no-edge case; budget splits need E>0)
        node_row = row_base[level] + node_slot // Kn
        node_pos = node_slot % Kn
    else:
        node_row = np.zeros(0, np.int64)
        node_pos = np.zeros(0, np.int64)

    # --- edges: group by (row of target, [near/far,] pos of target) so
    # per-row segment ids arrive sorted (within each region for nearfar) ---
    if E > 0 and (level[msg_src] >= level[msg_dst]).any():
        raise ValueError("edge from level >= target level: invalid schedule input")
    erow = node_row[msg_dst] if E > 0 else np.zeros(0, dtype=np.int64)
    epos_t = node_pos[msg_dst] if E > 0 else np.zeros(0, dtype=np.int64)
    regions = nearfar is True or nearfar == "regions"
    if nearfar and E > 0:
        e_near = (erow - node_row[msg_src]) == 1
        edge_order = (np.lexsort((edge_id, epos_t, e_near, erow)) if regions
                      else np.lexsort((edge_id, epos_t, erow)))
    else:
        e_near = np.zeros(E, dtype=bool)
        edge_order = np.lexsort((edge_id, epos_t, erow))
    e_sorted_row = erow[edge_order]
    e_sorted_near = e_near[edge_order]
    erow_counts = np.bincount(e_sorted_row, minlength=max(num_rows, 1))
    erow_starts = np.zeros(max(num_rows, 1) + 1, dtype=np.int64)
    np.cumsum(erow_counts, out=erow_starts[1:])
    rank_in_row = (np.arange(E) - erow_starts[e_sorted_row]
                   if E > 0 else np.zeros(0, dtype=np.int64))

    # --- resolve static shapes ---
    R = max_levels if max_levels is not None else num_rows
    if num_rows > R:
        raise ValueError(f"schedule needs {num_rows} rows > max_levels={R}")
    if regions:
        far_counts = np.bincount(e_sorted_row[~e_sorted_near],
                                 minlength=max(num_rows, 1))
        near_counts = erow_counts - far_counts
        kf = int(far_counts.max()) if E > 0 else 0
        kne = int(near_counts.max()) if E > 0 else 0
        Kf = far_width if far_width is not None else kf
        if kf > Kf:
            raise ValueError(f"far width {kf} > far_width={Kf}")
        Ke = edges_per_level if edges_per_level is not None else Kf + kne
        if Kf + kne > Ke:
            raise ValueError(
                f"near width {kne} > edges_per_level-far_width={Ke - Kf}")
        # far edges keep their far-region rank; near edges start at Kf
        # (sort put far first, so rank - far_count is the near rank)
        e_slot = np.where(e_sorted_near,
                          Kf + rank_in_row - far_counts[e_sorted_row],
                          rank_in_row)
    else:
        ke = int(erow_counts.max()) if E > 0 else 0
        Ke = edges_per_level if edges_per_level is not None else ke
        if ke > Ke:
            raise ValueError(f"row edge width {ke} > edges_per_level={Ke}")
        Kf = Ke
        e_slot = rank_in_row

    node_ids = np.full((R, Kn), n_pad, dtype=np.int32)
    node_mask = np.zeros((R, Kn), dtype=bool)
    if num_nodes > 0:
        node_ids[node_row, node_pos] = np.arange(num_nodes)
        node_mask[node_row, node_pos] = True

    # flat slot of each node in the [R*Kn] row-sorted layout
    flat_pad = R * Kn
    node_flat_slot = np.full(n_pad + 1, flat_pad, dtype=np.int32)
    if num_nodes > 0:
        node_flat_slot[:num_nodes] = (node_row * Kn + node_pos).astype(np.int32)

    edge_src = np.full((R, Ke), n_pad, dtype=np.int32)
    edge_src_slot = np.full((R, Ke), flat_pad, dtype=np.int32)
    edge_dst = np.full((R, Ke), Kn, dtype=np.int32)
    edge_id_arr = np.full((R, Ke), e_pad, dtype=np.int32)
    edge_mask = np.zeros((R, Ke), dtype=bool)
    if E > 0:
        edge_src[e_sorted_row, e_slot] = msg_src[edge_order]
        edge_src_slot[e_sorted_row, e_slot] = node_flat_slot[msg_src[edge_order]]
        edge_dst[e_sorted_row, e_slot] = node_pos[msg_dst[edge_order]]
        edge_id_arr[e_sorted_row, e_slot] = edge_id[edge_order]
        edge_mask[e_sorted_row, e_slot] = True

    # --- transpose schedule: group edges by the ROW OF THEIR SOURCE ---
    # nearfar: near edges' previous-row source slot (the in-kernel one-hot
    # routing index); the transpose schedule covers FAR edges only and its
    # flat slots index a [num_rows * far_width] (far-region) grad buffer.
    edge_nsrc = None
    if nearfar:
        edge_nsrc = np.full((R, Ke), Kn, dtype=np.int32)
        if E > 0:
            near_sel = e_sorted_near
            edge_nsrc[e_sorted_row[near_sel], e_slot[near_sel]] = (
                node_pos[msg_src[edge_order][near_sel]])

    if E > 0:
        src_sorted = msg_src[edge_order]
        if nearfar:
            tsel = ~e_sorted_near
            # "regions": far-only buffer (unit Kf); "tgonly": full buffer
            fslot_all = e_sorted_row * Kf + e_slot
        else:
            tsel = np.ones(E, dtype=bool)
            fslot_all = e_sorted_row * Ke + e_slot    # flat edge slot
        fslot = fslot_all[tsel]
        srow = node_row[src_sorted[tsel]]
        spos = node_pos[src_sorted[tsel]]
        torder = np.lexsort((fslot, spos, srow))
        t_row = srow[torder]
        trow_counts = np.bincount(t_row, minlength=max(num_rows, 1))
        kt = int(trow_counts.max()) if len(t_row) else 0
        trow_starts = np.zeros(max(num_rows, 1) + 1, dtype=np.int64)
        np.cumsum(trow_counts, out=trow_starts[1:])
        t_slot = np.arange(len(t_row)) - trow_starts[t_row]
    else:
        kt = 0
    Kt = tgrad_per_level if tgrad_per_level is not None else kt
    if kt > Kt:
        raise ValueError(f"transpose row width {kt} > tgrad_per_level={Kt}")
    eflat_pad = R * (Kf if nearfar else Ke)
    tgrad_eslot = np.full((R, Kt), eflat_pad, dtype=np.int32)
    tgrad_dst = np.full((R, Kt), Kn, dtype=np.int32)
    tgrad_mask = np.zeros((R, Kt), dtype=bool)
    if E > 0 and len(t_row):
        tgrad_eslot[t_row, t_slot] = fslot[torder]
        tgrad_dst[t_row, t_slot] = spos[torder]
        tgrad_mask[t_row, t_slot] = True

    return LevelSchedule(
        node_ids=node_ids,
        node_mask=node_mask,
        edge_src=edge_src,
        edge_src_slot=edge_src_slot,
        edge_dst=edge_dst,
        edge_id=edge_id_arr,
        edge_mask=edge_mask,
        node_slot=node_flat_slot,
        num_levels=np.asarray(num_rows, dtype=np.int32),
        tgrad_eslot=tgrad_eslot,
        tgrad_dst=tgrad_dst,
        tgrad_mask=tgrad_mask,
        far_width=(np.zeros((Kf, 0), dtype=bool) if regions else None),
        edge_nsrc=edge_nsrc,
    )
