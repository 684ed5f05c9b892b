"""Host-side DAG containers and static-shape batch collation.

Replaces the reference's PyG ``Batch.from_data_list`` + special-cased level
index offsetting (reference: dvae/batch.py:53-66) with a single collate that
emits fully padded, statically shaped arrays:

* node/edge arrays are concatenated with cumulative offsets (same as PyG),
* each graph keeps its own topo levels — batch level l is the union of every
  member graph's level l, exactly what the reference's flat
  ``_bi_layer_idx0/1`` achieve under PyG batching (src/utils_dag.py:39-52),
* everything is padded to a ``PadConfig`` so XLA compiles once per bucket.

Index conventions inside a collated ``DAGBatch`` with pads N/E/G:
  node arrays have N+1 rows; row N is a garbage row (gathers of padding land
  there, scatters to it are discarded by masking). Edge arrays have E+1 rows,
  row E is the garbage edge. graph_id of padding nodes = G (an extra segment
  that readouts drop).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Sequence

import numpy as np

from dagnn_tpu.dag.topo import topo_levels, reverse_levels
from dagnn_tpu.dag.schedule import (LevelSchedule, build_level_schedule,
                                    stagger_offsets)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m if m > 1 else x


@dataclasses.dataclass
class DAGGraph:
    """A single DAG on the host (numpy). Nodes are 0..num_nodes-1.

    ``x`` is the raw per-node feature array (float features or integer token
    ids — the model's encoder decides). ``extras`` holds additional per-node
    arrays (e.g. node_depth / attr ids for the AST encoder). ``y`` holds
    per-graph targets (scalars or fixed-size arrays).
    """

    num_nodes: int
    edge_src: np.ndarray
    edge_dst: np.ndarray
    x: np.ndarray
    edge_attr: Optional[np.ndarray] = None
    extras: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)
    y: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)
    level_fwd: Optional[np.ndarray] = None
    level_rev: Optional[np.ndarray] = None

    def __post_init__(self):
        self.edge_src = np.asarray(self.edge_src, dtype=np.int64).ravel()
        self.edge_dst = np.asarray(self.edge_dst, dtype=np.int64).ravel()

    @property
    def num_edges(self) -> int:
        return int(self.edge_src.shape[0])

    def ensure_levels(self) -> "DAGGraph":
        """Compute and cache forward/reverse topo levels (src/utils_dag.py:39-52)."""
        if self.level_fwd is None:
            self.level_fwd = topo_levels(self.edge_src, self.edge_dst, self.num_nodes)
        if self.level_rev is None:
            self.level_rev = reverse_levels(self.edge_src, self.edge_dst, self.num_nodes)
        return self

    @property
    def len_longest_path(self) -> int:
        """Longest path length (ogb/io/read_graph_pyg.py:54 equivalent)."""
        self.ensure_levels()
        return int(self.level_fwd.max()) if self.num_nodes else 0


class DAGBatch(NamedTuple):
    """A collated, padded batch of DAGs — a pure JAX pytree.

    All static information is derivable from array shapes; traced scalars
    (n_node/n_edge/n_graph) carry the true counts.
    """

    x: np.ndarray                 # [N+1, ...] node features (pad rows zero)
    edge_attr: Optional[np.ndarray]  # [E+1, R] or None
    graph_id: np.ndarray          # [N+1] int32, pad nodes -> G
    node_mask: np.ndarray         # [N+1] bool (garbage row False)
    fwd: LevelSchedule
    rev: LevelSchedule
    out_mask_fwd: np.ndarray      # [N+1] bool: nodes with rev-level 0 (DAG sinks)
    out_mask_rev: np.ndarray      # [N+1] bool: nodes with fwd-level 0 (DAG sources)
    graph_mask: np.ndarray        # [G] bool — real vs padding graphs
    n_node: np.ndarray            # [] int32 true node count
    n_edge: np.ndarray            # [] int32 true edge count
    n_graph: np.ndarray           # [] int32 true graph count
    extras: Dict[str, np.ndarray]     # per-node [N+1, ...]
    y: Dict[str, np.ndarray]          # per-graph [G, ...]
    # flat edge arrays (pad = N) for whole-graph message passing (baseline
    # GNNs run over the full — possibly cyclic — edge set, no wavefront)
    edge_src_flat: Optional[np.ndarray] = None   # [E+1] int32
    edge_dst_flat: Optional[np.ndarray] = None   # [E+1] int32
    edge_mask_flat: Optional[np.ndarray] = None  # [E+1] bool
    # per-graph OUTPUT-node slot lists [G, Om] (flat slots into the
    # direction's level-sorted buffer; pad entries = 0, masked False):
    # lets readouts gather the handful of output rows per graph instead of
    # segment-pooling over every slot (~40x less work on TPU). fwd lists
    # the out_mask_fwd nodes' fwd-schedule slots; rev likewise.
    out_slots_fwd: Optional[np.ndarray] = None       # [G, Om] int32
    out_slots_mask_fwd: Optional[np.ndarray] = None  # [G, Om] bool
    out_slots_rev: Optional[np.ndarray] = None       # [G, Om] int32
    out_slots_mask_rev: Optional[np.ndarray] = None  # [G, Om] bool
    # pair-scheduled wavefront plan (dag/pair.py; PadConfig.pair) — two
    # rows per scan step with intra-pair edges routed in-kernel
    pair: Optional[Any] = None

    @property
    def num_node_slots(self) -> int:
        return self.x.shape[0] - 1

    @property
    def num_graph_slots(self) -> int:
        return self.graph_mask.shape[0]


@dataclasses.dataclass(frozen=True)
class PadConfig:
    """Static shape targets for one compilation bucket."""

    max_nodes: int
    max_edges: int
    max_graphs: int
    max_levels: int
    nodes_per_level: int
    edges_per_level: int
    # width of the backward transpose schedule (see schedule.py tgrad_*);
    # 0 = derive exactly per batch (fine for one-off collates; bucketed
    # loaders should set it for shape stability)
    tgrad_per_level: int = 0
    # row split policy (must match between pad measurement and collate):
    # levels with more than rows*edge_budget edges get extra scan rows
    # (see schedule.py). 0 = split by node count only.
    edge_budget: int = 0
    # stagger per-graph level offsets so independent graphs' levels pack
    # densely into scan rows (see schedule.stagger_offsets). Requires a
    # finite chunk width (nodes_per_level); 0 = all graphs aligned at
    # level 0 (reference-equivalent layout).
    stagger: int = 0
    # max output (final-level) nodes per graph across both directions —
    # width of the DAGBatch.out_slots_* arrays. 0 = derive exactly per
    # batch (bucketed loaders should set it for shape stability).
    out_per_graph: int = 0
    # NEAR/FAR-aware layout (see dag/schedule.py nearfar). Accepts 0 (off),
    # a single mode applied to both directions ("regions": far-only gather
    # + far-only transpose; "tgonly": plain layout, near gradients on the
    # backward carry; 1/True = "regions"), or a (fwd_mode, rev_mode) pair —
    # e.g. ("regions", "tgonly") when the reverse direction's far-heavy
    # rows would blow up the regions row width. Row edge/transpose widths
    # are derived exactly per batch and per direction, so this is for
    # exact-fit collates (bench, single-config training); bucketed loaders
    # wanting stable shapes should keep it off.
    nearfar: Any = 0
    # pair-scheduled wavefront (dag/pair.py): collate additionally builds
    # a PairPlan fusing rows (2p, 2p+1) into one scan step. Requires even
    # max_levels and plain schedules (nearfar off). 2 = additionally bias
    # the row packer so more edges land inside pairs (pack_rows
    # pair_affine, depth-tie preference; Python path — the native packer
    # stays pop-identical). 3+ = allow intra-pair candidates up to
    # (pair-2) levels shallower than the deepest ready node (can add scan
    # rows on adversarial profiles — check the row count).
    pair: int = 0

    @classmethod
    def for_graphs(
        cls,
        graphs: Sequence[DAGGraph],
        node_mult: int = 8,
        edge_mult: int = 8,
        level_mult: int = 1,
        width_mult: int = 8,
        chunk_size: Optional[int] = None,
        edge_budget: int = 0,
        stagger: int = 0,
    ) -> "PadConfig":
        """Exact-fit config for a batch, rounded to hardware-friendly
        multiples.

        chunk_size caps the scan-row width: levels wider than it are split
        across rows (see dag/schedule.py), drastically cutting padding
        compute for skewed width profiles. None keeps one row per level.
        """
        from dagnn_tpu.dag.schedule import build_level_schedule

        for g in graphs:
            g.ensure_levels()
        n = sum(g.num_nodes for g in graphs)
        e = sum(g.num_edges for g in graphs)

        # measure exact row/width stats on the concatenated batch
        offsets = np.zeros(len(graphs) + 1, dtype=np.int64)
        np.cumsum([g.num_nodes for g in graphs], out=offsets[1:])
        src = (np.concatenate([g.edge_src + o for g, o in zip(graphs, offsets)])
               if e else np.zeros(0, np.int64))
        dst = (np.concatenate([g.edge_dst + o for g, o in zip(graphs, offsets)])
               if e else np.zeros(0, np.int64))
        lvl_f = (np.concatenate([g.level_fwd for g in graphs]) if n
                 else np.zeros(0, np.int64))
        lvl_r = (np.concatenate([g.level_rev for g in graphs]) if n
                 else np.zeros(0, np.int64))

        node_graph = np.repeat(np.arange(len(graphs)),
                               [g.num_nodes for g in graphs])
        rows = kn = ke = kt = 0
        for ms, md, lv, rd in ((src, dst, lvl_f, lvl_r),
                               (dst, src, lvl_r, lvl_f)):
            lv = _staggered(lv, node_graph, len(graphs), chunk_size,
                            edge_budget, md, stagger, rdepth=rd, msg_src=ms)
            s = build_level_schedule(ms, md, lv, n, nodes_per_level=chunk_size,
                                     edge_budget=edge_budget or None)
            rows = max(rows, int(s.num_levels))
            kn = max(kn, s.nodes_per_level)
            ke = max(ke, s.edges_per_level)
            kt = max(kt, s.tgrad_per_level)
        om = 0
        for lv in (lvl_f, lvl_r):
            if n:
                cnt = np.bincount(node_graph[lv == 0],
                                  minlength=len(graphs))
                om = max(om, int(cnt.max()))
        if stagger >= 2 and edge_budget:
            # packed layouts are not subset-monotone: a SUBSET of the batch
            # (sharded collate) can pack into wider transpose rows than the
            # whole batch did. pack_rows caps per-row out-edges at
            # max(edge_budget, max out-degree), so that is the true bound.
            outdeg = np.bincount(src, minlength=n) if e else np.zeros(1, int)
            indeg = np.bincount(dst, minlength=n) if e else np.zeros(1, int)
            kt = max(kt, edge_budget,
                     int(outdeg.max(initial=0)), int(indeg.max(initial=0)))
        return cls(
            max_nodes=_round_up(max(n, 1), node_mult),
            max_edges=_round_up(max(e, 1), edge_mult),
            max_graphs=len(graphs),
            max_levels=_round_up(max(rows, 1), level_mult),
            nodes_per_level=chunk_size or _round_up(max(kn, 1), width_mult),
            edges_per_level=_round_up(max(ke, 1), width_mult),
            tgrad_per_level=_round_up(max(kt, 1), width_mult),
            edge_budget=edge_budget,
            stagger=stagger,
            out_per_graph=max(om, 1),
        )


def collate(graphs: Sequence[DAGGraph], pad: Optional[PadConfig] = None,
            build_schedules: bool = True) -> DAGBatch:
    """Collate a list of DAGGraphs into one padded DAGBatch.

    Mirrors PyG batching with cumulative node offsets plus the reference's
    level-aware index handling (dvae/batch.py:53-66), but emits static
    shapes. build_schedules=False skips topo leveling entirely (required
    for the possibly-cyclic 4-way augmented baseline graphs) — schedules
    come out empty and only the flat edge arrays are usable.
    """
    if pad is None:
        pad = PadConfig.for_graphs(graphs)
    G = pad.max_graphs
    if len(graphs) > G:
        raise ValueError(f"{len(graphs)} graphs > max_graphs={G}")
    if build_schedules:
        for g in graphs:
            g.ensure_levels()

    n = sum(g.num_nodes for g in graphs)
    e = sum(g.num_edges for g in graphs)
    if n > pad.max_nodes or e > pad.max_edges:
        raise ValueError(
            f"batch ({n} nodes, {e} edges) exceeds pad ({pad.max_nodes}, {pad.max_edges})"
        )
    N, E = pad.max_nodes, pad.max_edges

    # --- concatenate nodes/edges with offsets ---
    offsets = np.zeros(len(graphs) + 1, dtype=np.int64)
    np.cumsum([g.num_nodes for g in graphs], out=offsets[1:])
    src = np.concatenate([g.edge_src + o for g, o in zip(graphs, offsets)]) if e else np.zeros(0, np.int64)
    dst = np.concatenate([g.edge_dst + o for g, o in zip(graphs, offsets)]) if e else np.zeros(0, np.int64)
    if build_schedules:
        lvl_f = np.concatenate([g.level_fwd for g in graphs]) if n else np.zeros(0, np.int64)
        lvl_r = np.concatenate([g.level_rev for g in graphs]) if n else np.zeros(0, np.int64)
    else:
        lvl_f = lvl_r = np.zeros(n, np.int64)

    x0 = np.concatenate([np.asarray(g.x) for g in graphs], axis=0)
    x = np.zeros((N + 1,) + x0.shape[1:], dtype=x0.dtype)
    x[:n] = x0

    edge_attr = None
    if graphs and graphs[0].edge_attr is not None:
        ea0 = np.concatenate([np.asarray(g.edge_attr) for g in graphs], axis=0)
        edge_attr = np.zeros((E + 1,) + ea0.shape[1:], dtype=ea0.dtype)
        edge_attr[:e] = ea0

    graph_id = np.full(N + 1, G, dtype=np.int32)
    for i, g in enumerate(graphs):
        graph_id[offsets[i]: offsets[i + 1]] = i
    node_mask = np.zeros(N + 1, dtype=bool)
    node_mask[:n] = True

    # --- schedules over the batched edge set (pad ids -> N / E) ---
    common = dict(
        n_pad=N, e_pad=E,
        max_levels=pad.max_levels,
        nodes_per_level=pad.nodes_per_level,
        edges_per_level=pad.edges_per_level,
        tgrad_per_level=pad.tgrad_per_level or None,
        edge_budget=pad.edge_budget or None,
    )
    nf_common = dict(common)
    if pad.nearfar:
        # near/far row widths ("regions" total = far + near padded maxima)
        # exceed the plain max-edges-per-row measurement and differ per
        # direction — derive them exactly (see PadConfig.nearfar)
        m = pad.nearfar
        m_f, m_r = m if isinstance(m, (tuple, list)) else (m, m)
        norm = lambda v: "regions" if v in (1, True, "regions") else v
        common.update(nearfar=norm(m_f), edges_per_level=None,
                      tgrad_per_level=None)
        nf_common.update(nearfar=norm(m_r), edges_per_level=None,
                         tgrad_per_level=None)
    else:
        nf_common = common
    if build_schedules:
        node_graph = graph_id[:n].astype(np.int64)
        slvl_f = _staggered(lvl_f[:n], node_graph, len(graphs),
                            pad.nodes_per_level, pad.edge_budget, dst,
                            pad.stagger, rdepth=lvl_r[:n], msg_src=src,
                            pair_affine=max(pad.pair - 1, 0))
        slvl_r = _staggered(lvl_r[:n], node_graph, len(graphs),
                            pad.nodes_per_level, pad.edge_budget, src,
                            pad.stagger, rdepth=lvl_f[:n], msg_src=dst,
                            pair_affine=max(pad.pair - 1, 0))
        fwd = build_level_schedule(src, dst, slvl_f, n, **common)
        rev = build_level_schedule(dst, src, slvl_r, n, **nf_common)
    else:
        empty = np.zeros(0, np.int64)
        fwd = build_level_schedule(empty, empty, np.zeros(0, np.int64), 0, **common)
        rev = fwd

    out_mask_fwd = np.zeros(N + 1, dtype=bool)
    out_mask_fwd[:n] = lvl_r == 0     # reference _get_output_nodes: rev-level 0
    out_mask_rev = np.zeros(N + 1, dtype=bool)
    out_mask_rev[:n] = lvl_f == 0     # reverse readout uses fwd-level 0

    # per-graph output-slot lists for the gather readout (see DAGBatch)
    oslots = {k: None for k in ("fwd", "rev")}
    omasks = {k: None for k in ("fwd", "rev")}
    if build_schedules and n:
        gid_n = graph_id[:n].astype(np.int64)
        om_needed = 0
        for lv in (lvl_r, lvl_f):
            cnt = np.bincount(gid_n[lv == 0], minlength=G)
            om_needed = max(om_needed, int(cnt.max()) if len(cnt) else 0)
        Om = pad.out_per_graph or om_needed
        if om_needed > Om:
            raise ValueError(
                f"{om_needed} output nodes/graph > out_per_graph={Om}")
        for key, sched_d, lv in (("fwd", fwd, lvl_r), ("rev", rev, lvl_f)):
            nodes = np.flatnonzero(lv == 0)
            gids = gid_n[nodes]
            order = np.argsort(gids, kind="stable")
            nodes, gids = nodes[order], gids[order]
            starts = np.zeros(G + 1, dtype=np.int64)
            np.cumsum(np.bincount(gids, minlength=G), out=starts[1:])
            rank = np.arange(len(nodes)) - starts[gids]
            sl = np.zeros((G, Om), dtype=np.int32)
            mk = np.zeros((G, Om), dtype=bool)
            sl[gids, rank] = sched_d.node_slot[nodes]
            mk[gids, rank] = True
            oslots[key], omasks[key] = sl, mk

    src_flat = np.full(E + 1, N, dtype=np.int32)
    dst_flat = np.full(E + 1, N, dtype=np.int32)
    emask_flat = np.zeros(E + 1, dtype=bool)
    src_flat[:e] = src
    dst_flat[:e] = dst
    emask_flat[:e] = True

    pair_plan = None
    if pad.pair and build_schedules:
        # pair-scheduled wavefront (dag/pair.py): needs even max_levels
        # and plain (non-near/far) schedules
        from dagnn_tpu.dag.pair import build_pair_plan
        pair_plan = build_pair_plan(fwd, rev)

    graph_mask = np.zeros(G, dtype=bool)
    graph_mask[: len(graphs)] = True

    extras: Dict[str, np.ndarray] = {}
    if graphs and graphs[0].extras:
        for k in graphs[0].extras:
            v0 = np.concatenate([np.asarray(g.extras[k]) for g in graphs], axis=0)
            v = np.zeros((N + 1,) + v0.shape[1:], dtype=v0.dtype)
            v[:n] = v0
            extras[k] = v

    y: Dict[str, np.ndarray] = {}
    if graphs and graphs[0].y:
        for k in graphs[0].y:
            v0 = np.stack([np.asarray(g.y[k]) for g in graphs], axis=0)
            v = np.zeros((G,) + v0.shape[1:], dtype=v0.dtype)
            v[: len(graphs)] = v0
            y[k] = v

    return DAGBatch(
        x=x,
        edge_attr=edge_attr,
        graph_id=graph_id,
        node_mask=node_mask,
        fwd=fwd,
        rev=rev,
        out_mask_fwd=out_mask_fwd,
        out_mask_rev=out_mask_rev,
        graph_mask=graph_mask,
        n_node=np.asarray(n, dtype=np.int32),
        n_edge=np.asarray(e, dtype=np.int32),
        n_graph=np.asarray(len(graphs), dtype=np.int32),
        extras=extras,
        y=y,
        edge_src_flat=src_flat,
        edge_dst_flat=dst_flat,
        edge_mask_flat=emask_flat,
        out_slots_fwd=oslots["fwd"],
        out_slots_mask_fwd=omasks["fwd"],
        out_slots_rev=oslots["rev"],
        out_slots_mask_rev=omasks["rev"],
        pair=pair_plan,
    )


def _padded_levels(levels: np.ndarray, n: int) -> np.ndarray:
    return levels[:n]


def _staggered(lvl, node_graph, n_graphs, chunk, edge_budget, msg_dst,
               enabled, rdepth=None, msg_src=None,
               pair_affine=False) -> np.ndarray:
    """Pack a direction's level array into scan rows.

    enabled=1: per-graph stagger offsets (schedule.stagger_offsets).
    enabled=2: per-NODE critical-path packing (schedule.pack_rows; needs
    rdepth = the opposite direction's levels, msg_src, and a finite
    edge_budget) — strictly denser, reaches the depth lower bound on the
    bench shapes.
    No-op unless enabled and a finite chunk width is set (without chunking
    row width is derived from the max level width, which staggering would
    itself change — chicken-and-egg; dense packing only makes sense with a
    fixed row width)."""
    if not enabled or not chunk or lvl.size == 0:
        return lvl
    if enabled >= 2 and rdepth is not None and msg_src is not None \
            and edge_budget:
        from dagnn_tpu.dag.schedule import pack_rows
        import os
        tb = int(os.environ.get("DAGNN_TG_BUDGET", "0")) or edge_budget
        return pack_rows(lvl, rdepth, msg_src, msg_dst, chunk, edge_budget,
                         tg_budget=tb, pair_affine=pair_affine)
    if n_graphs <= 1:
        return lvl
    offs = stagger_offsets(lvl, node_graph, n_graphs, chunk,
                           edge_budget=edge_budget or 0, edge_dst=msg_dst)
    return lvl + offs[node_graph]
