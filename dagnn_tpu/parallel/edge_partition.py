"""Edge-partitioned wavefront execution across a device mesh.

The reference's only device parallelism is replica-per-GPU DataParallel
(reference: ogbg-code/tg/data_parallel.py) — one graph batch per device.
This module supplies what it never had (SURVEY.md §5.7-5.8): splitting ONE
batched DAG's edge set across devices so graphs larger than a chip — or
latency-critical single batches — scale over ICI.

Two schemes:

1. `partition_schedule` + `make_ep_forward` — "replicated states, sharded
   work": every device holds the full state buffer and all_gathers every
   row. Simple, forward-only; kept as the cross-check reference.

2. `partition_schedule_sharded` + `ep_node_states` / `make_ep_train_step`
   — "SHARDED states + halo": device d owns a contiguous [w = Kn/D]-slot
   slice of every scan row. Its state buffer holds only its own slices
   plus a HALO region of the remote slots its edges actually read — memory
   shrinks with D instead of being replicated. Per row:

     forward:  compute own slice -> BOUNDARY-ONLY exchange: an
               all_to_all carrying, per (sender, receiver) pair, only the
               halo entries the receiver's later rows actually read
               (host-planned, O(B·H) per link instead of the full-row
               all_gather's O(Kn·H)). Entries first read ≥ 2 rows after
               their source row are DEFERRED: their exchange is issued
               one scan step early through the carry, so XLA's collective
               pipeliner can overlap the wire with the next row's compute.
               Span-1 entries ride a synchronous exchange (statically
               skipped when the batch has none).
     backward: the exact mirror — per-halo-entry gradients are
               all_to_all'd back to slot owners over the SAME host plan
               (send/recv roles swapped), replacing the previous full-row
               one-hot + psum_scatter.

   The backward is a custom VJP exploiting the same write-once property as
   the single-device scan (nn/dagnn.py): only the final buffer is saved
   and rows are replayed in reverse — O(1) memory in depth. The halo
   region is internal: the public function returns only owned slices, so
   copies never leak gradients.

Collectives are XLA all_to_all/psum over a named mesh axis — they ride
ICI within a slice and DCN across slices when the axis spans hosts (see
parallel/mesh.py make_hybrid_mesh). All host planning is vectorized
(lexsort/bincount — no per-(device, row) Python loops).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from dagnn_tpu.dag.batch import DAGBatch
from dagnn_tpu.dag.schedule import LevelSchedule
from dagnn_tpu.nn.dagnn import DAGNNConfig, _step_outs
from dagnn_tpu.nn.readout import pool_nodes


# ======================================================================
# Scheme 1: replicated states (reference path, forward only)
# ======================================================================

def partition_schedule(sched: LevelSchedule, n_dev: int) -> LevelSchedule:
    """Re-chunk a schedule for D-way edge partitioning.

    Returns a schedule pytree whose per-row arrays carry a leading device
    axis: node_ids [D, R, w], edge_* [D, R, Ke_d]. Edges are grouped by the
    device owning their target slot (edge_dst // w); per-device edge rows
    are padded to the max across devices.
    """
    R, Kn = sched.node_ids.shape
    if Kn % n_dev != 0:
        raise ValueError(f"row width {Kn} not divisible by {n_dev} devices")
    w = Kn // n_dev
    Ke = sched.edge_src.shape[1]

    node_ids = sched.node_ids.reshape(R, n_dev, w).transpose(1, 0, 2)
    node_mask = sched.node_mask.reshape(R, n_dev, w).transpose(1, 0, 2)

    rr, kk, dev, pos, ke_d = _group_edges_by_device(sched, w, n_dev)

    flat_pad = R * Kn
    e_src = np.full((n_dev, R, ke_d), _node_pad(sched), np.int32)
    e_slot = np.full((n_dev, R, ke_d), flat_pad, np.int32)
    e_dst = np.full((n_dev, R, ke_d), w, np.int32)
    e_id = np.full((n_dev, R, ke_d), _edge_pad(sched), np.int32)
    e_mask = np.zeros((n_dev, R, ke_d), bool)
    e_src[dev, rr, pos] = sched.edge_src[rr, kk]
    e_slot[dev, rr, pos] = sched.edge_src_slot[rr, kk]
    e_dst[dev, rr, pos] = sched.edge_dst[rr, kk] - dev * w  # device-local
    e_id[dev, rr, pos] = sched.edge_id[rr, kk]
    e_mask[dev, rr, pos] = True

    return LevelSchedule(
        node_ids=node_ids, node_mask=node_mask,
        edge_src=e_src, edge_src_slot=e_slot, edge_dst=e_dst,
        edge_id=e_id, edge_mask=e_mask,
        # tiled so every leaf carries the leading device axis (shard_map)
        node_slot=np.tile(sched.node_slot[None], (n_dev, 1)),
        num_levels=np.tile(np.asarray(sched.num_levels)[None], (n_dev,)),
    )


def _group_edges_by_device(sched: LevelSchedule, w: int, n_dev: int,
                           min_ke: int = 1):
    """Vectorized (row, slot) -> (device, row, position) edge regrouping.

    Returns (rr, kk, dev, pos, ke_d): for every real edge at [rr, kk] of
    the base schedule, the owning device of its target (edge_dst // w) and
    its rank within that device's row-r list; ke_d is the padded width.
    """
    R = sched.node_ids.shape[0]
    rr, kk = np.nonzero(sched.edge_mask)
    dev = (sched.edge_dst[rr, kk] // w).astype(np.int64)
    key = dev * R + rr
    order = np.lexsort((kk, key))
    rr, kk, dev, key = rr[order], kk[order], dev[order], key[order]
    counts = np.bincount(key, minlength=n_dev * R)
    ke_d = max(int(counts.max()) if counts.size else 0, min_ke)
    starts = np.zeros(n_dev * R + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(len(rr)) - starts[key]
    return rr, kk, dev, pos, ke_d


def _node_pad(sched: LevelSchedule) -> int:
    return int(sched.node_slot.shape[0] - 1)


def _edge_pad(sched: LevelSchedule) -> int:
    return int(sched.edge_id.max(initial=0))


def ep_direction_pass(params_dir, cfg: DAGNNConfig, x, edge_attr,
                      psched: LevelSchedule, axis: str):
    """Shard-local wavefront pass (replicated-state scheme). Called INSIDE
    shard_map: psched arrays already carry this device's shard (leading
    axis stripped), x/params replicated. Returns node-space states like
    _direction_pass."""
    n1 = x.shape[0]
    D = jax.lax.axis_size(axis)
    my = jax.lax.axis_index(axis)
    R, w = psched.node_ids.shape
    kn = w * D
    flat = R * kn
    node_ids = psched.node_ids

    fxs = {"x": x[node_ids]}
    if cfg.w_edge_attr and edge_attr is not None and cfg.num_rels > 1:
        fxs["ea"] = jnp.asarray(edge_attr)[psched.edge_id].astype(x.dtype)
    if cfg.agg_x or cfg.agg_attn_x:
        fxs["xsrc"] = x[psched.edge_src]
    if cfg.vid_dim > 0:
        vids_all = jax.nn.one_hot(jnp.arange(n1) % cfg.vid_dim, cfg.vid_dim,
                                  dtype=x.dtype)
        fxs["vsrc"] = vids_all[psched.edge_src]
        fxs["vnode"] = vids_all[node_ids]
    ixs = {
        "lvl": jnp.arange(R, dtype=jnp.int32),
        "nmask": psched.node_mask,
        "eslot": psched.edge_src_slot,
        "edst": psched.edge_dst,
        "emask": psched.edge_mask,
    }

    specs = [cfg.aggregator_spec(l) for l in range(cfg.num_layers)]
    h0 = jnp.zeros((cfg.num_layers, flat + 1, cfg.hidden_dim), x.dtype)

    def step(h, xs):
        fxs_l, ixs_l = xs
        lvl = ixs_l["lvl"]
        vals = (jnp.zeros((cfg.num_layers,) + ixs_l["eslot"].shape + (cfg.hidden_dim,), h.dtype)
                if cfg.agg_x else h[:, ixs_l["eslot"], :])
        outs = _step_outs(cfg, params_dir, specs, vals, fxs_l, ixs_l)  # [L, w, H]
        # boundary exchange: gather every device's slice of this row
        full = jax.lax.all_gather(outs, axis, axis=1)  # [L, D, w, H]
        full = full.reshape(cfg.num_layers, kn, cfg.hidden_dim)
        h = jax.lax.dynamic_update_slice(h, full, (0, lvl * kn, 0))
        return h, None

    h_flat, _ = jax.lax.scan(step, h0, (fxs, ixs))
    return h_flat[:, psched.node_slot, :]


def make_ep_forward(cfg: DAGNNConfig, mesh: Mesh, axis: str = "ep"):
    """Build a jitted edge-partitioned node-states function
    (replicated-state scheme — the cross-check path).

    Takes (params, x, edge_attr, psched) where psched has the leading
    device axis from partition_schedule; returns [num_layers, N+1, H].
    """
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(axis)),
             out_specs=P(), check_vma=False)
    def _fwd(params_dir, x, edge_attr, psched):
        # every psched leaf has a leading device axis; strip the local shard
        psched = jax.tree.map(lambda a: a[0], psched)
        return ep_direction_pass(params_dir, cfg, x, edge_attr, psched, axis)

    return jax.jit(_fwd)


# ======================================================================
# Scheme 2: SHARDED states + halo (training path)
# ======================================================================

class EPSchedule(NamedTuple):
    """Per-direction sharded-state execution plan (arrays only — a pure
    pytree; static sizes travel in EPStatic). Leading device axis [D, ...]
    on every array; shard_map strips it to this device's shard.

    Sizes: R rows, w = Kn/D own slots/row, Ke_d edges/row/device, Hs halo
    slots/device, Kt_d transpose width, Dp = mesh-axis size, B* exchange
    block widths.

    Local state buffer layout per device: [R*w own | Hs halo | 1 garbage].

    Exchange plans are ALIGNED pairs: the block device d sends to peer p at
    row r (gathered by `*_send_col[d, r, p]` from d's own row outputs) is
    written by p at halo indices `*_recv_hidx[p, r, d]` — both sides are
    filled from the same host-sorted entry list, so position j on the send
    side is position j on the receive side. `u_*` covers URGENT entries
    (first read exactly one row after their source row — exchanged
    synchronously), `d_*` covers DEFERRED entries (first read >= 2 rows
    later — exchanged one scan step after their source row through the
    carry, so the collective can overlap the next row's compute). The
    full plan `x_*` (urgent + deferred) drives the backward's mirrored
    grad return. `d_recv_*` arrays are PRE-SHIFTED by one row (row r holds
    row r-1's plan) so the scan consumes them with its own row index.
    """

    node_ids: np.ndarray       # [D, R, w] global node id of own slots
    node_mask: np.ndarray      # [D, R, w]
    e_src_lslot: np.ndarray    # [D, R, Ke_d] LOCAL buffer index of source
    e_dst: np.ndarray          # [D, R, Ke_d] own-local target slot in [0, w]
    e_id: np.ndarray           # [D, R, Ke_d] original edge id (ea gather)
    e_mask: np.ndarray         # [D, R, Ke_d]
    # full exchange plan (backward grad return; Bf wide)
    x_send_col: np.ndarray     # [D, R, Dp, Bf] own col in [0,w) (pad 0)
    x_send_mask: np.ndarray    # [D, R, Dp, Bf]
    x_recv_hidx: np.ndarray    # [D, R, Dp, Bf] halo index (pad Hs)
    # urgent subset (span-1, synchronous; Bu wide)
    u_send_col: np.ndarray     # [D, R, Dp, Bu]
    u_send_mask: np.ndarray    # [D, R, Dp, Bu]
    u_recv_hidx: np.ndarray    # [D, R, Dp, Bu]
    # deferred subset (span>=2, pipelined; Bd wide; recv side shifted +1)
    d_send_col: np.ndarray     # [D, R, Dp, Bd] FLAT own idx (pad garbage)
    d_send_mask: np.ndarray    # [D, R, Dp, Bd]
    d_recv_hidx: np.ndarray    # [D, R, Dp, Bd] row r holds row r-1's plan
    d_recv_mask: np.ndarray    # [D, R, Dp, Bd]
    # transpose plan (edges grouped by SOURCE row, for the backward)
    t_eslot: np.ndarray        # [D, R, Kt_d] flat edge slot (r*Ke_d+k)
    t_lcol: np.ndarray         # [D, R, Kt_d] own-local source col, w if remote/pad
    t_blk: np.ndarray          # [D, R, Kt_d] p*Bf+j into the full plan, Dp*Bf if own/pad
    t_mask: np.ndarray         # [D, R, Kt_d]


@dataclasses.dataclass(frozen=True)
class EPStatic:
    rows: int
    own_w: int
    halo: int
    has_urgent: bool = True
    has_deferred: bool = True


def _fill_plan(entries, n_dev, R, Dp, B, Hs, col_pad=0):
    """Fill aligned send/recv plan arrays from a flat entry table.

    entries: dict of 1-D arrays {recv_d, send_d, row, col, hidx} — one
    element per (receiver, halo-entry) exchanged at `row` (the source
    row on the send side; for the REBALANCED deferred plan `row` is the
    stage row and `col` a flat own-buffer index — see
    partition_schedule_sharded). Returns (send_col, send_mask, recv_hidx,
    recv_mask, blk_of_entry) where blk_of_entry[i] = peer*B + j is entry
    i's position in the RECEIVER's block layout.
    """
    send_col = np.full((n_dev, R, Dp, B), col_pad, np.int32)
    send_mask = np.zeros((n_dev, R, Dp, B), bool)
    recv_hidx = np.full((n_dev, R, Dp, B), Hs, np.int32)
    recv_mask = np.zeros((n_dev, R, Dp, B), bool)
    rd, sd, row, col, hidx = (entries[k] for k in
                              ("recv_d", "send_d", "row", "col", "hidx"))
    # canonical order: group by (sender, row, receiver), sort by col
    key = (sd * R + row) * n_dev + rd
    order = np.lexsort((col, key))
    rd, sd, row, col, hidx = (a[order] for a in (rd, sd, row, col, hidx))
    key = key[order]
    counts = np.bincount(key, minlength=n_dev * R * n_dev)
    starts = np.zeros(counts.size + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    j = np.arange(len(rd)) - starts[key]
    if len(rd) and int(j.max()) >= B:
        raise ValueError(f"exchange block {int(j.max()) + 1} > width {B}")
    send_col[sd, row, rd, j] = col
    send_mask[sd, row, rd, j] = True
    recv_hidx[rd, row, sd, j] = hidx
    recv_mask[rd, row, sd, j] = True
    blk = np.empty(len(rd), np.int64)
    blk[:] = sd * B + j
    inv = np.empty(len(order), np.int64)
    inv[order] = np.arange(len(order))
    return send_col, send_mask, recv_hidx, recv_mask, blk[inv]


def partition_schedule_sharded(
        sched: LevelSchedule, n_dev: int,
        widths: Optional[dict] = None) -> Tuple[EPSchedule, EPStatic]:
    """Build the sharded-state plan from a base LevelSchedule.

    Fully vectorized (lexsort/bincount passes — no per-(device, row)
    Python loops; a bench-sized batch plans in tens of milliseconds).

    widths: optional static width targets {"ke_d", "halo", "kt", "bf",
    "bu", "bd"} so different batches compile to one program (analog of
    PadConfig); each defaults to this schedule's exact maximum."""
    widths = widths or {}
    R, Kn = sched.node_ids.shape
    if Kn % n_dev != 0:
        raise ValueError(f"row width {Kn} not divisible by {n_dev} devices")
    w = Kn // n_dev
    flat_pad_g = R * Kn

    # --- per-device edge lists grouped by row (targets owned by d) ---
    rr, kk, dev, pos, ke_d = _group_edges_by_device(sched, w, n_dev)
    ke_d = max(ke_d, widths.get("ke_d", 0))
    if ke_d > widths.get("ke_d", ke_d):
        raise ValueError(f"ke_d {ke_d} exceeds width target")

    e_src_g = np.full((n_dev, R, ke_d), flat_pad_g, np.int64)  # global src slot
    e_dst = np.full((n_dev, R, ke_d), w, np.int32)
    e_id = np.full((n_dev, R, ke_d), _edge_pad(sched), np.int32)
    e_mask = np.zeros((n_dev, R, ke_d), bool)
    e_src_g[dev, rr, pos] = sched.edge_src_slot[rr, kk]
    e_dst[dev, rr, pos] = sched.edge_dst[rr, kk] - dev * w
    e_id[dev, rr, pos] = sched.edge_id[rr, kk]
    e_mask[dev, rr, pos] = True

    # --- halo: unique remote source slots each device reads, and the
    # first row that reads each (urgent/deferred classification) ---
    src_g = sched.edge_src_slot[rr, kk].astype(np.int64)   # per real edge
    src_col = src_g % Kn
    remote = (src_col // w != dev) & (src_g < flat_pad_g)
    pair = dev[remote] * (flat_pad_g + 1) + src_g[remote]  # (reader dev, slot)
    upair, uinv = np.unique(pair, return_inverse=True)
    first_use = np.full(len(upair), R, np.int64)
    np.minimum.at(first_use, uinv, rr[remote])             # reader's row
    h_dev = upair // (flat_pad_g + 1)
    h_slot = upair % (flat_pad_g + 1)
    h_row = h_slot // Kn                                    # source row
    h_col = h_slot % Kn
    h_cnt = np.bincount(h_dev, minlength=n_dev)
    Hs = max(int(h_cnt.max()) if len(h_cnt) else 0, 1, widths.get("halo", 0))
    if int(h_cnt.max() if len(h_cnt) else 0) > Hs:
        raise ValueError("halo exceeds width target")
    h_starts = np.zeros(n_dev + 1, np.int64)
    np.cumsum(h_cnt, out=h_starts[1:])
    h_idx = np.arange(len(upair)) - h_starts[h_dev]        # halo index per entry

    # --- remap global source slots to local buffer indices ---
    garbage = R * w + Hs
    lut = np.full((n_dev, flat_pad_g + 1), garbage, np.int64)
    own_g = (np.arange(R)[:, None] * Kn + np.arange(w)[None, :])  # [R, w]
    for d in range(n_dev):                    # D iterations, vector body
        lut[d, (own_g + d * w).ravel()] = np.arange(R * w)
    lut[h_dev, h_slot] = R * w + h_idx
    e_src_l = np.take_along_axis(
        lut, e_src_g.reshape(n_dev, -1), axis=1).reshape(
            n_dev, R, ke_d).astype(np.int32)

    # --- exchange plans: full / urgent (span 1) / deferred (span >= 2) ---
    ent = dict(recv_d=h_dev, send_d=h_col // w, row=h_row, col=h_col % w,
               hidx=h_idx)
    span1 = first_use <= h_row + 1
    sel = lambda m: {k: v[m] for k, v in ent.items()}
    bw = lambda e, floor: max(
        int(np.bincount(((e["send_d"] * R + e["row"]) * n_dev
                         + e["recv_d"]),
                        minlength=1).max()) if len(e["row"]) else 0, floor)
    Bf = max(bw(ent, 1), widths.get("bf", 0))
    Bu = max(bw(sel(span1), 1), widths.get("bu", 0))
    x_sc, x_sm, x_rh, _, blk_full = _fill_plan(ent, n_dev, R, n_dev, Bf, Hs)
    u_sc, u_sm, u_rh, _, _ = _fill_plan(sel(span1), n_dev, R, n_dev, Bu, Hs)

    # DEFERRED plan, rebalanced: an entry produced at row s and first read
    # at row f >= s+2 may be exchanged at ANY stage row q in [s, f-1]
    # (staged from the state buffer by flat own index, delivered at q+1
    # <= f before the reader's gather). Spreading entries over their
    # windows levels the per-(pair, row) block counts, so Bd tracks the
    # MEAN load instead of the max — the previous source-row-only plan
    # padded blocks ~14x the real payload on the bench batch. Greedy:
    # earliest deadline first, least-loaded feasible row.
    defer = sel(~span1)
    d_flat = defer["row"] * w + defer["col"]               # flat own index
    q_arr = defer["row"].copy()
    if len(q_arr):
        e_arr = first_use[~span1] - 1
        pair_key = defer["send_d"] * n_dev + defer["recv_d"]
        order = np.lexsort((defer["row"], e_arr, pair_key))
        loads = np.zeros((n_dev * n_dev, R), np.int64)
        for i in order:
            p, s0, e0 = int(pair_key[i]), int(defer["row"][i]), int(e_arr[i])
            win = loads[p, s0:e0 + 1]
            q = s0 + int(np.argmin(win))
            q_arr[i] = q
            loads[p, q] += 1
    defer = dict(defer, row=q_arr, col=d_flat)
    Bd = max(bw(defer, 1), widths.get("bd", 0))
    d_sc, d_sm, d_rh0, d_rm0, _ = _fill_plan(defer, n_dev, R, n_dev,
                                             Bd, Hs, col_pad=garbage)
    # recv side of the deferred plan shifted one row later (pipelined)
    d_rh = np.concatenate([np.full_like(d_rh0[:, :1], Hs), d_rh0[:, :-1]], 1)
    d_rm = np.concatenate([np.zeros_like(d_rm0[:, :1]), d_rm0[:, :-1]], 1)

    # --- transpose plan: this device's edges grouped by SOURCE ROW ---
    # blk position of each remote edge's halo entry in the full plan
    blk_lut = np.full((n_dev, Hs), n_dev * Bf, np.int64)
    blk_lut[h_dev, h_idx] = blk_full
    erow = np.repeat(np.arange(R)[None, :], n_dev, 0)[..., None]  # [D,R,1]
    src_row_e = np.where(e_mask, e_src_g // Kn, R).astype(np.int64)
    src_col_e = np.where(e_mask, e_src_g % Kn, 0).astype(np.int64)
    own_e = e_mask & (src_col_e // w == np.arange(n_dev)[:, None, None])
    dd, tr, tk = np.nonzero(e_mask)
    srow = src_row_e[dd, tr, tk]
    scol = src_col_e[dd, tr, tk]
    fslot = tr * ke_d + tk
    own_f = own_e[dd, tr, tk]
    # local col for own sources; block position for remote ones
    lcol = np.where(own_f, scol - dd * w, w)
    hloc = lut[dd, np.where(own_f, 0, e_src_g[dd, tr, tk])] - R * w
    blk = np.where(own_f, n_dev * Bf,
                   blk_lut[dd, np.clip(hloc, 0, Hs - 1)])
    key = dd * R + srow
    order = np.lexsort((fslot, scol, key))
    dd, srow, lcol, blk, fslot = (a[order] for a in
                                  (dd, srow, lcol, blk, fslot))
    key = key[order]
    counts = np.bincount(key, minlength=n_dev * R)
    kt = max(int(counts.max()) if counts.size else 0, 1,
             widths.get("kt", 0))
    starts = np.zeros(counts.size + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    tpos = np.arange(len(dd)) - starts[key]
    eflat_pad = R * ke_d
    t_eslot = np.full((n_dev, R, kt), eflat_pad, np.int32)
    t_lcol = np.full((n_dev, R, kt), w, np.int32)
    t_blk = np.full((n_dev, R, kt), n_dev * Bf, np.int32)
    t_mask = np.zeros((n_dev, R, kt), bool)
    t_eslot[dd, srow, tpos] = fslot
    t_lcol[dd, srow, tpos] = lcol
    t_blk[dd, srow, tpos] = blk
    t_mask[dd, srow, tpos] = True

    node_ids = sched.node_ids.reshape(R, n_dev, w).transpose(1, 0, 2)
    node_mask = sched.node_mask.reshape(R, n_dev, w).transpose(1, 0, 2)
    eps = EPSchedule(
        node_ids=node_ids.astype(np.int32), node_mask=node_mask,
        e_src_lslot=e_src_l, e_dst=e_dst, e_id=e_id, e_mask=e_mask,
        x_send_col=x_sc, x_send_mask=x_sm, x_recv_hidx=x_rh,
        u_send_col=u_sc, u_send_mask=u_sm, u_recv_hidx=u_rh,
        d_send_col=d_sc, d_send_mask=d_sm, d_recv_hidx=d_rh,
        d_recv_mask=d_rm,
        t_eslot=t_eslot, t_lcol=t_lcol, t_blk=t_blk, t_mask=t_mask,
    )
    st = EPStatic(rows=R, own_w=w, halo=Hs,
                  has_urgent=bool(span1.any() or widths.get("bu", 0)),
                  has_deferred=bool((~span1).any() or widths.get("bd", 0)))
    return eps, st


def ep_widths_of(eps: EPSchedule, st: EPStatic,
                 acc: Optional[dict] = None) -> dict:
    """Merge this plan's static widths into `acc` (for shape-stable
    multi-batch compilation: measure every batch, then rebuild with the
    max — the EP analog of PadConfig)."""
    acc = dict(acc or {})
    mine = {"ke_d": eps.e_dst.shape[-1], "kt": eps.t_mask.shape[-1],
            "halo": st.halo, "bf": eps.x_send_col.shape[-1],
            "bu": eps.u_send_col.shape[-1], "bd": eps.d_send_col.shape[-1]}
    for k, v in mine.items():
        acc[k] = max(acc.get(k, 0), int(v))
    return acc


def ep_wire_stats(eps: EPSchedule, hidden: int, dtype_bytes: int = 2) -> dict:
    """Boundary-exchange wire accounting vs the old full-row all_gather."""
    D, R, w = eps.node_ids.shape
    Kn = D * w
    real = int(eps.x_send_mask.sum())
    padded = int(np.prod(eps.x_send_mask.shape))
    deferred = int(eps.d_send_mask.sum())
    return {
        "allgather_bytes_per_step": R * Kn * hidden * dtype_bytes * (D - 1) // max(D, 1) * D,
        "boundary_bytes_real": real * hidden * dtype_bytes,
        "boundary_bytes_padded": padded * hidden * dtype_bytes,
        "deferred_frac": round(deferred / real, 4) if real else 0.0,
    }


def _ep_streams(params_dir, cfg: DAGNNConfig, x, edge_attr, eps: EPSchedule,
                R: int):
    """Per-row streams for THIS device's shard (arrays already stripped)."""
    if cfg.compute_dtype == "bfloat16":
        x = x.astype(jnp.bfloat16)
        params_dir = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, params_dir)
    fxs = {"x": x[eps.node_ids]}                      # [R, w, emb]
    if cfg.w_edge_attr and edge_attr is not None and cfg.num_rels > 1:
        fxs["ea"] = jnp.asarray(edge_attr)[eps.e_id].astype(x.dtype)
    ixs = {
        "lvl": jnp.arange(R, dtype=jnp.int32),
        "nmask": eps.node_mask,
        "eslot": eps.e_src_lslot,
        "edst": eps.e_dst,
        "emask": eps.e_mask,
        "xsc": eps.x_send_col, "xsm": eps.x_send_mask,
        "usc": eps.u_send_col, "usm": eps.u_send_mask,
        "urh": eps.u_recv_hidx,
        "dsc": eps.d_send_col, "dsm": eps.d_send_mask,
        "drh": eps.d_recv_hidx, "drm": eps.d_recv_mask,
        "teslot": eps.t_eslot, "tlcol": eps.t_lcol,
        "tblk": eps.t_blk, "tmask": eps.t_mask,
    }
    return params_dir, fxs, ixs


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ep_wavefront(static, params_dir, fxs, ixs):
    """Sharded-state wavefront; returns OWN slices [Lyr, R*w, H].

    static = (cfg, R, w, Hs, axis, has_urgent, has_deferred). The halo
    region is internal (copies of other devices' slots) and never escapes:
    gradients of halo reads route to the owners via the mirrored
    all_to_all in the backward, so upstream consumers must only read the
    returned own region.
    """
    (buf, _), _ = jax.lax.scan(_ep_fwd_step(static, params_dir),
                               _ep_init(static, fxs, ixs), (fxs, ixs))
    cfg, R, w = static[0], static[1], static[2]
    return buf[:, :R * w, :]


def _ep_init(static, fxs, ixs):
    cfg, R, w, Hs = static[0], static[1], static[2], static[3]
    buf = jnp.zeros((cfg.num_layers, R * w + Hs + 1, cfg.hidden_dim),
                    fxs["x"].dtype)
    # deferred-exchange carry: last row's send block [Lyr, Dp, Bd, H]
    dp, bd = ixs["dsc"].shape[-2], ixs["dsc"].shape[-1]
    pend = jnp.zeros((cfg.num_layers, dp, bd, cfg.hidden_dim),
                     fxs["x"].dtype)
    return buf, pend


def _exchange(block, axis):
    """all_to_all a [Lyr, Dp, B, H] per-peer block over the mesh axis."""
    if jax.lax.axis_size(axis) == 1:
        return block
    return jax.lax.all_to_all(block, axis, split_axis=1, concat_axis=1)


def _ep_fwd_step(static, params_dir):
    cfg, R, w, Hs, axis, has_u, has_d = static
    specs = [cfg.aggregator_spec(l) for l in range(cfg.num_layers)]

    def step(carry, xs):
        buf, pend = carry
        fxs_l, ixs_l = xs
        lvl = ixs_l["lvl"]
        # deliver the DEFERRED entries of the previous row (their first
        # reader is >= this row + 1, so the wire can overlap this row's
        # compute — the collective's result is consumed only by the halo
        # write, not by this row's gather)
        if has_d:
            recv_d = _exchange(pend, axis)
            # send side is mask-zeroed and pad hidx = Hs, so pad entries
            # write zeros into the (always-zero) garbage slot
            hidx = ixs_l["drh"].reshape(-1)
            hw = recv_d.reshape(cfg.num_layers, -1, cfg.hidden_dim)
            buf = buf.at[:, R * w + hidx, :].set(hw)
        vals = buf[:, ixs_l["eslot"], :]
        outs = _step_outs(cfg, params_dir, specs, vals, fxs_l, ixs_l)  # [L,w,H]
        buf = jax.lax.dynamic_update_slice(buf, outs, (0, lvl * w, 0))
        # URGENT entries (read next row) exchanged synchronously
        if has_u:
            blk_u = outs[:, ixs_l["usc"], :]               # [L, Dp, Bu, H]
            blk_u = blk_u * ixs_l["usm"][None, ..., None].astype(outs.dtype)
            recv_u = _exchange(blk_u, axis)
            hidx = ixs_l["urh"].reshape(-1)                 # pad = Hs
            hw = recv_u.reshape(cfg.num_layers, -1, cfg.hidden_dim)
            buf = buf.at[:, R * w + hidx, :].set(hw)
        # stage the deferred block for the next step's exchange — gathered
        # from the state BUFFER by flat own index (entries may be staged
        # any row in [produce, first-read-1]; the planner load-balances the
        # stage rows, see partition_schedule_sharded), pad = garbage row
        if has_d:
            pend = buf[:, ixs_l["dsc"], :]
            pend = pend * ixs_l["dsm"][None, ..., None].astype(outs.dtype)
        return (buf, pend), None

    return step


def _ep_fwd(static, params_dir, fxs, ixs):
    (buf, _), _ = jax.lax.scan(_ep_fwd_step(static, params_dir),
                               _ep_init(static, fxs, ixs), (fxs, ixs))
    cfg, R, w = static[0], static[1], static[2]
    return buf[:, :R * w, :], (params_dir, fxs, ixs, buf)


def _ep_bwd(static, res, g_own):
    """Reverse replay. g_own [Lyr, R*w, H] is the upstream cotangent of the
    OWN region (readout). Per row, edge grads whose source is an OWN slot
    accumulate locally; grads of HALO reads are summed per halo entry and
    all_to_all'd back to the owners over the mirrored exchange plan —
    boundary-only wire, the exact transpose of the forward."""
    cfg, R, w, Hs, axis, has_u, has_d = static
    params_dir, fxs, ixs, buf_final = res
    specs = [cfg.aggregator_spec(l) for l in range(cfg.num_layers)]
    ke_d = ixs["eslot"].shape[-1]
    dp, bf = ixs["xsc"].shape[-2], ixs["xsc"].shape[-1]

    def bwd_step(carry, xs):
        acc, d_params = carry        # acc: [Lyr, R*Ke_d+1, H] edge grads
        fxs_l, ixs_l = xs
        lvl = ixs_l["lvl"]
        vals = buf_final[:, ixs_l["eslot"], :]
        tg = acc[:, ixs_l["teslot"], :]                    # [Lyr, Kt, H]
        tg = jnp.where(ixs_l["tmask"][None, :, None], tg, 0)
        # own-source edges: local one-hot segment sum into own cols
        oh_own = jax.nn.one_hot(ixs_l["tlcol"], w, dtype=tg.dtype)
        mine = jnp.einsum("lkh,kn->lnh", tg, oh_own)       # [Lyr, w, H]
        # remote-source edges: per-halo-entry sums, returned to owners
        oh_blk = jax.nn.one_hot(ixs_l["tblk"], dp * bf, dtype=tg.dtype)
        blk_g = jnp.einsum("lkh,kb->lbh", tg, oh_blk).reshape(
            cfg.num_layers, dp, bf, cfg.hidden_dim)
        recv = _exchange(blk_g, axis)                      # grads for MY cols
        recv = recv * ixs_l["xsm"][None, ..., None].astype(recv.dtype)
        oh_back = jax.nn.one_hot(ixs_l["xsc"].reshape(-1), w,
                                 dtype=recv.dtype)          # [Dp*Bf, w]
        mine = mine + jnp.einsum(
            "lbh,bn->lnh", recv.reshape(cfg.num_layers, -1, cfg.hidden_dim),
            oh_back)
        g_l = jax.lax.dynamic_slice(
            g_own, (0, lvl * w, 0), (cfg.num_layers, w, cfg.hidden_dim))
        g_l = g_l + mine

        def f(p, v, fl):
            return _step_outs(cfg, p, specs, v, fl, ixs_l)

        _, vjp_fn = jax.vjp(f, params_dir, vals, fxs_l)
        dp_, dv, dfl = vjp_fn(g_l)
        acc = jax.lax.dynamic_update_slice(acc, dv, (0, lvl * ke_d, 0))
        d_params = jax.tree.map(jnp.add, d_params, dp_)
        return (acc, d_params), dfl

    acc0 = jnp.zeros((cfg.num_layers, R * ke_d + 1, cfg.hidden_dim),
                     g_own.dtype)
    d_params0 = jax.tree.map(jnp.zeros_like, params_dir)
    (_, d_params), d_fxs = jax.lax.scan(
        bwd_step, (acc0, d_params0), (fxs, ixs), reverse=True)
    d_ixs = jax.tree.map(lambda a: np.zeros(a.shape, jax.dtypes.float0), ixs)
    return d_params, d_fxs, d_ixs


_ep_wavefront.defvjp(_ep_fwd, _ep_bwd)


def ep_node_states(params, cfg: DAGNNConfig, x, edge_attr, eps_dirs,
                   statics, axis: str):
    """Both direction passes, sharded-state scheme. Called INSIDE shard_map
    with device axes already stripped from each EPSchedule in eps_dirs.

    Returns (h_own per dir [Lyr, R*w, H], x_own per dir [R*w, emb])."""
    h_dirs, x_dirs = [], []
    for di, d in enumerate(cfg.dirs):
        pdir = {"aggr": params["aggr"][di], "cells": params["cells"][di]}
        eps, st = eps_dirs[di], statics[di]
        pdirc, fxs, ixs = _ep_streams(pdir, cfg, x, edge_attr, eps, st.rows)
        if d == 1 and cfg.reverse_agg_noop:
            # shared-AggConv quirk (see DAGNNConfig.ref_shared_agg_quirk):
            # the reverse pass aggregates nothing upstream
            ixs["emask"] = jnp.zeros_like(ixs["emask"])
            ixs["tmask"] = jnp.zeros_like(ixs["tmask"])
        own = _ep_wavefront((cfg, st.rows, st.own_w, st.halo, axis,
                             st.has_urgent, st.has_deferred),
                            pdirc, fxs, ixs)
        h_dirs.append(own)
        x_dirs.append(fxs["x"].reshape(st.rows * st.own_w, -1))
    return h_dirs, x_dirs


def ep_readout_aux(batch: DAGBatch, eps_dirs, cfg: DAGNNConfig):
    """Host-side per-device readout indices: per direction, the graph id
    and pool mask of each OWN slot (final-node or all-node per cfg)."""
    gids, masks = [], []
    omasks = [batch.out_mask_fwd, batch.out_mask_rev]
    for di, eps in enumerate(eps_dirs):
        D, R, w = eps.node_ids.shape
        nid = eps.node_ids.reshape(D, R * w)
        gids.append(batch.graph_id[nid].astype(np.int32))
        m = (batch.node_mask if cfg.out_pool_all
             else (omasks[di] & batch.node_mask))[nid]
        masks.append(m)
    D = eps_dirs[0].node_ids.shape[0]
    aux = {"gid": np.stack(gids, axis=1),        # [D, nd, R*w]
           "mask": np.stack(masks, axis=1),      # [D, nd, R*w]
           # replicated per device (stacked so every leaf has the D axis)
           "node_mask": np.tile(batch.node_mask[None], (D, 1))}
    if "node_depth" in batch.extras:
        aux["node_depth"] = np.tile(batch.extras["node_depth"][None],
                                    (D,) + (1,) * batch.extras["node_depth"].ndim)
    return aux


def make_ep_train_step(cfg: DAGNNConfig, mesh: Mesh, statics, loss_head,
                       optimizer, axis: str = "ep",
                       dp_axis: Optional[str] = None):
    """Jitted sharded-state EP training step.

    statics: per-direction EPStatic list (shape info, trace-time constant).
    loss_head(logits, y, graph_mask) -> scalar, given head outputs for the
    pooled readout (replicated across the axis after psum/pmax).
    Supports every out_pool incl. "attn": the reference's attention pool
    softmaxes a length-1 axis (dagnn.py:114-117), making it EXACTLY add
    pool with constant weights 1.0 — even its score-linear's gradient is
    identically zero — so it maps to the psum'd add pool here (same
    attn_compat rule as readout.pool_nodes).

    With dp_axis set (2-axis mesh, parallel/mesh.py make_hybrid_mesh),
    every data argument carries an extra leading dp-group dimension: each
    dp group trains its own sub-batch edge-partitioned over `axis` (ICI),
    and loss/grads are additionally averaged over dp_axis (DCN) — the
    composition of the reference's DataParallel (tg/data_parallel.py)
    with the intra-batch sharding it never had.
    """
    from dagnn_tpu.nn.dagnn import _apply_head
    from dagnn_tpu.nn.encoders import encode

    def fwd_loss(params, xraw, edge_attr, eps_dirs, aux, y, graph_mask):
        # node encoder (replicated; raw features -> [N+1, emb], pad zeroed)
        x = encode(params["encoder"], cfg.encoder, xraw,
                   aux.get("node_depth"))
        x = jnp.where(aux["node_mask"][:, None], x, 0)
        h_dirs, x_dirs = ep_node_states(params, cfg, x, edge_attr,
                                        eps_dirs, statics, axis)
        G = graph_mask.shape[0]
        kind = ("add" if cfg.out_pool in ("add", "sum", "mean", "attn")
                else cfg.out_pool)

        def pool(h, di):
            gid, m = aux["gid"][di], aux["mask"][di]
            if cfg.out_pool == "max":
                # cross-device max: a device holding NO nodes of graph g
                # must contribute -inf, not pool_nodes' empty fill (0);
                # pmax has no VJP rule, so gather + local max instead
                neg = jnp.finfo(h.dtype).min
                hm = jnp.where(m[:, None], h, neg)
                part = jax.ops.segment_max(hm, gid, num_segments=G + 1)[:G]
                pooled = jnp.max(jax.lax.all_gather(part, axis), axis=0)
                pooled = jnp.where(pooled <= neg, 0, pooled)
            else:
                pooled = pool_nodes(h, gid, G, mask=m, kind=kind)
                pooled = jax.lax.psum(pooled, axis)
            if cfg.out_pool == "mean":
                cnt = jax.lax.psum(
                    jax.ops.segment_sum(m.astype(pooled.dtype), gid,
                                        num_segments=G), axis)
                pooled = pooled / jnp.maximum(cnt, 1)[:, None]
            return pooled

        # segment pooling commutes with feature concat, so each tensor is
        # pooled in ITS OWN direction's slot layout; the feature order
        # mirrors the canonical readout branches (nn/dagnn.py)
        if cfg.out_pool_all or not cfg.bidirectional:
            parts = [pool(x_dirs[0], 0)] if cfg.out_wx else []
            for di in range(len(cfg.dirs)):
                for l in range(cfg.num_layers):
                    parts.append(pool(h_dirs[di][l], di))
        else:
            parts = []
            for di in range(len(cfg.dirs)):
                sub = [x_dirs[di]] if cfg.out_wx else []
                sub += [h_dirs[di][l] for l in range(cfg.num_layers)]
                parts.append(pool(jnp.concatenate(sub, axis=-1), di))
        out = jnp.concatenate(parts, axis=-1)
        logits = _apply_head(params, cfg, out.astype(jnp.float32), None, False)
        return loss_head(logits, y, graph_mask)

    if dp_axis is None:
        dspec = lambda *rest: P(*rest)          # no dp dimension
    else:
        dspec = lambda *rest: P(dp_axis, *rest)

    in_specs = (P(), dspec(), dspec(), dspec(axis), dspec(axis),
                dspec(), dspec())

    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=(P(), P()), check_vma=False)
    def _grad(params, x, edge_attr, eps_dirs, aux, y, graph_mask):
        strip = (lambda a: a[0]) if dp_axis is None else (lambda a: a[0, 0])
        eps_dirs = jax.tree.map(strip, eps_dirs)
        aux = jax.tree.map(strip, aux)
        if dp_axis is not None:
            sq = lambda a: a[0]
            x, edge_attr, y, graph_mask = (
                sq(x), jax.tree.map(sq, edge_attr), jax.tree.map(sq, y),
                sq(graph_mask))
        loss, grads = jax.value_and_grad(fwd_loss)(
            params, x, edge_attr, eps_dirs, aux, y, graph_mask)
        grads = jax.lax.psum(grads, axis)   # partial -> total weight grads
        if dp_axis is not None:
            loss = jax.lax.pmean(loss, dp_axis)
            grads = jax.lax.pmean(grads, dp_axis)
        return loss, grads

    def step(params, opt_state, x, edge_attr, eps_dirs, aux, y, graph_mask):
        loss, grads = _grad(params, x, edge_attr, eps_dirs, aux, y,
                            graph_mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return jax.jit(step)
