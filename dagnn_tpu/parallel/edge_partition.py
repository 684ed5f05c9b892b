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

     forward:  compute own slice -> all_gather the row over the mesh axis
               (boundary exchange, O(Kn·H) per link) -> keep own slice +
               scatter the halo entries sourced from this row.
     backward: edge gradients are delivered to slot OWNERS with a
               psum_scatter of per-device one-hot segment sums — the
               transpose of the forward all_gather, same wire volume.

   The backward is a custom VJP exploiting the same write-once property as
   the single-device scan (nn/dagnn.py): only the final buffer is saved
   and rows are replayed in reverse — O(1) memory in depth. The halo
   region is internal: the public function returns only owned slices, so
   copies never leak gradients.

Collectives are XLA all_gather/psum_scatter/psum over a named mesh axis —
they ride ICI within a slice and DCN across slices when the axis spans
hosts (see parallel/mesh.py make_hybrid_mesh).
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

    owner = np.where(sched.edge_mask, sched.edge_dst // w, -1)  # [R, Ke]
    counts = np.zeros((n_dev, R), np.int64)
    for d in range(n_dev):
        counts[d] = (owner == d).sum(axis=1)
    ke_d = int(counts.max()) if counts.size else 0
    ke_d = max(ke_d, 1)

    flat_pad = R * Kn
    e_src = np.full((n_dev, R, ke_d), _node_pad(sched), np.int32)
    e_slot = np.full((n_dev, R, ke_d), flat_pad, np.int32)
    e_dst = np.full((n_dev, R, ke_d), w, np.int32)
    e_id = np.full((n_dev, R, ke_d), _edge_pad(sched), np.int32)
    e_mask = np.zeros((n_dev, R, ke_d), bool)
    for d in range(n_dev):
        for r in range(R):
            sel = np.flatnonzero(owner[r] == d)
            k = len(sel)
            e_src[d, r, :k] = sched.edge_src[r, sel]
            e_slot[d, r, :k] = sched.edge_src_slot[r, sel]
            e_dst[d, r, :k] = sched.edge_dst[r, sel] - d * w  # device-local
            e_id[d, r, :k] = sched.edge_id[r, sel]
            e_mask[d, r, :k] = True

    return LevelSchedule(
        node_ids=node_ids, node_mask=node_mask,
        edge_src=e_src, edge_src_slot=e_slot, edge_dst=e_dst,
        edge_id=e_id, edge_mask=e_mask,
        # tiled so every leaf carries the leading device axis (shard_map)
        node_slot=np.tile(sched.node_slot[None], (n_dev, 1)),
        num_levels=np.tile(np.asarray(sched.num_levels)[None], (n_dev,)),
    )


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
    slots/device, Ws halo writes/row, Kt_d transpose width.

    Local state buffer layout per device: [R*w own | Hs halo | 1 garbage].
    """

    node_ids: np.ndarray       # [D, R, w] global node id of own slots
    node_mask: np.ndarray      # [D, R, w]
    e_src_lslot: np.ndarray    # [D, R, Ke_d] LOCAL buffer index of source
    e_dst: np.ndarray          # [D, R, Ke_d] own-local target slot in [0, w]
    e_id: np.ndarray           # [D, R, Ke_d] original edge id (ea gather)
    e_mask: np.ndarray         # [D, R, Ke_d]
    hw_idx: np.ndarray         # [D, R, Ws] halo index written at row r (pad Hs)
    hw_col: np.ndarray         # [D, R, Ws] source column in [0, Kn) (pad 0)
    t_eslot: np.ndarray        # [D, R, Kt_d] flat edge slot (r*Ke_d+k) whose SOURCE is in row r
    t_col: np.ndarray          # [D, R, Kt_d] source column in [0, Kn) (pad Kn)
    t_mask: np.ndarray         # [D, R, Kt_d]


@dataclasses.dataclass(frozen=True)
class EPStatic:
    rows: int
    own_w: int
    halo: int


def partition_schedule_sharded(
        sched: LevelSchedule, n_dev: int,
        widths: Optional[dict] = None) -> Tuple[EPSchedule, EPStatic]:
    """Build the sharded-state plan from a base LevelSchedule.

    widths: optional static width targets {"ke_d", "halo", "ws", "kt"} so
    different batches compile to one program (analog of PadConfig); each
    defaults to this schedule's exact maximum."""
    widths = widths or {}
    R, Kn = sched.node_ids.shape
    if Kn % n_dev != 0:
        raise ValueError(f"row width {Kn} not divisible by {n_dev} devices")
    w = Kn // n_dev
    flat_pad_g = R * Kn

    owner = np.where(sched.edge_mask, sched.edge_dst // w, -1)  # [R, Ke]

    # --- per-device edge lists grouped by row (targets owned by d) ---
    counts = np.stack([(owner == d).sum(axis=1) for d in range(n_dev)])
    ke_d = max(int(counts.max()) if counts.size else 0, 1)
    ke_d = max(ke_d, widths.get("ke_d", 0))
    if ke_d > widths.get("ke_d", ke_d):
        raise ValueError(f"ke_d {ke_d} exceeds width target")

    e_src_g = np.full((n_dev, R, ke_d), flat_pad_g, np.int64)  # global src slot
    e_dst = np.full((n_dev, R, ke_d), w, np.int32)
    e_id = np.full((n_dev, R, ke_d), _edge_pad(sched), np.int32)
    e_mask = np.zeros((n_dev, R, ke_d), bool)
    for d in range(n_dev):
        for r in range(R):
            sel = np.flatnonzero(owner[r] == d)
            k = len(sel)
            e_src_g[d, r, :k] = sched.edge_src_slot[r, sel]
            e_dst[d, r, :k] = sched.edge_dst[r, sel] - d * w
            e_id[d, r, :k] = sched.edge_id[r, sel]
            e_mask[d, r, :k] = True

    # --- halo: remote source slots each device reads ---
    halos = []
    for d in range(n_dev):
        s = e_src_g[d][e_mask[d]]
        col = s % Kn
        remote = s[(col // w != d) & (s < flat_pad_g)]
        halos.append(np.unique(remote))
    Hs = max([len(h) for h in halos] + [1, widths.get("halo", 0)])
    halo_idx = np.full((n_dev, Hs), flat_pad_g, np.int64)
    for d, h in enumerate(halos):
        halo_idx[d, :len(h)] = h

    # --- remap global source slots to local buffer indices ---
    garbage = R * w + Hs
    e_src_l = np.full((n_dev, R, ke_d), garbage, np.int32)
    for d in range(n_dev):
        lut = np.full(flat_pad_g + 1, garbage, np.int64)
        gcols = np.arange(w) + d * w
        for r in range(R):
            lut[r * Kn + gcols] = r * w + np.arange(w)
        valid = halo_idx[d] < flat_pad_g
        lut[halo_idx[d][valid]] = R * w + np.flatnonzero(valid)
        e_src_l[d] = lut[e_src_g[d]]

    # --- halo write plan: halo entries grouped by source row ---
    hrow = np.where(halo_idx < flat_pad_g, halo_idx // Kn, R)  # [D, Hs]
    ws = max(1, widths.get("ws", 0))
    for d in range(n_dev):
        c = np.bincount(hrow[d][hrow[d] < R], minlength=max(R, 1))
        ws = max(ws, int(c.max()) if len(c) else 0)
    hw_idx = np.full((n_dev, R, ws), Hs, np.int32)
    hw_col = np.zeros((n_dev, R, ws), np.int32)
    for d in range(n_dev):
        for r in range(R):
            sel = np.flatnonzero(hrow[d] == r)
            hw_idx[d, r, :len(sel)] = sel
            hw_col[d, r, :len(sel)] = (halo_idx[d, sel] % Kn).astype(np.int32)

    # --- transpose plan: this device's edges grouped by SOURCE ROW ---
    kt = max(1, widths.get("kt", 0))
    t_data = []
    for d in range(n_dev):
        rr, cc = np.nonzero(e_mask[d])
        src_row = (e_src_g[d, rr, cc] // Kn).astype(np.int64)
        src_col = (e_src_g[d, rr, cc] % Kn).astype(np.int64)
        fslot = rr * ke_d + cc
        order = np.lexsort((fslot, src_col, src_row))
        t_data.append((src_row[order], src_col[order], fslot[order]))
        if len(src_row):
            kt = max(kt, int(np.bincount(src_row, minlength=R).max()))
    eflat_pad = R * ke_d
    t_eslot = np.full((n_dev, R, kt), eflat_pad, np.int32)
    t_col = np.full((n_dev, R, kt), Kn, np.int32)
    t_mask = np.zeros((n_dev, R, kt), bool)
    for d in range(n_dev):
        srow, scol, fslot = t_data[d]
        starts = np.zeros(R + 1, np.int64)
        np.cumsum(np.bincount(srow, minlength=R), out=starts[1:])
        pos = np.arange(len(srow)) - starts[srow]
        t_eslot[d, srow, pos] = fslot
        t_col[d, srow, pos] = scol
        t_mask[d, srow, pos] = True

    node_ids = sched.node_ids.reshape(R, n_dev, w).transpose(1, 0, 2)
    node_mask = sched.node_mask.reshape(R, n_dev, w).transpose(1, 0, 2)
    eps = EPSchedule(
        node_ids=node_ids.astype(np.int32), node_mask=node_mask,
        e_src_lslot=e_src_l, e_dst=e_dst, e_id=e_id, e_mask=e_mask,
        hw_idx=hw_idx, hw_col=hw_col,
        t_eslot=t_eslot, t_col=t_col, t_mask=t_mask,
    )
    return eps, EPStatic(rows=R, own_w=w, halo=Hs)


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
        "hwi": eps.hw_idx, "hwc": eps.hw_col,
        "teslot": eps.t_eslot, "tcol": eps.t_col, "tmask": eps.t_mask,
    }
    return params_dir, fxs, ixs


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ep_wavefront(static, params_dir, fxs, ixs):
    """Sharded-state wavefront; returns OWN slices [Lyr, R*w, H].

    static = (cfg, R, w, Hs, axis). The halo region is internal (copies of
    other devices' slots) and never escapes: gradients of halo reads route
    to the owners via the transpose psum_scatter in the backward, so
    upstream consumers must only read the returned own region.
    """
    cfg, R, w, Hs, axis = static
    buf, _ = jax.lax.scan(_ep_fwd_step(static, params_dir),
                          _ep_init(static, fxs), (fxs, ixs))
    return buf[:, :R * w, :]


def _ep_init(static, fxs):
    cfg, R, w, Hs, axis = static
    return jnp.zeros((cfg.num_layers, R * w + Hs + 1, cfg.hidden_dim),
                     fxs["x"].dtype)


def _ep_fwd_step(static, params_dir):
    cfg, R, w, Hs, axis = static
    specs = [cfg.aggregator_spec(l) for l in range(cfg.num_layers)]

    def step(buf, xs):
        fxs_l, ixs_l = xs
        lvl = ixs_l["lvl"]
        vals = buf[:, ixs_l["eslot"], :]
        outs = _step_outs(cfg, params_dir, specs, vals, fxs_l, ixs_l)  # [L,w,H]
        # boundary exchange: full row = concat of every device's slice
        full = jax.lax.all_gather(outs, axis, axis=1)      # [L, D, w, H]
        full = full.reshape(cfg.num_layers, -1, cfg.hidden_dim)  # [L, Kn, H]
        buf = jax.lax.dynamic_update_slice(buf, outs, (0, lvl * w, 0))
        # halo entries sourced from this row (pad writes land in garbage)
        hw = full[:, ixs_l["hwc"], :]                      # [L, Ws, H]
        buf = buf.at[:, R * w + ixs_l["hwi"], :].set(hw)
        return buf, None

    return step


def _ep_fwd(static, params_dir, fxs, ixs):
    buf, _ = jax.lax.scan(_ep_fwd_step(static, params_dir),
                          _ep_init(static, fxs), (fxs, ixs))
    cfg, R, w, Hs, axis = static
    return buf[:, :R * w, :], (params_dir, fxs, ixs, buf)


def _ep_bwd(static, res, g_own):
    """Reverse replay. g_own [Lyr, R*w, H] is the upstream cotangent of the
    OWN region (readout). Edge grads into any slot are delivered to its
    owner by a one-hot segment-sum over global columns + psum_scatter —
    the transpose of the forward all_gather."""
    cfg, R, w, Hs, axis = static
    params_dir, fxs, ixs, buf_final = res
    specs = [cfg.aggregator_spec(l) for l in range(cfg.num_layers)]
    ke_d = ixs["eslot"].shape[-1]

    def bwd_step(carry, xs):
        acc, d_params = carry        # acc: [Lyr, R*Ke_d+1, H] edge grads
        fxs_l, ixs_l = xs
        lvl = ixs_l["lvl"]
        vals = buf_final[:, ixs_l["eslot"], :]
        tg = acc[:, ixs_l["teslot"], :]                    # [Lyr, Kt, H]
        tg = jnp.where(ixs_l["tmask"][None, :, None], tg, 0)
        kn = w * jax.lax.axis_size(axis)
        oh = jax.nn.one_hot(ixs_l["tcol"], kn, dtype=tg.dtype)  # [Kt, Kn]
        contrib = jnp.einsum("lkh,kn->lnh", tg, oh)        # [Lyr, Kn, H]
        mine = jax.lax.psum_scatter(contrib, axis, scatter_dimension=1,
                                    tiled=True)            # [Lyr, w, H]
        g_l = jax.lax.dynamic_slice(
            g_own, (0, lvl * w, 0), (cfg.num_layers, w, cfg.hidden_dim))
        g_l = g_l + mine

        def f(p, v, fl):
            return _step_outs(cfg, p, specs, v, fl, ixs_l)

        _, vjp_fn = jax.vjp(f, params_dir, vals, fxs_l)
        dp, dv, dfl = vjp_fn(g_l)
        acc = jax.lax.dynamic_update_slice(acc, dv, (0, lvl * ke_d, 0))
        d_params = jax.tree.map(jnp.add, d_params, dp)
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
        own = _ep_wavefront((cfg, st.rows, st.own_w, st.halo, axis),
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
    Supports out_pool in {max, add, sum, mean}; attn pool would need a
    cross-device softmax and is rejected.

    With dp_axis set (2-axis mesh, parallel/mesh.py make_hybrid_mesh),
    every data argument carries an extra leading dp-group dimension: each
    dp group trains its own sub-batch edge-partitioned over `axis` (ICI),
    and loss/grads are additionally averaged over dp_axis (DCN) — the
    composition of the reference's DataParallel (tg/data_parallel.py)
    with the intra-batch sharding it never had.
    """
    if cfg.out_pool == "attn":
        raise NotImplementedError("attn pool not supported in EP mode")
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
        kind = "add" if cfg.out_pool in ("add", "sum", "mean") else cfg.out_pool

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
