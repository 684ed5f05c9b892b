"""Edge-partitioned wavefront execution across a device mesh.

The reference's only device parallelism is replica-per-GPU DataParallel
(reference: ogbg-code/tg/data_parallel.py) — one graph batch per device.
This module supplies what it never had (SURVEY.md §5.7-5.8): splitting ONE
batched DAG's edge set across devices so graphs larger than a chip — or
latency-critical single batches — scale over ICI.

Scheme ("replicated states, sharded work"):
  * every scan row's Kn node slots are partitioned contiguously across the
    'ep' mesh axis (w = Kn / D slots per device);
  * each edge lives on the device owning its TARGET slot, so aggregation
    (segment softmax + SpMM) is device-local; per-device row edge budgets
    are balanced by construction of the chunked schedule;
  * the flat state buffer is replicated; after each row, devices
    all_gather their [w, H] outputs over ICI and update their replica —
    the boundary exchange of predecessor states between wavefront levels.

Per-row traffic is O(Kn * H / D) per link — the analog of ring/context
parallelism for DAG wavefronts (BASELINE.md north star).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from dagnn_tpu.dag.batch import DAGBatch
from dagnn_tpu.dag.schedule import LevelSchedule
from dagnn_tpu.nn.aggregators import aggregate_level, encode_edges
from dagnn_tpu.nn.dagnn import DAGNNConfig, _step_outs
from dagnn_tpu.ops.gru import gru_cell


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
    """Shard-local wavefront pass. Called INSIDE shard_map: psched arrays
    already carry this device's shard (leading axis stripped), x/params
    replicated. Returns node-space states like _direction_pass."""
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
    """Build a jitted edge-partitioned node-states function.

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
