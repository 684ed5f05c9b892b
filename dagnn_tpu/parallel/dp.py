"""Data-parallel training over a device mesh.

TPU-native replacement for the reference's thread-based DataParallel
(reference: ogbg-code/tg/data_parallel.py:41-82 scatter/replicate/
parallel_apply/gather + autograd grad-sum): one SPMD program via shard_map —
the global batch is pre-split into per-device sub-batches (mirroring the
node-balanced Collater, tg/dataloader.py:16-35), stacked on a leading 'dp'
axis, and gradients are psum-reduced over ICI instead of gathered to a
master replica.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dagnn_tpu.dag.batch import DAGBatch, DAGGraph, PadConfig, collate


def split_by_nodes(graphs: Sequence[DAGGraph], n_shards: int) -> List[List[DAGGraph]]:
    """Split a batch into n_shards contiguous groups balanced by NODE count
    (the reference Collater's cumsum/round policy, tg/dataloader.py:16-28)."""
    if n_shards <= 1:
        return [list(graphs)]
    sizes = np.array([g.num_nodes for g in graphs], dtype=np.float64)
    cum = np.cumsum(sizes)
    total = cum[-1] if len(cum) else 0
    device_id = (
        np.round(cum * n_shards / max(total, 1e-9) - 0.5).astype(int).clip(0, n_shards - 1)
        if len(cum) else np.zeros(0, int)
    )
    out = [[] for _ in range(n_shards)]
    for g, d in zip(graphs, device_id):
        out[d].append(g)
    return out


def stack_batches(batches: Sequence[DAGBatch]) -> DAGBatch:
    """Stack per-device DAGBatches on a leading 'dp' axis (all must share
    one PadConfig so shapes agree)."""
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *batches)


def collate_sharded(graphs: Sequence[DAGGraph], n_shards: int,
                    pad: PadConfig) -> DAGBatch:
    shards = split_by_nodes(graphs, n_shards)
    return stack_batches([collate(s, pad) for s in shards])


def make_dp_train_step(
    loss_fn: Callable,           # (params, batch, rng) -> scalar loss
    optimizer,
    mesh: Mesh,
    axis: str = "dp",
    donate: bool = True,
):
    """Build a jitted SPMD train step over `mesh`.

    loss_fn sees a single-device DAGBatch (leading dp axis squeezed).
    Gradients and loss are psum-averaged over the dp axis — the SPMD
    equivalent of DataParallel's backward grad-sum.
    """
    n = mesh.shape[axis]
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(axis))

    def shard_batch(batch: DAGBatch) -> DAGBatch:
        return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharded), batch)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P(axis), P()),
             out_specs=(P(), P(), P()), check_vma=False)
    def _grad_shard(params, batch, rng):
        local = jax.tree.map(lambda x: x[0], batch)  # squeeze dp axis
        rng = jax.random.fold_in(rng[0], jax.lax.axis_index(axis))
        loss, grads = jax.value_and_grad(loss_fn)(params, local, rng)
        loss = jax.lax.pmean(loss, axis)
        grads = jax.lax.pmean(grads, axis)
        return loss, grads, jnp.zeros((), jnp.int32)

    def step(params, opt_state, batch, rng):
        loss, grads, _ = _grad_shard(params, batch, rng[None])
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    jit_step = jax.jit(step, donate_argnums=(0, 1) if donate else ())
    return jit_step, shard_batch
