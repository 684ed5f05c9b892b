"""Scaling-efficiency harness: edges/s at 1..N devices, DP and EP modes.

The §6 deliverable the reference lacks (BASELINE.md): measures the fwd+bwd
training-step edge throughput of the flagship DAGNN at 1 device and at N
devices under (a) data parallelism (batch sharded, grads psum-reduced) and
(b) edge partitioning (one batched DAG split across the mesh), and reports
scaling efficiency = throughput_N / (N * throughput_1).

    python -m dagnn_tpu.cli.bench_scaling --devices 8 --cpu   # virtual mesh
    python -m dagnn_tpu.cli.bench_scaling                     # real chips
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--devices", type=int, default=0, help="0 = all visible")
    p.add_argument("--graphs", type=int, default=64)
    p.add_argument("--mean-nodes", type=int, default=80)
    p.add_argument("--emb", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count={args.devices or 8}")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import __graft_entry__ as ge
    from dagnn_tpu.dag.batch import collate
    from dagnn_tpu.data.synthetic import synthetic_ast_batch
    from dagnn_tpu.nn.dagnn import dagnn_init, dagnn_forward
    from dagnn_tpu.parallel.dp import collate_sharded, make_dp_train_step
    from dagnn_tpu.parallel.mesh import make_mesh
    from dagnn_tpu.train.losses import tok_loss
    from dagnn_tpu.train.optim import make_optimizer

    n_dev = args.devices or len(jax.devices())
    cfg = ge._flagship_cfg(emb=args.emb, hidden=args.emb)
    graphs = synthetic_ast_batch(0, args.graphs, mean_nodes=args.mean_nodes)
    n_edges = sum(g.num_edges for g in graphs)
    params = dagnn_init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer()
    results = {}

    def timeit(step, sargs, n):
        out = step(*sargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(*sargs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    def loss_fn(p, b, rng):
        logits = dagnn_forward(p, cfg, b)
        return tok_loss(logits, b.y["y_arr"], b.graph_mask)

    for d in sorted({1, n_dev}):
        mesh = make_mesh(d, ("dp",))
        pad = ge._pad_for(graphs, n_shards=d)
        batch = collate_sharded(graphs, d, pad)
        step, shard = make_dp_train_step(loss_fn, opt, mesh, donate=False)
        opt_state = opt.init(params)
        sb = shard(batch)
        rng = jax.random.PRNGKey(0)
        dt = timeit(lambda *a: step(*a)[2], (params, opt_state, sb, rng),
                    args.iters)
        results[f"dp_{d}"] = n_edges / dt
        print(f"DP x{d}: {n_edges / dt:,.0f} edges/s ({dt * 1e3:.1f} ms/step)")

    if n_dev > 1:
        eff = results[f"dp_{n_dev}"] / (n_dev * results["dp_1"])
        results["dp_scaling_efficiency"] = eff
        print(f"DP scaling efficiency at {n_dev} devices: {eff:.1%}")

    # --- edge partitioning: ONE batched DAG sharded across the mesh ---
    from dagnn_tpu.parallel.edge_partition import (
        partition_schedule_sharded, ep_readout_aux, ep_wire_stats,
        make_ep_train_step)
    import dataclasses as dc

    def loss_head(logits, y, gmask):
        return tok_loss(logits, y["y_arr"], gmask)

    for d in sorted({1, n_dev}):
        chunk = max(64, 64 * d)
        pad1 = ge._pad_for(graphs, n_shards=1, chunk=chunk)
        pad1 = dc.replace(pad1, nodes_per_level=chunk)
        batch = collate(graphs, pad1)
        t0 = time.perf_counter()
        eps_f, st_f = partition_schedule_sharded(batch.fwd, d)
        eps_r, st_r = partition_schedule_sharded(batch.rev, d)
        plan_ms = (time.perf_counter() - t0) * 1e3
        aux = ep_readout_aux(batch, (eps_f, eps_r), cfg)
        if d > 1:
            wire = ep_wire_stats(eps_f, cfg.hidden_dim)
            print(f"EP x{d} plan {plan_ms:.0f} ms; wire/step: "
                  f"boundary {wire['boundary_bytes_real']/1e6:.2f} MB real "
                  f"({wire['boundary_bytes_padded']/1e6:.2f} padded, "
                  f"deferred {wire['deferred_frac']:.0%}) vs full-row "
                  f"all_gather {wire['allgather_bytes_per_step']/1e6:.2f} MB")
            results["ep_wire_boundary_mb"] = wire["boundary_bytes_real"] / 1e6
            results["ep_wire_allgather_mb"] = (
                wire["allgather_bytes_per_step"] / 1e6)
        mesh = make_mesh(d, ("ep",))
        step = make_ep_train_step(cfg, mesh, (st_f, st_r), loss_head, opt)
        sargs = (params, opt.init(params), jnp.asarray(batch.x),
                 jnp.asarray(batch.edge_attr),
                 jax.tree.map(jnp.asarray, (eps_f, eps_r)),
                 jax.tree.map(jnp.asarray, aux),
                 jax.tree.map(jnp.asarray, batch.y),
                 jnp.asarray(batch.graph_mask))
        dt = timeit(lambda *a: step(*a)[2], sargs, args.iters)
        results[f"ep_{d}"] = n_edges / dt
        print(f"EP x{d}: {n_edges / dt:,.0f} edges/s ({dt * 1e3:.1f} ms/step)")

    if n_dev > 1:
        eff = results[f"ep_{n_dev}"] / (n_dev * results["ep_1"])
        results["ep_scaling_efficiency"] = eff
        print(f"EP scaling efficiency at {n_dev} devices: {eff:.1%}")

    print(json.dumps({k: round(v, 1) for k, v in results.items()}))
    return results


if __name__ == "__main__":
    main()
