"""EP cost decomposition + break-even model (round-4 verdict weak #4).

results/ep_scaling recorded sharded-state EP at 355k edges/s on one chip
vs 952k for DP — a 2.7x machinery cost with no committed analysis. This
harness produces that analysis on the real chip:

1. profiles the EP x1 AND DP x1 train steps at the bench_scaling
   workload (64 graphs, mean 80 nodes, emb 128) and aggregates device
   time into categories (collectives, halo DUS + plan gathers, scan
   bodies, optimizer/other);
2. prints the host plan's exact per-device statistics for D = 1..8
   (rows, per-device edge width, halo size, boundary-exchange widths) —
   the inputs to the scaling model: own-slice compute shrinks ~1/D
   while plan widths (the overhead) stay roughly constant per device;
3. prints the break-even model derived from (1)+(2).

Run: python scripts/ep_decompose.py            (real chip)
     python scripts/ep_decompose.py --plan-only  (any backend)
"""

import dataclasses as dc
import json
import os
import sys
import time

_ia = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _ia:
    os.environ["LIBTPU_INIT_ARGS"] = (
        _ia + " --xla_tpu_scoped_vmem_limit_kib=32768").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    plan_only = "--plan-only" in sys.argv
    import __graft_entry__ as ge
    from dagnn_tpu.dag.batch import collate
    from dagnn_tpu.data.synthetic import synthetic_ast_batch
    from dagnn_tpu.parallel.edge_partition import (
        partition_schedule_sharded, ep_readout_aux, make_ep_train_step)
    from dagnn_tpu.parallel.mesh import make_mesh
    from dagnn_tpu.parallel.dp import collate_sharded, make_dp_train_step
    from dagnn_tpu.nn.dagnn import dagnn_init, dagnn_forward
    from dagnn_tpu.train.losses import tok_loss
    from dagnn_tpu.train.optim import make_optimizer

    cfg = ge._flagship_cfg(emb=128, hidden=128)
    graphs = synthetic_ast_batch(0, 64, mean_nodes=80)
    n_edges = sum(g.num_edges for g in graphs)
    params = dagnn_init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer()

    # ---- plan statistics by device count ------------------------------
    plans = {}
    for d in (1, 2, 4, 8):
        chunk = max(64, 64 * d)
        pad1 = ge._pad_for(graphs, n_shards=1, chunk=chunk)
        pad1 = dc.replace(pad1, nodes_per_level=chunk)
        b = collate(graphs, pad1)
        eps_f, st_f = partition_schedule_sharded(b.fwd, d)
        plans[d] = dict(
            rows=int(st_f.rows), own_w=int(st_f.own_w),
            halo=int(st_f.halo),
            ke_per_dev=int(eps_f.e_dst.shape[-1]),
            tgrad_per_dev=int(eps_f.t_mask.shape[-1]),
            boundary_w=int(eps_f.x_send_col.shape[-1]),
            deferred_w=int(eps_f.d_send_col.shape[-1]),
            urgent_w=int(eps_f.u_send_col.shape[-1]),
        )
    print(json.dumps({"plan_by_D": plans}))
    if plan_only:
        return

    # ---- measured DP x1 vs EP x1 + profiles ---------------------------
    from dagnn_tpu.utils.profiling import profile_step, summarize_trace

    def categorize(rows, iters):
        cats = {"collective": 0.0, "dus": 0.0, "gather": 0.0,
                "scan_total": 0.0, "fusion": 0.0, "other": 0.0}
        for r in rows:
            nm = r["name"].lower()
            cat = (r.get("category") or "").lower()
            ex = (r.get("example") or "").lower()
            us = r["total_us"] / iters
            if nm in ("1", "2", "0") or nm.startswith("jit_"):
                continue
            if ("all-to-all" in nm or "all-reduce" in nm
                    or "collective" in nm or "all-to-all" in ex):
                cats["collective"] += us
            elif "dynamic_update" in nm or "dynamic-update" in nm:
                cats["dus"] += us
            elif "gather" in nm or "pad_clamp" in ex:
                cats["gather"] += us
            elif cat == "while":
                cats["scan_total"] += us
            elif "fusion" in nm or "custom" in cat:
                cats["fusion"] += us
            else:
                cats["other"] += us
        return {k: round(v, 1) for k, v in cats.items()}

    out = {}

    # DP x1
    mesh = make_mesh(1, ("dp",))
    pad = ge._pad_for(graphs, n_shards=1)
    sb = collate_sharded(graphs, 1, pad)

    def loss_fn(p, b, rng):
        return tok_loss(dagnn_forward(p, cfg, b), b.y["y_arr"], b.graph_mask)

    dstep, shard = make_dp_train_step(loss_fn, opt, mesh, donate=False)
    sbs = shard(sb)
    ostate = opt.init(params)
    rng = jax.random.PRNGKey(0)

    def run_dp():
        jax.block_until_ready(dstep(params, ostate, sbs, rng)[2])

    run_dp()
    t0 = time.perf_counter()
    for _ in range(5):
        run_dp()
    out["dp1_ms"] = round((time.perf_counter() - t0) / 5 * 1e3, 2)
    rows = summarize_trace(profile_step(run_dp, iters=3), top=60)
    out["dp1_profile_us"] = categorize(rows, 3)

    # EP x1
    chunk = 64
    pad1 = dc.replace(ge._pad_for(graphs, n_shards=1, chunk=chunk),
                      nodes_per_level=chunk)
    batch = collate(graphs, pad1)
    eps_f, st_f = partition_schedule_sharded(batch.fwd, 1)
    eps_r, st_r = partition_schedule_sharded(batch.rev, 1)
    aux = ep_readout_aux(batch, (eps_f, eps_r), cfg)
    mesh = make_mesh(1, ("ep",))

    def loss_head(logits, y, gmask):
        return tok_loss(logits, y["y_arr"], gmask)

    estep = make_ep_train_step(cfg, mesh, (st_f, st_r), loss_head, opt)
    sargs = (params, opt.init(params), jnp.asarray(batch.x),
             jnp.asarray(batch.edge_attr),
             jax.tree.map(jnp.asarray, (eps_f, eps_r)),
             jax.tree.map(jnp.asarray, aux),
             jax.tree.map(jnp.asarray, batch.y),
             jnp.asarray(batch.graph_mask))

    def run_ep():
        jax.block_until_ready(estep(*sargs)[2])

    run_ep()
    t0 = time.perf_counter()
    for _ in range(5):
        run_ep()
    out["ep1_ms"] = round((time.perf_counter() - t0) / 5 * 1e3, 2)
    rows = summarize_trace(profile_step(run_ep, iters=3), top=60)
    out["ep1_profile_us"] = categorize(rows, 3)
    out["edges"] = n_edges
    out["dp1_edges_per_s"] = round(n_edges / out["dp1_ms"] * 1e3, 1)
    out["ep1_edges_per_s"] = round(n_edges / out["ep1_ms"] * 1e3, 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
