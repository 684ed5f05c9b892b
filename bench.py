"""Benchmark: edges/s/chip on the flagship DAGNN fwd+bwd train step.

Runs the ogbg-code2-TOK-shaped workload (batch 160 synthetic ASTs,
emb/hidden 300, bidirectional attn_h, reference config of
scripts/ogb_tok.sh:15-31) on the available accelerator and prints ONE JSON
line. The primary metric follows BASELINE.md: edges processed per second per
chip through a full forward+backward+Adam step (each edge is aggregated in
both DAG directions per GRU layer; we count raw graph edges, not
direction-multiplied, to stay conservative and comparable).

vs_baseline is value / 1e6 — a nominal 1M edges/s/chip bar recorded at
round 1 (the reference repo commits no numbers, BASELINE.md); later rounds
compare against their own history in BENCH_r{N}.json.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from dagnn_tpu.dag.batch import collate
from dagnn_tpu.data.synthetic import synthetic_ast_batch
from dagnn_tpu.nn.dagnn import dagnn_init, dagnn_forward
from dagnn_tpu.train.losses import tok_loss
from dagnn_tpu.train.optim import make_optimizer

import __graft_entry__ as ge

BASELINE_EDGES_PER_S = 1.0e6


def main():
    from dagnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    cfg = ge._flagship_cfg()
    graphs = synthetic_ast_batch(0, 160, mean_nodes=125)
    pad = ge._pad_for(graphs)
    batch = collate(graphs, pad)
    n_edges = int(batch.n_edge)

    params = dagnn_init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(lr=1e-3, clip=0.25)
    opt_state = opt.init(params)

    def loss_fn(p, b):
        logits = dagnn_forward(p, cfg, b)
        return tok_loss(logits, b.y["y_arr"], b.graph_mask)

    @jax.jit
    def step(p, s, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        updates, s = opt.update(grads, s, p)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
        return p, s, loss

    batch = jax.tree.map(jnp.asarray, batch)
    # warmup / compile
    params, opt_state, loss = step(params, opt_state, batch)
    jax.block_until_ready(loss)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, batch)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    edges_per_s = n_edges * iters / dt
    print(json.dumps({
        "metric": "edges_per_s_per_chip_fwdbwd",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
