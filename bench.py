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

--roofline additionally prints an accounting line: analytic model FLOPs
(fwd + 2x bwd), executed FLOPs (including pad slots and the backward's
in-kernel forward recompute), achieved FLOP/s vs the chip's bf16 peak
(MFU), an HBM-traffic estimate vs peak bandwidth, and the per-scan-row
latency split. The wavefront's binding constraint on TPU is SEQUENTIAL ROW
LATENCY (cross-row gather + kernel dispatch per topological row), not
FLOPs or bandwidth — the roofline line quantifies all three so the bar
stops being a folk number.
"""

import json
import os
from functools import partial
import sys
import time

# raise the TPU scoped-VMEM stack limit (default 16MB): the merged
# backward kernel at dense-packed widths needs ~17-20MB of scoped VMEM
# (v5e has 128MB physical VMEM; must be set before the first compile)
_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    # pair kernels (the default) need ~32.3MB scoped (two rows of ctx;
    # the backward reconstructs per block to stay this low) — 36MB keeps
    # margin while avoiding the global buffer-assignment regression a
    # 64MB limit causes (A/B: plain at 64MB ran 18.0 vs 16.2ms/step)
    _kib = 32768 if "--nopair" in sys.argv else 36864
    os.environ["LIBTPU_INIT_ARGS"] = (
        _args + f" --xla_tpu_scoped_vmem_limit_kib={_kib}").strip()

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

# TPU v5e (v5 lite) single-chip peaks (public spec)
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BYTES = 819e9


def _roofline(cfg, batch, dt, n_params):
    """Analytic FLOP/byte model of one train step at the bench config."""
    H, E_dim = cfg.hidden_dim, cfg.emb_dim
    dirs, nl = len(cfg.dirs), cfg.num_layers
    n = int(batch.n_node)
    e = int(batch.n_edge)
    L, Kn = batch.fwd.node_ids.shape
    Ke = batch.fwd.edge_src.shape[1]
    Kt = batch.fwd.tgrad_eslot.shape[1]
    if getattr(batch, "pair", None) is not None:
        # pair layout: the plan's per-PAIR widths, expressed as equivalent
        # per-row-per-direction widths for the census below (L stays the
        # row count = 2 * pairs; the sequential unit is L/2 pair steps)
        plan = batch.pair
        Ke = plan.edst.shape[1] / (2 * dirs)
        Kt = plan.teslot.shape[1] / (2 * dirs)
    G, S, V = batch.y["y_arr"].shape[0], cfg.max_seq_len, cfg.num_vocab

    def gru_flops(units):
        # gi + gh matmuls per unit per layer (In == H at bench config)
        return units * dirs * nl * 2 * (3 * H * E_dim + 3 * H * H)

    def attn_flops(edge_units):
        # edge encode (R->A) + k score + SpMM value reduce, per edge/layer
        return edge_units * dirs * nl * 2 * (cfg.num_rels * H + H + H)

    head = 2 * G * S * V * cfg.out_hidden_dim
    fwd_useful = gru_flops(n) + attn_flops(e) + head
    model = 3 * fwd_useful                      # fwd + 2x analytic bwd
    if cfg.segment_impl == "fused":
        # the fused kernels' ACTUAL op census (ops/pallas/row_step.py):
        # H-width one-hot passes are ONE SpMM forward (P^T (alpha*val))
        # and one backward (P dagg) per layer-dir — softmax internals are
        # width-1 column ops; GRU family = fwd gi/gh + bwd dcur/dagg + dW
        # = 3x (3H*Kn*(E+H)) MACs; transpose segment-sum OH once per
        # row-dir; no backward recompute (residuals stream).
        units = L * dirs * nl
        gru_ish = units * 3 * 2 * 3 * H * Kn * (E_dim + H)
        p_mm = units * 2 * 2 * Ke * Kn * H
        tg_mm = L * dirs * 2 * Kt * Kn * nl * H
        enc_small = 3 * (attn_flops(L * Ke))
        execd = gru_ish + p_mm + tg_mm + 3 * head + enc_small
    else:
        # dense XLA path: ~3 H-width one-hot passes per layer-dir
        p_mm = L * dirs * nl * 3 * 2 * Ke * Kn * H
        fwd_exec = gru_flops(L * Kn) + attn_flops(L * Ke) + p_mm + head
        tg_mm = L * dirs * 2 * Kt * Kn * nl * H
        execd = 3 * fwd_exec + tg_mm

    bpe = 2  # bf16
    streams = L * Kn * E_dim * bpe * dirs       # x stream
    h_buf = (L * Kn + 1) * nl * H * bpe * dirs
    vals_s = L * Ke * nl * H * bpe * dirs
    acc = (L * Ke + 1) * nl * H * bpe * dirs
    dw = L * dirs * nl * (2 * 3 * H * (E_dim + H)) * bpe * 3  # rw+add per row
    opt = n_params * 4 * 8                      # p, m, v, grad rw in f32
    bytes_est = (2 * streams + 3 * h_buf + 2 * vals_s + 3 * acc + dw + opt)

    return dict(
        model_tflops=round(model / 1e12, 3),
        executed_tflops=round(execd / 1e12, 3),
        mfu=round(model / dt / PEAK_BF16_FLOPS, 4),
        executed_vs_peak=round(execd / dt / PEAK_BF16_FLOPS, 4),
        hbm_gb_est=round(bytes_est / 1e9, 2),
        hbm_util_est=round(bytes_est / dt / PEAK_HBM_BYTES, 4),
        seq_rows=int(L * dirs),
        us_per_row=round(dt / (L * dirs) * 1e6, 2),
        binding="sequential row latency (gather+dispatch), not flops/bw",
    )


def main():
    from dagnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    cfg = ge._flagship_cfg()
    graphs = synthetic_ast_batch(0, 160, mean_nodes=125)
    pad = ge._pad_for(graphs)
    if "--nopair" not in sys.argv:
        # DEFAULT: pair-scheduled wavefront (dag/pair.py) with the
        # pair-affine row packer — two rows per scan step, intra-pair
        # edges routed in-kernel. v5e A/B (quiet host, this config):
        # plain 1.86M / pair-plan-only 1.94M / pair-affine 1.99M edges/s.
        # --pair1 selects plan-only; --nopair the per-row merged path.
        import dataclasses as _dc
        pm = 2
        for a in sys.argv:
            if a.startswith("--pair") and a[6:].isdigit():
                pm = int(a[6:])
        pad = _dc.replace(pad, pair=pm,
                          max_levels=pad.max_levels + pad.max_levels % 2)
    batch = collate(graphs, pad)
    n_edges = int(batch.n_edge)

    params = dagnn_init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(lr=1e-3, clip=0.25)
    opt_state = opt.init(params)

    def loss_fn(p, b):
        logits = dagnn_forward(p, cfg, b)
        return tok_loss(logits, b.y["y_arr"], b.graph_mask)

    def one_step(p, s, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        updates, s = opt.update(grads, s, p)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
        return p, s, loss

    # TWO optimizer steps per dispatch: the tunnel's per-program launch
    # latency (~2.3-2.9ms) is paid once per jit call, so chaining steps
    # inside one program amortizes it (measured +0.55ms/step on v5e;
    # unroll 4/8 gain nothing further). Plain UNROLLED chaining — a
    # lax.fori_loop variant measured 0.37x in round 2 because XLA loses
    # the in-place state-buffer updates through the loop carry; inline
    # chaining keeps every buffer reuse intact.
    n_chain = int(os.environ.get("DAGNN_BENCH_STEPS", "2"))

    @partial(jax.jit, donate_argnums=(0, 1))
    def step2(p, s, b):
        loss = None
        for _ in range(n_chain):
            p, s, loss = one_step(p, s, b)
        return p, s, loss

    batch = jax.tree.map(jnp.asarray, batch)
    # warmup / compile
    params, opt_state, loss = step2(params, opt_state, batch)
    jax.block_until_ready(loss)

    iters = 16 // n_chain
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step2(params, opt_state, batch)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    edges_per_s = n_edges * n_chain * iters / dt
    dt = dt / n_chain  # per-step for the roofline accounting
    print(json.dumps({
        "metric": "edges_per_s_per_chip_fwdbwd",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 4),
    }))
    if "--roofline" in sys.argv:
        n_params = sum(int(np.prod(a.shape))
                       for a in jax.tree.leaves(params))
        print(json.dumps({"metric": "roofline",
                          **_roofline(cfg, batch, dt / iters, n_params)}))


if __name__ == "__main__":
    main()
