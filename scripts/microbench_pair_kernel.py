"""Microbenchmark: the pair kernels standalone at bench plan shapes.

Times fused_pair_forward / fused_pair_backward (ops/pallas/pair_step.py)
with no scan and no caller glue, at the block widths the real bench plan
produces (pass --pair3 shapes via PAIR=3), against 2x the per-row merged
kernels at the same total work — isolating the in-kernel cost of the
pair structure (intra-pair one-hot routing, per-block reconstruction)
from the glue savings the e2e bench measures.

Run on TPU:  python scripts/microbench_pair_kernel.py
"""

import os
import sys
import time

_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    os.environ["LIBTPU_INIT_ARGS"] = (
        _args + " --xla_tpu_scoped_vmem_limit_kib=36864").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, iters=50):
    fn()
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e6


def main():
    from dagnn_tpu.dag.batch import collate
    from dagnn_tpu.data.synthetic import synthetic_ast_batch
    from dagnn_tpu.nn.dagnn import (dagnn_init, _build_streams_pair,
                                    _build_streams_merged, _mweights,
                                    _fused_static, encode)
    from dagnn_tpu.ops.pallas.pair_step import (fused_pair_forward,
                                                fused_pair_backward)
    from dagnn_tpu.ops.pallas.row_step import (fused_row_forward,
                                               fused_row_backward)
    import __graft_entry__ as ge

    pm = int(os.environ.get("PAIR", "2"))
    cfg = ge._flagship_cfg()
    graphs = synthetic_ast_batch(0, 160, mean_nodes=125)
    pad = ge._pad_for(graphs)
    padp = dataclasses.replace(pad, pair=pm,
                               max_levels=pad.max_levels + pad.max_levels % 2)
    b = collate(graphs, padp)
    params = dagnn_init(jax.random.PRNGKey(0), cfg)
    x = encode(params["encoder"], cfg.encoder, b.x,
               b.extras.get("node_depth"))
    x = jnp.where(jnp.asarray(b.node_mask)[:, None], x, 0)

    # one representative pair step (mid-schedule) + the two merged rows
    params2, fxs, ixs, (P, kn, blocks, U) = _build_streams_pair(
        params, cfg, x, b.edge_attr, b)
    st = _fused_static(cfg, fxs)
    w = _mweights(cfg, params2, st[0])
    i = P // 2
    row = jax.tree.map(lambda a: a[i], ixs)
    fx = jax.tree.map(lambda a: a[i], fxs)
    lh = cfg.num_layers * cfg.hidden_dim
    vals = jnp.asarray(np.random.default_rng(0).normal(
        size=(U, lh)).astype(np.float32), jnp.bfloat16)
    g = jnp.asarray(np.random.default_rng(1).normal(
        size=(4 * kn, lh)).astype(np.float32), jnp.bfloat16)
    tg = jnp.asarray(np.random.default_rng(2).normal(
        size=(row["teslot"].shape[0], lh)).astype(np.float32), jnp.bfloat16)

    pf = jax.jit(lambda: fused_pair_forward(
        st, False, fx["x"], vals, fx.get("ea"), row["edst"], row["emask"],
        row["nmask"], row["nsrc"], w, blocks, emit_res=True))
    outs, a32, nres = pf()
    pb = jax.jit(lambda: fused_pair_backward(
        st, False, fx["x"], vals, fx.get("ea"), row["edst"], row["emask"],
        row["nmask"], row["nsrc"], w, g, tg, row["tdst"], row["tmask"],
        (a32, nres), blocks))
    print(f"pair (PAIR={pm}, U={U}, W={row['edst'].shape[0]}, "
          f"T={row['teslot'].shape[0]}):")
    print(f"  fwd {timeit(pf):8.1f} us/pair")
    print(f"  bwd {timeit(pb):8.1f} us/pair")

    # per-row merged kernels x2 at the plain layout for the same batch
    bm = collate(graphs, pad)
    params2m, fxm, ixm, (L, kn2, nf) = _build_streams_merged(
        params, cfg, x, bm.edge_attr, bm.fwd, bm.rev)
    wm = _mweights(cfg, params2m, st[0])
    rowm = jax.tree.map(lambda a: a[L // 2], ixm)
    fxm1 = jax.tree.map(lambda a: a[L // 2], fxm)
    ke2 = rowm["eslot"].shape[0]
    valsm = vals[:ke2] if ke2 <= U else jnp.concatenate(
        [vals, vals[: ke2 - U]])
    gm = g[: kn2]
    tgm = jnp.asarray(np.random.default_rng(3).normal(
        size=(rowm["teslot"].shape[0], lh)).astype(np.float32), jnp.bfloat16)

    mf = jax.jit(lambda: fused_row_forward(
        st, False, fxm1["x"], valsm, fxm1.get("ea"), rowm["edst"],
        rowm["emask"], rowm["nmask"], wm, emit_res=True, ndirs=2))
    outsm, a32m, nresm = mf()
    mb = jax.jit(lambda: fused_row_backward(
        st, False, fxm1["x"], valsm, fxm1.get("ea"), rowm["edst"],
        rowm["emask"], rowm["nmask"], wm, gm, tgm, rowm["tdst"],
        rowm["tmask"], res=(a32m, nresm), ndirs=2))
    print(f"merged row x1 (Ke={ke2}, Kt={rowm['teslot'].shape[0]}) — "
          f"a PAIR equals 2 of these:")
    print(f"  fwd {timeit(mf):8.1f} us/row")
    print(f"  bwd {timeit(mb):8.1f} us/row")


if __name__ == "__main__":
    main()
