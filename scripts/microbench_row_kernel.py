"""Microbenchmark: fused row kernel at bench shapes, H=300 vs lane-aligned.

Measures the in-kernel cost of Mosaic relayouts caused by the layer-packed
layout's non-tile-aligned (300-column) lane offsets: runs the fused
forward+backward kernels standalone (no scan, no caller glue) at the TOK
bench row shape for hidden widths 300 (production) and 384 (3x128 lanes,
zero-padded), and prints us/row for each. If 384 is not ~1.64x slower
(the FLOP ratio), misalignment overhead is real and lane-padding the
packed layout pays.

Run on TPU: python scripts/microbench_row_kernel.py
"""

import time
import os

_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    os.environ["LIBTPU_INIT_ARGS"] = (
        _args + " --xla_tpu_scoped_vmem_limit_kib=32768").strip()

import jax
import jax.numpy as jnp
import numpy as np

from dagnn_tpu.ops.pallas.row_step import (
    flatten_row_weights, stack_row_weights, fused_row_forward,
    fused_row_backward)


def make_inputs(h, emb, kn, ke, kt, r, nl, ndirs, dtype, seed=0):
    rng = np.random.default_rng(seed)

    def t(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32), dtype)

    qdims = [emb] + [h] * (nl - 1)
    ws = []
    for _ in range(ndirs):
        aggr, cells = [], []
        for l in range(nl):
            aggr.append({
                "attn_lin": {"w": t(1, qdims[l] + h), "b": t(1)},
                "edge_encoder": {"w": t(h, r), "b": t(h)},
            })
            cells.append({"w_ih": t(3 * h, qdims[l]), "w_hh": t(3 * h, h),
                          "b_ih": t(3 * h), "b_hh": t(3 * h)})
        ws.append(flatten_row_weights(aggr, cells, qdims, True))
    weights = stack_row_weights(ws) if ndirs > 1 else ws[0]

    KN, KE, KT = kn * ndirs, ke * ndirs, kt * ndirs
    xin = t(KN, emb)
    vals = t(KE, nl * h)
    ea = t(KE, r)
    edst = jnp.asarray(
        np.concatenate([np.sort(rng.integers(0, kn, ke))
                        for _ in range(ndirs)]).astype(np.int32))
    emask = jnp.ones(KE, jnp.float32)
    nmask = jnp.ones(KN, jnp.float32)
    g = t(KN, nl * h)
    tg = t(KT, nl * h)
    tdst = jnp.asarray(rng.integers(0, kn, KT).astype(np.int32))
    tmask = jnp.ones(KT, jnp.float32)
    return ((True, h, nl), xin, vals, ea, edst, emask, nmask, weights,
            g, tg, tdst, tmask)


def bench_shape(label, h, emb, iters=10, rows=82, ndirs=2):
    """Time `rows` kernel calls chained inside ONE jit (lax.scan with a
    data dependency through the carry) — per-call tunnel dispatch (~300us)
    would otherwise swamp the ~30us kernels."""
    kn, ke, kt, r, nl = 256, 512, 576, 8, 2
    (st, xin, vals, ea, edst, emask, nmask, weights,
     g, tg, tdst, tmask) = make_inputs(h, emb, kn, ke, kt, r, nl, ndirs,
                                       jnp.bfloat16)

    @jax.jit
    def fwd_scan(xin, vals, ea):
        def body(c, _):
            o, a32, nres = fused_row_forward(
                st, False, xin + c[:, :emb], vals, ea, edst, emask,
                nmask, weights, emit_res=True, ndirs=ndirs)
            return o, (a32, nres)
        return jax.lax.scan(body, jnp.zeros_like(g), None, length=rows)

    @jax.jit
    def bwd_scan(xin, vals, ea, res, g, tg):
        def body(c, _):
            dx, dvals, dea, dw = fused_row_backward(
                st, False, xin, vals, ea, edst, emask, nmask, weights,
                c, tg, tdst, tmask, res=res, ndirs=ndirs)
            return c + dvals[: g.shape[0], : g.shape[1]].astype(g.dtype) * 0 + dx[:, :1].astype(g.dtype) * 0, None
        return jax.lax.scan(body, g, None, length=rows)

    out, (a32, nres) = fwd_scan(xin, vals, ea)
    res = (a32[0], nres[0])
    jax.block_until_ready(out)
    o, _ = bwd_scan(xin, vals, ea, res, g, tg)
    jax.block_until_ready(o)

    t0 = time.perf_counter()
    for _ in range(iters):
        out, _ = fwd_scan(xin, vals, ea)
    jax.block_until_ready(out)
    t_f = (time.perf_counter() - t0) / iters / rows

    t0 = time.perf_counter()
    for _ in range(iters):
        o, _ = bwd_scan(xin, vals, ea, res, g, tg)
    jax.block_until_ready(o)
    t_b = (time.perf_counter() - t0) / iters / rows

    print(f"{label:28s} fwd {t_f*1e6:7.1f}us/row  bwd {t_b*1e6:7.1f}us/row"
          f"  -> scan est fwd {t_f*rows*1e3:.2f}ms bwd {t_b*rows*1e3:.2f}ms")
    return t_f, t_b


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    bench_shape("H=300 (production)", 300, 300)
    bench_shape("H=384 (lane-aligned)", 384, 384)
    bench_shape("H=256 (2x128)", 256, 256)
