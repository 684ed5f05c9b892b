"""Fused pair kernels: TWO consecutive wavefront rows per pallas call.

Companion to ops/pallas/row_step.py (which owns the per-row kernels and
all shared layer math). One pair call executes rows 2p and 2p+1 of the
direction-merged wavefront — four blocks [A0 | A1 | B0 | B1] (A = even
row, B = odd row, digit = direction) — so every per-scan-step glue op the
caller pays (predecessor gather, state DUS, transpose-grad gather,
edge-grad DUS) is issued HALF as often at twice the size. Those ops run
at 25-30% of HBM peak on v5e (latency-bound per op, see
results/profile_r4/SUMMARY.md), which is exactly the regime where fewer,
bigger ops win.

Intra-pair edges (source in row 2p, target in row 2p+1) cannot be
gathered — row 2p's outputs are not in the state buffer yet. The forward
computes the A blocks first, keeps their layer-packed outputs in VMEM,
and rebuilds the B blocks' intra-pair predecessor rows from them with a
one-hot MXU matmul (row_step._nf_rebuild_vals). The backward mirrors
this in-kernel: B blocks run first (reverse order) and their intra-pair
edge gradients accumulate straight into the same-direction A block's
output cotangent — no edge-grad buffer round-trip and no cross-step
carry (the two costs that sank the per-row near/far "regions" mode,
PLAN.md round-5 stint 1).

Semantics per block are IDENTICAL to the merged row kernels (reference:
ogbg-code/model/dagnn.py:362-373 attention + :171-182 GRU); the pair
layout is produced by dag/pair.py. Residual-stream (use_res) training
path only — the recompute path stays per-row.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dagnn_tpu.ops.pallas.row_step import (
    _F32, _call_kw, _dg, _mm, _build_P, _layer_fwd, _layer_bwd,
    _nf_rebuild_vals, _prep_row, _DictRefs, _names, agg_keys,
    CELL_KEYS, CELL_FWD_KEYS)


def _block_offsets(blocks):
    """Cumulative (edge, vals, tg) offsets per block."""
    out, eo, vo, to = [], 0, 0, 0
    for (mode, d, ked, kvd, ktd) in blocks:
        out.append((mode, d, eo, ked, vo, kvd, to, ktd))
        eo, vo, to = eo + ked, vo + kvd, to + ktd
    return out


def _pair_fwd_kernel(static, names, refs):
    has_ea, hdim, nlayers, emit_res, blocks = static
    (xin_ref, vals_ref, ea_ref, edst_ref, emask_ref, nmask_ref, nsrc_ref,
     *rest) = refs
    n_out = 3 if emit_res else 1
    wref = _DictRefs(names, rest[:-n_out])
    out_ref = rest[-n_out]
    if emit_res:
        a32_ref, nres_ref = rest[-2:]
    kn = xin_ref.shape[0] // len(blocks)
    dt = vals_ref.dtype
    outs_packed = {}                      # dir -> A block's [Kn, L*H] outs
    for bi, (mode, d, eo, ked, vo, kvd, _to, _ktd) in enumerate(
            _block_offsets(blocks)):
        w = lambda nm: wref[nm][d]
        ns, es = slice(bi * kn, (bi + 1) * kn), slice(eo, eo + ked)
        ea = ea_ref[es, :] if has_ea else None
        emask = emask_ref[es, :]
        Pm, P = _build_P(edst_ref[es, :], emask, kn, dt)
        nmask = nmask_ref[ns, :]
        cur = xin_ref[ns, :]
        q = cur
        if mode == "q":
            # intra-pair predecessor rows rebuilt from the same-direction
            # A block's outputs (still in VMEM — bitwise the state-buffer
            # values a gather would have produced)
            vals_d = _nf_rebuild_vals(vals_ref[vo:vo + kvd, :],
                                      nsrc_ref[eo + kvd:eo + ked, :],
                                      outs_packed[d], kn, dt)
        else:
            vals_d = vals_ref[vo:vo + kvd, :]
        louts = []
        for l in range(nlayers):
            aggp = {k: w(f"a{l}_{k}") for k in agg_keys(has_ea)}
            cellp = {k: w(f"c{l}_{k}") for k in CELL_FWD_KEYS}
            out, res = _layer_fwd(aggp, cellp, cur, q,
                                  vals_d[:, l * hdim:(l + 1) * hdim], ea, P,
                                  Pm, emask, nmask, hdim)
            out = out.astype(out_ref.dtype)
            out_ref[ns, l * hdim:(l + 1) * hdim] = out
            if emit_res:
                _k_l, _alpha, alpha32, agg, r, z, n, _h_n = res
                a32_ref[es, l:l + 1] = alpha32
                for i, t in enumerate((agg, r, z, n)):
                    col = (4 * l + i) * hdim
                    nres_ref[ns, col:col + hdim] = t.astype(nres_ref.dtype)
            louts.append(out)
            cur = out
            q = out
        if mode == "p":
            outs_packed[d] = jnp.concatenate(louts, axis=1)


def _pair_bwd_kernel(static, names, refs):
    has_ea, hdim, nlayers, blocks = static
    in_names, out_names = names
    (xin_ref, vals_ref, ea_ref, edst_ref, emask_ref, nmask_ref, nsrc_ref,
     *rest) = refs
    nw = len(in_names)
    wref = _DictRefs(in_names, rest[:nw])
    a32_ref, nres_ref, g_ref, tg_ref, tdst_ref, tmask_ref = rest[nw:nw + 6]
    dx_ref, dvals_ref, dea_ref = rest[nw + 6:nw + 9]
    dwrefs = _DictRefs(out_names, rest[nw + 9:])

    kn = xin_ref.shape[0] // len(blocks)
    dt = vals_ref.dtype
    offs = _block_offsets(blocks)

    def _reconstruct(bi, outs_packed, keep_ctx):
        """Rebuild one block's forward from the residual streams (bitwise
        the forward's values). keep_ctx=False returns only the layer-packed
        outputs (cheap: h_n matmul + gate combine per layer) — used to get
        the A outputs without holding the full context, so only ONE
        block's context is ever live (scoped-VMEM diet: 51MB -> fits the
        32MB default budget)."""
        mode, d, eo, ked, vo, kvd, _to, _ktd = offs[bi]
        wsel = lambda nm: wref[nm][d]
        ns, es = slice(bi * kn, (bi + 1) * kn), slice(eo, eo + ked)
        ea = ea_ref[es, :] if has_ea else None
        emask = emask_ref[es, :]
        nmask = nmask_ref[ns, :]
        if mode == "q":
            vals = _nf_rebuild_vals(vals_ref[vo:vo + kvd, :],
                                    nsrc_ref[eo + kvd:eo + ked, :],
                                    outs_packed[d], kn, dt)
        else:
            vals = vals_ref[vo:vo + kvd, :]
        cur = xin_ref[ns, :]
        q = cur
        curs, qs, resids, aggps, cellps, louts = [], [], [], [], [], []
        for l in range(nlayers):
            agg, r, z, n = (
                nres_ref[ns, (4 * l + i) * hdim:(4 * l + i + 1) * hdim]
                for i in range(4))
            if keep_ctx:
                aggp = {k: wsel(f"a{l}_{k}")
                        for k in agg_keys(has_ea, rows=True)}
                aggps.append(aggp)
                cellps.append({k: wsel(f"c{l}_{k}") for k in CELL_KEYS})
                curs.append(cur)
                qs.append(q)
                k_l = vals[:, l * hdim:(l + 1) * hdim]
                if has_ea:
                    k_l = (k_l.astype(_F32) + _dg(ea, aggp["we"], 1, 1)
                           + aggp["be"].astype(_F32)).astype(dt)
                alpha32 = a32_ref[es, l:l + 1]
                h_n = (_dg(agg, wsel(f"c{l}_w_hn"), 1, 1)
                       + wsel(f"c{l}_b_hn").astype(_F32)).astype(dt)
                resids.append((k_l, alpha32.astype(dt), alpha32, agg, r, z,
                               n, h_n))
            out = (((1.0 - z.astype(_F32)) * n.astype(_F32)
                    + z.astype(_F32) * agg.astype(_F32)) * nmask).astype(dt)
            louts.append(out)
            cur = out
            q = out
        if not keep_ctx:
            return jnp.concatenate(louts, axis=1)
        Pm, P = _build_P(edst_ref[es, :], emask, kn, dt)
        return (vals, ea, emask, nmask, P, Pm, curs, qs, resids, aggps,
                cellps)

    # A blocks' layer-packed outputs (feed the B blocks' vals rebuild) —
    # outputs only, contexts are rebuilt per block inside the reverse loop
    outs_packed = {blocks[bi][1]: _reconstruct(bi, None, False)
                   for bi in range(len(blocks)) if blocks[bi][0] == "p"}

    # ---- reverse-order gradients. B blocks run first; their intra-pair
    # edge gradients land in g_extra[dir], consumed by the same-direction
    # A block below. Each block's forward context is reconstructed HERE
    # (A blocks' cheap output reconstruction thus runs twice) and dies
    # with the iteration.
    g_extra = {}
    for bi in range(len(blocks) - 1, -1, -1):
        mode, d, eo, ked, vo, kvd, to, ktd = offs[bi]
        ns, es = slice(bi * kn, (bi + 1) * kn), slice(eo, eo + ked)
        ts = slice(to, to + ktd)
        (vals, ea, emask, nmask, P, Pm, curs, qs, resids, aggps,
         cellps) = _reconstruct(bi, outs_packed, True)

        # incoming transpose-edge gradients (one-hot MXU segment sum over
        # the whole layer-packed width), plus — for A blocks — the B
        # block's in-kernel intra-pair contribution
        tcol = jax.lax.broadcasted_iota(jnp.int32, (ktd, kn), 1)
        OH = ((tcol == tdst_ref[ts, :]) & (tmask_ref[ts, :] > 0)).astype(dt)
        tg_all = _dg(OH, tg_ref[ts, :], 0, 0)                 # [Kn, L*H] f32
        if mode == "p" and d in g_extra:
            tg_all = tg_all + g_extra[d]
        g_rows_tot = [
            g_ref[ns, l * hdim:(l + 1) * hdim].astype(_F32)
            + tg_all[:, l * hdim:(l + 1) * hdim]
            for l in range(nlayers)
        ]

        NH = None
        if mode == "q":
            ncol = jax.lax.broadcasted_iota(jnp.int32, (ked - kvd, kn), 1)
            NH = (ncol == nsrc_ref[eo + kvd:eo + ked, :]).astype(dt)
        dea_acc = jnp.zeros((ked, dea_ref.shape[1]), _F32) if has_ea else None
        ng_cols = []
        g_next = None
        for l in range(nlayers - 1, -1, -1):
            g_l = g_rows_tot[l]
            if g_next is not None:
                g_l = g_l + g_next
            g_l = g_l * nmask
            dcur, dq, dval, dea_l, daggp, dcell = _layer_bwd(
                aggps[l], cellps[l], curs[l], qs[l],
                vals[:, l * hdim:(l + 1) * hdim], ea, P, resids[l], g_l,
                hdim)
            if mode == "q":
                dvals_ref[vo:vo + kvd, l * hdim:(l + 1) * hdim] = (
                    dval[:kvd].astype(dvals_ref.dtype))
                ng_cols.append(_dg(NH, dval[kvd:], 0, 0))     # [Kn, H] f32
            else:
                dvals_ref[vo:vo + kvd, l * hdim:(l + 1) * hdim] = (
                    dval.astype(dvals_ref.dtype))
            # weight grads: the q block (visited first in reverse order)
            # WRITES its direction's refs, the p block ACCUMULATES into
            # them — no cross-iteration f32 accumulator dict stays live
            # (scoped-VMEM diet)
            for k, v in list(daggp.items()) + list(dcell.items()):
                nm = (f"a{l}_{k}" if k in daggp else f"c{l}_{k}")
                ref = dwrefs[nm]
                if mode == "q":
                    ref[d] = v.astype(ref.dtype)
                else:
                    ref[d] = ref[d] + v.astype(ref.dtype)
            if dea_l is not None:
                dea_acc = dea_acc + dea_l.astype(_F32)
            g_next = dcur + dq
        if mode == "q":
            # layer loop ran high->low; repack to layer order for g_extra
            g_extra[d] = jnp.concatenate(ng_cols[::-1], axis=1)
        dx_ref[ns, :] = g_next.astype(dx_ref.dtype)
        if has_ea:
            dea_ref[es, :] = dea_acc.astype(dea_ref.dtype)
        else:
            dea_ref[es, :] = jnp.zeros((ked, dea_ref.shape[1]),
                                       dea_ref.dtype)



def fused_pair_forward(static, interpret, xin, vals, ea, edst, emask, nmask,
                       nsrc, weights, blocks, emit_res: bool = False):
    """Pair forward: four blocks [A0|A1|B0|B1] in one pallas call.

    xin [4Kn, In]; vals [U, L*H] = [A0 full | A1 full | B0 far | B1 far];
    edst/emask/ea/nsrc [W, ...] over the full block widths. blocks is
    PairPlan.blocks. Returns outs [4Kn, L*H] (+ residual streams with
    emit_res: alpha32 [W, L] f32, nres [4Kn, 4*L*H])."""
    has_ea, hdim, nlayers = static
    names = _names(nlayers, has_ea, fwd=True)
    args = _prep_row(xin, vals, ea, edst, emask, nmask)
    kn4 = xin.shape[0]
    ke = edst.shape[0]
    args = args + (nsrc.astype(jnp.int32).reshape(ke, 1),)

    def kernel(*refs):
        _pair_fwd_kernel((has_ea, hdim, nlayers, emit_res, blocks), names,
                         refs)

    out_shape = jax.ShapeDtypeStruct((kn4, nlayers * hdim), xin.dtype)
    if emit_res:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((ke, nlayers), _F32),
                     jax.ShapeDtypeStruct((kn4, 4 * nlayers * hdim),
                                          xin.dtype))
    fn = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (len(args) + len(names)),
        out_specs=(tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3)
                   if emit_res else pl.BlockSpec(memory_space=pltpu.VMEM)),
        **_call_kw(interpret),
    )
    return fn(*args, *[weights[n] for n in names])


def fused_pair_backward(static, interpret, xin, vals, ea, edst, emask,
                        nmask, nsrc, weights, g, tg, tdst, tmask, res,
                        blocks):
    """Pair backward (use_res path only — residual streams required).

    g [4Kn, L*H]; tg [T, L*H] gathered from the pair edge-grad buffer;
    tdst/tmask [T] block-local. Returns (dx [4Kn, In], dvals [U, L*H],
    dea or None, dw flat stacked dict)."""
    has_ea, hdim, nlayers = static
    assert res is not None, "pair backward requires residual streams"
    in_names = _names(nlayers, has_ea, rows=True, use_res=True)
    out_names = _names(nlayers, has_ea)
    args = _prep_row(xin, vals, ea, edst, emask, nmask)
    ea2 = args[2]
    ke = edst.shape[0]
    kt = tdst.shape[0]
    args = args + (nsrc.astype(jnp.int32).reshape(ke, 1),)
    g_args = (g, tg,
              tdst.astype(jnp.int32).reshape(kt, 1),
              tmask.astype(_F32).reshape(kt, 1))

    out_shapes = tuple(
        [jax.ShapeDtypeStruct(xin.shape, xin.dtype),
         jax.ShapeDtypeStruct(vals.shape, vals.dtype),
         jax.ShapeDtypeStruct(ea2.shape, ea2.dtype)]
        + [jax.ShapeDtypeStruct(weights[n].shape, weights[n].dtype)
           for n in out_names])

    def kernel(*refs):
        _pair_bwd_kernel((has_ea, hdim, nlayers, blocks),
                         (in_names, out_names), refs)

    fn = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (len(args) + len(in_names) + len(res) + len(g_args)),
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)]
                        * len(out_shapes)),
        **_call_kw(interpret),
    )
    outs = fn(*args, *[weights[n] for n in in_names], *res, *g_args)
    dx, dvals, dea = outs[0], outs[1], outs[2]
    dw = dict(zip(out_names, outs[3:]))
    return dx, dvals, (dea if has_ea else None), dw
