"""Fused Pallas TPU kernels: one whole wavefront row per call.

The DAGNN wavefront is op-count bound on TPU: per scan row, the XLA path
runs ~30 small ops per GRU layer (edge encode, SDDMM attention scores,
segment softmax, SpMM aggregate, GRU gates — reference semantics:
ogbg-code/model/dagnn.py:362-373 AttnConv.message + :171-182 GRU update),
each costing microseconds of fixed overhead at row shapes (Ke~0.5-1k
edges, Kn~256-512 slots, H~300).  These kernels fuse the ENTIRE row — all
GRU layers — into one `pallas_call` for forward and one for backward:

  per layer l (chained: layer l's cur/query = layer l-1's output):
    k      = val_l + ea @ We_l + be_l     (edge-type encoder, optional)
    s_e    = q[dst]·wq_l + k·wk_l + b_l   (additive attention, SDDMM)
    P      = one_hot(dst) * emask         (built once per row via iota)
    alpha  = segment_softmax(s, P)        (max-shifted, +1e-16 denominator)
    agg    = P^T (alpha * val_l)          (SpMM, MXU)
    out_l  = GRU_l(cur, agg) * nmask      (torch.nn.GRUCell gate math)

The backward kernel additionally performs the TRANSPOSE-SCHEDULE
accumulation in-kernel: the per-edge gradients flowing into this row's
outputs (tg, gathered from the contiguous edge-grad buffer by the caller)
are segment-summed over local source slots as a one-hot MXU matmul —
XLA lowers the equivalent one-hot einsum to a scatter (~40us/row measured
on v5e); here it is a ~1us matmul. When the forward ran with
emit_res=True (the training path), the backward consumes the streamed
residuals and skips its in-kernel forward recompute entirely (v5e:
25.7 -> 17.9 us/row at the bench shape).

The stream/recompute boundary is measured, not principled: streaming a
[K, H] tensor costs ~2.9us/row of HBM write+read at the bench shape,
so intermediates reachable by a SMALL matmul recompute (k: [Ke,R]x[R,A];
h_n: [Kn,H]x[H,H]) are rebuilt in the backward instead (1.78 -> 1.86M
edges/s together), while ones needing a full-width gate matmul lose:
recomputing n via i_n ([Kn,In]x[In,H]) benched 1.83 and replaying the
whole GRU from alpha32 alone benched 1.73 vs the 1.86M baseline — at
~27% effective MXU the gate matmuls cost more than the bytes they save.

All matmuls use `dot_general` in Mosaic-supported orientations (NN / NT /
TN over 2-D operands; the score vectors travel column-form because NT
against a [1,D] operand does not lower) — no activation transposes
materialize anywhere, and weight gradients leave the kernel in (or one
hoisted transpose away from) parameter layout. Operands stay in the
compute dtype (bf16 in production) with float32 MXU accumulation;
softmax internals are float32 always.

LAYER-PACKED LAYOUT: all per-slot state crossing the kernel boundary is
packed along the LAST axis — vals / outs / cotangents are [K, L*H] with
layer l in columns l*H:(l+1)*H — so the caller's cross-row gathers move
half as many (twice as wide) rows. XLA row gathers on TPU cost ~20ns per
row regardless of width up to ~1KB (measured v5e), so this halves the
dominant non-kernel cost of the wavefront scan. In-kernel the layers are
lane-offset slices (Mosaic handles the 300-column offsets exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-16
_F32 = jnp.float32

_VMEM_LIMIT = 100 * 1024 * 1024


def _dg(a, b, contract_a, contract_b):
    """dot_general contracting one dim of each operand, f32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((), ())),
        preferred_element_type=_F32)


def _mm(a, b):          # [M,K]x[K,N] -> [M,N]
    return _dg(a, b, 1, 0)


def _layer_fwd(aggp, cellp, cur, q, val, ea, P, Pm, emask, nmask, hdim):
    """One layer's forward in-kernel. Returns (out_f32, residuals)."""
    dt = val.dtype
    k = val
    if ea is not None:
        # edge encoder: linear w [A,R], b [1,A] (dagnn.py:238,356)
        k = (k.astype(_F32) + _dg(ea, aggp["we"], 1, 1)
             + aggp["be"].astype(_F32)).astype(dt)
    # additive attention: attn_lin([q, k]) split into q/k parts.
    # wq/wk are passed COLUMN-form [D,1]: Mosaic rejects NT matvecs with a
    # [1,D] rhs ("only constant accumulators supported"), NN is fine.
    q_scores = _mm(q, aggp["wq"])                             # [Kn, 1] f32
    k_scores = _mm(k, aggp["wk"]) + aggp["b"].astype(_F32)    # [Ke, 1]
    scores = _mm(P, q_scores.astype(dt)) + k_scores           # [Ke, 1] f32
    neg = jnp.finfo(_F32).min
    sm = jnp.where(Pm, scores, neg)                           # [Ke, Kn] f32
    seg_max = jnp.max(sm, axis=0, keepdims=True)
    seg_max = jnp.where(seg_max <= neg, 0.0, seg_max)
    e = jnp.exp(scores - _mm(P, seg_max.T.astype(dt))) * emask
    denom = _mm(P.T, e.astype(dt))                            # [Kn, 1] f32
    alpha32 = e / (_mm(P, denom.astype(dt)) + _EPS)
    alpha = alpha32.astype(dt)
    agg = _mm(P.T, val * alpha).astype(dt)                    # [Kn, H]

    # GRU (torch.nn.GRUCell; params w_ih [3H,In], w_hh [3H,H]).
    # r/z gates only ever see gi+gh, so their two matmuls fuse into ONE
    # [Kn, In+H] x [In+H, 2H] pass over the precomputed concat weight
    # (w_rz, flatten_row_weights) — fewer MXU dispatches and less lane
    # padding at H=300; the n gate needs i_n and h_n separately.
    ca = jnp.concatenate([cur, agg], axis=1)
    grz = _dg(ca, cellp["w_rz"], 1, 1) + cellp["b_rz"].astype(_F32)
    i_n = _dg(cur, cellp["w_in"], 1, 1) + cellp["b_in"].astype(_F32)
    h_n = _dg(agg, cellp["w_hn"], 1, 1) + cellp["b_hn"].astype(_F32)
    r = jax.nn.sigmoid(grz[:, :hdim])
    z = jax.nn.sigmoid(grz[:, hdim:])
    n = jnp.tanh(i_n + r * h_n)
    # round z/n to the compute dtype BEFORE the final combine (identity at
    # f32): the use_res backward reconstructs this output from the
    # dt-rounded residual streams, so the combine must read the rounded
    # values for the rebuild to be BITWISE the forward's output
    # (tested: test_row_backward_res_stream_is_bitwise_recompute)
    z_dt, n_dt = z.astype(dt), n.astype(dt)
    out = ((1.0 - z_dt.astype(_F32)) * n_dt.astype(_F32)
           + z_dt.astype(_F32) * agg.astype(_F32)) * nmask
    # residuals stored in the compute dtype — halves bwd VMEM residency
    return out, (k, alpha, alpha32, agg, r.astype(dt), z_dt,
                 n_dt, h_n.astype(dt))


def _layer_bwd(aggp, cellp, cur, q, val, ea, P, res, g, hdim):
    """One layer's backward. g [Kn,H] f32. Returns grads (dea may be None)."""
    dt = val.dtype
    k, alpha, alpha32, agg, r, z, n, h_n = res
    r, z, n, h_n = (a.astype(_F32) for a in (r, z, n, h_n))
    dn = g * (1.0 - z)
    dz = g * (agg.astype(_F32) - n)
    dpre_n = dn * (1.0 - n * n)
    dr = dpre_n * h_n
    dpre_z = dz * z * (1.0 - z)
    dpre_r = dr * r * (1.0 - r)
    dgi = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=1).astype(dt)
    dgh = jnp.concatenate([dpre_r, dpre_z, dpre_n * r], axis=1).astype(dt)
    dcur = _mm(dgi, cellp["w_ih"])                            # [Kn, In] f32
    dagg = (_mm(dgh, cellp["w_hh"]) + g * z).astype(dt)       # [Kn, H]
    dcell = {
        "w_ih": _dg(dgi, cur, 0, 0),                          # [3H, In]
        "w_hh": _dg(dgh, agg, 0, 0),                          # [3H, H]
        "b_ih": jnp.sum(dgi.astype(_F32), axis=0, keepdims=True),  # [1, 3H]
        "b_hh": jnp.sum(dgh.astype(_F32), axis=0, keepdims=True),
    }

    g_rows = _mm(P, dagg).astype(dt)                          # [Ke, H]
    dval = alpha * g_rows
    dalpha = jnp.sum((g_rows * val).astype(_F32), axis=1, keepdims=True)
    seg_dot = _mm(P.T, (alpha32 * dalpha).astype(dt))         # [Kn, 1]
    dscores = (alpha32 * (dalpha - _mm(P, seg_dot.astype(dt)))).astype(dt)

    dq_scores = _mm(P.T, dscores).astype(dt)                  # [Kn, 1]
    # d(q)/d(k) via elementwise broadcast against the ROW-form weight
    # (outer product [N,1]x[1,D] as a VPU multiply, not an MXU matvec)
    dq = dq_scores.astype(_F32) * aggp["wqr"].astype(_F32)    # [Kn, Dq]
    dk = (dscores.astype(_F32) * aggp["wkr"].astype(_F32)).astype(dt)
    daggp = {
        "wq": _dg(q, dq_scores, 0, 0),                        # [Dq, 1]
        "wk": _dg(k, dscores, 0, 0),                          # [A, 1]
        "b": jnp.sum(dscores.astype(_F32), axis=0, keepdims=True),  # [1, 1]
    }
    dval = (dval + dk).astype(dt)
    dea = None
    if ea is not None:
        daggp["we"] = _dg(dk, ea, 0, 0)                       # [A, R]
        daggp["be"] = jnp.sum(dk.astype(_F32), axis=0, keepdims=True)  # [1, A]
        dea = _mm(dk, aggp["we"]).astype(dt)                  # [Ke, R]
    return dcur, dq, dval, dea, daggp, dcell


def _build_P(edst, emask, kn, dt):
    ke = edst.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (ke, kn), 1)
    Pm = (col == edst) & (emask > 0)
    return Pm, Pm.astype(dt)


# ---------------------------------------------------------------- plumbing

def agg_keys(has_ea, rows=False):
    ks = ("wq", "wk", "b") + (("we", "be") if has_ea else ())
    if rows:
        ks = ks + ("wqr", "wkr")  # row-form copies, backward-only inputs
    return ks


CELL_KEYS = ("w_ih", "w_hh", "b_ih", "b_hh")
# forward-kernel cell keys: fused r/z concat weight + separate n-gate
# weights (derived views of w_ih/w_hh, built in flatten_row_weights)
CELL_FWD_KEYS = ("w_rz", "w_in", "w_hn", "b_rz", "b_in", "b_hn")


_CELL_DERIVED = ("w_rz", "w_in", "w_hn", "b_rz", "b_in", "b_hn")


def _names(nlayers, has_ea, rows=False, fwd=False, use_res=False):
    """Ordered weight names. fwd=True: the forward kernel's set (fused r/z
    + n-gate views, no canonical w_ih/w_hh). rows=True (backward inputs):
    canonical + row-form score vectors + the derived views the backward
    actually reads — the use_res path only rebuilds h_n so it takes just
    (w_hn, b_hn); the recompute path consumes all six."""
    if fwd:
        ck = CELL_FWD_KEYS
    elif rows:
        ck = CELL_KEYS + (("w_hn", "b_hn") if use_res else _CELL_DERIVED)
    else:
        ck = CELL_KEYS
    ns = []
    for l in range(nlayers):
        ns += [f"a{l}_{k}" for k in agg_keys(has_ea, rows)]
        ns += [f"c{l}_{k}" for k in ck]
    return ns


def flatten_row_weights(aggr, cells, query_dims, has_ea):
    """Build the ordered weight dict for fused_row fwd/bwd.

    aggr[l] = {"attn_lin": {"w": [1, Dq+A], "b": [1]}, "edge_encoder"?};
    cells[l] = torch-layout GRU dict. query_dims[l] is layer l's attention
    query dim (emb for layer 0, hidden above — reference dagnn.py:56-75).
    Biases are reshaped 2-D for VMEM residency; pure slices/reshapes that
    XLA hoists out of the scan.
    """
    out = {}
    for l, (ap, cp) in enumerate(zip(aggr, cells)):
        w = ap["attn_lin"]["w"]
        dq = query_dims[l]
        out[f"a{l}_wq"] = w[:, :dq].T          # [Dq, 1] column form
        out[f"a{l}_wk"] = w[:, dq:].T          # [A, 1]
        out[f"a{l}_wqr"] = w[:, :dq]           # [1, Dq] row form (bwd)
        out[f"a{l}_wkr"] = w[:, dq:]
        out[f"a{l}_b"] = ap["attn_lin"]["b"].reshape(1, 1)
        if has_ea:
            out[f"a{l}_we"] = ap["edge_encoder"]["w"]
            out[f"a{l}_be"] = ap["edge_encoder"]["b"].reshape(1, -1)
        out[f"c{l}_w_ih"] = cp["w_ih"]
        out[f"c{l}_w_hh"] = cp["w_hh"]
        out[f"c{l}_b_ih"] = cp["b_ih"].reshape(1, -1)
        out[f"c{l}_b_hh"] = cp["b_hh"].reshape(1, -1)
        # derived forward views (hoisted slices/concats; grads flow only
        # through the canonical w_ih/w_hh, the backward never reads these)
        h3 = cp["w_ih"].shape[0]
        hd = h3 // 3
        out[f"c{l}_w_rz"] = jnp.concatenate(
            [cp["w_ih"][: 2 * hd], cp["w_hh"][: 2 * hd]], axis=1)
        out[f"c{l}_w_in"] = cp["w_ih"][2 * hd:]
        out[f"c{l}_w_hn"] = cp["w_hh"][2 * hd:]
        # combined biases precomputed host-side (an in-kernel slice+add of
        # [1, 2H] vectors trips a Mosaic broadcast limitation at small H)
        out[f"c{l}_b_rz"] = (cp["b_ih"][: 2 * hd]
                             + cp["b_hh"][: 2 * hd]).reshape(1, -1)
        out[f"c{l}_b_in"] = cp["b_ih"][2 * hd:].reshape(1, -1)
        out[f"c{l}_b_hn"] = cp["b_hh"][2 * hd:].reshape(1, -1)
    return out


def stack_row_weights(w_dirs):
    """Stack per-direction flat weight dicts into [ndirs, ...] leaves for
    the direction-merged kernels (fused_row_* with ndirs=2)."""
    return {k: jnp.stack([w[k] for w in w_dirs]) for k in w_dirs[0]}


def unflatten_row_weight_grads(dw, nlayers, has_ea):
    """Map flat kernel weight-grad dict back to params_dir tree shapes."""
    aggr, cells = [], []
    for l in range(nlayers):
        ap = {"attn_lin": {
            "w": jnp.concatenate([dw[f"a{l}_wq"].T, dw[f"a{l}_wk"].T],
                                 axis=1),
            "b": dw[f"a{l}_b"].reshape(1)}}
        if has_ea:
            ap["edge_encoder"] = {"w": dw[f"a{l}_we"],
                                  "b": dw[f"a{l}_be"].reshape(-1)}
        aggr.append(ap)
        cells.append({"w_ih": dw[f"c{l}_w_ih"], "w_hh": dw[f"c{l}_w_hh"],
                      "b_ih": dw[f"c{l}_b_ih"].reshape(-1),
                      "b_hh": dw[f"c{l}_b_hh"].reshape(-1)})
    return {"aggr": aggr, "cells": cells}


class _DictRefs:
    """Adapter letting kernel code index a flat tuple of refs by name."""

    def __init__(self, names, refs):
        self._m = dict(zip(names, refs))

    def __getitem__(self, k):
        return self._m[k]


def _prep_row(xin, vals, ea, edst, emask, nmask):
    ke = edst.shape[0]      # full edge width (vals may be far-only, see nf)
    kn = xin.shape[0]
    ea2 = ea if ea is not None else jnp.zeros((ke, 1), vals.dtype)
    return (xin, vals, ea2,
            edst.astype(jnp.int32).reshape(ke, 1),
            emask.astype(_F32).reshape(ke, 1),
            nmask.astype(_F32).reshape(kn, 1))


def _nf_blocks(nf, ndirs, ke_total):
    """Per-direction (mode, edge_offset, ke_d, vals_offset, kv_d) blocks.

    nf = ((mode, ke_d, kf_d), ...) per direction with mode "r" (regions:
    vals carry only the kf_d far rows, near rows rebuild from prev_out),
    "t" (tgonly: full vals, near gradients still ride the carry) or "p"
    (plain block inside an nf kernel). nf=None = all-plain uniform blocks.
    kv_d is the block's width in the vals/dvals arrays (kf_d for "r",
    ke_d otherwise)."""
    blocks = []
    eo = vo = 0
    for d in range(ndirs):
        if nf is None:
            mode, ked, kfd = "p", ke_total // ndirs, ke_total // ndirs
        else:
            mode, ked, kfd = nf[d]
        kvd = kfd if mode == "r" else ked
        blocks.append((mode, eo, ked, vo, kvd))
        eo += ked
        vo += kvd
    return blocks


def _nf_rebuild_vals(vals_far_d, nsrc_d, prev_out_d, kn, dt):
    """Reconstruct a direction block's full predecessor-state rows: far rows
    arrive gathered from the state buffer; near rows are routed from the
    previous row's outputs by a one-hot MXU matmul (nsrc = source slot in
    the previous row, pad Kn -> all-zero one-hot row). Bitwise the h-buffer
    values: prev_out IS the previous row's output block."""
    kne = nsrc_d.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (kne, kn), 1)
    NH = (col == nsrc_d).astype(dt)
    near = _mm(NH, prev_out_d).astype(dt)                     # [Kne, L*H]
    return jnp.concatenate([vals_far_d, near], axis=0)


def _call_kw(interpret):
    if interpret:
        return dict(interpret=True)
    return dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT))


# ----------------------------------------------------------------- kernels

def _row_fwd_kernel(static, names, refs):
    has_ea, hdim, nlayers, emit_res, ndirs, nf = static
    (xin_ref, vals_ref, ea_ref, edst_ref, emask_ref, nmask_ref,
     *rest) = refs
    if nf is not None and any(e[0] == "r" for e in nf):
        nsrc_ref, prev_ref = rest[:2]
        rest = rest[2:]
    n_out = 3 if emit_res else 1
    wref = _DictRefs(names, rest[:-n_out])
    out_ref = rest[-n_out]
    if emit_res:
        a32_ref, nres_ref = rest[-2:]
    kn = xin_ref.shape[0] // ndirs
    for d, (mode, eo, ked, vo, kvd) in enumerate(
            _nf_blocks(nf, ndirs, edst_ref.shape[0])):
        # with ndirs>1 the row is a concat of per-direction blocks and the
        # weights are stacked [ndirs, ...] (direction-merged scan: both
        # direction passes ride ONE kernel dispatch per wavefront row)
        w = ((lambda nm: wref[nm][d]) if ndirs > 1
             else (lambda nm: wref[nm][:]))
        ns, es = slice(d * kn, (d + 1) * kn), slice(eo, eo + ked)
        ea = ea_ref[es, :] if has_ea else None
        emask = emask_ref[es, :]
        Pm, P = _build_P(edst_ref[es, :], emask, kn, vals_ref.dtype)
        nmask = nmask_ref[ns, :]
        cur = xin_ref[ns, :]
        q = cur
        if mode == "r":
            # NEAR/FAR regions: only far predecessor rows were gathered;
            # near rows are the previous row's outputs, routed in-kernel
            vals_d = _nf_rebuild_vals(vals_ref[vo:vo + kvd, :],
                                      nsrc_ref[eo + kvd:eo + ked, :],
                                      prev_ref[ns, :], kn, vals_ref.dtype)
        else:
            vals_d = vals_ref[vo:vo + kvd, :]
        for l in range(nlayers):
            aggp = {k: w(f"a{l}_{k}") for k in agg_keys(has_ea)}
            cellp = {k: w(f"c{l}_{k}") for k in CELL_FWD_KEYS}
            out, res = _layer_fwd(aggp, cellp, cur, q,
                                  vals_d[:, l * hdim:(l + 1) * hdim], ea, P,
                                  Pm, emask, nmask, hdim)
            out = out.astype(out_ref.dtype)
            out_ref[ns, l * hdim:(l + 1) * hdim] = out
            if emit_res:
                # stream the backward's residuals (see fused_row_backward):
                # alpha32 per edge, (agg, r, z, n) per slot. k and h_n are
                # NOT streamed: the backward rebuilds k from the vals stream
                # + the tiny [Ke,R]x[R,A] encoder matmul and h_n from the
                # streamed agg via one [Kn,H]x[H,H] matmul — both bitwise
                # the forward expressions — trading ~3.6MB/row of HBM
                # write+read at the bench shape for cheap MXU work.
                _k_l, _alpha, alpha32, agg, r, z, n, _h_n = res
                a32_ref[es, l:l + 1] = alpha32
                for i, t in enumerate((agg, r, z, n)):
                    col = (4 * l + i) * hdim
                    nres_ref[ns, col:col + hdim] = t.astype(nres_ref.dtype)
            cur = out
            q = out


def _row_bwd_kernel(static, names, refs):
    has_ea, hdim, nlayers, merge_tg, use_res, ndirs, nf = static
    in_names, out_names = names
    (xin_ref, vals_ref, ea_ref, edst_ref, emask_ref, nmask_ref,
     *rest) = refs
    if nf is not None:
        nsrc_ref = rest[0]
        rest = rest[1:]
        prev_ref = None
        if use_res and any(e[0] == "r" for e in nf):
            prev_ref = rest[0]
            rest = rest[1:]
    nw = len(in_names)
    wref = _DictRefs(in_names, rest[:nw])
    pos = nw
    res_refs = None
    if use_res:
        res_refs = rest[pos:pos + 2]
        pos += 2
    if merge_tg:
        g_ref, tg_ref, tdst_ref, tmask_ref = rest[pos:pos + 4]
        pos += 4
    else:
        g_ref = rest[pos]
        pos += 1
    ng_in_ref = None
    if nf is not None:
        ng_in_ref = rest[pos]
        pos += 1
    dx_ref, dvals_ref, dea_ref = rest[pos:pos + 3]
    pos += 3
    ng_out_ref = None
    if nf is not None:
        ng_out_ref = rest[pos]
        pos += 1
    dwrefs = _DictRefs(out_names, rest[pos:])

    kn = xin_ref.shape[0] // ndirs
    kt = tdst_ref.shape[0] // ndirs if merge_tg else 0
    dt = vals_ref.dtype
    for d, (mode, eo, ked, vo, kvd) in enumerate(
            _nf_blocks(nf, ndirs, edst_ref.shape[0])):
        # per-direction block of the (possibly direction-merged) row; with
        # ndirs>1 the weight / weight-grad refs are stacked [ndirs, ...]
        wsel = ((lambda nm: wref[nm][d]) if ndirs > 1
                else (lambda nm: wref[nm][:]))
        ns = slice(d * kn, (d + 1) * kn)
        es = slice(eo, eo + ked)
        ts = slice(d * kt, (d + 1) * kt)

        ea = ea_ref[es, :] if has_ea else None
        emask = emask_ref[es, :]
        nmask = nmask_ref[ns, :]
        if nf is not None and not use_res:
            # recompute path: the caller gathered FULL-width rows for every
            # block regardless of mode
            vals = vals_ref[es, :]
        elif mode == "r":
            # vals stream holds only the gathered far rows; rebuild near
            # rows from the previous row's outputs (bitwise the h-buffer
            # values — prev_out IS that block)
            vals = _nf_rebuild_vals(vals_ref[vo:vo + kvd, :],
                                    nsrc_ref[eo + kvd:eo + ked, :],
                                    prev_ref[ns, :], kn, dt)
        else:
            vals = vals_ref[vo:vo + kvd, :]
        Pm, P = _build_P(edst_ref[es, :], emask, kn, dt)

        if merge_tg:
            # incoming edge-grad segment-sum fused in (saves one pallas
            # dispatch per row): g_total = g + OH^T tg, OH one-hot of the
            # transpose edges' local source slots. ONE [Kn,Kt]x[Kt,L*H]
            # matmul covers every layer (packed last axis).
            tcol = jax.lax.broadcasted_iota(jnp.int32, (kt, kn), 1)
            OH = ((tcol == tdst_ref[ts, :]) & (tmask_ref[ts, :] > 0)).astype(dt)
            tg_all = _dg(OH, tg_ref[ts, :], 0, 0)              # [Kn, L*H] f32
            if ng_in_ref is not None:
                # NEAR/FAR: the next row's near-edge gradients arrive as a
                # dense carry block instead of through the edge-grad buffer
                tg_all = tg_all + ng_in_ref[ns, :].astype(_F32)
            g_rows_tot = [
                g_ref[ns, l * hdim:(l + 1) * hdim].astype(_F32)
                + tg_all[:, l * hdim:(l + 1) * hdim]
                for l in range(nlayers)
            ]
        else:
            g_rows_tot = None

        cur = xin_ref[ns, :]
        q = cur
        curs, qs, resids, aggps, cellps = [], [], [], [], []
        if use_res:
            # residuals streamed from the forward kernel: no recompute; the
            # layer outputs (cur/q chain) reconstruct from the GRU pieces.
            # k is rebuilt from the vals stream (+ encoder when has_ea) —
            # the identical fwd expression, so bitwise the same value.
            a32_ref, nres_ref = res_refs
            for l in range(nlayers):
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
                parts = [nres_ref[ns,
                                  (4 * l + i) * hdim:(4 * l + i + 1) * hdim]
                         for i in range(4)]
                agg, r, z, n = parts
                # rebuild h_n from agg (the forward's exact expression and
                # rounding: f32 matmul then cast to the compute dtype)
                h_n = (_dg(agg, wsel(f"c{l}_w_hn"), 1, 1)
                       + wsel(f"c{l}_b_hn").astype(_F32)).astype(dt)
                resids.append((k_l, alpha32.astype(dt), alpha32, agg,
                               r, z, n, h_n))
                out = (((1.0 - z.astype(_F32)) * n.astype(_F32)
                        + z.astype(_F32) * agg.astype(_F32))
                       * nmask).astype(dt)
                cur = out
                q = out
        else:
            # forward recompute (residuals per layer stay in VMEM)
            for l in range(nlayers):
                aggp = {k: wsel(f"a{l}_{k}")
                        for k in agg_keys(has_ea, rows=True)}
                cellp = {k: wsel(f"c{l}_{k}")
                         for k in CELL_KEYS + _CELL_DERIVED}
                curs.append(cur)
                qs.append(q)
                out, res = _layer_fwd(aggp, cellp, cur, q,
                                      vals[:, l * hdim:(l + 1) * hdim],
                                      ea, P, Pm, emask, nmask, hdim)
                out = out.astype(dt)
                resids.append(res)
                aggps.append(aggp)
                cellps.append(cellp)
                cur = out
                q = out

        dea_acc = jnp.zeros((ked, dea_ref.shape[1]), _F32) if has_ea else None
        NH = None
        if nf is not None and mode != "p":
            # one-hot routing near dvals back to the previous row's slots
            # (transpose of the vals rebuild); for "t" the one-hot spans
            # the full block — far rows (nsrc = Kn) vanish
            lo = eo + kvd if mode == "r" else eo
            ncol = jax.lax.broadcasted_iota(jnp.int32, (eo + ked - lo, kn), 1)
            NH = (ncol == nsrc_ref[lo:eo + ked, :]).astype(dt)
        g_next = None  # d(out_l) arriving from layer l+1 (via its cur and q)
        for l in range(nlayers - 1, -1, -1):
            if merge_tg:
                g_l = g_rows_tot[l]                            # [Kn, H] f32
            else:
                g_l = g_ref[ns, l * hdim:(l + 1) * hdim].astype(_F32)
            if g_next is not None:
                g_l = g_l + g_next
            g_l = g_l * nmask
            dcur, dq, dval, dea_l, daggp, dcell = _layer_bwd(
                aggps[l], cellps[l], curs[l], qs[l],
                vals[:, l * hdim:(l + 1) * hdim], ea, P,
                resids[l], g_l, hdim)
            if nf is None:
                dvals_ref[es, l * hdim:(l + 1) * hdim] = dval.astype(
                    dvals_ref.dtype)
            else:
                # "r": far rows -> the far-only edge-grad buffer, near rows
                # -> segment-summed to previous-row slots (carry block).
                # "t": full rows to the buffer (near entries are dead — the
                # transpose schedule excludes them) + the same carry block.
                dvals_ref[vo:vo + kvd, l * hdim:(l + 1) * hdim] = (
                    dval[:kvd].astype(dvals_ref.dtype))
                ng = (_dg(NH, dval[kvd if mode == "r" else 0:], 0, 0)
                      if NH is not None
                      else jnp.zeros((kn, hdim), _F32))
                ng_out_ref[ns, l * hdim:(l + 1) * hdim] = ng.astype(
                    ng_out_ref.dtype)
            for k, v in daggp.items():
                ref = dwrefs[f"a{l}_{k}"]
                if ndirs > 1:
                    ref[d] = v.astype(ref.dtype)
                else:
                    ref[:] = v.astype(ref.dtype)
            for k, v in dcell.items():
                ref = dwrefs[f"c{l}_{k}"]
                if ndirs > 1:
                    ref[d] = v.astype(ref.dtype)
                else:
                    ref[:] = v.astype(ref.dtype)
            if dea_l is not None:
                dea_acc = dea_acc + dea_l.astype(_F32)
            g_next = dcur + dq
        dx_ref[ns, :] = g_next.astype(dx_ref.dtype)
        if has_ea:
            dea_ref[es, :] = dea_acc.astype(dea_ref.dtype)
        else:
            dea_ref[es, :] = jnp.zeros((ked, dea_ref.shape[1]), dea_ref.dtype)


# ------------------------------------------------------------ entry points

def fused_row_forward(static, interpret, xin, vals, ea, edst, emask, nmask,
                      weights, emit_res: bool = False, ndirs: int = 1,
                      nf=None, nsrc=None, prev_out=None):
    """Whole-row fused forward. vals [Ke, L*H] layer-packed; returns outs
    [Kn, L*H] (layer l in columns l*H:(l+1)*H).

    static = (has_ea, hidden_dim, num_layers). `weights` is the ordered
    dict from flatten_row_weights. With emit_res=True additionally returns
    the backward residual streams (alpha32 [Ke, L] f32, nres [Kn, 4*L*H]:
    agg/r/z/n per layer) so fused_row_backward can skip its in-kernel
    forward recompute (k and h_n are rebuilt there from the vals/agg
    streams).

    ndirs=2 runs the DIRECTION-MERGED row: every per-row operand is a
    concat of per-direction blocks along axis 0 and `weights` values are
    stacked [2, ...] — both direction passes ride one kernel dispatch
    (the two directions of the bidirectional wavefront are independent
    given x, so their rows can share scan steps).

    nf = ((far_width, near_width) per direction) activates the NEAR/FAR
    layout (dag/schedule.py nearfar): `vals` holds only the gathered FAR
    rows ([sum far_width, L*H], per-direction far blocks concatenated);
    near rows are routed from `prev_out` [ndirs*Kn, L*H] (the previous
    wavefront row's output block) by the one-hot of `nsrc` [sum Ke_d]
    (source slot in the previous row, pad Kn). edst/emask/ea/nsrc keep the
    full per-direction widths far_width+near_width."""
    has_ea, hdim, nlayers = static
    names = _names(nlayers, has_ea, fwd=True)
    args = _prep_row(xin, vals, ea, edst, emask, nmask)
    kn = xin.shape[0]
    ke = edst.shape[0]
    if nf is not None and any(e[0] == "r" for e in nf):
        args = args + (nsrc.astype(jnp.int32).reshape(ke, 1),
                       prev_out)
    n_in = len(args)

    def kernel(*refs):
        _row_fwd_kernel((has_ea, hdim, nlayers, emit_res, ndirs, nf), names,
                        refs)

    out_shape = jax.ShapeDtypeStruct((kn, nlayers * hdim), xin.dtype)
    if emit_res:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((ke, nlayers), _F32),
                     jax.ShapeDtypeStruct((kn, 4 * nlayers * hdim),
                                          xin.dtype))
    fn = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (n_in + len(names)),
        out_specs=(tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3)
                   if emit_res else pl.BlockSpec(memory_space=pltpu.VMEM)),
        **_call_kw(interpret),
    )
    return fn(*args, *[weights[n] for n in names])


def _tg_accumulate(interpret, g, tg, tdst, tmask, kn):
    """Small dedicated kernel: g + segment_sum(tg over local source slot).

    Kept separate from the main backward kernel to stay under the scoped
    VMEM limit; expressed as a one-hot MXU matmul because the equivalent
    XLA one-hot einsum gets pattern-rewritten into a scatter (~40us/row
    measured on v5e; this is ~1us). g [Kn, L*H], tg [Kt, L*H]."""
    kt = tdst.shape[0]
    tdst2 = tdst.astype(jnp.int32).reshape(kt, 1)
    tmask2 = tmask.astype(_F32).reshape(kt, 1)

    def kernel(g_ref, tg_ref, tdst_ref, tmask_ref, out_ref):
        tcol = jax.lax.broadcasted_iota(jnp.int32, (kt, kn), 1)
        OH = ((tcol == tdst_ref[:]) & (tmask_ref[:] > 0)).astype(tg_ref.dtype)
        out_ref[:] = (g_ref[:].astype(_F32)
                      + _dg(OH, tg_ref[:], 0, 0)).astype(out_ref.dtype)

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(g.shape, g.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        **_call_kw(interpret),
    )
    return fn(g, tg, tdst2, tmask2)


def fused_row_backward(static, interpret, xin, vals, ea, edst, emask, nmask,
                       weights, g, tg, tdst, tmask, merge_tg=True,
                       res=None, ndirs: int = 1,
                       nf=None, nsrc=None, prev_out=None, near_g=None):
    """Whole-row fused backward — ONE pallas call by default (the
    transpose-edge-grad segment sum rides inside, merge_tg=True; set
    DAGNN_TPU_SPLIT_TG=1 or merge_tg=False for the two-call form if a
    shape ever exceeds the kernel VMEM budget).

    g     [Kn, L*H] cotangent slice of this row's outputs (layer-packed)
    tg    [Kt, L*H] edge grads flowing into this row (caller-gathered
          from the contiguous edge-grad buffer; garbage slots zero)
    tdst  [Kt] local source slot of each transpose edge (pad = Kn)
    res   optional (alpha32, nres) residual streams from
          fused_row_forward(emit_res=True) — skips the in-kernel forward
          recompute (k is rebuilt from vals + the encoder weights).
    Returns (dx [Kn, emb], dvals [Ke, L*H], dea or None, dw flat dict).

    NEAR/FAR (nf = per-direction (far, near) widths, see
    fused_row_forward): with res streams, `vals` holds only the far rows
    and near rows rebuild from `prev_out` (the previous row's outputs)
    via `nsrc`; without res (recompute), `vals` must be full-width.
    `near_g` [ndirs*Kn, L*H] is the NEXT row's near-edge gradient block
    (zeros at the last row); tg/tdst then cover FAR edges only. Returns
    (dx, dvals_far [sum far, L*H], dea, dw, near_g_out) — near_g_out is
    this row's gradient contribution to the PREVIOUS row's outputs.
    """
    import os
    if os.environ.get("DAGNN_TPU_SPLIT_TG") and ndirs == 1 and nf is None:
        merge_tg = False
    assert merge_tg or ndirs == 1, "split-tg path is single-direction only"
    assert merge_tg or nf is None, "near/far requires merge_tg"
    has_ea, hdim, nlayers = static
    use_res = res is not None
    in_names = _names(nlayers, has_ea, rows=True, use_res=use_res)
    out_names = _names(nlayers, has_ea)             # grad'able weights only
    args = _prep_row(xin, vals, ea, edst, emask, nmask)
    ea2 = args[2]
    kn = xin.shape[0]
    ke = edst.shape[0]
    if nf is not None:
        args = args + (nsrc.astype(jnp.int32).reshape(ke, 1),)
        if use_res and any(e[0] == "r" for e in nf):
            args = args + (prev_out,)
    n_in = len(args)
    res_args = tuple(res) if use_res else ()
    if merge_tg:
        kt = tdst.shape[0]
        g_args = (g, tg,
                  tdst.astype(jnp.int32).reshape(kt, 1),
                  tmask.astype(_F32).reshape(kt, 1))
    else:
        g_args = (_tg_accumulate(interpret, g, tg, tdst, tmask, kn),)
    if nf is not None:
        g_args = g_args + (near_g,)

    kv_total = (sum(kf if m == "r" else kd for m, kd, kf in nf)
                if nf is not None else None)
    dvals_shape = ((kv_total, nlayers * hdim) if nf is not None
                   else vals.shape)
    out_shapes = (
        [jax.ShapeDtypeStruct(xin.shape, xin.dtype),
         jax.ShapeDtypeStruct(dvals_shape, vals.dtype),
         jax.ShapeDtypeStruct(ea2.shape, ea2.dtype)]
        + ([jax.ShapeDtypeStruct((kn, nlayers * hdim), g.dtype)]
           if nf is not None else [])
        + [jax.ShapeDtypeStruct(weights[n].shape, weights[n].dtype)
           for n in out_names])
    out_shapes = tuple(out_shapes)

    def kernel(*refs):
        _row_bwd_kernel(
            (has_ea, hdim, nlayers, merge_tg, use_res, ndirs, nf),
            (in_names, out_names), refs)

    n_fixed_out = 4 if nf is not None else 3
    fn = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (n_in + len(in_names) + len(res_args) + len(g_args)),
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)]
                        * (n_fixed_out + len(out_names))),
        **_call_kw(interpret),
    )
    outs = fn(*args, *[weights[n] for n in in_names], *res_args, *g_args)
    dx, dvals, dea = outs[0], outs[1], outs[2]
    dw = dict(zip(out_names, outs[n_fixed_out:]))
    if nf is not None:
        return dx, dvals, (dea if has_ea else None), dw, outs[3]
    return dx, dvals, (dea if has_ea else None), dw
