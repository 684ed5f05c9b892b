"""Fused Pallas TPU kernel: one wavefront row-step (attention + GRU).

The hot loop of the DAGNN wavefront executes, per scan row and GRU layer,
a chain of ~30 small XLA ops (edge encode, SDDMM scores, segment softmax,
SpMM aggregate, GRU gates — reference semantics:
ogbg-code/model/dagnn.py:362-373 AttnConv.message + :171-182 GRU update).
At wavefront shapes (Ke~1k edges, Kn~512 nodes, H~300) each op is a few
microseconds of fixed overhead — the scan is op-count bound, not FLOP
bound.  This kernel fuses the entire row-layer into ONE pallas_call (and
its backward into one more), keeping every intermediate in VMEM:

    k      = val + ea @ We + be          (edge-type encoder, optional)
    s_e    = q[dst] @ wq + k @ wk + b    (additive attention, SDDMM)
    P      = one_hot(dst) * emask        (in-kernel iota; dst=Kn -> zero row)
    alpha  = segment_softmax(s, P)       (max-shifted, +1e-16 denominator)
    agg    = P^T (alpha * val)           (SpMM, MXU)
    out    = GRU(cur, agg) * nmask       (torch.nn.GRUCell gate math)

Matmuls run on the MXU with float32 accumulation; softmax internals are
float32 regardless of the compute dtype.

The backward kernel recomputes alpha from VMEM-resident inputs (cheaper
than storing it) and emits every gradient in one call:
d_cur, d_val, d_q, d_ea and the 8 weight grads.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-16
_F32 = jnp.float32


def _hp_dot(a, b):
    return jax.lax.dot(a, b, preferred_element_type=_F32,
                       precision=jax.lax.Precision.HIGHEST)


def _attention(q, val, ea, edst, emask, wq, wk, b, we, be):
    """Shared fwd recompute: returns (alpha [Ke,1] f32, P [Ke,Kn] f32, k)."""
    ke = val.shape[0]
    kn = q.shape[0]
    k = val.astype(_F32)
    if ea is not None:
        k = k + _hp_dot(ea.astype(_F32), we.astype(_F32)) + be.astype(_F32)
    q_scores = _hp_dot(q.astype(_F32), wq.astype(_F32))           # [Kn, 1]
    k_scores = _hp_dot(k, wk.astype(_F32)) + b.astype(_F32)       # [Ke, 1]

    col = jax.lax.broadcasted_iota(jnp.int32, (ke, kn), 1)
    P = jnp.where(col == edst, 1.0, 0.0) * emask                  # [Ke, Kn] f32

    scores = _hp_dot(P, q_scores) + k_scores                      # [Ke, 1]
    neg = jnp.finfo(_F32).min
    sm = jnp.where(P > 0, scores, neg)                            # [Ke, Kn]
    seg_max = jnp.max(sm, axis=0, keepdims=True)                  # [1, Kn]
    seg_max = jnp.where(seg_max <= neg, 0.0, seg_max)
    e = jnp.exp(scores - _hp_dot(P, seg_max.T)) * emask           # [Ke, 1]
    denom = _hp_dot(P.T, e)                                       # [Kn, 1]
    alpha = e / (_hp_dot(P, denom) + _EPS)                        # [Ke, 1]
    return alpha, P, k, scores


def _gru_gates(cur, agg, wih, whh, bih, bhh, hdim):
    """Forward GRU gate math (torch.nn.GRUCell). Returns (out, r, z, n, hn)."""
    gi = _hp_dot(cur.astype(_F32), wih.astype(_F32)) + bih.astype(_F32)
    gh = _hp_dot(agg, whh.astype(_F32)) + bhh.astype(_F32)
    i_r, i_z, i_n = gi[:, :hdim], gi[:, hdim:2 * hdim], gi[:, 2 * hdim:]
    h_r, h_z, h_n = gh[:, :hdim], gh[:, hdim:2 * hdim], gh[:, 2 * hdim:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    out = (1.0 - z) * n + z * agg
    return out, r, z, n, h_n


def _fwd_kernel(has_ea, hdim,
                cur_ref, q_ref, val_ref, ea_ref, edst_ref, emask_ref,
                nmask_ref, wq_ref, wk_ref, b_ref, we_ref, be_ref,
                wih_ref, whh_ref, bih_ref, bhh_ref, out_ref):
    ea = ea_ref[:] if has_ea else None
    alpha, P, _, _ = _attention(q_ref[:], val_ref[:], ea, edst_ref[:],
                                emask_ref[:], wq_ref[:], wk_ref[:], b_ref[:],
                                we_ref[:], be_ref[:])
    agg = _hp_dot(P.T, val_ref[:].astype(_F32) * alpha)           # [Kn, H]
    out, _, _, _, _ = _gru_gates(cur_ref[:], agg, wih_ref[:], whh_ref[:],
                                 bih_ref[:], bhh_ref[:], hdim)
    out_ref[:] = (out * nmask_ref[:]).astype(out_ref.dtype)


def _bwd_kernel(has_ea, hdim,
                cur_ref, q_ref, val_ref, ea_ref, edst_ref, emask_ref,
                nmask_ref, wq_ref, wk_ref, b_ref, we_ref, be_ref,
                wih_ref, whh_ref, bih_ref, bhh_ref, g_ref,
                dcur_ref, dq_ref, dval_ref, dea_ref,
                dwq_ref, dwk_ref, db_ref, dwe_ref, dbe_ref,
                dwih_ref, dwhh_ref, dbih_ref, dbhh_ref):
    ea = ea_ref[:] if has_ea else None
    val = val_ref[:]
    cur = cur_ref[:]
    alpha, P, k, _ = _attention(q_ref[:], val, ea, edst_ref[:], emask_ref[:],
                                wq_ref[:], wk_ref[:], b_ref[:],
                                we_ref[:], be_ref[:])
    vf = val.astype(_F32)
    agg = _hp_dot(P.T, vf * alpha)
    out, r, z, n, h_n = _gru_gates(cur, agg, wih_ref[:], whh_ref[:],
                                   bih_ref[:], bhh_ref[:], hdim)

    g = g_ref[:].astype(_F32) * nmask_ref[:]                      # [Kn, H]
    # GRU backward (h' = (1-z) n + z agg)
    dn = g * (1.0 - z)
    dz = g * (agg - n)
    dpre_n = dn * (1.0 - n * n)          # pre-tanh
    dr = dpre_n * h_n
    dpre_z = dz * z * (1.0 - z)
    dpre_r = dr * r * (1.0 - r)
    dgi = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=1)       # [Kn, 3H]
    dgh = jnp.concatenate([dpre_r, dpre_z, dpre_n * r], axis=1)
    dcur_ref[:] = _hp_dot(dgi, wih_ref[:].astype(_F32).T).astype(dcur_ref.dtype)
    dagg = _hp_dot(dgh, whh_ref[:].astype(_F32).T) + g * z        # [Kn, H]
    dwih_ref[:] = _hp_dot(cur.astype(_F32).T, dgi).astype(dwih_ref.dtype)
    dwhh_ref[:] = _hp_dot(agg.T, dgh).astype(dwhh_ref.dtype)
    dbih_ref[:] = jnp.sum(dgi, axis=0, keepdims=True).astype(dbih_ref.dtype)
    dbhh_ref[:] = jnp.sum(dgh, axis=0, keepdims=True).astype(dbhh_ref.dtype)

    # aggregate backward: agg = P^T (alpha * val)
    g_rows = _hp_dot(P, dagg)                                     # [Ke, H]
    dval = alpha * g_rows                                         # value term
    dalpha = jnp.sum(g_rows * vf, axis=1, keepdims=True)          # [Ke, 1]
    # softmax jacobian per segment
    seg_dot = _hp_dot(P.T, alpha * dalpha)                        # [Kn, 1]
    dscores = alpha * (dalpha - _hp_dot(P, seg_dot))              # [Ke, 1]

    # scores = P q wq + (k wk + b)
    dq_scores = _hp_dot(P.T, dscores)                             # [Kn, 1]
    dq_ref[:] = _hp_dot(dq_scores, wq_ref[:].astype(_F32).T).astype(dq_ref.dtype)
    dwq_ref[:] = _hp_dot(q_ref[:].astype(_F32).T, dq_scores).astype(dwq_ref.dtype)
    dk = _hp_dot(dscores, wk_ref[:].astype(_F32).T)               # [Ke, A]
    dwk_ref[:] = _hp_dot(k.T, dscores).astype(dwk_ref.dtype)
    db_ref[:] = jnp.sum(dscores, axis=0, keepdims=True).astype(db_ref.dtype)
    dval_ref[:] = (dval + dk).astype(dval_ref.dtype)              # k = val + ...
    if has_ea:
        dwe_ref[:] = _hp_dot(ea.astype(_F32).T, dk).astype(dwe_ref.dtype)
        dbe_ref[:] = jnp.sum(dk, axis=0, keepdims=True).astype(dbe_ref.dtype)
        dea_ref[:] = _hp_dot(dk, we_ref[:].astype(_F32).T).astype(dea_ref.dtype)
    else:
        dwe_ref[:] = jnp.zeros_like(dwe_ref)
        dbe_ref[:] = jnp.zeros_like(dbe_ref)
        dea_ref[:] = jnp.zeros_like(dea_ref)


def _prep(cur, q, val, ea, edst, emask, nmask):
    """Shape/dtype normalization shared by fwd and bwd calls."""
    ke = val.shape[0]
    kn = cur.shape[0]
    ea2 = ea if ea is not None else jnp.zeros((ke, 1), val.dtype)
    return (cur, q, val, ea2,
            edst.astype(jnp.int32).reshape(ke, 1),
            emask.astype(_F32).reshape(ke, 1),
            nmask.astype(_F32).reshape(kn, 1))


def _vmem_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM)] * n


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_attn_gru_row(static, interpret, cur, q, val, ea, edst, emask,
                       nmask, wq, wk, b, we, be, wih, whh, bih, bhh):
    """One fused wavefront row-layer: attention aggregate + GRU.

    static = (has_ea, hidden_dim). Weight layouts are matmul-ready:
    wq [Dq,1], wk [A,1], b [1,1], we [R,A], be [1,A], wih [In,3H],
    whh [H,3H], bih/bhh [1,3H]. Returns out [Kn, H] in cur's dtype.
    """
    has_ea, hdim = static
    args = _prep(cur, q, val, ea, edst, emask, nmask)
    kn = cur.shape[0]
    fn = pl.pallas_call(
        functools.partial(_fwd_kernel, has_ea, hdim),
        out_shape=jax.ShapeDtypeStruct((kn, hdim), cur.dtype),
        in_specs=_vmem_specs(16),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    return fn(*args, wq, wk, b, we, be, wih, whh, bih, bhh)


def _row_fwd(static, interpret, cur, q, val, ea, edst, emask, nmask,
             wq, wk, b, we, be, wih, whh, bih, bhh):
    out = fused_attn_gru_row(static, interpret, cur, q, val, ea, edst,
                             emask, nmask, wq, wk, b, we, be, wih, whh,
                             bih, bhh)
    return out, (cur, q, val, ea, edst, emask, nmask,
                 wq, wk, b, we, be, wih, whh, bih, bhh)


def _row_bwd(static, interpret, res, g):
    has_ea, hdim = static
    (cur, q, val, ea, edst, emask, nmask,
     wq, wk, b, we, be, wih, whh, bih, bhh) = res
    args = _prep(cur, q, val, ea, edst, emask, nmask)
    ea2 = args[3]
    out_shapes = (
        jax.ShapeDtypeStruct(cur.shape, cur.dtype),   # d_cur
        jax.ShapeDtypeStruct(q.shape, q.dtype),       # d_q
        jax.ShapeDtypeStruct(val.shape, val.dtype),   # d_val
        jax.ShapeDtypeStruct(ea2.shape, ea2.dtype),   # d_ea
        jax.ShapeDtypeStruct(wq.shape, wq.dtype),
        jax.ShapeDtypeStruct(wk.shape, wk.dtype),
        jax.ShapeDtypeStruct(b.shape, b.dtype),
        jax.ShapeDtypeStruct(we.shape, we.dtype),
        jax.ShapeDtypeStruct(be.shape, be.dtype),
        jax.ShapeDtypeStruct(wih.shape, wih.dtype),
        jax.ShapeDtypeStruct(whh.shape, whh.dtype),
        jax.ShapeDtypeStruct(bih.shape, bih.dtype),
        jax.ShapeDtypeStruct(bhh.shape, bhh.dtype),
    )
    fn = pl.pallas_call(
        functools.partial(_bwd_kernel, has_ea, hdim),
        out_shape=out_shapes,
        in_specs=_vmem_specs(17),
        out_specs=tuple(_vmem_specs(13)),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    (dcur, dq, dval, dea, dwq, dwk, db, dwe, dbe,
     dwih, dwhh, dbih, dbhh) = fn(*args, wq, wk, b, we, be,
                                  wih, whh, bih, bhh, g)
    return (dcur, dq, dval, dea if has_ea else None, None, None, None,
            dwq, dwk, db, dwe, dbe, dwih, dwhh, dbih, dbhh)


fused_attn_gru_row.defvjp(_row_fwd, _row_bwd)
