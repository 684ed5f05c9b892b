"""Canonical DAGNN: level-synchronous wavefront execution as a lax.scan.

Re-designs the reference model (reference: ogbg-code/model/dagnn.py:18-215)
TPU-first: instead of per-level Python masking and O(|level|*E) edge
selection (dagnn.py:146-157), the forward is a single `lax.scan` over the
precomputed LevelSchedule — per step it gathers predecessor states, runs the
edge-attention aggregate (SDDMM + segment softmax + SpMM over level-local
slots), applies the GRU stack, and scatters updated states. Bidirectional
passes reuse the same scan with the reverse schedule.

Config mirrors the reference flag surface one-to-one
(dagnn.py:18-21): num_vocab, max_seq_len, emb/hidden dims, num_rels,
w_edge_attr, num_layers, bidirectional, mapper_bias, agg_x, agg, out_wx,
out_pool_all, out_pool, dropout, num_class, recurr.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dagnn_tpu.dag.batch import DAGBatch
from dagnn_tpu.nn.aggregators import (
    AggregatorSpec,
    aggregator_init,
    aggregate_level,
    encode_edges,
)
from dagnn_tpu.nn.encoders import EncoderSpec, encoder_init, encode
from dagnn_tpu.nn.readout import pool_nodes
from dagnn_tpu.ops.gru import gru_cell, gru_init
from dagnn_tpu.ops.linear import linear, linear_init

# aggregator names (reference src/constants.py:12-19)
NA_SUM = "add"
NA_MAX = "max"
NA_GATED_SUM = "gated_sum"
NA_SELF_ATTN_X = "self_attn_x"
NA_SELF_ATTN_H = "self_attn_h"
NA_ATTN_X = "attn_x"
NA_ATTN_H = "attn_h"
NA_MATTN_H = "mattn_h"

P_MEAN, P_ADD, P_SUM, P_MAX, P_ATTN = "mean", "add", "sum", "max", "attn"

# scan unroll factor for the wavefront loops (A/B knob; see bench history)
_SCAN_UNROLL = int(os.environ.get("DAGNN_SCAN_UNROLL", "1"))

# A/B knob: 1 = merged backward re-gathers predecessor states from the
# final buffer and recomputes the forward in-kernel instead of consuming
# the forward's residual streams (trades ~10us/row of stream DUS+slice
# glue and ~380MB/step of HBM for in-kernel recompute)
_NO_RES_STREAM = bool(int(os.environ.get("DAGNN_NO_RES_STREAM", "0")))


@dataclasses.dataclass(frozen=True)
class DAGNNConfig:
    num_vocab: int = 0
    max_seq_len: int = 5
    emb_dim: int = 300
    hidden_dim: int = 300
    out_dim: int = 0
    num_rels: int = 2
    w_edge_attr: bool = True
    num_layers: int = 2
    bidirectional: bool = True
    mapper_bias: bool = True
    agg_x: bool = False
    agg: str = NA_ATTN_H
    out_wx: bool = True
    out_pool_all: bool = True
    out_pool: str = P_MAX
    dropout: float = 0.0
    num_class: int = 0
    recurr: bool = True
    encoder: EncoderSpec = EncoderSpec()
    # D-VAE coupling: when > 0, a one-hot vertex id (global node index mod
    # vid_dim — all graphs share a fixed size) is appended to hidden states
    # before aggregation: to gated-sum values and to *_h attention keys and
    # queries (reference dvae/dagnn.py:129-137). 0 disables (canonical OGB).
    vid_dim: int = 0
    # segment-op implementation: "dense" (one-hot MXU matmuls, scatter-free)
    # or "scatter" (jax.ops.segment_*, the semantics reference)
    segment_impl: str = "dense"
    # The canonical reference shares ONE forward-flow AggConv across both
    # directions for agg add/max (dagnn.py:74-75, AggConv default
    # reverse=False): in the reverse pass the level's edges (source in
    # level) aggregate into their TARGETS, and indexing `[layer]` reads
    # rows that received nothing — the reverse aggregation is a structural
    # no-op upstream (ps_h == 0 at every level). True reproduces that
    # behavior (golden-tested against the actual reference model through
    # tests/pyg_shim.py); False applies the evidently intended reverse
    # aggregation. The dvae copies fix the bug upstream
    # (dvae/dagnn.py:67-70 builds a separate reverse=True conv), so VAE
    # couplings construct with False.
    ref_shared_agg_quirk: bool = True
    # wavefront compute dtype: "float32" (parity) or "bfloat16" (MXU-native;
    # params stay f32, states/matmuls run bf16, softmax internals f32)
    compute_dtype: str = "float32"
    # (a stack_dirs option that vmapped the two direction passes into one
    # scan existed through round 2; it measured 5x SLOWER on TPU v5e than
    # sequential passes — XLA gives the batched carry a transposed layout
    # and copies it every step — and was removed.)

    def __post_init__(self):
        if self.agg_x and self.hidden_dim < self.emb_dim:
            # reference dagnn.py:27-28
            raise ValueError("hidden dimension too small for input (agg_x)")
        if self.agg_x and self.agg_attn and not self.agg_attn_x:
            # *_h attention keys are hidden-dim but agg_x aggregates x:
            # the reference would crash on this combination (dagnn.py:159-163
            # passes h_attn=G.x into convs sized for hidden_dim)
            raise ValueError("agg_x requires an *_x attention or sum aggregator")

    # --- derived ---
    @property
    def dirs(self) -> Tuple[int, ...]:
        return (0, 1) if self.bidirectional else (0,)

    @property
    def agg_attn(self) -> bool:
        return "attn" in self.agg

    @property
    def agg_attn_x(self) -> bool:
        return "_x" in self.agg

    @property
    def out_hidden_dim(self) -> int:
        """Readout width.

        Note: the reference sizes this as emb*dirs + hidden*dirs*layers
        whenever out_wx (dagnn.py:44), but its pooled-all concat includes x
        only ONCE (dagnn.py:195) — the combination bidirectional+out_pool_all
        +out_wx would crash there (and is unreachable: driver defaults are
        out_wx=0, out_pool_all=0, main_pyg.py:161-162). We size heads to the
        actual concatenation: x appears per-direction only in the
        per-direction readout branch.
        """
        d = len(self.dirs)
        core = self.hidden_dim * d * self.num_layers
        if not self.out_wx:
            return core
        x_copies = d if (self.bidirectional and not self.out_pool_all) else 1
        return self.emb_dim * x_copies + core

    @property
    def effective_num_rels(self) -> int:
        # reference dagnn.py:53 drops the edge encoder when w_edge_attr=False
        return self.num_rels if self.w_edge_attr else 1

    def aggregator_spec(self, layer: int) -> AggregatorSpec:
        """Spec for the aggregator at GRU-stack position `layer`
        (mirrors the instantiation switch at dagnn.py:56-75; with vid_dim>0
        the D-VAE dims of dvae/dagnn.py:46-60 apply: vids extend gated-sum
        values and *_h attention keys/queries, never the aggregated values).
        """
        vd = self.vid_dim
        pred_dim = self.emb_dim if self.agg_x else self.hidden_dim
        attn_dim = (self.emb_dim if self.agg_attn_x
                    else self.hidden_dim + vd)
        nr = self.effective_num_rels
        if "self_attn" in self.agg:
            return AggregatorSpec("self_attn", value_dim=pred_dim, key_dim=attn_dim, num_rels=nr)
        if "mattn" in self.agg:
            qd = self.emb_dim if layer == 0 else attn_dim
            return AggregatorSpec("mattn", value_dim=pred_dim, key_dim=attn_dim, query_dim=qd, num_rels=nr)
        if "attn" in self.agg:
            qd = self.emb_dim if layer == 0 else attn_dim
            return AggregatorSpec("attn", value_dim=pred_dim, key_dim=attn_dim, query_dim=qd, num_rels=nr)
        if self.agg == NA_GATED_SUM:
            return AggregatorSpec("gated_sum", value_dim=pred_dim + vd, num_rels=nr,
                                  mapper_bias=self.mapper_bias,
                                  out_dim=self.hidden_dim if vd else 0)
        return AggregatorSpec(self.agg, value_dim=pred_dim, num_rels=nr)

    @property
    def shared_aggregator(self) -> bool:
        # plain add/max share ONE conv across layers and directions (dagnn.py:74-75)
        return self.agg in (NA_SUM, NA_MAX)

    @property
    def reverse_agg_noop(self) -> bool:
        """True when the reverse pass aggregates nothing (see
        ref_shared_agg_quirk): shared add/max conv with forward flow."""
        return self.shared_aggregator and self.ref_shared_agg_quirk


def dagnn_init(key, cfg: DAGNNConfig, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 256))
    p: Dict[str, Any] = {"encoder": encoder_init(next(keys), cfg.encoder, dtype)}

    if cfg.shared_aggregator:
        shared = aggregator_init(next(keys), cfg.aggregator_spec(0), dtype)
        p["aggr"] = [[shared for _ in range(cfg.num_layers)] for _ in cfg.dirs]
    else:
        p["aggr"] = [
            [aggregator_init(next(keys), cfg.aggregator_spec(l), dtype)
             for l in range(cfg.num_layers)]
            for _ in cfg.dirs
        ]

    cells = []
    for _ in cfg.dirs:
        row = []
        for l in range(cfg.num_layers):
            in_dim = cfg.emb_dim if l == 0 else cfg.hidden_dim
            if cfg.recurr:
                row.append(gru_init(next(keys), in_dim, cfg.hidden_dim, dtype))
            else:
                row.append(linear_init(next(keys), in_dim + cfg.hidden_dim, cfg.hidden_dim, dtype=dtype))
        cells.append(row)
    p["cells"] = cells

    if cfg.out_pool == P_ATTN:
        d = cfg.out_hidden_dim // 2 if (cfg.bidirectional and not cfg.out_pool_all) else cfg.out_hidden_dim
        p["pool_attn"] = linear_init(next(keys), d, 1, dtype=dtype)

    if cfg.num_class > 0:
        p["head"] = linear_init(next(keys), cfg.out_hidden_dim, cfg.num_class, dtype=dtype)
    elif cfg.num_vocab == 1:
        p["head"] = linear_init(next(keys), cfg.out_hidden_dim, 1, dtype=dtype)
    else:
        hw, hb = [], []
        for _ in range(cfg.max_seq_len):
            h = linear_init(next(keys), cfg.out_hidden_dim, cfg.num_vocab, dtype=dtype)
            hw.append(h["w"]); hb.append(h["b"])
        p["head"] = {"w": jnp.stack(hw), "b": jnp.stack(hb)}  # [S, V, D], [S, V]
    return p


def _step_outs(cfg: DAGNNConfig, params_dir, specs, vals, fxs, ixs):
    """Compute one level's per-layer outputs from pre-gathered inputs.

    vals: [num_layers, Ke, H] predecessor states h[i][edge_src_slot]
    (ignored for agg_x). fxs/ixs: this level's float/int streams.
    Returns outs [num_layers, Kn, H]. Pure in its inputs — the unit the
    write-once custom VJP replays (and the future Pallas kernel body).
    """
    inp_x = fxs["x"]
    node_mask = ixs["nmask"]
    edge_dst, edge_mask = ixs["edst"], ixs["emask"]
    ea, x_src = fxs.get("ea"), fxs.get("xsrc")
    v_src, v_node = fxs.get("vsrc"), fxs.get("vnode")
    kn = inp_x.shape[0]

    ps_common = None
    if cfg.agg_x:
        spec0, ap0 = specs[0], params_dir["aggr"][0]
        kw = {}
        if cfg.agg_attn:
            kw = dict(key_src=x_src, query=inp_x)
        ps = aggregate_level(
            ap0, spec0, x_src, edge_dst, edge_mask, kn + 1,
            edge_emb=encode_edges(ap0, spec0, ea), impl=cfg.segment_impl, **kw,
        )[:kn]
        if ps.shape[-1] < cfg.hidden_dim:  # zero-pad emb -> hidden (dagnn.py:165-167)
            ps = jnp.pad(ps, ((0, 0), (0, cfg.hidden_dim - ps.shape[-1])))
        ps_common = ps

    cur = inp_x
    prev_out = None
    outs = []
    for i in range(cfg.num_layers):
        if cfg.agg_x:
            ps_h = ps_common
        else:
            spec, ap = specs[i], params_dir["aggr"][i]
            val = vals[i]
            agg_val = val
            if v_src is not None and spec.kind == "gated_sum":
                agg_val = jnp.concatenate([val, v_src], axis=-1)
            kw = {}
            if cfg.agg_attn:
                if cfg.agg_attn_x:
                    kw = dict(key_src=x_src, query=inp_x)
                else:
                    key = val if v_src is None else jnp.concatenate([val, v_src], -1)
                    q = prev_out if i > 0 else inp_x  # h[d][i-1] at level == prev layer out
                    if i > 0 and v_node is not None:
                        q = jnp.concatenate([q, v_node], -1)
                    kw = dict(key_src=key, query=q)
            ps_h = aggregate_level(
                ap, spec, agg_val, edge_dst, edge_mask, kn + 1,
                edge_emb=encode_edges(ap, spec, ea), impl=cfg.segment_impl, **kw,
            )[:kn]

        if cfg.recurr:
            out = gru_cell(params_dir["cells"][i], cur, ps_h)
        else:
            out = linear(params_dir["cells"][i], jnp.concatenate([cur, ps_h], axis=-1))
        out = jnp.where(node_mask[:, None], out, 0)
        outs.append(out)
        prev_out = out
        cur = out
    return jnp.stack(outs)  # [num_layers, Kn, H]


def _gather_vals(cfg: DAGNNConfig, h, eslot):
    if cfg.agg_x:
        return jnp.zeros((cfg.num_layers,) + eslot.shape + (cfg.hidden_dim,), h.dtype)
    return h[:, eslot, :]


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _wavefront(static, params_dir, fxs, ixs):
    """Scan the wavefront over levels.

    Returns the level-sorted state buffer: layer-PACKED [L*Kn+1, nl*H]
    (layer l in columns l*H:(l+1)*H) on the fused Pallas path, un-packed
    [num_layers, L*Kn+1, H] on the generic XLA path.

    The buffer is WRITE-ONCE (each slot written exactly at its level;
    gathers read strictly earlier levels), so the custom VJP stores only
    the final buffer and replays levels in reverse — O(1) memory in depth
    instead of a per-step carry snapshot (which OOMs at depth ~100).
    """
    h, _ = jax.lax.scan(_fwd_step(static, params_dir), _init_h(static, fxs),
                        (fxs, ixs), unroll=_SCAN_UNROLL)
    return h


def _init_h(static, fxs):
    cfg, L, kn = static[:3]
    if _fused_applicable(cfg):
        # layer-packed: halves the row count of every cross-row gather
        return jnp.zeros((L * kn + 1, cfg.num_layers * cfg.hidden_dim),
                         fxs["x"].dtype)
    return jnp.zeros((cfg.num_layers, L * kn + 1, cfg.hidden_dim),
                     fxs["x"].dtype)


def _fused_applicable(cfg: DAGNNConfig) -> bool:
    """Static eligibility for the whole-row fused Pallas kernel
    (ops/pallas/row_step.py): additive-attention aggregators with a GRU
    stack, no agg_x / vids. Everything else uses the XLA path."""
    return (cfg.segment_impl == "fused" and not cfg.agg_x
            and cfg.vid_dim == 0 and cfg.recurr
            and cfg.agg_attn and not cfg.agg_attn_x
            and all(cfg.aggregator_spec(l).kind == "attn"
                    for l in range(cfg.num_layers)))


def _fused_static(cfg: DAGNNConfig, fxs):
    has_ea = "ea" in fxs and cfg.aggregator_spec(0).wea
    return (has_ea, cfg.hidden_dim, cfg.num_layers)


def _fused_weights(cfg: DAGNNConfig, params_dir, has_ea):
    from dagnn_tpu.ops.pallas.row_step import flatten_row_weights
    qdims = [cfg.aggregator_spec(l).query_dim for l in range(cfg.num_layers)]
    return flatten_row_weights(params_dir["aggr"], params_dir["cells"],
                               qdims, has_ea)


def _fwd_step(static, params_dir, with_vals: bool = False):
    """One wavefront scan step. with_vals=True additionally emits the
    per-row gathered predecessor states as scan ys, so the custom backward
    consumes them as a stream instead of re-gathering from the final
    buffer (the gather is ~half the backward scan's non-kernel cost)."""
    cfg, L, kn = static[:3]
    nf = static[3] if len(static) > 3 else None
    specs = [cfg.aggregator_spec(l) for l in range(cfg.num_layers)]
    fused = _fused_applicable(cfg)

    def step(h, xs):
        fxs, ixs = xs
        offset = ixs["lvl"] * kn
        if fused:
            from dagnn_tpu.ops.pallas.row_step import fused_row_forward
            st = _fused_static(cfg, fxs)
            kw = dict(emit_res=with_vals)
            if nf is None:
                vals = h[ixs["eslot"]]  # [Ke, nl*H] layer-packed
            else:
                # NEAR/FAR: "regions" rows gather far-only; near rows are
                # routed in-kernel from the previous row's output block
                vals = h[ixs["eslot_v"]]
                kw.update(nf=nf)
                if any(e[0] == "r" for e in nf):
                    prev = jax.lax.dynamic_slice(
                        h, (jnp.maximum(offset - kn, 0), 0),
                        (kn, h.shape[1]))
                    kw.update(nsrc=ixs["nsrc"], prev_out=prev)
            out = fused_row_forward(
                st, jax.default_backend() != "tpu",
                fxs["x"], vals, fxs.get("ea") if st[0] else None,
                ixs["edst"], ixs["emask"], ixs["nmask"],
                _fused_weights(cfg, params_dir, st[0]), **kw)
            if with_vals:
                outs, *res = out
                h = jax.lax.dynamic_update_slice(h, outs, (offset, 0))
                return h, (vals, tuple(res))
            h = jax.lax.dynamic_update_slice(h, out, (offset, 0))
        else:
            vals = _gather_vals(cfg, h, ixs["eslot"])
            outs = _step_outs(cfg, params_dir, specs, vals, fxs, ixs)
            h = jax.lax.dynamic_update_slice(h, outs, (0, offset, 0))
        return h, (vals if with_vals else None)

    return step


def _wavefront_fwd(static, params_dir, fxs, ixs):
    cfg = static[0]
    nf = static[3] if len(static) > 3 else None
    if _fused_applicable(cfg) and "teslot" in ixs:
        # stream the per-row gathered predecessor states AND the kernel
        # residuals to the backward (one extra HBM write of ~[L, Ke+5Kn,
        # nl*H]; saves the backward scan's per-row re-gather — 2x the
        # write cost — and its entire in-kernel forward recompute)
        h, (vals_s, res_s) = jax.lax.scan(
            _fwd_step(static, params_dir, with_vals=True),
            _init_h(static, fxs), (fxs, ixs), unroll=_SCAN_UNROLL)
        # near/far backward also needs h (near vals rebuild from the
        # previous row's output block)
        return h, (params_dir, fxs, ixs,
                   (h, vals_s, res_s) if nf is not None else (vals_s, res_s))
    h = _wavefront(static, params_dir, fxs, ixs)
    return h, (params_dir, fxs, ixs, h)


def _wavefront_bwd(static, res, g):
    cfg, L, kn = static[:3]
    params_dir, fxs, ixs, h_final = res
    specs = [cfg.aggregator_spec(l) for l in range(cfg.num_layers)]
    if _fused_applicable(cfg):
        if "teslot" not in ixs:
            raise NotImplementedError(
                "fused wavefront backward requires a transpose schedule")
        return _wavefront_bwd_fused(static, res, g)
    # Transpose-schedule backward (preferred): instead of scatter-adding each
    # row's predecessor-state gradients dv into the full [L*Kn+1, H] buffer
    # (a random-access scatter per step — slow on TPU), write dv CONTIGUOUSLY
    # into a per-edge-slot gradient buffer; when the reverse scan reaches row
    # r, every edge consuming row r's outputs (they live in strictly later
    # rows) has already written its gradient, so the incoming cotangent is a
    # gather via tgrad_eslot + a row-local segment-sum via tgrad_dst.
    use_t = ("teslot" in ixs) and not cfg.agg_x
    ke = ixs["eslot"].shape[1]

    def bwd_step(carry, xs):
        acc, d_params = carry
        fxs_l, ixs_l = xs
        lvl = ixs_l["lvl"]
        eslot = ixs_l["eslot"]
        vals = _gather_vals(cfg, h_final, eslot)
        if use_t:
            g_out = jax.lax.dynamic_slice(
                g, (0, lvl * kn, 0), (cfg.num_layers, kn, cfg.hidden_dim))
            tg = acc[:, ixs_l["teslot"], :]  # [Lyr, Kt, H] edge grads into this row
            tg = jnp.where(ixs_l["tmask"][None, :, None], tg, 0)
            if cfg.segment_impl == "dense":
                oh = jax.nn.one_hot(ixs_l["tdst"], kn, dtype=tg.dtype)  # [Kt, kn]
                g_out = g_out + jnp.einsum("lkh,kn->lnh", tg, oh)
            else:
                g_out = g_out + jax.vmap(
                    lambda t: jax.ops.segment_sum(
                        t, ixs_l["tdst"], num_segments=kn + 1,
                        indices_are_sorted=True))(tg)[:, :kn, :]
        else:
            g_out = jax.lax.dynamic_slice(
                acc, (0, lvl * kn, 0), (cfg.num_layers, kn, cfg.hidden_dim))

        def f(p, v, fl):
            return _step_outs(cfg, p, specs, v, fl, ixs_l)

        _, vjp_fn = jax.vjp(f, params_dir, vals, fxs_l)
        dp, dv, dfl = vjp_fn(g_out)
        if use_t:
            acc = jax.lax.dynamic_update_slice(acc, dv, (0, lvl * ke, 0))
        elif not cfg.agg_x:
            acc = acc.at[:, eslot, :].add(dv)
        d_params = jax.tree.map(jnp.add, d_params, dp)
        return (acc, d_params), dfl

    acc0 = (jnp.zeros((cfg.num_layers, L * ke + 1, cfg.hidden_dim), g.dtype)
            if use_t else g)
    d_params0 = jax.tree.map(jnp.zeros_like, params_dir)
    (_, d_params), d_fxs = jax.lax.scan(
        bwd_step, (acc0, d_params0), (fxs, ixs), reverse=True,
        unroll=_SCAN_UNROLL)
    d_ixs = jax.tree.map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), ixs)
    return d_params, d_fxs, d_ixs


def _wavefront_bwd_fused(static, res, g):
    """Backward with the whole-row fused Pallas kernel.

    Same transpose-schedule recurrence as the generic path, but the
    per-row work (incoming-edge-grad segment sum + both layers' VJPs) is
    one pallas_call; weight grads accumulate in the kernel's flat layout
    and map back to the params tree once after the scan. All per-slot
    state is layer-packed [*, nl*H] (see row_step.py) and the forward's
    per-row gathered predecessor states arrive as a residual STREAM
    (vals_s), so the only per-row random access left is the transpose-
    schedule gather from the contiguous edge-grad buffer."""
    from dagnn_tpu.ops.pallas.row_step import unflatten_row_weight_grads
    cfg, L, kn = static[:3]
    nf = static[3] if len(static) > 3 else None
    params_dir, fxs, ixs, res4 = res
    if nf is not None:
        h_all, vals_s, res_s = res4
    else:
        h_all = None
        vals_s, res_s = res4
    st = _fused_static(cfg, fxs)
    has_ea = st[0]
    weights = _fused_weights(cfg, params_dir, has_ea)
    interp = jax.default_backend() != "tpu"
    ke = ixs["eslot"].shape[1]
    # edge-grad buffer row width: far-only for "regions", full otherwise
    acc_unit = ((nf[0][2] if nf[0][0] == "r" else nf[0][1])
                if nf is not None else ke)
    lh = cfg.num_layers * cfg.hidden_dim

    def bwd_step(carry, xs):
        from dagnn_tpu.ops.pallas.row_step import fused_row_backward
        if nf is not None:
            acc, dw_acc, near_g = carry
        else:
            acc, dw_acc = carry
        fxs_l, ixs_l, g_out, vals, res_l = xs
        lvl = ixs_l["lvl"]
        tg = acc[ixs_l["teslot"]]            # [Kt, nl*H]; pad slot is zero
        # barrier: without it XLA fuses this gather (whose source is the
        # full [L*Ke+1, nl*H] carry) INTO the pallas custom-call and
        # stack-allocates the whole source in scoped VMEM -> compile OOM
        tg = jax.lax.optimization_barrier(tg)
        kw = dict(res=res_l)
        if nf is not None:
            kw.update(nf=nf, nsrc=ixs_l["nsrc"], near_g=near_g)
            if any(e[0] == "r" for e in nf):
                kw.update(prev_out=jax.lax.dynamic_slice(
                    h_all, (jnp.maximum((lvl - 1) * kn, 0), 0),
                    (kn, h_all.shape[1])))
        out = fused_row_backward(
            st, interp, fxs_l["x"], vals,
            fxs_l.get("ea") if has_ea else None,
            ixs_l["edst"], ixs_l["emask"], ixs_l["nmask"], weights,
            g_out, tg, ixs_l["tdst"], ixs_l["tmask"], **kw)
        if nf is not None:
            dx, dvals, dea, dw, near_g = out
        else:
            dx, dvals, dea, dw = out
        dvals = jax.lax.optimization_barrier(dvals)
        acc = jax.lax.dynamic_update_slice(acc, dvals, (lvl * acc_unit, 0))
        dw_acc = jax.tree.map(jnp.add, dw_acc, dw)
        dfl = {"x": dx}
        if "ea" in fxs_l:
            dfl["ea"] = (dea if dea is not None
                         else jnp.zeros_like(fxs_l["ea"]))
        if nf is not None:
            return (acc, dw_acc, near_g), dfl
        return (acc, dw_acc), dfl

    from dagnn_tpu.ops.pallas.row_step import _names as _row_names
    acc0 = jnp.zeros((L * acc_unit + 1, lh), g.dtype)
    # stream the cotangent as a per-row scan input ([L, kn, nl*H]) rather
    # than dynamic-slicing the full [L*kn+1, nl*H] buffer inside the body
    # (the slice-of-big-buffer fuses into the pallas call and blows the
    # scoped-VMEM stack limit); the garbage slot L*kn carries no gradient
    g_stream = g[: L * kn].reshape(L, kn, lh)
    # grads exist only for the canonical weight forms (the row-form score
    # vector copies are backward-only INPUTS, their grads fold into wq/wk)
    dw0 = {n: jnp.zeros_like(weights[n])
           for n in _row_names(cfg.num_layers, has_ea)}
    carry0 = ((acc0, dw0, jnp.zeros((kn, lh), g.dtype))
              if nf is not None else (acc0, dw0))
    (carry_out), d_fxs = jax.lax.scan(
        bwd_step, carry0, (fxs, ixs, g_stream, vals_s, res_s),
        reverse=True, unroll=_SCAN_UNROLL)
    dw_total = carry_out[1]
    d_params = unflatten_row_weight_grads(dw_total, cfg.num_layers, has_ea)
    if not has_ea:
        # structural zeros for edge-encoder params absent from the kernel
        for l, ap in enumerate(params_dir["aggr"]):
            if "edge_encoder" in ap:
                d_params["aggr"][l]["edge_encoder"] = jax.tree.map(
                    jnp.zeros_like, ap["edge_encoder"])
    d_ixs = jax.tree.map(lambda a: np.zeros(a.shape, jax.dtypes.float0), ixs)
    return d_params, d_fxs, d_ixs


_wavefront.defvjp(_wavefront_fwd, _wavefront_bwd)


@jax.custom_vjp
def _perm_gather(src, idx, inv_idx, inv_valid):
    """Gather src[idx] whose VJP is the INVERSE-permutation gather.

    Legal when every row of src appears at most once in idx (true for the
    node<->slot maps: each node owns exactly one slot per schedule). The
    generic gather VJP is a scatter-add — ~2x slower than a gather on TPU
    (v5e: 925us vs ~450us for the [41k, 300] stream); with a known inverse
    the cotangent is just d_src = g[inv_idx] (masked where src rows do not
    appear in idx).
    """
    return src[idx]


def _perm_gather_fwd(src, idx, inv_idx, inv_valid):
    return src[idx], (idx.shape, inv_idx, inv_valid, src.shape)


def _perm_gather_bwd(res, g):
    idx_shape, inv_idx, inv_valid, src_shape = res
    # barrier: the cotangent is a scan ys buffer; without the barrier XLA
    # fuses the in-loop dynamic-update-slice producing it INTO the pallas
    # custom-call once this gather (rather than the old scatter-add)
    # consumes it, stack-allocating the whole stream in scoped VMEM
    g = jax.lax.optimization_barrier(g)
    flat = g.reshape((-1,) + tuple(src_shape[1:]))
    d_src = jnp.where(inv_valid[:, None],
                      flat[jnp.clip(inv_idx, 0, flat.shape[0] - 1)], 0)
    zero = lambda shape: np.zeros(shape, jax.dtypes.float0)
    return (d_src, zero(idx_shape), zero(inv_idx.shape),
            zero(inv_valid.shape))


_perm_gather.defvjp(_perm_gather_fwd, _perm_gather_bwd)


def _build_streams(params_dir, cfg: DAGNNConfig, x, edge_attr, sched):
    """Build one direction's (params, float-streams, int-streams) triple.

    Execution uses the LEVEL-SORTED layout (see dag/schedule.py): states
    live in a flat [L*Kn+1, H] write-once buffer so per-level writes are
    contiguous dynamic-update-slices; per-slot inputs (x, edge attrs, vids)
    are pre-gathered once and streamed through the scan. The only per-step
    random access is the cross-level predecessor gather, whose transpose
    (scatter-add) appears only in the memory-light custom backward.
    """
    n1 = x.shape[0]
    L, kn = sched.node_ids.shape
    node_ids = jnp.asarray(sched.node_ids)

    if cfg.compute_dtype == "bfloat16":
        x = x.astype(jnp.bfloat16)
        params_dir = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
            params_dir)

    # NOTE: the x-stream gather deliberately keeps the default scatter-add
    # VJP. Routing it through _perm_gather was A/B'd on v5e: the inverse
    # gather itself is ~2x faster than the scatter, but its consumer shape
    # makes XLA fuse the backward scan's ys dynamic-update-slice into the
    # pallas call (scoped-VMEM overflow), and the barrier that prevents
    # that costs more than the gather saves (1.015M vs 1.12M edges/s).
    fxs = {"x": x[node_ids]}  # [L, Kn, emb]
    if cfg.w_edge_attr and edge_attr is not None and cfg.num_rels > 1:
        fxs["ea"] = jnp.asarray(edge_attr)[jnp.asarray(sched.edge_id)].astype(x.dtype)
    if cfg.agg_x or cfg.agg_attn_x:
        fxs["xsrc"] = x[jnp.asarray(sched.edge_src)]  # [L, Ke, emb]
    if cfg.vid_dim > 0:
        # one-hot vertex id within the (fixed-size) graph: global index mod
        # vid_dim (reference dvae/dagnn.py:130-134)
        vids_all = jax.nn.one_hot(jnp.arange(n1) % cfg.vid_dim, cfg.vid_dim,
                                  dtype=x.dtype)
        fxs["vsrc"] = vids_all[jnp.asarray(sched.edge_src)]
        fxs["vnode"] = vids_all[node_ids]
    ixs = {
        "lvl": jnp.arange(L, dtype=jnp.int32),
        "nmask": jnp.asarray(sched.node_mask),
        "eslot": jnp.asarray(sched.edge_src_slot),
        "edst": jnp.asarray(sched.edge_dst),
        "emask": jnp.asarray(sched.edge_mask),
    }
    nf = None
    fused = _fused_applicable(cfg)
    if sched.edge_nsrc is not None and fused:
        # NEAR/FAR-aware schedule (dag/schedule.py nearfar), single-
        # direction form: the schedule's transpose flat slots already index
        # the per-direction grad buffer (far-only for "regions", full for
        # "tgonly"), so no remap is needed here
        ke_d = sched.edge_src_slot.shape[1]
        kf = sched.far_w
        nf = ((("r", ke_d, kf),) if kf is not None
              else (("t", ke_d, ke_d),))
        ixs["nsrc"] = jnp.asarray(sched.edge_nsrc)
        # the forward's gather list: far rows only under "regions"
        ixs["eslot_v"] = jnp.asarray(
            sched.edge_src_slot[:, :kf] if kf is not None
            else sched.edge_src_slot)
    use_tgrad = sched.tgrad_eslot is not None and not cfg.agg_x
    if use_tgrad and sched.edge_nsrc is not None and not fused:
        # a nearfar schedule's transpose covers FAR edges only — the
        # generic XLA backward cannot consume it; omitting the keys makes
        # it fall back to the (correct) scatter-add accumulation
        use_tgrad = False
    if use_tgrad:
        # transpose schedule: consumed only by the custom backward (the
        # forward scan body ignores these keys; XLA dead-code-eliminates them)
        ixs["teslot"] = jnp.asarray(sched.tgrad_eslot)
        ixs["tdst"] = jnp.asarray(sched.tgrad_dst)
        ixs["tmask"] = jnp.asarray(sched.tgrad_mask)
    return params_dir, fxs, ixs, (L, kn, nf)


def _direction_pass(params_dir, cfg: DAGNNConfig, x, edge_attr, sched,
                    slot_space: bool = False, kill_edges: bool = False):
    """Run the wavefront pass for one direction.

    Returns h [num_layers, N+1, H] in node space, or — with
    slot_space=True — (hcat_flat [L*Kn, num_layers*H], x_slot [L*Kn, emb])
    in the level-sorted layout (layer l in columns l*H:(l+1)*H — exactly
    the per-layer concatenation readouts consume). Slot space avoids the
    node-space conversion whose backward is a [slots, H] scatter (measured
    ~2ms/step at TOK shapes); readouts that only need per-graph pooling
    run directly over slots.
    """
    params_dir, fxs, ixs, (L, kn, nf) = _build_streams(params_dir, cfg, x,
                                                       edge_attr, sched)
    if kill_edges:
        # reverse pass under ref_shared_agg_quirk: every aggregate is
        # exactly zero upstream; masking out all edges reproduces that
        # (masked sum -> 0, fully-masked max segment -> 0) and zeroes the
        # edge-gradient stream in the custom backward via tmask
        ixs["emask"] = jnp.zeros_like(ixs["emask"])
        if "tmask" in ixs:
            ixs["tmask"] = jnp.zeros_like(ixs["tmask"])
    h_flat = _wavefront((cfg, L, kn, nf), params_dir, fxs, ixs)
    packed = _fused_applicable(cfg)
    if slot_space:
        if not packed:
            # [nl, S+1, H] -> [S, nl*H] per-layer concat
            h_flat = jnp.concatenate(
                [h_flat[l, : L * kn, :] for l in range(cfg.num_layers)],
                axis=-1)
        else:
            h_flat = h_flat[: L * kn]
        return h_flat, fxs["x"].reshape(L * kn, -1)
    # back to node space for readouts / VAE index arithmetic
    node_slot = jnp.asarray(sched.node_slot)
    if packed:
        n_pad = sched.node_slot.shape[0] - 1
        nid_flat = jnp.asarray(sched.node_ids).reshape(L * kn)
        inv = jnp.concatenate(
            [nid_flat, jnp.full((1,), n_pad, nid_flat.dtype)])
        valid = jnp.concatenate(
            [nid_flat != n_pad, jnp.zeros((1,), bool)])
        hn = _perm_gather(h_flat, node_slot, inv, valid)  # [N+1, nl*H]
        n1 = hn.shape[0]
        return jnp.moveaxis(
            hn.reshape(n1, cfg.num_layers, cfg.hidden_dim), 1, 0)
    return h_flat[:, node_slot, :]


# ------------------- direction-merged wavefront (fused path, bidirectional)
#
# The two direction passes are independent given x (they only meet at the
# readout), yet the sequential-row LATENCY of the scan is paid per row per
# direction. When both schedules share padded shapes, the merged path runs
# ONE scan whose rows are the concat [fwd-block | rev-block]: one kernel
# dispatch, one predecessor gather, one state write per row covers both
# directions — halving the per-row fixed costs that dominate the wavefront
# (v5e profile: ~12.5us/row fwd + ~21us/row bwd of XLA glue at the TOK
# bench shape). Fused-kernel configs only (attn aggregators + GRU).


def merged_applicable(cfg: DAGNNConfig, batch: DAGBatch) -> bool:
    if not (cfg.bidirectional and _fused_applicable(cfg)):
        return False
    f, r = batch.fwd, batch.rev
    if f.node_ids.shape != r.node_ids.shape:
        return False
    if f.tgrad_eslot is None or r.tgrad_eslot is None:
        return False
    if f.edge_nsrc is not None or r.edge_nsrc is not None:
        # near/far-aware layout: per-direction edge widths may differ (the
        # kernel slices per-direction blocks by the static nf spec)
        return f.edge_src_slot.shape[0] == r.edge_src_slot.shape[0]
    return f.edge_src_slot.shape == r.edge_src_slot.shape


def _remap_slot(slot, unit, L, d):
    """Per-direction buffer index -> merged-buffer index.

    A per-direction buffer [L*unit + 1] (garbage row last) interleaves into
    the merged [L*2*unit + 1] as row*2*unit + d*unit + col."""
    g = L * unit
    row, col = slot // unit, slot % unit
    return jnp.where(slot == g, 2 * g, row * (2 * unit) + d * unit + col)


def _remap_slot_nf(slot, unit, units_total, offset, L):
    """General merged remap for UNEQUAL direction blocks: a per-direction
    buffer [L*unit + 1] interleaves into [L*units_total + 1] at row-block
    offset `offset` (= sum of earlier directions' units)."""
    g = L * unit
    row, col = slot // unit, slot % unit
    return jnp.where(slot == g, L * units_total,
                     row * units_total + offset + col)


def _build_streams_merged(params, cfg: DAGNNConfig, x, edge_attr, sf, sr):
    """Merged-direction streams: per-row concat of both schedules' blocks.

    eslot / teslot are remapped into the merged state / edge-grad buffers;
    edst and tdst stay BLOCK-LOCAL (the kernel processes each direction
    block with its own one-hot matrices and weights)."""
    L, kn = sf.node_ids.shape
    params2 = [{"aggr": params["aggr"][di], "cells": params["cells"][di]}
               for di in range(2)]
    if cfg.compute_dtype == "bfloat16":
        x = x.astype(jnp.bfloat16)
        params2 = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, params2)

    cat = lambda a, b: jnp.concatenate([jnp.asarray(a), jnp.asarray(b)],
                                       axis=1)
    node_ids = cat(sf.node_ids, sr.node_ids)              # [L, 2Kn]
    # NOTE: like the per-direction path, the x gather keeps the default
    # scatter-add VJP. An inverse-map (two-gather) custom VJP was re-A/B'd
    # at the merged shapes on v5e: 1.54M vs 1.60M edges/s — the barrier it
    # needs (to keep the bwd-scan ys from fusing into the pallas call)
    # still costs more than the 0.8ms scatter it replaces.
    fxs = {"x": x[node_ids]}
    if cfg.w_edge_attr and edge_attr is not None and cfg.num_rels > 1:
        eid = cat(sf.edge_id, sr.edge_id)
        fxs["ea"] = jnp.asarray(edge_attr)[eid].astype(x.dtype)
    ixs = {
        "lvl": jnp.arange(L, dtype=jnp.int32),
        "nmask": cat(sf.node_mask, sr.node_mask),
        "eslot": cat(_remap_slot(jnp.asarray(sf.edge_src_slot), kn, L, 0),
                     _remap_slot(jnp.asarray(sr.edge_src_slot), kn, L, 1)),
        "edst": cat(sf.edge_dst, sr.edge_dst),            # block-local
        "emask": cat(sf.edge_mask, sr.edge_mask),
    }
    nf = None
    if sf.edge_nsrc is not None or sr.edge_nsrc is not None:
        # NEAR/FAR-aware schedules (dag/schedule.py nearfar), possibly with
        # different modes per direction: "r" gathers far rows only (near
        # rows route in-kernel from the previous row's outputs); "t" keeps
        # the plain layout/gather but still rides near gradients on the
        # reverse-scan carry. Transpose flat slots index the per-direction
        # edge-grad buffer (units = far width for "r", full width else).
        entries, nsrc_parts, ev_parts = [], [], []
        for d, s in ((0, sf), (1, sr)):
            ke_d = s.edge_src_slot.shape[1]
            kf = s.far_w
            esv = jnp.asarray(s.edge_src_slot)
            if s.edge_nsrc is None:
                entries.append(("p", ke_d, ke_d))
                nsrc_parts.append(jnp.full((L, ke_d), kn, jnp.int32))
            elif kf is not None:
                entries.append(("r", ke_d, kf))
                nsrc_parts.append(jnp.asarray(s.edge_nsrc))
                esv = esv[:, :kf]
            else:
                entries.append(("t", ke_d, ke_d))
                nsrc_parts.append(jnp.asarray(s.edge_nsrc))
            ev_parts.append(_remap_slot(esv, kn, L, d))
        nf = tuple(entries)
        ixs["nsrc"] = cat(nsrc_parts[0], nsrc_parts[1])
        ixs["eslot_v"] = cat(ev_parts[0], ev_parts[1])
    ke = sf.edge_src_slot.shape[1]
    # Kt is sized per direction from actual transpose-row widths — pad both
    # to the common max (pad conventions per schedule.py: eslot -> garbage
    # L*Ke, dst -> Kn, mask -> 0)
    kt = max(sf.tgrad_eslot.shape[1], sr.tgrad_eslot.shape[1])

    def padt(a, fill):
        a = jnp.asarray(a)
        w = kt - a.shape[1]
        if w == 0:
            return a
        return jnp.pad(a, ((0, 0), (0, w)), constant_values=fill)

    if nf is not None:
        u_f = nf[0][2] if nf[0][0] == "r" else nf[0][1]
        u_r = nf[1][2] if nf[1][0] == "r" else nf[1][1]
        ixs["teslot"] = cat(
            _remap_slot_nf(padt(sf.tgrad_eslot, L * u_f), u_f, u_f + u_r,
                           0, L),
            _remap_slot_nf(padt(sr.tgrad_eslot, L * u_r), u_r, u_f + u_r,
                           u_f, L))
    else:
        ixs["teslot"] = cat(
            _remap_slot(padt(sf.tgrad_eslot, L * ke), ke, L, 0),
            _remap_slot(padt(sr.tgrad_eslot, L * ke), ke, L, 1))
    ixs["tdst"] = cat(padt(sf.tgrad_dst, kn), padt(sr.tgrad_dst, kn))
    ixs["tmask"] = cat(padt(sf.tgrad_mask, False), padt(sr.tgrad_mask, False))
    return params2, fxs, ixs, (L, 2 * kn, nf)


def _mweights(cfg: DAGNNConfig, params2, has_ea):
    from dagnn_tpu.ops.pallas.row_step import (flatten_row_weights,
                                               stack_row_weights)
    qdims = [cfg.aggregator_spec(l).query_dim for l in range(cfg.num_layers)]
    return stack_row_weights([
        flatten_row_weights(p["aggr"], p["cells"], qdims, has_ea)
        for p in params2])


def _mfwd_step(static, params2, with_vals: bool = False):
    """One merged scan step: both direction blocks in one fused kernel."""
    cfg, L, kn2, nf = static

    def step(h, xs):
        from dagnn_tpu.ops.pallas.row_step import fused_row_forward
        fxs, ixs = xs
        offset = ixs["lvl"] * kn2
        st = _fused_static(cfg, fxs)
        kw = dict(emit_res=with_vals, ndirs=2)
        if nf is None:
            vals = h[ixs["eslot"]]                        # [2Ke, nl*H]
        else:
            # NEAR/FAR: "r" blocks gather only the far predecessor rows;
            # the kernel routes their near rows from the previous row's
            # output block (a contiguous slice of h — row 0 has no near
            # edges, so the clamped slice at lvl 0 is never read through
            # the one-hot)
            vals = h[ixs["eslot_v"]]
            kw.update(nf=nf)
            if any(e[0] == "r" for e in nf):
                prev = jax.lax.dynamic_slice(
                    h, (jnp.maximum(offset - kn2, 0), 0),
                    (kn2, h.shape[1]))
                kw.update(nsrc=ixs["nsrc"], prev_out=prev)
        out = fused_row_forward(
            st, jax.default_backend() != "tpu",
            fxs["x"], vals, fxs.get("ea") if st[0] else None,
            ixs["edst"], ixs["emask"], ixs["nmask"],
            _mweights(cfg, params2, st[0]), **kw)
        if with_vals:
            outs, *res = out
            h = jax.lax.dynamic_update_slice(h, outs, (offset, 0))
            return h, (vals, tuple(res))
        h = jax.lax.dynamic_update_slice(h, out, (offset, 0))
        return h, None

    return step


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mwavefront(static, params2, fxs, ixs):
    cfg, L, kn2, nf = static
    h0 = jnp.zeros((L * kn2 + 1, cfg.num_layers * cfg.hidden_dim),
                   fxs["x"].dtype)
    h, _ = jax.lax.scan(_mfwd_step(static, params2), h0, (fxs, ixs),
                        unroll=_SCAN_UNROLL)
    return h


def _mwavefront_fwd(static, params2, fxs, ixs):
    cfg, L, kn2, nf = static
    if _NO_RES_STREAM:
        h = _mwavefront(static, params2, fxs, ixs)
        return h, (params2, fxs, ixs, h)
    h0 = jnp.zeros((L * kn2 + 1, cfg.num_layers * cfg.hidden_dim),
                   fxs["x"].dtype)
    h, (vals_s, res_s) = jax.lax.scan(
        _mfwd_step(static, params2, with_vals=True), h0, (fxs, ixs),
        unroll=_SCAN_UNROLL)
    # near/far backward additionally needs h (the previous row's output
    # block rebuilds the near vals rows in-kernel)
    return h, (params2, fxs, ixs, (h, vals_s, res_s) if nf is not None
               else (vals_s, res_s))


def _mwavefront_bwd(static, res, g):
    """Merged transpose-schedule backward (mirror of _wavefront_bwd_fused
    with direction-concatenated rows and stacked weight grads)."""
    from dagnn_tpu.ops.pallas.row_step import (
        fused_row_backward, unflatten_row_weight_grads, _names as _row_names)
    cfg, L, kn2, nf = static
    params2, fxs, ixs, res4 = res
    h_all = None
    if _NO_RES_STREAM:
        h_final = res4
        vals_s = res_s = None
    elif nf is not None:
        h_all, vals_s, res_s = res4
    else:
        vals_s, res_s = res4
    st = _fused_static(cfg, fxs)
    has_ea = st[0]
    weights = _mweights(cfg, params2, has_ea)
    interp = jax.default_backend() != "tpu"
    ke2 = ixs["eslot"].shape[1]
    # near/far: per-direction edge-grad buffer units (far-only for "r")
    acc_unit = (sum(kf if m == "r" else kd for m, kd, kf in nf)
                if nf is not None else ke2)
    lh = cfg.num_layers * cfg.hidden_dim

    def bwd_step(carry, xs):
        if nf is not None:
            acc, dw_acc, near_g = carry
        else:
            acc, dw_acc = carry
            near_g = None
        if _NO_RES_STREAM:
            fxs_l, ixs_l, g_out = xs
            vals = jax.lax.optimization_barrier(h_final[ixs_l["eslot"]])
            res_l = None
        else:
            fxs_l, ixs_l, g_out, vals, res_l = xs
        lvl = ixs_l["lvl"]
        # two half-width gathers measurably beat one [2Kt,lh] gather from
        # the merged edge-grad buffer on v5e (1.240M vs 1.224M edges/s e2e)
        kt2 = ixs_l["teslot"].shape[0] // 2
        tg = jnp.concatenate([acc[ixs_l["teslot"][:kt2]],
                              acc[ixs_l["teslot"][kt2:]]])
        tg = jax.lax.optimization_barrier(tg)
        kw = dict(res=res_l, ndirs=2)
        if nf is not None:
            kw.update(nf=nf, nsrc=ixs_l["nsrc"], near_g=near_g)
            if res_l is not None and any(e[0] == "r" for e in nf):
                kw.update(prev_out=jax.lax.dynamic_slice(
                    h_all, (jnp.maximum((lvl - 1) * kn2, 0), 0),
                    (kn2, h_all.shape[1])))
        out = fused_row_backward(
            st, interp, fxs_l["x"], vals,
            fxs_l.get("ea") if has_ea else None,
            ixs_l["edst"], ixs_l["emask"], ixs_l["nmask"], weights,
            g_out, tg, ixs_l["tdst"], ixs_l["tmask"], **kw)
        if nf is not None:
            dx, dvals, dea, dw, near_g = out
        else:
            dx, dvals, dea, dw = out
        dvals = jax.lax.optimization_barrier(dvals)
        acc = jax.lax.dynamic_update_slice(acc, dvals, (lvl * acc_unit, 0))
        dw_acc = jax.tree.map(jnp.add, dw_acc, dw)
        dfl = {"x": dx}
        if "ea" in fxs_l:
            dfl["ea"] = (dea if dea is not None
                         else jnp.zeros_like(fxs_l["ea"]))
        if nf is not None:
            return (acc, dw_acc, near_g), dfl
        return (acc, dw_acc), dfl

    acc0 = jnp.zeros((L * acc_unit + 1, lh), g.dtype)
    g_stream = g[: L * kn2].reshape(L, kn2, lh)
    dw0 = {n: jnp.zeros_like(weights[n])
           for n in _row_names(cfg.num_layers, has_ea)}
    carry0 = ((acc0, dw0, jnp.zeros((kn2, lh), g.dtype))
              if nf is not None else (acc0, dw0))
    bxs = ((fxs, ixs, g_stream) if _NO_RES_STREAM
           else (fxs, ixs, g_stream, vals_s, res_s))
    (carry_out), d_fxs = jax.lax.scan(
        bwd_step, carry0, bxs,
        reverse=True, unroll=_SCAN_UNROLL)
    dw_total = carry_out[1]
    d_params2 = [
        unflatten_row_weight_grads({k: v[di] for k, v in dw_total.items()},
                                   cfg.num_layers, has_ea)
        for di in range(2)
    ]
    d_ixs = jax.tree.map(lambda a: np.zeros(a.shape, jax.dtypes.float0), ixs)
    return d_params2, d_fxs, d_ixs


_mwavefront.defvjp(_mwavefront_fwd, _mwavefront_bwd)


# ------------------------- pair-scheduled wavefront (two rows per step)
#
# Halves the scan-step count of the merged wavefront: one kernel call
# executes rows 2p and 2p+1 with intra-pair edges routed in-kernel (see
# dag/pair.py and ops/pallas/pair_step.py). Every per-step glue op the
# profile blames (gather / DUS / transpose-grad gather / edge-grad DUS,
# each latency-bound at 25-30% HBM peak) is issued half as often at twice
# the size. State-buffer layout is IDENTICAL to the merged path, so the
# readouts are unchanged.


def pair_applicable(cfg: DAGNNConfig, batch: DAGBatch) -> bool:
    return (getattr(batch, "pair", None) is not None
            and not _NO_RES_STREAM
            and cfg.bidirectional and _fused_applicable(cfg)
            and batch.fwd.node_ids.shape == batch.rev.node_ids.shape)


def _build_streams_pair(params, cfg: DAGNNConfig, x, edge_attr, batch):
    plan = batch.pair
    L, kn = batch.fwd.node_ids.shape
    P = plan.node_ids.shape[0]      # .shape only: leaves may be tracers
    params2 = [{"aggr": params["aggr"][di], "cells": params["cells"][di]}
               for di in range(2)]
    if cfg.compute_dtype == "bfloat16":
        x = x.astype(jnp.bfloat16)
        params2 = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, params2)
    fxs = {"x": x[jnp.asarray(plan.node_ids)]}
    if cfg.w_edge_attr and edge_attr is not None and cfg.num_rels > 1:
        fxs["ea"] = jnp.asarray(edge_attr)[jnp.asarray(plan.eid)].astype(
            x.dtype)
    ixs = {
        "lvl": jnp.arange(P, dtype=jnp.int32),
        "nmask": jnp.asarray(plan.node_mask),
        "eslot": jnp.asarray(plan.eslot_v),
        "edst": jnp.asarray(plan.edst),
        "emask": jnp.asarray(plan.emask),
        "nsrc": jnp.asarray(plan.nsrc),
        "teslot": jnp.asarray(plan.teslot),
        "tdst": jnp.asarray(plan.tdst),
        "tmask": jnp.asarray(plan.tmask),
    }
    blocks = plan.blocks
    U = plan.acc_unit
    return params2, fxs, ixs, (P, kn, blocks, U)


def _pfwd_step(static, params2, with_vals: bool = False):
    cfg, P, kn, blocks, U = static

    def step(h, xs):
        from dagnn_tpu.ops.pallas.pair_step import fused_pair_forward
        fxs, ixs = xs
        offset = ixs["lvl"] * (4 * kn)
        st = _fused_static(cfg, fxs)
        vals = h[ixs["eslot"]]
        out = fused_pair_forward(
            st, jax.default_backend() != "tpu",
            fxs["x"], vals, fxs.get("ea") if st[0] else None,
            ixs["edst"], ixs["emask"], ixs["nmask"], ixs["nsrc"],
            _mweights(cfg, params2, st[0]), blocks,
            emit_res=with_vals)
        if with_vals:
            outs, *res = out
            h = jax.lax.dynamic_update_slice(h, outs, (offset, 0))
            return h, (vals, tuple(res))
        h = jax.lax.dynamic_update_slice(h, out, (offset, 0))
        return h, None

    return step


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pwavefront(static, params2, fxs, ixs):
    cfg, P, kn, blocks, U = static
    h0 = jnp.zeros((P * 4 * kn + 1, cfg.num_layers * cfg.hidden_dim),
                   fxs["x"].dtype)
    h, _ = jax.lax.scan(_pfwd_step(static, params2), h0, (fxs, ixs),
                        unroll=_SCAN_UNROLL)
    return h


def _pwavefront_fwd(static, params2, fxs, ixs):
    cfg, P, kn, blocks, U = static
    h0 = jnp.zeros((P * 4 * kn + 1, cfg.num_layers * cfg.hidden_dim),
                   fxs["x"].dtype)
    h, (vals_s, res_s) = jax.lax.scan(
        _pfwd_step(static, params2, with_vals=True), h0, (fxs, ixs),
        unroll=_SCAN_UNROLL)
    return h, (params2, fxs, ixs, vals_s, res_s)


def _pwavefront_bwd(static, res, g):
    from dagnn_tpu.ops.pallas.pair_step import fused_pair_backward
    from dagnn_tpu.ops.pallas.row_step import (
        unflatten_row_weight_grads, _names as _row_names)
    cfg, P, kn, blocks, U = static
    params2, fxs, ixs, vals_s, res_s = res
    st_sample = _fused_static(cfg, fxs)
    has_ea = st_sample[0]
    weights = _mweights(cfg, params2, has_ea)
    interp = jax.default_backend() != "tpu"
    lh = cfg.num_layers * cfg.hidden_dim

    def bwd_step(carry, xs):
        acc, dw_acc = carry
        fxs_l, ixs_l, g_out, vals, res_l = xs
        lvl = ixs_l["lvl"]
        if os.environ.get("DAGNN_PAIR_TG_SPLIT"):
            # A/B knob: two half gathers from the edge-grad buffer (the
            # per-row merged path measured split > single on v5e)
            kt2 = ixs_l["teslot"].shape[0] // 2
            tg = jnp.concatenate([acc[ixs_l["teslot"][:kt2]],
                                  acc[ixs_l["teslot"][kt2:]]])
            tg = jax.lax.optimization_barrier(tg)
        else:
            tg = jax.lax.optimization_barrier(acc[ixs_l["teslot"]])
        dx, dvals, dea, dw = fused_pair_backward(
            st_sample, interp, fxs_l["x"], vals,
            fxs_l.get("ea") if has_ea else None,
            ixs_l["edst"], ixs_l["emask"], ixs_l["nmask"], ixs_l["nsrc"],
            weights, g_out, tg, ixs_l["tdst"], ixs_l["tmask"], res_l,
            blocks)
        dvals = jax.lax.optimization_barrier(dvals)
        acc = jax.lax.dynamic_update_slice(acc, dvals, (lvl * U, 0))
        dw_acc = jax.tree.map(jnp.add, dw_acc, dw)
        dfl = {"x": dx}
        if "ea" in fxs_l:
            dfl["ea"] = (dea if dea is not None
                         else jnp.zeros_like(fxs_l["ea"]))
        return (acc, dw_acc), dfl

    acc0 = jnp.zeros((P * U + 1, lh), g.dtype)
    g_stream = g[: P * 4 * kn].reshape(P, 4 * kn, lh)
    dw0 = {n: jnp.zeros_like(weights[n])
           for n in _row_names(cfg.num_layers, has_ea)}
    (_, dw_total), d_fxs = jax.lax.scan(
        bwd_step, (acc0, dw0), (fxs, ixs, g_stream, vals_s, res_s),
        reverse=True, unroll=_SCAN_UNROLL)
    d_params2 = [
        unflatten_row_weight_grads({k: v[di] for k, v in dw_total.items()},
                                   cfg.num_layers, has_ea)
        for di in range(2)
    ]
    d_ixs = jax.tree.map(lambda a: np.zeros(a.shape, jax.dtypes.float0), ixs)
    return d_params2, d_fxs, d_ixs


_pwavefront.defvjp(_pwavefront_fwd, _pwavefront_bwd)


def pair_pass(params, cfg: DAGNNConfig, x, edge_attr, batch: DAGBatch):
    """Both directions, two wavefront rows per scan step. Same return
    layout as merged_pass (state buffer rows are untouched by pairing)."""
    params2, fxs, ixs, (P, kn, blocks, U) = _build_streams_pair(
        params, cfg, x, edge_attr, batch)
    h = _pwavefront((cfg, P, kn, blocks, U), params2, fxs, ixs)
    return h[: P * 4 * kn], fxs["x"].reshape(P * 4 * kn, -1)


def merged_pass(params, cfg: DAGNNConfig, x, edge_attr, batch: DAGBatch):
    """Both direction passes in one scan. Returns (h_flat [L*2Kn, nl*H],
    x_flat [L*2Kn, emb]) in the MERGED level-sorted layout: row r holds
    the fwd block at rows r*2Kn..r*2Kn+Kn and the rev block after it."""
    params2, fxs, ixs, (L, kn2, nf) = _build_streams_merged(
        params, cfg, x, edge_attr, batch.fwd, batch.rev)
    h = _mwavefront((cfg, L, kn2, nf), params2, fxs, ixs)
    return h[: L * kn2], fxs["x"].reshape(L * kn2, -1)


def dagnn_node_states(params, cfg: DAGNNConfig, batch: DAGBatch):
    """Run encoder + both direction passes; return (x, h_dirs) where
    h_dirs[d] is [num_layers, N+1, H]. The seam the VAE encoder builds its
    own readout on (reference dvae/dagnn.py:147-170 readouts differ from the
    canonical ones)."""
    x = encode(params["encoder"], cfg.encoder, batch.x,
               batch.extras.get("node_depth"))
    # keep the garbage row exactly zero so pad gathers are inert
    x = jnp.where(batch.node_mask[:, None], x, 0)

    h_dirs = []
    for di, d in enumerate(cfg.dirs):
        pdir = {"aggr": params["aggr"][di], "cells": params["cells"][di]}
        sched = batch.fwd if d == 0 else batch.rev
        h_dirs.append(_direction_pass(
            pdir, cfg, x, batch.edge_attr, sched,
            kill_edges=(d == 1 and cfg.reverse_agg_noop)))
    return x, h_dirs


def _pool_gathered(hsel, mask, kind, attn_params=None):
    """Pool pre-gathered per-graph node states [G, Om, D] with mask [G, Om].

    Same semantics as readout.pool_nodes (ops/segment.py empty-segment and
    attn-compat rules) but over a dense per-graph axis — no segment scatter.
    """
    m = mask[..., None]
    if kind in (P_ADD, P_SUM):
        return jnp.sum(jnp.where(m, hsel, 0), axis=1)
    if kind == P_MEAN:
        s = jnp.sum(jnp.where(m, hsel, 0), axis=1)
        cnt = jnp.sum(mask, axis=1).astype(hsel.dtype)
        return s / jnp.maximum(cnt, 1.0)[:, None]
    if kind == P_MAX:
        neg = jnp.finfo(hsel.dtype).min
        out = jnp.max(jnp.where(m, hsel, neg), axis=1)
        return jnp.where(out <= neg, 0, out)
    if kind == P_ATTN:
        # reference dagnn.py:114-117 softmaxes a length-1 axis -> weights
        # identically 1.0, i.e. add pool (see readout.pool_nodes attn_compat)
        return jnp.sum(jnp.where(m, hsel, 0), axis=1)
    raise ValueError(f"unknown pool kind {kind}")


def dagnn_forward(
    params,
    cfg: DAGNNConfig,
    batch: DAGBatch,
    rng: Optional[jax.Array] = None,
    train: bool = False,
):
    """Full forward pass. Returns per-position token logits [G, S, V],
    class logits [G, C], or regression [G, 1] per config (dagnn.py:209-215).
    """
    num_graphs = batch.num_graph_slots
    pool_kw = dict(
        kind=cfg.out_pool,
        attn_params=params.get("pool_attn"),
    )

    if not cfg.out_pool_all:
        # SLOT-SPACE readout fast path: final-node pooling is per direction,
        # so each direction pools straight from its level-sorted buffer —
        # no node-space conversion (scatter-free backward). Semantics equal
        # to the node-space branches below (dagnn.py:184-193).
        x = encode(params["encoder"], cfg.encoder, batch.x,
                   batch.extras.get("node_depth"))
        x = jnp.where(batch.node_mask[:, None], x, 0)
        merged = merged_applicable(cfg, batch)
        if merged and pair_applicable(cfg, batch):
            h2, x2 = pair_pass(params, cfg, x, batch.edge_attr, batch)
        elif merged:
            h2, x2 = merged_pass(params, cfg, x, batch.edge_attr, batch)
        parts = []
        for di, d in enumerate(cfg.dirs):
            sched = batch.fwd if d == 0 else batch.rev
            L, kn = sched.node_ids.shape
            if merged:
                oslots = (batch.out_slots_fwd if d == 0
                          else batch.out_slots_rev)
                if oslots is not None:
                    # gather this direction's output rows straight from the
                    # merged buffer — only the slot ids need remapping
                    ms = _remap_slot(jnp.asarray(oslots), kn, L, di)
                    hcat = h2[ms]
                    if cfg.out_wx:
                        hcat = jnp.concatenate([x2[ms], hcat], axis=-1)
                    omask2 = (batch.out_slots_mask_fwd if d == 0
                              else batch.out_slots_mask_rev)
                    parts.append(_pool_gathered(
                        hcat, jnp.asarray(omask2), cfg.out_pool,
                        params.get("pool_attn")))
                    continue
                # per-direction view of the merged buffer for segment pools
                hcat = h2.reshape(L, 2, kn, -1)[:, di].reshape(L * kn, -1)
                x_slot = x2.reshape(L, 2, kn, -1)[:, di].reshape(L * kn, -1)
            else:
                pdir = {"aggr": params["aggr"][di],
                        "cells": params["cells"][di]}
                hcat, x_slot = _direction_pass(
                    pdir, cfg, x, batch.edge_attr, sched, slot_space=True,
                    kill_edges=(d == 1 and cfg.reverse_agg_noop))
            if cfg.out_wx:
                hcat = jnp.concatenate([x_slot, hcat], axis=-1)
            oslots = (batch.out_slots_fwd if d == 0 else batch.out_slots_rev)
            if oslots is not None:
                # host-precomputed output-node slots [G, Om]: gather the few
                # output rows per graph and pool densely — a per-graph
                # segment-max over ALL 40k+ slots costs ~850us on v5e, this
                # costs ~20us (gather of G*Om rows + a [G, Om, D] reduce)
                omask2 = (batch.out_slots_mask_fwd if d == 0
                          else batch.out_slots_mask_rev)
                # pad entries point at slot 0 and are killed by the mask
                hsel = hcat[jnp.asarray(oslots)]
                parts.append(_pool_gathered(
                    hsel, jnp.asarray(omask2), cfg.out_pool,
                    params.get("pool_attn")))
                continue
            nid = jnp.asarray(sched.node_ids).reshape(L * kn)
            slot_gid = batch.graph_id[nid]          # pad slots -> segment G
            omask = batch.out_mask_fwd if d == 0 else batch.out_mask_rev
            slot_mask = (omask & batch.node_mask)[nid]
            parts.append(pool_nodes(hcat, slot_gid, num_graphs,
                                    mask=slot_mask, **pool_kw))
        out = jnp.concatenate(parts, axis=-1)
        return _apply_head(params, cfg, out, rng, train)

    # node-space path: only out_pool_all configs reach here (every
    # `not out_pool_all` config returned from the slot-space branch above,
    # including the bidirectional per-direction readout)
    x, h_dirs = dagnn_node_states(params, cfg, batch)
    layers = [h_dirs[di][l] for di in range(len(cfg.dirs))
              for l in range(cfg.num_layers)]
    hcat = jnp.concatenate(([x] if cfg.out_wx else []) + layers, axis=-1)
    out = pool_nodes(hcat, batch.graph_id, num_graphs,
                     mask=batch.node_mask, **pool_kw)
    return _apply_head(params, cfg, out, rng, train)


def _apply_head(params, cfg: DAGNNConfig, out, rng, train):
    if train and cfg.dropout > 0.0:
        keep = 1.0 - cfg.dropout
        out = out * jax.random.bernoulli(rng, keep, out.shape) / keep

    head = params["head"]
    if cfg.num_class > 0:
        return linear(head, out)
    if cfg.num_vocab == 1:
        return jax.nn.relu(linear(head, out))
    # [G, D] x [S, V, D] -> [G, S, V]
    return jnp.einsum("gd,svd->gsv", out, head["w"]) + head["b"][None]
