"""Pair plans: two consecutive wavefront rows fused into one scan step.

The merged wavefront scan (nn/dagnn.py merged_pass) pays a fixed set of
XLA glue ops per scan row — predecessor gather, state-buffer DUS, the
backward's transpose-gradient gathers and edge-grad DUS — and on v5e
those ops run at 25-30%% of HBM peak (latency/overhead-bound per op, see
results/profile_r4/SUMMARY.md). A PAIR step executes rows 2p and 2p+1 in
ONE kernel dispatch with ONE gather / ONE DUS of twice the size, halving
the per-op fixed costs without changing any numerics.

The catch: edges from row 2p into row 2p+1 ("intra-pair" edges — the
majority of edges are distance-1 under the critical-path packer,
dag/schedule.py pack_rows) cannot be gathered from the state buffer,
because row 2p's outputs are not written yet when the pair step starts.
They are routed IN-KERNEL instead: the pair kernel computes row 2p first,
keeps its outputs in VMEM, and rebuilds row 2p+1's intra-pair predecessor
rows from them by a one-hot MXU matmul (ops/pallas/pair_step.py). On the
backward, the intra-pair edge gradients flow straight into row 2p's
output cotangent inside the same kernel — no edge-grad buffer round trip
and no cross-step carry (the losses that sank the per-row near/far
"regions" mode, see PLAN.md round-5 stint 1).

This module builds the host-side plan: given the two plain per-direction
LevelSchedules of a batch (equal padded shapes, max_levels EVEN), it
emits the merged pair-step arrays. Block layout per pair step, along
every per-edge axis (A = even row 2p, B = odd row 2p+1, digits are
directions):

  edges   [A0 | A1 | B0 | B1]    B blocks are region-padded: far (i.e.
                                 gatherable) edges in [0, KfB), intra-pair
                                 edges in [KfB, KeB)
  vals    [A0 | A1 | Bf0 | Bf1]  state-buffer gather covers A fully and
                                 only B's far region (width U, also the
                                 per-pair unit of the edge-grad buffer)
  nodes   [a0 | a1 | b0 | b1]    = rows 2p, 2p+1 of the merged layout —
                                 exactly the [4Kn] slice the pair DUS
                                 writes, so the state buffer layout (and
                                 every readout built on it) is unchanged
  tgrads  [tA0 | tA1 | tB0 | tB1] transpose edges grouped by the SOURCE
                                 subrow/direction; intra-pair edges are
                                 excluded (handled in-kernel)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from dagnn_tpu.dag.schedule import LevelSchedule


class PairPlan(NamedTuple):
    """Merged pair-step arrays (all [P, ...], P = max_levels // 2).

    Static block widths are encoded in ``bshape``: a TUPLE of ten
    zero-size [w, 0] arrays (the established far_width trick,
    schedule.py:83-86 — shape-encoded statics survive
    jax.tree.map(jnp.asarray, ...) and jit tracing), in the order
    (KeA0, KeA1, KeB0, KeB1, KfB0, KfB1, KtA0, KtA1, KtB0, KtB1).
    """

    edst: np.ndarray     # [P, W] int32 block-local target slot, pad = Kn
    emask: np.ndarray    # [P, W] bool
    eid: np.ndarray      # [P, W] int32 original edge id (edge_attr gather)
    nsrc: np.ndarray     # [P, W] int32 intra-pair source slot in row 2p's
    #                      direction block ([0, Kn)); far/pad = Kn
    eslot_v: np.ndarray  # [P, U] int32 merged state-buffer gather slots
    #                      (garbage = L * 2Kn)
    teslot: np.ndarray   # [P, T] int32 flat edge-grad buffer slot
    #                      (pair * U + offset; garbage = P * U)
    tdst: np.ndarray     # [P, T] int32 block-local source slot, pad = Kn
    tmask: np.ndarray    # [P, T] bool
    node_ids: np.ndarray  # [P, 4Kn] int32 (x gather; = merged rows 2p,2p+1)
    node_mask: np.ndarray  # [P, 4Kn] bool
    bshape: tuple        # zero-size static-width sentinels (see class doc)

    @property
    def widths(self):
        # .shape only — the plan's leaves may be jit tracers
        s = tuple(int(a.shape[0]) for a in self.bshape)
        return dict(keA=s[0:2], keB=s[2:4], kfB=s[4:6], ktA=s[6:8],
                    ktB=s[8:10])

    @property
    def blocks(self):
        """Kernel block spec: ((mode, dir, ke, kv, kt), ...) in the fixed
        [A0, A1, B0, B1] order. mode "p" = plain (fully gathered), "q" =
        pair (far gathered + intra-pair routed from the same-direction A
        block's in-kernel outputs)."""
        w = self.widths
        return (("p", 0, w["keA"][0], w["keA"][0], w["ktA"][0]),
                ("p", 1, w["keA"][1], w["keA"][1], w["ktA"][1]),
                ("q", 0, w["keB"][0], w["kfB"][0], w["ktB"][0]),
                ("q", 1, w["keB"][1], w["kfB"][1], w["ktB"][1]))

    @property
    def acc_unit(self) -> int:
        """Per-pair width of the vals gather / edge-grad buffer."""
        w = self.widths
        return w["keA"][0] + w["keA"][1] + w["kfB"][0] + w["kfB"][1]


def _pad_of(arr, mask, fallback):
    m = ~np.asarray(mask).ravel()
    return int(np.asarray(arr).ravel()[m][0]) if m.any() else fallback


def build_pair_plan(sf: LevelSchedule, sr: LevelSchedule) -> PairPlan:
    """Build the merged pair plan from the two plain direction schedules.

    Requires: equal node shapes, EVEN max_levels, transpose schedules
    present, plain (non-near/far) edge layouts.
    """
    if sf.node_ids.shape != sr.node_ids.shape:
        raise ValueError("pair plan needs equal per-direction node shapes")
    L, Kn = sf.node_ids.shape
    if L % 2:
        raise ValueError(f"pair plan needs even max_levels, got {L}")
    if sf.edge_nsrc is not None or sr.edge_nsrc is not None:
        raise ValueError("pair plan starts from PLAIN schedules")
    if sf.tgrad_eslot is None or sr.tgrad_eslot is None:
        raise ValueError("pair plan needs transpose schedules")
    P = L // 2
    scheds = (sf, sr)

    # ---- per-direction classification + B-row re-layout -----------------
    per = []
    for d, s in enumerate(scheds):
        Ke = s.edge_src_slot.shape[1]
        em = np.asarray(s.edge_mask)
        eslot = np.asarray(s.edge_src_slot, np.int64)      # garbage L*Kn
        srow = eslot // Kn                                  # garbage -> L
        spos = eslot % Kn
        rows = np.arange(L)[:, None]
        near = em & (rows % 2 == 1) & (srow == rows - 1)

        bm, bnear = em[1::2], near[1::2]
        bfar = bm & ~bnear
        KfB = int(bfar.sum(1).max(initial=0))
        KnB = int(bnear.sum(1).max(initial=0))
        KeB = KfB + KnB
        far_rank = np.cumsum(bfar, axis=1) - 1
        near_rank = np.cumsum(bnear, axis=1) - 1
        newcol = np.where(bfar, far_rank, KfB + near_rank)  # valid where bm

        e_pad = _pad_of(s.edge_id, em, 0)
        # merged state-buffer slots (same remap as _build_streams_merged)
        g_per, g_merged = L * Kn, L * 2 * Kn
        mslot = np.where(eslot == g_per, g_merged,
                         srow * (2 * Kn) + d * Kn + spos)

        b_edst = np.full((P, KeB), Kn, np.int32)
        b_eid = np.full((P, KeB), e_pad, np.int32)
        b_emask = np.zeros((P, KeB), bool)
        b_nsrc = np.full((P, KeB), Kn, np.int32)
        b_far_slot = np.full((P, KfB), g_merged, np.int32)
        pi, ci = np.nonzero(bm)
        nc = newcol[pi, ci]
        b_edst[pi, nc] = np.asarray(s.edge_dst)[1::2][pi, ci]
        b_eid[pi, nc] = np.asarray(s.edge_id)[1::2][pi, ci]
        b_emask[pi, nc] = True
        fi = bfar[pi, ci]
        b_far_slot[pi[fi], nc[fi]] = mslot[1::2][pi[fi], ci[fi]]
        ni = bnear[pi, ci]
        b_nsrc[pi[ni], nc[ni]] = spos[1::2][pi[ni], ci[ni]]

        per.append(dict(
            Ke=Ke, KfB=KfB, KeB=KeB, e_pad=e_pad,
            a_edst=np.asarray(s.edge_dst)[0::2].astype(np.int32),
            a_eid=np.asarray(s.edge_id)[0::2].astype(np.int32),
            a_emask=em[0::2],
            a_slot=mslot[0::2].astype(np.int32),
            b_edst=b_edst, b_eid=b_eid, b_emask=b_emask, b_nsrc=b_nsrc,
            b_far_slot=b_far_slot,
            em=em, near=near, srow=srow, spos=spos, newcol=newcol,
        ))

    keA = (per[0]["Ke"], per[1]["Ke"])
    kfB = (per[0]["KfB"], per[1]["KfB"])
    keB = (per[0]["KeB"], per[1]["KeB"])
    U = keA[0] + keA[1] + kfB[0] + kfB[1]
    # vals-axis block offsets [A0 | A1 | Bf0 | Bf1]
    offA = (0, keA[0])
    offF = (keA[0] + keA[1], keA[0] + keA[1] + kfB[0])

    # ---- transpose schedule over the pair edge-grad buffer --------------
    # every real non-intra-pair edge, keyed by SOURCE (pair, subrow, dir)
    tg_entries = {(sub, d): [] for sub in (0, 1) for d in (0, 1)}
    for d, s in enumerate(scheds):
        p = per[d]
        em, near, srow, spos = p["em"], p["near"], p["srow"], p["spos"]
        sel = em & ~near
        r, c = np.nonzero(sel)
        pair_t = r // 2
        # buffer slot of the edge itself (by TARGET row's pair layout)
        is_b = (r % 2) == 1
        col_new = np.where(is_b, p["newcol"][r // 2, c], c)
        off = np.where(is_b, offF[d], offA[d])
        flat = pair_t * U + off + col_new
        # drop B intra... already excluded; B far cols < KfB by construction
        sp_pair, sp_sub = srow[r, c] // 2, srow[r, c] % 2
        for sub in (0, 1):
            m = sp_sub == sub
            tg_entries[(sub, d)].append(
                np.stack([sp_pair[m], flat[m], spos[r, c][m]], axis=0))

    kt = {}
    tg_cols = {}
    for key, parts in tg_entries.items():
        e = (np.concatenate(parts, axis=1) if parts
             else np.zeros((3, 0), np.int64))
        order = np.lexsort((e[1], e[2], e[0]))
        e = e[:, order]
        cnt = np.bincount(e[0], minlength=P) if e.shape[1] else np.zeros(P, np.int64)
        kt[key] = int(cnt.max(initial=0))
        starts = np.zeros(P + 1, np.int64)
        np.cumsum(cnt, out=starts[1:])
        rank = np.arange(e.shape[1]) - starts[e[0]]
        tg_cols[key] = (e, rank)

    ktA = (kt[(0, 0)], kt[(0, 1)])
    ktB = (kt[(1, 0)], kt[(1, 1)])
    T = ktA[0] + ktA[1] + ktB[0] + ktB[1]
    teslot = np.full((P, T), P * U, np.int32)
    tdst = np.full((P, T), Kn, np.int32)
    tmask = np.zeros((P, T), bool)
    toff = 0
    for key in ((0, 0), (0, 1), (1, 0), (1, 1)):
        e, rank = tg_cols[key]
        if e.shape[1]:
            teslot[e[0], toff + rank] = e[1]
            tdst[e[0], toff + rank] = e[2]
            tmask[e[0], toff + rank] = True
        toff += kt[key]

    # ---- assemble merged [P, ...] arrays ---------------------------------
    cat = lambda arrs: np.concatenate(arrs, axis=1)
    edst = cat([per[0]["a_edst"], per[1]["a_edst"],
                per[0]["b_edst"], per[1]["b_edst"]])
    emask = cat([per[0]["a_emask"], per[1]["a_emask"],
                 per[0]["b_emask"], per[1]["b_emask"]])
    eid = cat([per[0]["a_eid"], per[1]["a_eid"],
               per[0]["b_eid"], per[1]["b_eid"]])
    nsrc = cat([np.full((P, keA[0]), Kn, np.int32),
                np.full((P, keA[1]), Kn, np.int32),
                per[0]["b_nsrc"], per[1]["b_nsrc"]])
    eslot_v = cat([per[0]["a_slot"], per[1]["a_slot"],
                   per[0]["b_far_slot"], per[1]["b_far_slot"]])

    node_ids = cat([np.asarray(sf.node_ids), np.asarray(sr.node_ids)])
    node_ids = node_ids.reshape(P, 4 * Kn).astype(np.int32)
    node_mask = cat([np.asarray(sf.node_mask), np.asarray(sr.node_mask)])
    node_mask = node_mask.reshape(P, 4 * Kn)

    bshape = tuple(np.zeros((k, 0), bool)
                   for k in keA + keB + kfB + ktA + ktB)
    return PairPlan(edst=edst.astype(np.int32), emask=emask,
                    eid=eid.astype(np.int32), nsrc=nsrc.astype(np.int32),
                    eslot_v=eslot_v.astype(np.int32),
                    teslot=teslot, tdst=tdst, tmask=tmask,
                    node_ids=node_ids, node_mask=node_mask, bshape=bshape)
