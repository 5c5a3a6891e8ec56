"""Fused Pallas step kernel + driver for the two-level cluster hierarchy.

The XLA formulation of one traversal step (``hierarchy._one_step``) is ~20
separate ops whose (M, SUP)/(M, LEAF) intermediates round-trip HBM; at the
8K-lane compaction front each round measured ~1 ms against ~0.1 ms of
arithmetic content, and growing the front past 16K lanes made XLA stop
fusing the slab/Moeller-Trumbore chains entirely (6x step-cost blowup).
This module replaces the step with ONE Pallas kernel per round: the super
sweep, child-AABB slab tests, triangle tests and all per-lane state updates
run out of VMEM/registers, so the only HBM traffic per round is the packed
row gathers (still XLA: per-lane dynamic row gathers do not map to Pallas
block specs) and the (M, NC) state matrix.

Pipeline shape (one bubble per super entry instead of dependent gathers
inside the step): the kernel consumes the cluster row *chosen last round*
and the child row of the *current super*, and emits the next cluster
choice — so each round is gather(blocks[cid]) + gather(childs[sidc]) +
kernel, with the retire-cursor compaction (argsort + contiguous refill,
``hierarchy.intersect_hierarchy``'s driver design) every ``R_INNER``
rounds.

Parity target: the same component the reference serves with its SAH
kd-tree traversal (``/root/reference/include/mitsuba/render/skdtree.h:431``);
equality with the XLA driver is pinned by ``tests/test_driver_equiv.py``
and the TPU-vs-CPU gate in ``parity_check.py``.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import Float, Int
from . import hierarchy as hy

LANES = 128
BIG = hy.BIG
FAR = hy.FAR
IBIG = jnp.iinfo(np.int32).max

TILE = 256          # rays per kernel grid step
KFRONT = 1 << 15    # compaction front for the kernel driver
R_INNER = 1         # kernel rounds between compactions

# State matrix column layout (f32; ints/bools bitcast).  The 7 result
# columns lead so the retire append is a leading column slice.
C_T, C_U, C_V, C_PRIM, C_INST, C_FOUND, C_IDX = range(7)
C_OX, C_OY, C_OZ = 7, 8, 9            # world origin
C_IX, C_IY, C_IZ = 10, 11, 12         # world 1/d
C_LOX, C_LOY, C_LOZ = 13, 14, 15      # local origin
C_LDX, C_LDY, C_LDZ = 16, 17, 18      # local direction
C_LIX, C_LIY, C_LIZ = 19, 20, 21      # local 1/d
C_TMIN = 22
C_SGT, C_SGC = 23, 24                 # super sweep gate (lex)
C_IGT, C_IGC = 25, 26                 # in-super child gate (lex)
C_SIDC = 27                           # current super id
C_ACT = 28
C_CID = 29                            # cluster row pending test (-1 none)
C_CURI = 30                           # current super's instance id
C_BASE = 31                           # current super's BLAS row (crow/block base)
C_DX, C_DY, C_DZ = 32, 33, 34         # world direction
NC = 35
NRES = 7

F32 = jnp.float32
I32 = jnp.int32


def _ib(x):
    return jax.lax.bitcast_convert_type(x, I32)


def _fb(x):
    return jax.lax.bitcast_convert_type(x, F32)


def _step_kernel(swp_ref, st_ref, br_ref, cr_ref, out_ref, *,
                 n_chunks, any_hit, do_mt=True, do_child=True,
                 do_sweep=True):
    """One traversal round for a (TILE, NC) state slice.

    Per lane: (1) Moeller-Trumbore the cluster row gathered for last
    round's pick, fold into the best hit; (2) slab-test the current
    super's child row, pick the nearest child past the lex gate -> next
    cluster id; (3) lanes with no remaining child sweep the super tables
    (fully VMEM-resident) for their next super; (4) lanes with neither
    retire.
    """
    col = lambda k: st_ref[:, k:k + 1]          # (TILE, 1) f32
    icol = lambda k: _ib(st_ref[:, k:k + 1])    # (TILE, 1) i32

    t_b = col(C_T)
    tmin = col(C_TMIN)
    active = icol(C_ACT) > 0
    lane = jax.lax.broadcasted_iota(I32, (st_ref.shape[0], hy.LEAF), 1)
    lane_s = jax.lax.broadcasted_iota(I32, (st_ref.shape[0], hy.SUP), 1)
    lane_w = jax.lax.broadcasted_iota(I32, (st_ref.shape[0], LANES), 1)

    # ---- (1) triangle tests on the pending cluster row -------------------
    olx, oly, olz = col(C_LOX), col(C_LOY), col(C_LOZ)
    if do_mt:
        cid = icol(C_CID)
        mt_on = active & (cid >= 0)
        dlx, dly, dlz = col(C_LDX), col(C_LDY), col(C_LDZ)
        L = hy.LEAF
        cmp = lambda c: br_ref[:, c * L:(c + 1) * L]
        p0x, p0y, p0z = cmp(0), cmp(1), cmp(2)
        e1x, e1y, e1z = cmp(3), cmp(4), cmp(5)
        e2x, e2y, e2z = cmp(6), cmp(7), cmp(8)
        pvx = dly * e2z - dlz * e2y
        pvy = dlz * e2x - dlx * e2z
        pvz = dlx * e2y - dly * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = jnp.where(jnp.abs(det) > 1e-12,
                            1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        tvx = olx - p0x
        tvy = oly - p0y
        tvz = olz - p0z
        uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        vv = (dlx * qvx + dly * qvy + dlz * qvz) * inv_det
        tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        hitm = ((jnp.abs(det) > 1e-12)
                & (uu >= 0) & (vv >= 0) & (uu + vv <= 1)
                & (tt > tmin) & (tt < t_b) & mt_on)
        tm = jnp.where(hitm, tt, BIG)
        tnew = jnp.min(tm, axis=1, keepdims=True)
        better = tnew < t_b
        kpick = jnp.min(jnp.where(tm == tnew, lane, IBIG), axis=1,
                        keepdims=True)
        oh = (lane == jnp.where(better, kpick, -1)).astype(F32)
        pids = _ib(br_ref[:, 9 * L:10 * L])
        t_b = jnp.where(better, tnew, t_b)
        u_b = jnp.where(better, jnp.sum(uu * oh, axis=1, keepdims=True),
                        col(C_U))
        v_b = jnp.where(better, jnp.sum(vv * oh, axis=1, keepdims=True),
                        col(C_V))
        p_b = jnp.where(better,
                        jnp.sum(pids * oh.astype(I32), axis=1,
                                keepdims=True),
                        icol(C_PRIM))
        i_b = jnp.where(better, icol(C_CURI), icol(C_INST))
        found = (icol(C_FOUND) > 0) | better
        if any_hit:
            active = active & ~found
    else:
        u_b, v_b = col(C_U), col(C_V)
        p_b, i_b = icol(C_PRIM), icol(C_INST)
        found = icol(C_FOUND) > 0

    # ---- (2) child slab tests + nearest gated pick -----------------------
    ig_t, ig_c = col(C_IGT), icol(C_IGC)
    if do_child:
        has_sup = (icol(C_BASE) >= 0) & active
        S = hy.SUP
        ccmp = lambda c: cr_ref[:, c * S:(c + 1) * S]
        ilx, ily, ilz = col(C_LIX), col(C_LIY), col(C_LIZ)
        ax0 = (ccmp(0) - olx) * ilx
        ax1 = (ccmp(3) - olx) * ilx
        ay0 = (ccmp(1) - oly) * ily
        ay1 = (ccmp(4) - oly) * ily
        az0 = (ccmp(2) - olz) * ilz
        az1 = (ccmp(5) - olz) * ilz
        ctn = jnp.maximum(
            jnp.maximum(jnp.minimum(ax0, ax1), jnp.minimum(ay0, ay1)),
            jnp.maximum(jnp.minimum(az0, az1), tmin))
        ctf = jnp.minimum(
            jnp.minimum(jnp.maximum(ax0, ax1), jnp.maximum(ay0, ay1)),
            jnp.minimum(jnp.maximum(az0, az1), t_b))
        gated = (ctn > ig_t) | ((ctn == ig_t) & (lane_s > ig_c))
        e = jnp.where((ctn <= ctf) & (ctn < FAR) & gated, ctn, BIG)
        emin = jnp.min(e, axis=1, keepdims=True)
        kk = jnp.min(jnp.where(e == emin, lane_s, IBIG), axis=1,
                     keepdims=True)
        got_child = (emin < BIG) & has_sup
        cid_new = jnp.where(got_child, icol(C_BASE) * S + kk, -1)
        ig_t = jnp.where(got_child, emin, ig_t)
        ig_c = jnp.where(got_child, kk, ig_c)
    else:
        got_child = jnp.zeros_like(active)
        cid_new = jnp.full_like(ig_c, -1)

    # ---- (3) super sweep for lanes with nothing left here ----------------
    need = active & ~got_child
    if not do_sweep:
        sidc = icol(C_SIDC)
        sg_t, sg_c = col(C_SGT), icol(C_SGC)
        active = active & got_child
        _write_out(out_ref, st_ref, t_b, u_b, v_b, p_b, i_b, found,
                   sg_t, sg_c, ig_t, ig_c, sidc, active, cid_new)
        return
    ox, oy, oz = col(C_OX), col(C_OY), col(C_OZ)
    ixw, iyw, izw = col(C_IX), col(C_IY), col(C_IZ)
    sg_t, sg_c = col(C_SGT), icol(C_SGC)

    def chunk(c, carry):
        best_e, best_c = carry
        off = pl.multiple_of(c * LANES, LANES)
        sl = lambda r: swp_ref[r:r + 1, pl.ds(off, LANES)]
        bx0 = (sl(0) - ox) * ixw
        bx1 = (sl(3) - ox) * ixw
        by0 = (sl(1) - oy) * iyw
        by1 = (sl(4) - oy) * iyw
        bz0 = (sl(2) - oz) * izw
        bz1 = (sl(5) - oz) * izw
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(bx0, bx1), jnp.minimum(by0, by1)),
            jnp.maximum(jnp.minimum(bz0, bz1), tmin))
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(bx0, bx1), jnp.maximum(by0, by1)),
            jnp.minimum(jnp.maximum(bz0, bz1), t_b))
        sid = lane_w + off
        ok = ((tn <= tf) & (tn < FAR)
              & ((tn > sg_t) | ((tn == sg_t) & (sid > sg_c))))
        ee = jnp.where(ok, tn, BIG)
        ecand = jnp.min(ee, axis=1, keepdims=True)
        ccand = jnp.min(jnp.where(ee == ecand, sid, IBIG), axis=1,
                        keepdims=True)
        take = ecand < best_e
        return (jnp.where(take, ecand, best_e),
                jnp.where(take, ccand, best_c))

    init = (jnp.full_like(t_b, BIG), jnp.zeros_like(sg_c))
    if n_chunks == 1:
        best_e, best_c = chunk(0, init)
    else:
        best_e, best_c = jax.lax.fori_loop(0, n_chunks, chunk, init)
    got_sup = need & (best_e < BIG)
    sidc = jnp.where(got_sup, best_c, icol(C_SIDC))
    sg_t = jnp.where(got_sup, best_e, sg_t)
    sg_c = jnp.where(got_sup, best_c, sg_c)
    ig_t = jnp.where(got_sup, -BIG, ig_t)
    ig_c = jnp.where(got_sup, -1, ig_c)

    # ---- (4) retire ------------------------------------------------------
    active = active & (got_child | got_sup)
    _write_out(out_ref, st_ref, t_b, u_b, v_b, p_b, i_b, found,
               sg_t, sg_c, ig_t, ig_c, sidc, active, cid_new)


def _write_out(out_ref, st_ref, t_b, u_b, v_b, p_b, i_b, found,
               sg_t, sg_c, ig_t, ig_c, sidc, active, cid_new):
    out_ref[:, C_T:C_T + 1] = t_b
    out_ref[:, C_U:C_U + 1] = u_b
    out_ref[:, C_V:C_V + 1] = v_b
    out_ref[:, C_PRIM:C_PRIM + 1] = _fb(p_b)
    out_ref[:, C_INST:C_INST + 1] = _fb(i_b)
    out_ref[:, C_FOUND:C_FOUND + 1] = _fb(found.astype(I32))
    out_ref[:, C_IDX:C_TMIN + 1] = st_ref[:, C_IDX:C_TMIN + 1]
    out_ref[:, C_SGT:C_SGT + 1] = sg_t
    out_ref[:, C_SGC:C_SGC + 1] = _fb(sg_c)
    out_ref[:, C_IGT:C_IGT + 1] = ig_t
    out_ref[:, C_IGC:C_IGC + 1] = _fb(ig_c)
    out_ref[:, C_SIDC:C_SIDC + 1] = _fb(sidc)
    out_ref[:, C_ACT:C_ACT + 1] = _fb(active.astype(I32))
    out_ref[:, C_CID:C_CID + 1] = _fb(cid_new)
    out_ref[:, C_CURI:NC] = st_ref[:, C_CURI:NC]


def _slab128(cr, olx, oly, olz, ilx, ily, ilz, tmin, t_b):
    """Child slab entries from a (TILE, CROW) component-blocked row set."""
    S = hy.SUP
    c = lambda k: cr[:, k * S:(k + 1) * S]
    ax0 = (c(0) - olx) * ilx
    ax1 = (c(3) - olx) * ilx
    ay0 = (c(1) - oly) * ily
    ay1 = (c(4) - oly) * ily
    az0 = (c(2) - olz) * ilz
    az1 = (c(5) - olz) * ilz
    ctn = jnp.maximum(
        jnp.maximum(jnp.minimum(ax0, ax1), jnp.minimum(ay0, ay1)),
        jnp.maximum(jnp.minimum(az0, az1), tmin))
    ctf = jnp.minimum(
        jnp.minimum(jnp.maximum(ax0, ax1), jnp.maximum(ay0, ay1)),
        jnp.minimum(jnp.maximum(az0, az1), t_b))
    return ctn, ctf


def _step_kernel2(swp_ref, childs_ref, st_ref, br_ref, out_ref, *,
                  n_chunks, any_hit):
    """Bubble-free traversal round for plain (single-TLAS) scenes.

    The whole child-AABB table rides in VMEM; per-lane rows are fetched
    with an exact one-hot matmul on the (otherwise idle) MXU —
    ``precision=HIGHEST`` one-hot contractions reproduce f32 rows bitwise,
    verified in tests.  This kills both the (M, CROW) child-row gather
    stream of the v1 pipeline and the one-round bubble per super entry:
    a lane that sweeps into a new super picks its first child in the SAME
    round (second matmul stage), so per-ray rounds ~= 1 + cluster visits.
    """
    col = lambda k: st_ref[:, k:k + 1]
    icol = lambda k: _ib(st_ref[:, k:k + 1])
    T = st_ref.shape[0]
    S_pad = childs_ref.shape[0]

    t_b = col(C_T)
    tmin = col(C_TMIN)
    active = icol(C_ACT) > 0
    lane = jax.lax.broadcasted_iota(I32, (T, hy.LEAF), 1)
    lane_s = jax.lax.broadcasted_iota(I32, (T, hy.SUP), 1)
    lane_w = jax.lax.broadcasted_iota(I32, (T, LANES), 1)
    olx, oly, olz = col(C_LOX), col(C_LOY), col(C_LOZ)
    ilx, ily, ilz = col(C_LIX), col(C_LIY), col(C_LIZ)

    # ---- (1) triangle tests on the pending cluster row -------------------
    cid = icol(C_CID)
    mt_on = active & (cid >= 0)
    dlx, dly, dlz = col(C_LDX), col(C_LDY), col(C_LDZ)
    L = hy.LEAF
    cmp = lambda c: br_ref[:, c * L:(c + 1) * L]
    p0x, p0y, p0z = cmp(0), cmp(1), cmp(2)
    e1x, e1y, e1z = cmp(3), cmp(4), cmp(5)
    e2x, e2y, e2z = cmp(6), cmp(7), cmp(8)
    pvx = dly * e2z - dlz * e2y
    pvy = dlz * e2x - dlx * e2z
    pvz = dlx * e2y - dly * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = jnp.where(jnp.abs(det) > 1e-12,
                        1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tvx = olx - p0x
    tvy = oly - p0y
    tvz = olz - p0z
    uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    vv = (dlx * qvx + dly * qvy + dlz * qvz) * inv_det
    tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    hitm = ((jnp.abs(det) > 1e-12)
            & (uu >= 0) & (vv >= 0) & (uu + vv <= 1)
            & (tt > tmin) & (tt < t_b) & mt_on)
    tm = jnp.where(hitm, tt, BIG)
    tnew = jnp.min(tm, axis=1, keepdims=True)
    better = tnew < t_b
    kpick = jnp.min(jnp.where(tm == tnew, lane, IBIG), axis=1, keepdims=True)
    oh = (lane == jnp.where(better, kpick, -1)).astype(F32)
    pids = _ib(br_ref[:, 9 * L:10 * L])
    t_b = jnp.where(better, tnew, t_b)
    u_b = jnp.where(better, jnp.sum(uu * oh, axis=1, keepdims=True),
                    col(C_U))
    v_b = jnp.where(better, jnp.sum(vv * oh, axis=1, keepdims=True),
                    col(C_V))
    p_b = jnp.where(better,
                    jnp.sum(pids * oh.astype(I32), axis=1, keepdims=True),
                    icol(C_PRIM))
    i_b = icol(C_INST)
    found = (icol(C_FOUND) > 0) | better
    if any_hit:
        active = active & ~found

    dims = (((1,), (0,)), ((), ()))
    s_iota = jax.lax.broadcasted_iota(I32, (T, S_pad), 1)

    def pick_from(sid_col, valid, ig_t, ig_c):
        """One-hot matmul gather of childs[sid] + gated nearest pick."""
        ohs = ((s_iota == sid_col) & valid).astype(F32)
        cr = jax.lax.dot_general(ohs, childs_ref[:], dims,
                                 preferred_element_type=F32,
                                 precision=jax.lax.Precision.HIGHEST)
        ctn, ctf = _slab128(cr, olx, oly, olz, ilx, ily, ilz, tmin, t_b)
        gated = (ctn > ig_t) | ((ctn == ig_t) & (lane_s > ig_c))
        e = jnp.where((ctn <= ctf) & (ctn < FAR) & gated, ctn, BIG)
        emin = jnp.min(e, axis=1, keepdims=True)
        kk = jnp.min(jnp.where(e == emin, lane_s, IBIG), axis=1,
                     keepdims=True)
        return (emin < BIG) & valid, emin, kk

    # ---- (2) pick the next child of the current super --------------------
    sidc = icol(C_SIDC)
    sg_t, sg_c = col(C_SGT), icol(C_SGC)
    ig_t, ig_c = col(C_IGT), icol(C_IGC)
    has_sup = active & (sg_c >= 0)
    gotA, eA, kA = pick_from(sidc, has_sup, ig_t, ig_c)
    ig_t = jnp.where(gotA, eA, ig_t)
    ig_c = jnp.where(gotA, kA, ig_c)

    # ---- (3) sweep + first-child pick for exhausted lanes ----------------
    need = active & ~gotA
    ox, oy, oz = col(C_OX), col(C_OY), col(C_OZ)
    ixw, iyw, izw = col(C_IX), col(C_IY), col(C_IZ)

    def chunk(c, carry):
        best_e, best_c = carry
        off = pl.multiple_of(c * LANES, LANES)
        sl = lambda r: swp_ref[r:r + 1, pl.ds(off, LANES)]
        bx0 = (sl(0) - ox) * ixw
        bx1 = (sl(3) - ox) * ixw
        by0 = (sl(1) - oy) * iyw
        by1 = (sl(4) - oy) * iyw
        bz0 = (sl(2) - oz) * izw
        bz1 = (sl(5) - oz) * izw
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(bx0, bx1), jnp.minimum(by0, by1)),
            jnp.maximum(jnp.minimum(bz0, bz1), tmin))
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(bx0, bx1), jnp.maximum(by0, by1)),
            jnp.minimum(jnp.maximum(bz0, bz1), t_b))
        sid = lane_w + off
        ok = ((tn <= tf) & (tn < FAR)
              & ((tn > sg_t) | ((tn == sg_t) & (sid > sg_c))))
        ee = jnp.where(ok, tn, BIG)
        ecand = jnp.min(ee, axis=1, keepdims=True)
        ccand = jnp.min(jnp.where(ee == ecand, sid, IBIG), axis=1,
                        keepdims=True)
        take = ecand < best_e
        return (jnp.where(take, ecand, best_e),
                jnp.where(take, ccand, best_c))

    init = (jnp.full_like(t_b, BIG), jnp.zeros_like(sg_c))
    if n_chunks == 1:
        best_e, best_c = chunk(0, init)
    else:
        best_e, best_c = jax.lax.fori_loop(0, n_chunks, chunk, init)
    got_sup = need & (best_e < BIG)
    sidc = jnp.where(got_sup, best_c, sidc)
    sg_t = jnp.where(got_sup, best_e, sg_t)
    sg_c = jnp.where(got_sup, best_c, sg_c)

    gotB, eB, kB = pick_from(sidc, got_sup,
                             jnp.full_like(ig_t, -BIG),
                             jnp.full_like(ig_c, -1))
    ig_t = jnp.where(got_sup, jnp.where(gotB, eB, -BIG), ig_t)
    ig_c = jnp.where(got_sup, jnp.where(gotB, kB, -1), ig_c)

    got = gotA | gotB
    cid_new = jnp.where(
        got, sidc * hy.SUP + jnp.where(gotA, kA, kB), -1)
    active = active & (got | got_sup)
    _write_out(out_ref, st_ref, t_b, u_b, v_b, p_b, i_b, found,
               sg_t, sg_c, ig_t, ig_c, sidc, active, cid_new)


def _advance_kernel(swp_ref, childs_ref, st_ref, out_ref, *, n_chunks):
    """Sweep + first-child pick only (no cluster row, no gather).

    Runs once at FULL width as the driver prologue: every ray leaves with
    its first cluster pending (or retired if it misses everything), so
    every subsequent driver round is an MT round — the per-round row
    gather is never wasted on advance-only work.
    """
    col = lambda k: st_ref[:, k:k + 1]
    icol = lambda k: _ib(st_ref[:, k:k + 1])
    T = st_ref.shape[0]
    S_pad = childs_ref.shape[0]

    t_b = col(C_T)
    tmin = col(C_TMIN)
    active = icol(C_ACT) > 0
    lane_s = jax.lax.broadcasted_iota(I32, (T, hy.SUP), 1)
    lane_w = jax.lax.broadcasted_iota(I32, (T, LANES), 1)
    olx, oly, olz = col(C_LOX), col(C_LOY), col(C_LOZ)
    ilx, ily, ilz = col(C_LIX), col(C_LIY), col(C_LIZ)
    ox, oy, oz = col(C_OX), col(C_OY), col(C_OZ)
    ixw, iyw, izw = col(C_IX), col(C_IY), col(C_IZ)
    sg_t, sg_c = col(C_SGT), icol(C_SGC)

    def chunk(c, carry):
        best_e, best_c = carry
        off = pl.multiple_of(c * LANES, LANES)
        sl = lambda r: swp_ref[r:r + 1, pl.ds(off, LANES)]
        bx0 = (sl(0) - ox) * ixw
        bx1 = (sl(3) - ox) * ixw
        by0 = (sl(1) - oy) * iyw
        by1 = (sl(4) - oy) * iyw
        bz0 = (sl(2) - oz) * izw
        bz1 = (sl(5) - oz) * izw
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(bx0, bx1), jnp.minimum(by0, by1)),
            jnp.maximum(jnp.minimum(bz0, bz1), tmin))
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(bx0, bx1), jnp.maximum(by0, by1)),
            jnp.minimum(jnp.maximum(bz0, bz1), t_b))
        sid = lane_w + off
        ok = ((tn <= tf) & (tn < FAR)
              & ((tn > sg_t) | ((tn == sg_t) & (sid > sg_c))))
        ee = jnp.where(ok, tn, BIG)
        ecand = jnp.min(ee, axis=1, keepdims=True)
        ccand = jnp.min(jnp.where(ee == ecand, sid, IBIG), axis=1,
                        keepdims=True)
        take = ecand < best_e
        return (jnp.where(take, ecand, best_e),
                jnp.where(take, ccand, best_c))

    init = (jnp.full_like(t_b, BIG), jnp.zeros_like(sg_c))
    if n_chunks == 1:
        best_e, best_c = chunk(0, init)
    else:
        best_e, best_c = jax.lax.fori_loop(0, n_chunks, chunk, init)
    got_sup = active & (best_e < BIG)
    sidc = jnp.where(got_sup, best_c, icol(C_SIDC))
    sg_t = jnp.where(got_sup, best_e, sg_t)
    sg_c = jnp.where(got_sup, best_c, sg_c)

    dims = (((1,), (0,)), ((), ()))
    s_iota = jax.lax.broadcasted_iota(I32, (T, S_pad), 1)
    ohs = ((s_iota == sidc) & got_sup).astype(F32)
    cr = jax.lax.dot_general(ohs, childs_ref[:], dims,
                             preferred_element_type=F32,
                             precision=jax.lax.Precision.HIGHEST)
    ctn, ctf = _slab128(cr, olx, oly, olz, ilx, ily, ilz, tmin, t_b)
    e = jnp.where((ctn <= ctf) & (ctn < FAR), ctn, BIG)
    emin = jnp.min(e, axis=1, keepdims=True)
    kk = jnp.min(jnp.where(e == emin, lane_s, IBIG), axis=1, keepdims=True)
    gotB = (emin < BIG) & got_sup
    ig_t = jnp.where(got_sup, jnp.where(gotB, emin, -BIG),
                     col(C_IGT))
    ig_c = jnp.where(got_sup, jnp.where(gotB, kk, -1), icol(C_IGC))
    cid_new = jnp.where(gotB, sidc * hy.SUP + kk, -1)
    active = active & got_sup
    _write_out(out_ref, st_ref, t_b, col(C_U), col(C_V), icol(C_PRIM),
               icol(C_INST), icol(C_FOUND) > 0, sg_t, sg_c, ig_t, ig_c,
               sidc, active, cid_new)


@jax.jit
def _advance_all(swp, childs, ST):
    """Full-width advance prologue (N must be a TILE multiple)."""
    M = ST.shape[0]
    S_pad = swp.shape[1]
    kern = functools.partial(_advance_kernel, n_chunks=S_pad // LANES)
    return pl.pallas_call(
        kern,
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((8, S_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_pad, hy.CROW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, NC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, NC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, NC), F32),
    )(swp, childs, ST)


def _childs_resident(h: hy.Hierarchy):
    """(S_pad, CROW) child table padded with FAR rows (one-hot gather)."""
    S = h.childs.shape[0]
    S_pad = h.swp_lo.shape[1]
    pad = jnp.full((max(S_pad - S, 0), hy.CROW), FAR, Float)
    return jnp.concatenate([h.childs, pad], axis=0)[:S_pad]


@functools.partial(jax.jit, static_argnames=("any_hit",))
def _round2(h: hy.Hierarchy, swp, childs, ST, *, any_hit):
    """Plain-scene round: one BR gather + the bubble-free kernel."""
    M = ST.shape[0]
    cid = _ib(ST[:, C_CID])
    BR = h.blocks[jnp.clip(cid, 0, h.blocks.shape[0] - 1)]
    S_pad = swp.shape[1]
    grid = M // TILE
    kern = functools.partial(_step_kernel2, n_chunks=S_pad // LANES,
                             any_hit=any_hit)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, S_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_pad, hy.CROW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, NC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, hy.ROW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, NC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, NC), F32),
    )(swp, childs, ST, BR)


def _swp_packed(h: hy.Hierarchy):
    """(8, S_pad) sweep table: rows 0-2 lo xyz, 3-5 hi xyz, 6-7 pad."""
    pad = jnp.full((2, h.swp_lo.shape[1]), FAR, Float)
    return jnp.concatenate([h.swp_lo, h.swp_hi, pad], axis=0)


@functools.partial(jax.jit, static_argnames=("any_hit",))
def _round(h: hy.Hierarchy, swp, ST, *, any_hit):
    """One gather + kernel round over the full (M, NC) state matrix."""
    M = ST.shape[0]
    cid = _ib(ST[:, C_CID])
    sid = _ib(ST[:, C_SIDC])
    crow_idx = h.sup_blas[jnp.clip(sid, 0, h.sup_blas.shape[0] - 1)] \
        if h.indirect else sid
    BR = h.blocks[jnp.clip(cid, 0, h.blocks.shape[0] - 1)]
    CR = h.childs[jnp.clip(crow_idx, 0, h.childs.shape[0] - 1)]

    # base/instance columns refresh from sidc each round; lanes that have
    # never swept a super (sg_c < 0) keep base = -1 so the kernel skips
    # the child pick until their first sweep lands
    swept = _ib(ST[:, C_SGC]) >= 0
    ST = ST.at[:, C_BASE].set(_fb(jnp.where(swept, crow_idx, -1)))
    instanced = h.inst_inv.shape[0] > 1
    if instanced or h.indirect:
        inst = h.sup_inst[jnp.clip(sid, 0, h.sup_inst.shape[0] - 1)]
        ST = ST.at[:, C_CURI].set(_fb(inst))
    if instanced:
        o = ST[:, C_OX:C_OZ + 1]
        dw = ST[:, C_DX:C_DZ + 1]
        Mx = h.inst_inv[jnp.clip(inst, 0, h.inst_inv.shape[0] - 1)]
        ol = jnp.einsum("nij,nj->ni", Mx[:, :, :3], o) + Mx[:, :, 3]
        dl = jnp.einsum("nij,nj->ni", Mx[:, :, :3], dw)
        dl_safe = jnp.where(jnp.abs(dl) < 1e-20,
                            jnp.where(dl < 0, -1e-20, 1e-20), dl)
        ST = ST.at[:, C_LOX:C_LOZ + 1].set(ol)
        ST = ST.at[:, C_LDX:C_LDZ + 1].set(dl)
        ST = ST.at[:, C_LIX:C_LIZ + 1].set(1.0 / dl_safe)

    S_pad = swp.shape[1]
    grid = M // TILE
    kern = functools.partial(_step_kernel, n_chunks=S_pad // LANES,
                             any_hit=any_hit)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, S_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, NC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, hy.ROW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, hy.CROW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, NC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, NC), F32),
    )(swp, ST, BR, CR)


def _partition3(key):
    """Stable 3-way partition permutation via prefix sums.

    ``jnp.argsort`` lowers to a bitonic sort network (~log^2 N passes) and
    measured ~1 ms at 32K keys; three cumsums + one scatter build the same
    stable {0,1,2}-key permutation in a handful of passes.
    """
    M = key.shape[0]
    k0 = (key == 0).astype(Int)
    k1 = (key == 1).astype(Int)
    c0 = jnp.cumsum(k0)
    c1 = jnp.cumsum(k1)
    c2 = jnp.cumsum(1 - k0 - k1)
    n0 = c0[-1]
    n01 = n0 + c1[-1]
    pos = jnp.where(key == 0, c0 - 1,
                    jnp.where(key == 1, n0 + c1 - 1, n01 + c2 - 1))
    return jnp.zeros((M,), Int).at[pos].set(jnp.arange(M, dtype=Int))


def _make_state(h: hy.Hierarchy, o, d, tmin, tmax, active_in=None):
    """(N, NC) initial state matrix with the root-AABB prepass."""
    N = o.shape[0]
    d_safe = jnp.where(jnp.abs(d) < 1e-20,
                       jnp.where(d < 0, -1e-20, 1e-20), d)
    inv_d = 1.0 / d_safe
    S = h.n_supers
    root_lo = jnp.min(h.swp_lo[:, :S], axis=1)
    root_hi = jnp.max(h.swp_hi[:, :S], axis=1)
    t0 = (root_lo[None] - o) * inv_d
    t1 = (root_hi[None] - o) * inv_d
    tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), tmin)
    tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), -1), tmax)
    hits_root = tn <= tf
    if active_in is not None:
        hits_root = hits_root & active_in

    z = jnp.zeros((N,), Float)
    zi = jnp.zeros((N,), Int)
    cols = [None] * NC
    cols[C_T] = jnp.minimum(jnp.full((N,), BIG, Float), tmax)
    cols[C_U] = z
    cols[C_V] = z
    cols[C_PRIM] = _fb(zi)
    cols[C_INST] = _fb(zi)
    cols[C_FOUND] = _fb(zi)
    cols[C_IDX] = _fb(jnp.arange(N, dtype=Int))
    cols[C_OX], cols[C_OY], cols[C_OZ] = o[:, 0], o[:, 1], o[:, 2]
    cols[C_IX], cols[C_IY], cols[C_IZ] = inv_d[:, 0], inv_d[:, 1], inv_d[:, 2]
    cols[C_LOX], cols[C_LOY], cols[C_LOZ] = o[:, 0], o[:, 1], o[:, 2]
    cols[C_LDX], cols[C_LDY], cols[C_LDZ] = d[:, 0], d[:, 1], d[:, 2]
    cols[C_LIX], cols[C_LIY], cols[C_LIZ] = (inv_d[:, 0], inv_d[:, 1],
                                             inv_d[:, 2])
    cols[C_TMIN] = tmin
    cols[C_SGT] = jnp.full((N,), -BIG, Float)
    cols[C_SGC] = _fb(jnp.full((N,), -1, Int))
    cols[C_IGT] = jnp.full((N,), -BIG, Float)
    cols[C_IGC] = _fb(jnp.full((N,), -1, Int))
    cols[C_SIDC] = _fb(zi)
    cols[C_ACT] = _fb(hits_root.astype(Int))
    cols[C_CID] = _fb(jnp.full((N,), -1, Int))
    cols[C_CURI] = _fb(zi)
    cols[C_BASE] = _fb(jnp.full((N,), -1, Int))
    cols[C_DX], cols[C_DY], cols[C_DZ] = d[:, 0], d[:, 1], d[:, 2]
    return jnp.stack(cols, axis=1)


def intersect_hier_kernel(h: hy.Hierarchy, o, d, tmin, tmax, any_hit=False,
                          active=None, front=None, r_inner=None):
    """Kernel-driver closest/any hit; same contract as intersect_hierarchy.

    Driver shape (v3): a full-width gather-free *advance* prologue gives
    every ray its first pending cluster, so each driver round over the
    compaction front is an MT round and the per-round row gather is never
    wasted.  Compaction is sort-free: retired lanes scatter their 7 result
    columns by ray index (unique per round by construction) and refill
    in-place from the pending queue via a prefix-sum rank — no argsort, no
    full-row permutation.
    """
    N = o.shape[0]
    M = front or KFRONT
    tmin = jnp.broadcast_to(jnp.asarray(tmin, Float), (N,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, Float), (N,))
    swp = _swp_packed(h)
    ST = _make_state(h, o, d, tmin, tmax, active_in=active)

    # plain single-TLAS scenes take the bubble-free resident-childs kernel;
    # instanced/indirect scenes keep the v1 gather pipeline (local-ray
    # recompute between rounds)
    S_pad = swp.shape[1]
    plain = (not h.indirect and h.inst_inv.shape[0] <= 1
             and S_pad * hy.CROW * 4 <= (2 << 20))
    if plain:
        childs = _childs_resident(h)

        def round_(st):
            return _round2(h, swp, childs, st, any_hit=any_hit)
    else:
        def round_(st):
            return _round(h, swp, st, any_hit=any_hit)

    n_pad = -(-N // TILE) * TILE
    if n_pad != N:
        ST = jnp.concatenate([ST, jnp.zeros((n_pad - N, NC), F32)], axis=0)
    if plain:
        # gather-free prologue: sweep + first-child pick at full width
        ST = _advance_all(swp, childs, ST)

    if N <= M:
        def cond(st):
            return jnp.any(_ib(st[:, C_ACT]) > 0)

        ST = jax.lax.while_loop(cond, round_, ST)
        return dict(
            t=ST[:N, C_T], u=ST[:N, C_U], v=ST[:N, C_V],
            prim=_ib(ST[:N, C_PRIM]), inst=_ib(ST[:N, C_INST]),
            found=_ib(ST[:N, C_FOUND]) > 0,
        )

    # ---- sort-free scatter-retire / rank-refill driver -------------------
    act0 = _ib(ST[:, C_ACT]) > 0
    P = ST[_partition3(jnp.where(act0, 0, 1))]   # actives first, once
    n_act = jnp.sum(act0.astype(Int))
    P = jnp.concatenate([P, jnp.zeros((M, NC), F32)], axis=0)

    # result buffer (n_pad+1 rows; the last row swallows tombstone/pad
    # scatters), seeded with the prologue state so never-enqueued lanes
    # (root misses, masked-off) keep their initial results
    res = jnp.concatenate([ST[:, :NRES], jnp.zeros((1, NRES), F32)], axis=0)

    def cond(carry):
        fr = carry[0]
        return jnp.any(_ib(fr[:, C_ACT]) > 0)

    def body(carry):
        fr, tail, res = carry
        fr = round_(fr)
        retired = ~(_ib(fr[:, C_ACT]) > 0)
        idx = _ib(fr[:, C_IDX])
        # scatter retired results by ray index (unique: each real ray
        # retires exactly once; tombstones/pads land in the last row)
        widx = jnp.where(retired & (idx < N), idx, res.shape[0] - 1)
        # NOT unique_indices: every non-retired lane aliases the dump row
        res = res.at[widx].set(fr[:, :NRES], mode="drop")
        # rank-refill: k-th retired slot takes pending row tail+k
        rank = jnp.cumsum(retired.astype(Int)) - 1
        src = tail + rank
        Pref = P[jnp.clip(src, 0, P.shape[0] - 1)]
        fr = jnp.where(retired[:, None], Pref, fr)
        is_tomb = retired & (src >= n_act)
        dead = _fb(jnp.zeros((), Int))
        fr = fr.at[:, C_ACT].set(jnp.where(is_tomb, dead, fr[:, C_ACT]))
        fr = fr.at[:, C_FOUND].set(
            jnp.where(is_tomb, dead, fr[:, C_FOUND]))
        fr = fr.at[:, C_IDX].set(
            jnp.where(is_tomb, _fb(jnp.asarray(N, Int)), fr[:, C_IDX]))
        tail = tail + jnp.sum(retired.astype(Int))
        return fr, tail, res

    carry = (P[:M], jnp.asarray(M, Int), res)
    fr, tail, res = jax.lax.while_loop(cond, body, carry)

    return dict(
        t=res[:N, C_T], u=res[:N, C_U], v=res[:N, C_V],
        prim=_ib(res[:N, C_PRIM]), inst=_ib(res[:N, C_INST]),
        found=_ib(res[:N, C_FOUND]) > 0,
    )
