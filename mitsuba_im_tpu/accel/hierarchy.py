"""Two-level cluster hierarchy: the large-scene (~1M+ triangle) intersector.

This is the TPU answer to the reference's SAH kd-tree
(``/root/reference/include/mitsuba/render/gkdtree.h:1050`` parallel build,
``skdtree.h:431`` Havran traversal): instead of a per-lane pointer walk
(hostile to 8x128 vector lanes — every step is a divergent gather), rays
march *supers* in increasing entry-``t`` order using a lexicographic gate,
so all per-step work is dense vector math plus one contiguous row gather:

- **clusters**: <=``LEAF`` triangles each (binned-SAH leaves), stored as one
  *lane-aligned packed row* per cluster — ``(C, 640)`` f32: 64 triangles x 9
  floats (p0|e1|e2) plus the 64 primitive ids bitcast into the tail.  One
  cluster = one 2.5 KB row gather.
- **supers**: <=``SUP`` clusters each (a second SAH build over cluster
  AABBs).  A ray sweeps the super AABBs (dense per-axis slab tests on
  ``(3, S_pad)`` transposed tables), enters the nearest unvisited super with
  entry < current best hit, slab-tests its packed ``(384,)`` child-AABB row,
  and marches the children nearest-first.

Measured design notes (v5e, round 3).  The round-2 incarnation of this file
ran at 0.14-0.35 Mrays/s; profiling showed every cost was an avoidable
artifact, not a bandwidth wall:

- XLA row gathers are *layout-bound*: a ``(C, 64, 9)`` gather moves 59 GB/s
  because the trailing dim 9 breaks lane alignment, while the same bytes as
  packed ``(C, 640)`` rows (640 = 5x128 lanes) move ~300 GB/s.  Everything
  gathered per step is therefore packed into lane-multiple rows, with int
  payloads bitcast into the float matrix so one gather carries them all.
- ``argsort(512K)`` costs 0.54 ms (the round-2 profile misattributed 16 ms
  to it), so stable-sort compaction per round is kept — it beats both
  cumsum+scatter partition (2.6 ms) and queue-refill gathers (1.5 ms).
- Exact CPU traversal stats on the 1.1M-triangle bench bunny show mean
  leaf visits per ray of ~0.6-2 (p50 = 0: most rays miss the root or hit on
  the first nearest-first visit).  Per-ray *work* is tiny; throughput is
  set by scheduling overhead.  Hence ``K_INNER`` (steps per compaction
  round) is small — long lockstep runs only serve stragglers while every
  lane keeps paying the full per-step cost.

Instancing (``/root/reference/src/shapes/instance.cpp:115``) composes at the
super level: each super carries an instance id; child AABBs and triangle
blocks are stored in *local* (BLAS) space and shared across instances, while
super AABBs are world-space.  Rays transform into instance space with an
unnormalized direction so the ``t`` parameter stays world-consistent.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.types import pytree_dataclass, static_field, Float, Int

LEAF = 64   # triangles per cluster (gather-latency sweet spot)
SUP = 64    # clusters per super
ROW = LEAF * 9 + LEAF  # 1280 = packed cluster row (tris + prim ids)
CROW = SUP * 6         # 768 = packed child-AABB row
BIG = 3.0e37
FAR = 1.0e30  # degenerate padding box (point at +FAR: every slab rejects it)

FRONT = 1 << 13     # compaction front (rays stepped per round); above
                    # ~16K lanes XLA stops fusing the (M, SUP) slab/MT
                    # chains (measured 6x step-cost blowup at 32K)
K_INNER = 2         # traversal steps per compaction round
PROLOGUE = 1        # full-width traversal steps before the driver starts
SWEEP_CHUNK = 1024  # supers per dense sweep pass (S <= 1024: single pass)
SWEEP_ALIGN = 128   # pad S to this multiple (pads cost dense slab lanes)
IBIG = jnp.iinfo(np.int32).max


@pytree_dataclass
class Hierarchy:
    swp_lo: jax.Array    # (3, S_pad) transposed world-space super AABB mins
    swp_hi: jax.Array    # (3, S_pad)
    sup_inst: jax.Array  # (S_pad,) instance id (0 = identity)
    childs: jax.Array    # (S, CROW) packed [lo3 hi3] x SUP child AABBs, local
    blocks: jax.Array    # (C, ROW) packed cluster rows, local space
    inst_inv: jax.Array  # (I, 3, 4) world->local affine transforms
    inst_fwd: jax.Array  # (I, 3, 4) local->world
    sup_blas: jax.Array  # (S_pad,) world super -> BLAS super row (instanced)
    blocks1: jax.Array = None  # (C, ROW) frame-1 rows (deformable motion)
    time: jax.Array = None     # () shutter time in [0,1] (deformable motion)
    n_supers: int = static_field(default=0)
    n_tris: int = static_field(default=0)
    indirect: bool = static_field(default=False)  # sup_blas indirection live
    has_motion: bool = static_field(default=False)


def _leaf_groups(flat, cap=LEAF):
    """Collapse maximal <=``cap``-triangle BVH subtrees into clusters.

    SAH termination leaves average far below capacity (~31 tris measured on
    the 1.1M-tri bench at max 64), so one-row-per-leaf packing wastes half
    of every gathered row and every MT lane; naively merging DFS-*runs*
    fills rows but unions boxes across subtree boundaries (measured +44%
    cluster visits).  Instead walk the skip-threaded DFS and emit every
    maximal subtree whose triangle count fits ``cap``: the cluster AABB is
    then an actual BVH node box (tight by construction) and fill stays
    high because the builder splits top-down by SAH.

    Returns (ids (C, cap) triangle indices, vmask (C, cap) valid slots) in
    DFS (spatially coherent) order.
    """
    node_count = np.asarray(flat["node_count"])
    node_skip = np.asarray(flat["node_skip"])
    order = np.asarray(flat["order"])
    Nn = len(node_count)
    # prims strictly before node i in DFS order (subtree prim ranges are
    # contiguous in ``order`` because the builder partitions in place)
    pref = np.zeros(Nn + 1, np.int64)
    np.cumsum(node_count, out=pref[1:])

    groups = []
    i = 0
    while 0 <= i < Nn:
        s = node_skip[i] if node_skip[i] >= 0 else Nn
        if pref[s] - pref[i] <= cap:
            groups.append((pref[i], pref[s]))
            i = s if node_skip[i] >= 0 else -1
        else:
            i += 1  # descend into the near child
    C = len(groups)
    ids = np.zeros((C, cap), np.int64)
    vmask = np.zeros((C, cap), bool)
    for g, (b, e) in enumerate(groups):
        c = e - b
        ids[g, :c] = order[b:e]
        vmask[g, :c] = True
    return ids, vmask


def _pack_leaves(flat, soup, tri_ids=None, groups=None):
    """Extract (C, LEAF-padded) cluster blocks from a host BVH dict's leaves.

    Returns (cl_lo, cl_hi, rows) with C = number of merged-leaf clusters in
    DFS (spatially coherent) order; ``rows`` is the packed (C, ROW) matrix.
    Padded triangle slots are all-zero (degenerate: det == 0 never hits).
    ``groups``: optional precomputed ``_leaf_groups`` output (shared by the
    deformable two-keyframe build so both frames pack identically).
    """
    ids, vmask = groups if groups is not None else _leaf_groups(flat)
    C = ids.shape[0]
    tris = np.where(vmask[:, :, None], soup[ids], 0.0).astype(np.float32)
    prim = np.where(vmask, ids if tri_ids is None else tri_ids[ids], 0)
    # cluster AABBs from the packed triangles (p0 | e1 | e2 columns)
    p0 = tris[..., 0:3]
    c1 = p0 + tris[..., 3:6]
    c2 = p0 + tris[..., 6:9]
    lo3 = np.minimum(np.minimum(p0, c1), c2)
    hi3 = np.maximum(np.maximum(p0, c1), c2)
    big = np.where(vmask[:, :, None], lo3, np.inf)
    cl_lo = big.min(axis=1)
    cl_hi = np.where(vmask[:, :, None], hi3, -np.inf).max(axis=1)
    # component-blocked row: [p0x*L p0y p0z e1x e1y e1z e2x e2y e2z prim*L]
    # so the device slices nine contiguous (M, LEAF) planes after the gather
    # (interleaved layouts force strided slices / unfusable (M,L,3) math)
    rows = np.empty((C, ROW), np.float32)
    rows[:, : LEAF * 9] = tris.transpose(0, 2, 1).reshape(C, LEAF * 9)
    rows[:, LEAF * 9 :] = prim.astype(np.int32).view(np.float32)
    return cl_lo.astype(np.float32), cl_hi.astype(np.float32), rows


def _pack_supers(cl_lo, cl_hi, rows, rows_extra=()):
    """Second SAH level: cluster AABBs -> supers; returns packed tables.

    ``rows_extra``: additional row matrices sharing the cluster order
    (deformable frame-1 blocks) reordered identically."""
    from . import bvh as bvh_mod

    C = cl_lo.shape[0]
    flat2 = bvh_mod.build_bvh_arrays(cl_lo, cl_hi, leaf_size=64)
    # merge DFS-consecutive second-level leaves into ~full SUP-wide supers
    # (same fill argument as _leaf_groups at the triangle level)
    cids, cmask = _leaf_groups(flat2, cap=SUP)
    S = cids.shape[0]

    # child AABB rows, component-blocked [lox*SUP loy loz hix hiy hiz];
    # pads get the far point box
    ch = np.empty((S, SUP, 6), np.float32)
    ch[..., 0:3] = np.where(cmask[..., None], cl_lo[cids], FAR)
    ch[..., 3:6] = np.where(cmask[..., None], cl_hi[cids], FAR)
    ch = ch.transpose(0, 2, 1)  # (S, 6, SUP)

    # block rows re-ordered so super s owns rows [s*SUP, (s+1)*SUP)
    flatmask = cmask.reshape(-1)
    src = cids.reshape(-1)[flatmask]

    def reorder(r):
        out = np.zeros((S * SUP, ROW), np.float32)
        out[flatmask] = r[src]
        return out

    blocks = reorder(rows)
    extra = tuple(reorder(r) for r in rows_extra)
    # super AABBs = union over their (merged) member clusters
    sup_lo = np.where(cmask[..., None], cl_lo[cids], np.inf).min(axis=1)
    sup_hi = np.where(cmask[..., None], cl_hi[cids], -np.inf).max(axis=1)
    if rows_extra:
        return sup_lo, sup_hi, ch.reshape(S, CROW), blocks, extra
    return sup_lo, sup_hi, ch.reshape(S, CROW), blocks


def _pad_sweep(sup_lo, sup_hi):
    S = sup_lo.shape[0]
    S_pad = max(-(-S // SWEEP_ALIGN) * SWEEP_ALIGN, SWEEP_ALIGN)
    lo = np.full((S_pad, 3), FAR, np.float32)
    hi = np.full((S_pad, 3), FAR, np.float32)
    lo[:S] = sup_lo
    hi[:S] = sup_hi
    return lo.T.copy(), hi.T.copy()


def build_hierarchy(p0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
                    leaf_size: int = 64) -> Hierarchy:
    """Two SAH passes: triangles -> clusters, cluster AABBs -> supers.

    ``leaf_size`` bounds the SAH leaves; DFS-consecutive leaves are then
    merged into LEAF(=128)-wide packed rows (~97% fill, see _leaf_groups).
    """
    from . import bvh as bvh_mod

    p0 = np.asarray(p0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    soup = np.concatenate([p0, e1, e2], axis=1)  # (T, 9)

    lo, hi = bvh_mod.tri_bounds(p0, e1, e2)
    flat = bvh_mod.build_bvh_arrays(lo, hi, leaf_size=leaf_size)
    cl_lo, cl_hi, rows = _pack_leaves(flat, soup)
    sup_lo, sup_hi, childs, blocks = _pack_supers(cl_lo, cl_hi, rows)
    swp_lo, swp_hi = _pad_sweep(sup_lo, sup_hi)
    S_pad = swp_lo.shape[1]

    ident = np.concatenate([np.eye(3, dtype=np.float32),
                            np.zeros((3, 1), np.float32)], axis=1)[None]
    return Hierarchy(
        swp_lo=jnp.asarray(swp_lo, Float), swp_hi=jnp.asarray(swp_hi, Float),
        sup_inst=jnp.zeros((S_pad,), Int),
        childs=jnp.asarray(childs, Float),
        blocks=jnp.asarray(blocks, Float),
        inst_inv=jnp.asarray(ident, Float), inst_fwd=jnp.asarray(ident, Float),
        sup_blas=jnp.zeros((1,), Int),
        blocks1=jnp.zeros((1, 1), Float), time=jnp.zeros((), Float),
        n_supers=int(sup_lo.shape[0]), n_tris=int(len(p0)),
    )


def build_hierarchy_motion(p0, e1, e2, q0, f1, f2) -> Hierarchy:
    """Deformable two-keyframe hierarchy (the reference's space-time kd-tree
    regime, ``/root/reference/include/mitsuba/render/sahkdtree4.h:113``).

    TPU redesign: one SAH build over the UNION of the two keyframes'
    triangle AABBs (boxes valid for every shutter time), with both frames'
    packed block tables sharing the cluster order; at traversal time the
    wavefront's shared shutter time lerps the gathered rows, so a
    progressive render stratifies times across passes with zero per-ray
    machinery and no brute-force fallback at any scale."""
    from . import bvh as bvh_mod

    p0 = np.asarray(p0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    q0 = np.asarray(q0, np.float32)
    f1 = np.asarray(f1, np.float32)
    f2 = np.asarray(f2, np.float32)
    soup_a = np.concatenate([p0, e1, e2], axis=1)
    soup_b = np.concatenate([q0, f1, f2], axis=1)

    lo_a, hi_a = bvh_mod.tri_bounds(p0, e1, e2)
    lo_b, hi_b = bvh_mod.tri_bounds(q0, f1, f2)
    lo = np.minimum(lo_a, lo_b)
    hi = np.maximum(hi_a, hi_b)
    flat = bvh_mod.build_bvh_arrays(lo, hi, leaf_size=64)
    # union cluster bounds come from the union primitive boxes: pack both
    # frames with the SAME merged-leaf grouping and union the cluster AABBs
    groups = _leaf_groups(flat)
    cl_lo_a, cl_hi_a, rows_a = _pack_leaves(flat, soup_a, groups=groups)
    cl_lo_b, cl_hi_b, rows_b = _pack_leaves(flat, soup_b, groups=groups)
    cl_lo = np.minimum(cl_lo_a, cl_lo_b)
    cl_hi = np.maximum(cl_hi_a, cl_hi_b)

    sup_lo, sup_hi, childs, blocks, (blocks1,) = _pack_supers(
        cl_lo, cl_hi, rows_a, rows_extra=(rows_b,))
    swp_lo, swp_hi = _pad_sweep(sup_lo, sup_hi)
    S_pad = swp_lo.shape[1]
    ident = np.concatenate([np.eye(3, dtype=np.float32),
                            np.zeros((3, 1), np.float32)], axis=1)[None]
    return Hierarchy(
        swp_lo=jnp.asarray(swp_lo, Float), swp_hi=jnp.asarray(swp_hi, Float),
        sup_inst=jnp.zeros((S_pad,), Int),
        childs=jnp.asarray(childs, Float),
        blocks=jnp.asarray(blocks, Float),
        inst_inv=jnp.asarray(ident, Float), inst_fwd=jnp.asarray(ident, Float),
        sup_blas=jnp.zeros((1,), Int),
        blocks1=jnp.asarray(blocks1, Float), time=jnp.zeros((), Float),
        n_supers=int(sup_lo.shape[0]), n_tris=int(len(p0)),
        has_motion=True,
    )


def build_hierarchy_instanced(blas_list, instances) -> Hierarchy:
    """Shared-BLAS instancing (``/root/reference/src/shapes/instance.cpp:115``).

    blas_list: list of (p0, e1, e2, tri_ids) triangle soups in local space.
    instances: list of (blas_index, to_world (3,4)) — each instance
    contributes its BLAS's supers with world-space swept AABBs
    while child AABBs and triangle blocks are shared.  Memory is
    O(unique tris + instances x supers-per-blas).
    """
    from . import bvh as bvh_mod

    blas_data = []
    for (p0, e1, e2, tri_ids) in blas_list:
        p0 = np.asarray(p0, np.float32)
        e1 = np.asarray(e1, np.float32)
        e2 = np.asarray(e2, np.float32)
        soup = np.concatenate([p0, e1, e2], axis=1)
        lo, hi = bvh_mod.tri_bounds(p0, e1, e2)
        flat = bvh_mod.build_bvh_arrays(lo, hi, leaf_size=64)
        cl_lo, cl_hi, rows = _pack_leaves(
            flat, soup, None if tri_ids is None
            else np.asarray(tri_ids, np.int64))
        blas_data.append(_pack_supers(cl_lo, cl_hi, rows))

    childs = np.concatenate([b[2] for b in blas_data], axis=0)
    blocks = np.concatenate([b[3] for b in blas_data], axis=0)
    sup_off = np.cumsum([0] + [b[0].shape[0] for b in blas_data])

    all_lo, all_hi, all_inst, all_sid = [], [], [], []
    inv_list = [np.concatenate([np.eye(3, dtype=np.float32),
                                np.zeros((3, 1), np.float32)], axis=1)]
    fwd_list = [inv_list[0].copy()]
    for (blas_i, to_world) in instances:
        M = np.asarray(to_world, np.float32).reshape(3, 4)
        R = M[:, :3]
        Rinv = np.linalg.inv(R)
        inv = np.concatenate([Rinv, (-Rinv @ M[:, 3])[:, None]], axis=1)
        identity = np.allclose(M, inv_list[0])
        if identity:
            iid = 0
        else:
            iid = len(inv_list)
            inv_list.append(inv.astype(np.float32))
            fwd_list.append(M)
        s_lo, s_hi = blas_data[blas_i][0], blas_data[blas_i][1]
        # world AABB of a transformed box: |R| trick
        cent = (s_lo + s_hi) * 0.5 @ R.T + M[:, 3]
        ext = (s_hi - s_lo) * 0.5 @ np.abs(R).T
        all_lo.append(cent - ext)
        all_hi.append(cent + ext)
        n_s = s_lo.shape[0]
        all_inst.append(np.full(n_s, iid, np.int32))
        all_sid.append(np.arange(sup_off[blas_i], sup_off[blas_i] + n_s,
                                 dtype=np.int32))

    sup_lo = np.concatenate(all_lo).astype(np.float32)
    sup_hi = np.concatenate(all_hi).astype(np.float32)
    inst_ids = np.concatenate(all_inst)
    sids = np.concatenate(all_sid)
    S = sup_lo.shape[0]
    swp_lo, swp_hi = _pad_sweep(sup_lo, sup_hi)
    S_pad = swp_lo.shape[1]
    inst_pad = np.zeros(S_pad, np.int32)
    inst_pad[:S] = inst_ids
    # re-index childs/blocks so entry s of the world table maps to its BLAS
    # rows: keep shared storage, add an indirection via sup_blas
    sup_blas = np.zeros(S_pad, np.int32)
    sup_blas[:S] = sids
    n_tris = sum(len(b[0]) for b in blas_list)

    return Hierarchy(
        swp_lo=jnp.asarray(swp_lo, Float), swp_hi=jnp.asarray(swp_hi, Float),
        sup_inst=jnp.asarray(inst_pad, Int),
        childs=jnp.asarray(childs, Float),
        blocks=jnp.asarray(blocks, Float),
        inst_inv=jnp.asarray(np.stack(inv_list), Float),
        inst_fwd=jnp.asarray(np.stack(fwd_list), Float),
        sup_blas=jnp.asarray(sup_blas, Int),
        n_supers=S, n_tris=int(n_tris), indirect=True,
    )


# ---------------------------------------------------------------------------
# Traversal
# ---------------------------------------------------------------------------

def _nearest_super(h: Hierarchy, o, inv_d, tmin, t_best, gate_t, gate_c):
    """Lex-gated argmin of super entry-t: chunked dense per-axis sweep.

    Per-axis (N, CH) arithmetic on the transposed (3, S_pad) tables keeps
    intermediates 2-D and fusable (the round-2 (N, CH, 3) form forced ~6
    materialized 100 MB transients per chunk)."""
    N = o.shape[0]
    S_pad = h.swp_lo.shape[1]
    CH = min(SWEEP_CHUNK, S_pad)
    n_chunks = -(-S_pad // CH)

    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    ix, iy, iz = inv_d[:, 0:1], inv_d[:, 1:2], inv_d[:, 2:3]

    def chunk_body(kk, carry):
        best_e, best_c = carry
        # overlapping final window is harmless: candidates carry absolute
        # ids, and a min-reduce is idempotent under duplicates
        off = jnp.minimum(kk * CH, S_pad - CH)
        lo = jax.lax.dynamic_slice_in_dim(h.swp_lo, off, CH, 1)
        hi = jax.lax.dynamic_slice_in_dim(h.swp_hi, off, CH, 1)
        ax0 = (lo[0][None, :] - ox) * ix
        ax1 = (hi[0][None, :] - ox) * ix
        ay0 = (lo[1][None, :] - oy) * iy
        ay1 = (hi[1][None, :] - oy) * iy
        az0 = (lo[2][None, :] - oz) * iz
        az1 = (hi[2][None, :] - oz) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(ax0, ax1), jnp.minimum(ay0, ay1)),
            jnp.maximum(jnp.minimum(az0, az1), tmin[:, None]))
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(ax0, ax1), jnp.maximum(ay0, ay1)),
            jnp.minimum(jnp.maximum(az0, az1), t_best[:, None]))
        cid = off + jax.lax.broadcasted_iota(Int, (N, CH), 1)
        okm = (tn <= tf) & (tn < FAR) & (
            (tn > gate_t[:, None])
            | ((tn == gate_t[:, None]) & (cid > gate_c[:, None]))
        )
        e = jnp.where(okm, tn, BIG)
        emin = jnp.min(e, axis=1)
        # id pick via masked min over the existing id plane (argmax lowers
        # to an iota+reduce fusion that measured 'hot' in traces)
        idm = jnp.min(jnp.where(e == emin[:, None], cid, IBIG), axis=1)
        take = emin < best_e
        return (jnp.where(take, emin, best_e),
                jnp.where(take, idm, best_c))

    init = (jnp.full((N,), BIG, Float), jnp.zeros((N,), Int))
    if n_chunks == 1:
        return chunk_body(0, init)
    return jax.lax.fori_loop(0, n_chunks, chunk_body, init)


def _make_state(h, o, d, tmin, tmax, active_in=None):
    N = o.shape[0]
    d_safe = jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    inv_d = 1.0 / d_safe
    # root-AABB prepass: rays that miss the whole hierarchy never enter the
    # marching machinery (each would cost a full round slot otherwise)
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
    return dict(
        o=o, d=d, tmin=tmin,
        idx=jnp.arange(N, dtype=Int),
        t=jnp.minimum(jnp.full((N,), BIG, Float), tmax),
        u=jnp.zeros((N,), Float), v=jnp.zeros((N,), Float),
        prim=jnp.zeros((N,), Int), inst=jnp.zeros((N,), Int),
        found=jnp.zeros((N,), bool),
        sg_t=jnp.full((N,), -BIG, Float), sg_c=jnp.full((N,), -1, Int),
        sidc=jnp.zeros((N,), Int),
        ig_t=jnp.full((N,), -BIG, Float), ig_c=jnp.full((N,), -1, Int),
        has_super=jnp.zeros((N,), bool),
        active=hits_root,
        # stale=True marks lanes whose (M, SUP) child-entry cache must be
        # rebuilt before use (set when a mid-super lane re-enters through
        # the pending queue, which does not carry the cache)
        stale=jnp.zeros((N,), bool),
    )


def _compute_centry(h, sidc, ol, invl, tmin, t_b):
    """Child-cluster entry distances for each lane's current super: one
    packed (CROW,) row gather + componentwise (M, SUP) slab tests."""
    crow_idx = h.sup_blas[sidc] if h.indirect else sidc
    crow = h.childs[jnp.clip(crow_idx, 0, h.childs.shape[0] - 1)]
    lox = crow[:, 0 * SUP : 1 * SUP]
    loy = crow[:, 1 * SUP : 2 * SUP]
    loz = crow[:, 2 * SUP : 3 * SUP]
    hix = crow[:, 3 * SUP : 4 * SUP]
    hiy = crow[:, 4 * SUP : 5 * SUP]
    hiz = crow[:, 5 * SUP : 6 * SUP]
    ax0 = (lox - ol[:, 0:1]) * invl[:, 0:1]
    ax1 = (hix - ol[:, 0:1]) * invl[:, 0:1]
    ay0 = (loy - ol[:, 1:2]) * invl[:, 1:2]
    ay1 = (hiy - ol[:, 1:2]) * invl[:, 1:2]
    az0 = (loz - ol[:, 2:3]) * invl[:, 2:3]
    az1 = (hiz - ol[:, 2:3]) * invl[:, 2:3]
    ctn = jnp.maximum(
        jnp.maximum(jnp.minimum(ax0, ax1), jnp.minimum(ay0, ay1)),
        jnp.maximum(jnp.minimum(az0, az1), tmin[:, None]))
    ctf = jnp.minimum(
        jnp.minimum(jnp.maximum(ax0, ax1), jnp.maximum(ay0, ay1)),
        jnp.minimum(jnp.maximum(az0, az1), t_b[:, None]))
    return jnp.where((ctn <= ctf) & (ctn < FAR), ctn, BIG)


def _one_step(h: Hierarchy, st, inv_d, centry_in, any_hit, fresh=False):
    """Advance every lane of a state slice by one traversal step.

    ``centry_in``: (M, SUP) cached child entries, valid for lanes that kept
    their super since the cache was filled (super-switch lanes recompute
    theirs; the cache is carried across compaction rounds by the driver, so
    ``fresh=True`` — recompute for every lane — is only needed by callers
    that cannot carry it)."""
    M = st["o"].shape[0]
    o, d, tmin = st["o"], st["d"], st["tmin"]
    instanced = h.inst_inv.shape[0] > 1
    sup_iota = jax.lax.broadcasted_iota(Int, (M, SUP), 1)

    active = st["active"]
    t_b = st["t"]
    need = active & ~st["has_super"]

    # --- super advance for lanes without a current super -------------------
    def do_sweep(_):
        return _nearest_super(h, o, inv_d, tmin, t_b, st["sg_t"], st["sg_c"])

    se, sid = jax.lax.cond(
        jnp.any(need), do_sweep,
        lambda _: (jnp.full_like(t_b, BIG), jnp.zeros_like(st["sg_c"])),
        None)
    got = need & (se < BIG)
    active = active & (~need | got)
    sg_t = jnp.where(got, se, st["sg_t"])
    sg_c = jnp.where(got, sid, st["sg_c"])
    sidc = jnp.where(got, sid, st["sidc"])

    # instance-local ray (t-preserving: direction not renormalized)
    if instanced:
        inst = h.sup_inst[jnp.clip(sidc, 0, h.sup_inst.shape[0] - 1)]
        Mx = h.inst_inv[jnp.clip(inst, 0, h.inst_inv.shape[0] - 1)]
        ol = jnp.einsum("nij,nj->ni", Mx[:, :, :3], o) + Mx[:, :, 3]
        dl = jnp.einsum("nij,nj->ni", Mx[:, :, :3], d)
        dl_safe = jnp.where(jnp.abs(dl) < 1e-20,
                            jnp.where(dl < 0, -1e-20, 1e-20), dl)
        invl = 1.0 / dl_safe
    else:
        inst = jnp.zeros((M,), Int)
        ol, dl, invl = o, d, inv_d

    refresh = got | (st["stale"] & st["has_super"] & active)
    if fresh:
        centry = _compute_centry(h, sidc, ol, invl, tmin, t_b)
    else:
        centry = jax.lax.cond(
            jnp.any(refresh),
            lambda c: jnp.where(
                refresh[:, None],
                _compute_centry(h, sidc, ol, invl, tmin, t_b), c),
            lambda c: c, centry_in)
    ig_t = jnp.where(got, -BIG, st["ig_t"])
    ig_c = jnp.where(got, -1, st["ig_c"])
    has_super = (st["has_super"] | got) & active

    # --- one child-cluster test (packed row gather + dense MT) -------------
    gated = (
        (centry > ig_t[:, None])
        | ((centry == ig_t[:, None]) & (sup_iota > ig_c[:, None]))
    )
    e = jnp.where(gated & (centry <= t_b[:, None]), centry, BIG)
    emin = jnp.min(e, axis=1)
    kk = jnp.min(jnp.where(e == emin[:, None], sup_iota, IBIG), axis=1)
    kk = jnp.where(emin < BIG, kk, 0)
    ihas = (emin < BIG) & has_super
    blk_base = h.sup_blas[sidc] if h.indirect else sidc
    cid = jnp.clip(blk_base * SUP + jnp.where(ihas, kk, 0), 0,
                   h.blocks.shape[0] - 1)

    row = h.blocks[cid]                         # (M, ROW) one packed gather
    if h.has_motion:
        # deformable: lerp the geometric columns between the keyframe
        # tables at the wavefront's shared shutter time (ids stay frame-0)
        row1 = h.blocks1[cid]
        comp = [(1.0 - h.time) * row[:, c * LEAF:(c + 1) * LEAF]
                + h.time * row1[:, c * LEAF:(c + 1) * LEAF]
                for c in range(9)]
    else:
        comp = [row[:, c * LEAF : (c + 1) * LEAF] for c in range(9)]
    p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z = comp
    pids = jax.lax.bitcast_convert_type(row[:, LEAF * 9 :], Int)

    # componentwise Moeller-Trumbore on (M, LEAF) planes (3-D intermediates
    # defeat XLA fusion; 2-D planes stay in registers)
    olx, oly, olz = ol[:, 0:1], ol[:, 1:2], ol[:, 2:3]
    dlx, dly, dlz = dl[:, 0:1], dl[:, 1:2], dl[:, 2:3]
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
    hitm = (
        (jnp.abs(det) > 1e-12)
        & (uu >= 0) & (vv >= 0) & (uu + vv <= 1)
        & (tt > tmin[:, None]) & (tt < t_b[:, None]) & ihas[:, None]
    )
    tm = jnp.where(hitm, tt, BIG)
    tnew = jnp.min(tm, axis=1)
    better = tnew < t_b
    # tie-break via masked min over the lane iota (no cumsum/argmin: both
    # lower to expensive reduce-window / iota-reduce fusions)
    lane = jax.lax.broadcasted_iota(Int, tm.shape, 1)
    kpick = jnp.min(jnp.where(tm == tnew[:, None], lane, IBIG), axis=1)
    oh = (lane == jnp.where(better, kpick, -1)[:, None]).astype(Float)
    pick = lambda a: jnp.sum(a * oh, axis=1)
    t_b = jnp.where(better, tnew, t_b)
    u_b = jnp.where(better, pick(uu), st["u"])
    v_b = jnp.where(better, pick(vv), st["v"])
    p_b = jnp.where(better, jnp.sum(pids * oh.astype(Int), axis=1),
                    st["prim"])
    i_b = jnp.where(better, inst, st["inst"])
    found = st["found"] | better

    ig_t = jnp.where(ihas, emin, ig_t)
    ig_c = jnp.where(ihas, kk, ig_c)
    has_super = has_super & ihas
    if any_hit:
        active = active & ~found

    return dict(
        o=o, d=d, tmin=tmin, idx=st["idx"],
        t=t_b, u=u_b, v=v_b, prim=p_b, inst=i_b, found=found,
        sg_t=sg_t, sg_c=sg_c, sidc=sidc,
        ig_t=ig_t, ig_c=ig_c, has_super=has_super, active=active,
        stale=jnp.zeros_like(st["stale"]),
    ), centry


# Packed-state column layout.  The 7 RESULT columns lead so the retire
# queue write is a contiguous column slice of the sorted pack; the pending
# queue uses the first _NCOL columns; the front additionally carries the
# (M, SUP) child-entry cache so no step ever recomputes it wholesale.
_R_KEYS = ("t", "u", "v", "prim", "inst", "found", "idx")  # result cols
_F_KEYS = ("t", "u", "v", "sg_t", "ig_t", "tmin")
_I_KEYS = ("prim", "inst", "idx", "sg_c", "sidc", "ig_c")
_B_KEYS = ("found", "has_super", "active", "stale")
_ORDER = ("t", "u", "v", "prim", "inst", "found", "idx",
          "ox", "oy", "oz", "dx", "dy", "dz",
          "tmin", "sg_t", "ig_t", "sg_c", "sidc", "ig_c",
          "has_super", "active", "stale")
_NCOL = len(_ORDER)  # 22
_NRES = len(_R_KEYS)  # 7


def _pack_state(state, centry=None):
    """All state as ONE (N, 22) f32 matrix (ints/bools bitcast) — result
    columns first — so the compaction permute is a single wide row gather
    and the retire-queue write is a leading column slice.  With ``centry``
    the cache rides along as 64 extra columns (N, 86)."""
    cols = []
    for k in _ORDER:
        if k in ("ox", "oy", "oz"):
            cols.append(state["o"][:, ("ox", "oy", "oz").index(k), None])
        elif k in ("dx", "dy", "dz"):
            cols.append(state["d"][:, ("dx", "dy", "dz").index(k), None])
        elif k in _B_KEYS:
            cols.append(jax.lax.bitcast_convert_type(
                state[k].astype(Int), Float)[:, None])
        elif k in _I_KEYS:
            cols.append(
                jax.lax.bitcast_convert_type(state[k], Float)[:, None])
        else:
            cols.append(state[k][:, None])
    if centry is not None:
        cols.append(centry)
    return jnp.concatenate(cols, axis=1)


def _unpack_state(P):
    out = {}
    for c, k in enumerate(_ORDER):
        v = P[:, c]
        if k in _B_KEYS:
            out[k] = jax.lax.bitcast_convert_type(v, Int) > 0
        elif k in _I_KEYS:
            out[k] = jax.lax.bitcast_convert_type(v, Int)
        else:
            out[k] = v
    out["o"] = P[:, 7:10]
    out["d"] = P[:, 10:13]
    for k in ("ox", "oy", "oz", "dx", "dy", "dz"):
        out.pop(k, None)
    centry = P[:, _NCOL:] if P.shape[1] > _NCOL else None
    return out, centry


def _run_front(h, front, any_hit, k_inner, centry=None):
    d = front["d"]
    d_safe = jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    inv_d = 1.0 / d_safe
    if centry is None:
        front, centry = _one_step(h, front, inv_d, None, any_hit, fresh=True)
        k_done = 1
    else:
        k_done = 0
    if k_inner > k_done:
        front, centry = jax.lax.fori_loop(
            0, k_inner - k_done,
            lambda i, c: _one_step(h, c[0], inv_d, c[1], any_hit, fresh=False),
            (front, centry))
    return front, centry


def intersect_hierarchy(h: Hierarchy, o, d, tmin, tmax, any_hit=False,
                        active=None, front=FRONT, k_inner=K_INNER,
                        prologue=PROLOGUE, use_kernel=None):
    """Closest-hit (or any-hit) march over the two-level hierarchy.

    o, d: (N, 3) world-space rays.  Returns dict(t, u, v, prim, inst, found)
    of flat (N,) arrays; t is the world-space ray parameter.  ``active``
    optionally masks lanes off (sparse bounce wavefronts retire instantly
    instead of paying traversal rounds).

    **Retire-cursor compaction driver** (round-4 rework; the round-3
    attempt of this design silently corrupted TPU renders — suspected
    duplicate-index scatter — and is now gated by ``parity_check.py`` plus
    a unique-retire construction, see below).  The round-3 driver paid
    ~0.9 ms/round of bookkeeping, dominated by a per-round scatter into the
    (N, 6) result matrix that XLA laid out transposed; this driver removes
    every per-round scatter/gather:

    - retired rows are *appended* to a result queue with one contiguous
      ``dynamic_update_slice`` per round (the per-round sort puts real
      retirees first, so the written block's prefix is exactly the new
      results; the garbage tail is overwritten by the next round's append);
    - refills are *contiguous slices* of the round-0-sorted pending queue
      (the old driver gathered them through a clipped index vector);
    - ONE final scatter places queue rows by their ray index — each real
      ray retires exactly once (slots are always refilled, with tombstone
      rows once the pending queue is dry), so the scatter has unique
      indices by construction, removing the round-3 failure mode;
    - the (M, SUP) child-entry cache is carried through compaction inside
      the packed state, killing the all-lanes "fresh" recompute that cost
      ~0.1 ms/round.

    **Full-width prologue**: the driver's per-round cost is dominated by
    fixed per-dispatch overhead at front-sized (8K-lane) shapes, while the
    per-ray work distribution is extremely head-heavy (p50 = 1 cluster
    visit on the 1.1M-tri bench).  So the first ``prologue`` traversal
    steps run at FULL width — root test, first super sweep, first cluster
    test as a handful of large, fully-amortized ops — and only the
    multi-visit tail enters the compaction driver.  Survivors re-enter
    with ``stale=True`` so their child-entry cache (not carried by the
    22-column pending queue) is rebuilt on their first driver step while
    their cluster-order gate resumes exactly where the prologue stopped.
    """
    from .intersect import _use_pallas

    if use_kernel is None:
        use_kernel = False  # XLA driver measured faster; see PERF_NOTES r5
    if use_kernel:
        # fused Pallas step kernel (bitwise-equal traversal, see
        # hier_kernel.py); the XLA driver below remains the CPU/parity
        # reference and the deformable-motion path
        from .hier_kernel import intersect_hier_kernel

        return intersect_hier_kernel(h, o, d, tmin, tmax, any_hit=any_hit,
                                     active=active)

    N = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, Float), (N,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, Float), (N,))
    state = _make_state(h, o, d, tmin, tmax, active_in=active)

    if N <= front:
        def cond(c):
            return jnp.any(c[0]["active"])

        def body(c):
            return _run_front(h, c[0], any_hit, k_inner, centry=c[1])

        zc = jnp.zeros((N, SUP), Float)
        state, _ = jax.lax.while_loop(cond, body, (state, zc))
        return dict(t=state["t"], u=state["u"], v=state["v"],
                    prim=state["prim"], inst=state["inst"],
                    found=state["found"])

    # --- full-width prologue ------------------------------------------------
    if prologue > 0:
        state, _ = _run_front(h, state, any_hit, prologue,
                              centry=jnp.zeros((N, SUP), Float))
        state = dict(state, stale=state["has_super"])

    # --- retire-cursor driver ----------------------------------------------
    M = front
    P = _pack_state(state)  # (N, 22) pending queue, no centry
    perm0 = jnp.argsort(~state["active"], stable=True)
    P = P[perm0]
    n_act = jnp.sum(state["active"].astype(Int))
    # pad by M rows so the refill slice below never clamps its start (a
    # clamp+roll realignment variant miscompiled on the TPU backend: the
    # pending tail was lost, caught by parity_check + test_driver_equiv)
    P = jnp.concatenate([P, jnp.zeros((M, _NCOL), Float)], axis=0)

    # retire queue: rows appended per round, placed by ONE final scatter.
    # Size N + M absorbs the final round's garbage tail.
    resq = jnp.zeros((N + M, _NRES), Float)
    slot = jnp.arange(M, dtype=Int)
    zc = jnp.zeros((M, SUP), Float)
    TOMB = jnp.asarray(N, Int)  # tombstone ray index (dropped at scatter)

    def cond(carry):
        fr, centry, tail, cursor, resq = carry
        return jnp.any(fr["active"])

    def body(carry):
        fr, centry, tail, cursor, resq = carry
        fr, centry = _run_front(h, fr, any_hit, k_inner, centry=centry)
        retired = ~fr["active"]
        tomb = fr["idx"] >= N
        # sort key: real retirees (0) < tombstones (1) < active (2); the
        # write below persists rows [0, n_real) at the cursor
        key = jnp.where(retired, jnp.where(tomb, 1, 0), 2)
        permf = jnp.argsort(key, stable=True)
        Pf = _pack_state(fr, centry)[permf]
        n_real = jnp.sum((retired & ~tomb).astype(Int))
        n_ret = jnp.sum(retired.astype(Int))
        resq = jax.lax.dynamic_update_slice(resq, Pf[:, :_NRES],
                                            (cursor, 0))
        # refill every retired slot: pending rays while they last, then
        # tombstones (idx = N, inactive at once so they retire next round)
        take_new = slot < n_ret
        have_ray = tail + slot < n_act
        # contiguous refill read; P is padded by M rows so the slice start
        # (tail <= n_act <= N) never clamps
        Pref = jax.lax.dynamic_slice(P, (tail, 0), (M, _NCOL))
        Pf21 = jnp.where(take_new[:, None], Pref, Pf[:, :_NCOL])
        fr2, _ = _unpack_state(Pf21)
        centry2 = jnp.where(take_new[:, None], 0.0, Pf[:, _NCOL:])
        is_tomb_new = take_new & ~have_ray
        fr2["idx"] = jnp.where(is_tomb_new, TOMB, fr2["idx"])
        fr2["active"] = fr2["active"] & ~is_tomb_new
        fr2["found"] = fr2["found"] & ~is_tomb_new
        tail2 = tail + jnp.minimum(n_ret, jnp.maximum(n_act - tail, 0))
        return fr2, centry2, tail2, cursor + n_real, resq

    fr0, _ = _unpack_state(P[:M])
    carry = (fr0, zc, jnp.asarray(M, Int), jnp.asarray(0, Int), resq)
    fr, centry, tail, cursor, resq = jax.lax.while_loop(cond, body, carry)

    # base results: the (possibly prologue-advanced) full-width state —
    # rays that never entered the driver (missed root / masked off /
    # finished in the prologue) read straight from it
    t_r = state["t"]
    u_r = state["u"]
    v_r = state["v"]
    p_r = state["prim"]
    i_r = state["inst"]
    f_r = state["found"].astype(Int)
    qidx = jax.lax.bitcast_convert_type(resq[:, 6], Int)
    # rows at or past the cursor are garbage from the last append
    valid = jnp.arange(N + M, dtype=Int) < cursor
    widx = jnp.where(valid, jnp.clip(qidx, 0, N), N)
    t_r = t_r.at[widx].set(resq[:, 0], mode="drop")
    u_r = u_r.at[widx].set(resq[:, 1], mode="drop")
    v_r = v_r.at[widx].set(resq[:, 2], mode="drop")
    p_r = p_r.at[widx].set(
        jax.lax.bitcast_convert_type(resq[:, 3], Int), mode="drop")
    i_r = i_r.at[widx].set(
        jax.lax.bitcast_convert_type(resq[:, 4], Int), mode="drop")
    f_r = f_r.at[widx].set(
        jax.lax.bitcast_convert_type(resq[:, 5], Int), mode="drop")
    return dict(t=t_r, u=u_r, v=v_r, prim=p_r, inst=i_r, found=f_r > 0)
