"""Cluster-marching intersector for large scenes on TPU.

The classic per-lane BVH walk is hostile to TPU vector lanes: every step is
a data-dependent gather and all 8x128 lanes wait for the slowest walker
(measured ~0.01 MRays/s on a v5e).  This scheme restructures traversal as
wavefront-friendly dense math:

- triangles are partitioned into AABB clusters of <=64 via the binned-SAH
  builder (leaf size 64), stored as padded (C, 64, 9) blocks;
- each ray marches clusters in increasing entry-t order: every visit
  *recomputes* all C slab tests (dense (N, chunk) VPU work — far cheaper
  than materializing or walking) and picks the nearest unvisited cluster
  with entry < current best hit;
- the chosen cluster's 64 triangles load as ONE contiguous 2.3 KB row
  gather per lane and run a fully vectorized Moeller-Trumbore tile.

Effective for scenes up to a few hundred thousand triangles (C ~ T/64
slab tests per visit); a two-level cluster hierarchy extends it beyond
(planned).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.types import pytree_dataclass, static_field, Float, Int

LEAF = 64
BIG = 3.0e37


@pytree_dataclass
class ClusterSet:
    lo: jax.Array  # (C, 3)
    hi: jax.Array  # (C, 3)
    tris: jax.Array  # (C, LEAF, 9) p0|e1|e2 (padded with degenerate)
    prim: jax.Array  # (C, LEAF) original triangle ids (padded with 0)
    valid: jax.Array  # (C, LEAF) 1/0
    n_clusters: int = static_field(default=0)


def build_clusters(p0: np.ndarray, e1: np.ndarray, e2: np.ndarray) -> ClusterSet:
    """Partition the soup with the SAH builder at leaf size LEAF."""
    from . import bvh as bvh_mod

    lo, hi = bvh_mod.tri_bounds(p0, e1, e2)
    flat = bvh_mod.build_bvh(lo, hi, leaf_size=LEAF)
    node_count = np.asarray(flat.node_count)
    node_start = np.asarray(flat.node_start)
    node_lo = np.asarray(flat.node_lo)
    node_hi = np.asarray(flat.node_hi)
    order = np.asarray(flat.order)

    leaves = np.nonzero(node_count > 0)[0]
    C = len(leaves)
    tris = np.zeros((C, LEAF, 9), np.float32)
    prim = np.zeros((C, LEAF), np.int32)
    valid = np.zeros((C, LEAF), np.float32)
    cl_lo = node_lo[leaves]
    cl_hi = node_hi[leaves]
    soup = np.concatenate(
        [np.asarray(p0, np.float32), np.asarray(e1, np.float32),
         np.asarray(e2, np.float32)], axis=1,
    )  # (T, 9)
    for i, n in enumerate(leaves):
        s, c = node_start[n], node_count[n]
        ids = order[s : s + c]
        tris[i, :c] = soup[ids]
        prim[i, :c] = ids
        valid[i, :c] = 1.0
    return ClusterSet(
        lo=jnp.asarray(cl_lo, Float), hi=jnp.asarray(cl_hi, Float),
        tris=jnp.asarray(tris, Float), prim=jnp.asarray(prim, Int),
        valid=jnp.asarray(valid, Float), n_clusters=C,
    )


def intersect_clusters(cs: ClusterSet, o, d, tmin, tmax, any_hit=False,
                       max_visits=None):
    """Closest-hit (or any-hit) over the cluster set.

    Returns dict(t, u, v, prim, found) of flat (N,) arrays.
    """
    N = o.shape[0]
    C = cs.n_clusters
    if max_visits is None:
        max_visits = C  # unbiased: a lane may in the worst case visit all
    tmin = jnp.broadcast_to(jnp.asarray(tmin, Float), (N,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, Float), (N,))
    d_safe = jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    inv_d = 1.0 / d_safe

    # chunk size for the slab sweep (bounds the (N, chunk) transient)
    CH = min(256, C)
    n_chunks = -(-C // CH)
    pad_C = n_chunks * CH
    lo = jnp.pad(cs.lo, ((0, pad_C - C), (0, 0)), constant_values=1e30)
    hi = jnp.pad(cs.hi, ((0, pad_C - C), (0, 0)), constant_values=-1e30)

    def nearest_cluster(gate_t, gate_c, t_best):
        """argmin over clusters of entry t, restricted to (entry, c) lexico-
        graphically greater than (gate_t, gate_c) and entry <= t_best."""
        def chunk_body(k, carry):
            best_e, best_c = carry
            sl = jax.lax.dynamic_slice_in_dim(lo, k * CH, CH, 0)  # (CH, 3)
            sh = jax.lax.dynamic_slice_in_dim(hi, k * CH, CH, 0)
            t0 = (sl[None] - o[:, None, :]) * inv_d[:, None, :]
            t1 = (sh[None] - o[:, None, :]) * inv_d[:, None, :]
            tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), tmin[:, None])
            tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), -1), t_best[:, None])
            cid = k * CH + jax.lax.broadcasted_iota(Int, (N, CH), 1)
            okm = (tn <= tf) & (
                (tn > gate_t[:, None])
                | ((tn == gate_t[:, None]) & (cid > gate_c[:, None]))
            )
            e = jnp.where(okm, tn, BIG)
            # lexicographic min within the chunk: min entry, tie -> min cid
            emin = jnp.min(e, axis=1)
            first = jnp.argmax(e == emin[:, None], axis=1)
            cmin = k * CH + first
            take = emin < best_e
            return (jnp.where(take, emin, best_e),
                    jnp.where(take, cmin.astype(Int), best_c))

        init = (jnp.full((N,), BIG, Float), jnp.zeros((N,), Int))
        return jax.lax.fori_loop(0, n_chunks, chunk_body, init)

    def body(state):
        t_best, u_b, v_b, p_b, found, gate_t, gate_c, active, visits = state
        e, c = nearest_cluster(gate_t, gate_c, t_best)
        has = (e < BIG) & active
        csel = jnp.where(has, c, 0)

        blk = cs.tris[csel]  # (N, LEAF, 9) one contiguous row per lane
        vmask = cs.valid[csel] > 0
        pids = cs.prim[csel]

        ox = o[:, None, :]
        dx = d[:, None, :]
        p0 = blk[..., 0:3]
        e1 = blk[..., 3:6]
        e2 = blk[..., 6:9]
        from ..core import math as m

        pv = m.cross(dx, e2)  # (N, LEAF, 3) — LEAF-wide transient
        det = jnp.sum(e1 * pv, -1)
        inv_det = jnp.where(jnp.abs(det) > 1e-12,
                            1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        tv = ox - p0
        uu = jnp.sum(tv * pv, -1) * inv_det
        qv = m.cross(tv, e1)
        vv = jnp.sum(dx * qv, -1) * inv_det
        tt = jnp.sum(e2 * qv, -1) * inv_det
        hitm = (
            vmask & (jnp.abs(det) > 1e-12)
            & (uu >= 0) & (vv >= 0) & (uu + vv <= 1)
            & (tt > tmin[:, None]) & (tt < t_best[:, None])
            & (tt < tmax[:, None]) & has[:, None]
        )
        tm = jnp.where(hitm, tt, BIG)
        k = jnp.argmin(tm, axis=1)
        tnew = jnp.min(tm, axis=1)
        better = tnew < t_best
        onehot = jax.lax.broadcasted_iota(Int, tm.shape, 1) == k[:, None]
        pick = lambda a: jnp.sum(jnp.where(onehot, a, 0), axis=1)
        t_best = jnp.where(better, tnew, t_best)
        u_b = jnp.where(better, pick(uu), u_b)
        v_b = jnp.where(better, pick(vv), v_b)
        p_b = jnp.where(better, pick(pids), p_b)
        found = found | better
        if any_hit:
            active = active & has & ~found
        else:
            active = active & has
        return (t_best, u_b, v_b, p_b, found, jnp.where(has, e, gate_t),
                jnp.where(has, c, gate_c), active, visits + 1)

    def cond(state):
        return jnp.any(state[7]) & (state[8] < max_visits)

    init = (
        jnp.minimum(jnp.full((N,), BIG, Float), tmax),
        jnp.zeros((N,), Float), jnp.zeros((N,), Float), jnp.zeros((N,), Int),
        jnp.zeros((N,), bool),
        jnp.full((N,), -BIG, Float), jnp.full((N,), -1, Int),
        jnp.ones((N,), bool), jnp.zeros((), Int),
    )
    t_best, u_b, v_b, p_b, found, _gt, _gc, _a, _v = jax.lax.while_loop(
        cond, body, init
    )
    return dict(t=t_best, u=u_b, v=v_b, prim=p_b, found=found)
