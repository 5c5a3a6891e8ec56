"""Pallas TPU kernels for ray-triangle intersection (brute-force path).

The jnp broadcast intersector materializes (rays x tris) intermediates in
HBM; these kernels keep the triangle soup in VMEM and the running best hit
in vector registers, so HBM traffic is just rays-in / hits-out.

Layout: ray components arrive as eight independent (rows, 128) SoA arrays
(ox..dz, tmin, tmax) — producing those from an (N, 3) ray batch is nearly
free (XLA keeps (N, 3) compact, so a component slice + reshape is a single
cheap copy), whereas the previous packed ``o.T.reshape(3, rows, 128)``
forced a real relayout (~0.8 ms/Mray).  Each program owns a (TILE, 128)
tile of rays (TILE up to 256 sublanes = 32K rays) and walks it in (8, 128)
groups with an inner ``fori_loop``, so the pallas grid is ~32 steps per
Mray instead of 1024 (grid steps cost ~2 us each).

Triangles are lane-replicated (T_pad, 128) arrays; a chunk of 8 loads as an
aligned (8, 128) tile whose sublane r holds triangle 8c+r.  Mosaic forbids
scalar loads at dynamic lane offsets, so instead of broadcasting one
triangle at a time the kernel tests the chunk elementwise against the ray
group and cycles it with ``pltpu.roll`` — 8 rotations cover all 64
(ray-row x triangle) pairs, keeping every VPU op on a dense (8, 128) tile.

Used when the scene's triangle count is below ``BRUTE_FORCE_MAX``
(Cornell-box-class scenes); larger scenes take the cluster-marching path.

Measured design notes (v5e, 1M incoherent rays, T_pad=16): the kernel is
VPU *issue*-bound at ~1 vector op/cycle (~1.0 Grays/s closest-hit), not
flop- or roll-bound.  Two rejected alternatives, benchmarked head-to-head:
(a) (1,128) row-broadcast triangle layout without rolls — 15% slower than
the roll cycle; (b) Baldwin-Weber precomputed-matrix tests (~40% fewer
arithmetic flops than Moeller-Trumbore) — identical wall time, because the
per-test bookkeeping (hit mask combine, best-hit selects, index iota) is
the same and dominates once the geometric math shrinks.  Further gains at
small T need fewer per-test *ops*, not fewer flops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import Float, Int

LANES = 128
SUB = 8
CHUNK = 8  # triangles per chunk (sublane tile)
MAX_TILE = 256  # ray sublanes per program (256*128 = 32K rays)
BIG = 3.0e37


def _mt(ox, oy, oz, dx, dy, dz, tmin, tlim,
        p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z):
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12,
                        1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    tx = ox - p0x
    ty = oy - p0y
    tz = oz - p0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > tmin) & (t < tlim)
    )
    return hit, t, u, v


def _closest_kernel(*refs):
    tri = refs[0:9]
    ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tn_r, tf_r = refs[9:17]
    t_ref, u_ref, v_ref, idx_ref = refs[17:21]
    T = tri[0].shape[0]
    tile = ox_r.shape[0]

    sub_iota = jax.lax.broadcasted_iota(Int, (SUB, LANES), 0)

    def group(g, _):
        s = pl.multiple_of(g * SUB, SUB)
        ox, oy, oz = (ox_r[pl.ds(s, SUB), :], oy_r[pl.ds(s, SUB), :],
                      oz_r[pl.ds(s, SUB), :])
        dx, dy, dz = (dx_r[pl.ds(s, SUB), :], dy_r[pl.ds(s, SUB), :],
                      dz_r[pl.ds(s, SUB), :])
        tmin = tn_r[pl.ds(s, SUB), :]
        tmax = tf_r[pl.ds(s, SUB), :]

        def body(c, carry):
            t_b, u_b, v_b, i_b = carry
            cs = pl.multiple_of(c * CHUNK, CHUNK)
            comps = [r[pl.ds(cs, CHUNK), :] for r in tri]
            for j in range(CHUNK):
                if j > 0:
                    comps = [pltpu.roll(x, 1, 0) for x in comps]
                hit, t, u, v = _mt(ox, oy, oz, dx, dy, dz, tmin, t_b, *comps)
                # after j rolls, sublane r holds triangle 8c + (r - j) mod 8
                tri_idx = c * CHUNK + jnp.bitwise_and(
                    sub_iota + (CHUNK - j), CHUNK - 1)
                t_b = jnp.where(hit, t, t_b)
                u_b = jnp.where(hit, u, u_b)
                v_b = jnp.where(hit, v, v_b)
                i_b = jnp.where(hit, tri_idx, i_b)
            return t_b, u_b, v_b, i_b

        init = (
            jnp.minimum(jnp.full((SUB, LANES), BIG, Float), tmax),
            jnp.zeros((SUB, LANES), Float),
            jnp.zeros((SUB, LANES), Float),
            jnp.full((SUB, LANES), -1, Int),
        )
        t_b, u_b, v_b, i_b = jax.lax.fori_loop(0, T // CHUNK, body, init)
        t_ref[pl.ds(s, SUB), :] = t_b
        u_ref[pl.ds(s, SUB), :] = u_b
        v_ref[pl.ds(s, SUB), :] = v_b
        idx_ref[pl.ds(s, SUB), :] = i_b
        return 0

    jax.lax.fori_loop(0, tile // SUB, group, 0)


def _anyhit_kernel(*refs):
    tri = refs[0:9]
    ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tn_r, tf_r = refs[9:17]
    hit_ref = refs[17]
    T = tri[0].shape[0]
    tile = ox_r.shape[0]

    def group(g, _):
        s = pl.multiple_of(g * SUB, SUB)
        ox, oy, oz = (ox_r[pl.ds(s, SUB), :], oy_r[pl.ds(s, SUB), :],
                      oz_r[pl.ds(s, SUB), :])
        dx, dy, dz = (dx_r[pl.ds(s, SUB), :], dy_r[pl.ds(s, SUB), :],
                      dz_r[pl.ds(s, SUB), :])
        tmin = tn_r[pl.ds(s, SUB), :]
        tmax = tf_r[pl.ds(s, SUB), :]

        def body(c, acc):
            cs = pl.multiple_of(c * CHUNK, CHUNK)
            comps = [r[pl.ds(cs, CHUNK), :] for r in tri]
            for j in range(CHUNK):
                if j > 0:
                    comps = [pltpu.roll(x, 1, 0) for x in comps]
                hit, _t, _u, _v = _mt(ox, oy, oz, dx, dy, dz, tmin, tmax,
                                      *comps)
                # int32 accumulator: Mosaic rejects i1 vector loop carries
                acc = acc | hit.astype(Int)
            return acc

        acc = jax.lax.fori_loop(
            0, T // CHUNK, body, jnp.zeros((SUB, LANES), Int)
        )
        hit_ref[pl.ds(s, SUB), :] = acc
        return 0

    jax.lax.fori_loop(0, tile // SUB, group, 0)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def _tri_specs(T_pad):
    return [
        pl.BlockSpec((T_pad, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for _ in range(9)
    ]


def _ray_specs(tile):
    bs = pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
    return [bs] * 8


def replicate_tris(geom):
    """(9, T_pad, 128) lane-replicated triangle component arrays."""
    comps = jnp.concatenate(
        [geom.tri_p0.T, geom.tri_e1.T, geom.tri_e2.T], axis=0
    )  # (9, T)
    T = comps.shape[1]
    T_pad = max(-(-T // CHUNK) * CHUNK, CHUNK)
    comps = jnp.pad(comps, ((0, 0), (0, T_pad - T)))
    return jnp.broadcast_to(comps[:, :, None], (9, T_pad, LANES))


def _prep_components(comps8):
    """Eight flat (N,) ray components -> (rows, 128) planes.

    The (npad,) -> (rows, 128) reshape is a layout no-op (row-major), so
    component-SoA callers pay only the pad."""
    n = comps8[0].shape[0]
    rows_min = max(-(-n // LANES), SUB)
    tile = min(-(-rows_min // SUB) * SUB, MAX_TILE)
    block = tile * LANES
    npad = -(-n // block) * block
    rows = npad // LANES
    # pad values: direction components 1.0 (avoids degenerate rays),
    # tmax -1.0 (marks padding lanes as no-hit)
    fills = [0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, -1.0]
    planes = [
        jnp.pad(c, (0, npad - n), constant_values=f).reshape(rows, LANES)
        for c, f in zip(comps8, fills)
    ]
    return planes, rows, tile


def _prep_rays(o, d, tmin, tmax):
    """(N,3) rays -> eight (rows, 128) SoA component planes.

    Component slices of a compact (N, 3) array are nearly free."""
    n = o.shape[0]
    tn = jnp.broadcast_to(jnp.asarray(tmin, Float), (n,))
    tf = jnp.broadcast_to(jnp.asarray(tmax, Float), (n,))
    return _prep_components(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tn, tf]
    )


def _closest_planes(tri_rep, planes, rows, tile, n):
    T_pad = tri_rep.shape[1]
    grid = rows // tile
    out_bs = pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    t, u, v, idx = pl.pallas_call(
        _closest_kernel,
        grid=(grid,),
        in_specs=_tri_specs(T_pad) + _ray_specs(tile),
        out_specs=[out_bs] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), Float),
            jax.ShapeDtypeStruct((rows, LANES), Float),
            jax.ShapeDtypeStruct((rows, LANES), Float),
            jax.ShapeDtypeStruct((rows, LANES), Int),
        ],
    )(*[tri_rep[k] for k in range(9)], *planes)
    t = t.reshape(-1)[:n]
    idx = idx.reshape(-1)[:n]
    return (t, u.reshape(-1)[:n], v.reshape(-1)[:n], jnp.maximum(idx, 0),
            idx >= 0)


def _anyhit_planes(tri_rep, planes, rows, tile, n):
    T_pad = tri_rep.shape[1]
    grid = rows // tile
    out_bs = pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    hit = pl.pallas_call(
        _anyhit_kernel,
        grid=(grid,),
        in_specs=_tri_specs(T_pad) + _ray_specs(tile),
        out_specs=out_bs,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), Int),
    )(*[tri_rep[k] for k in range(9)], *planes)
    return hit.reshape(-1)[:n] > 0


def closest_tris(tri_rep, o, d, tmin, tmax):
    """Closest hit over the soup. Returns flat (t, u, v, idx, hit)."""
    n = o.shape[0]
    planes, rows, tile = _prep_rays(o, d, tmin, tmax)
    return _closest_planes(tri_rep, planes, rows, tile, n)


def closest_tris_v(tri_rep, o, d, tmin, tmax):
    """Component-SoA closest hit: o, d are V3 of flat (N,) arrays."""
    n = o.x.shape[0]
    tn = jnp.broadcast_to(jnp.asarray(tmin, Float), (n,))
    tf = jnp.broadcast_to(jnp.asarray(tmax, Float), (n,))
    planes, rows, tile = _prep_components(
        [o.x, o.y, o.z, d.x, d.y, d.z, tn, tf]
    )
    return _closest_planes(tri_rep, planes, rows, tile, n)


def anyhit_tris(tri_rep, o, d, tmin, tmax):
    n = o.shape[0]
    planes, rows, tile = _prep_rays(o, d, tmin, tmax)
    return _anyhit_planes(tri_rep, planes, rows, tile, n)


def anyhit_tris_v(tri_rep, o, d, tmin, tmax):
    n = o.x.shape[0]
    tn = jnp.broadcast_to(jnp.asarray(tmin, Float), (n,))
    tf = jnp.broadcast_to(jnp.asarray(tmax, Float), (n,))
    planes, rows, tile = _prep_components(
        [o.x, o.y, o.z, d.x, d.y, d.z, tn, tf]
    )
    return _anyhit_planes(tri_rep, planes, rows, tile, n)
