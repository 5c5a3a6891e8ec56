"""Pallas TPU kernels for ray-triangle intersection (brute-force path).

The jnp broadcast intersector materializes (rays x tris) intermediates in
HBM; these kernels keep the triangle soup in VMEM and the running best hit
in registers, so HBM traffic is just rays-in / hits-out.

Layout: rays ride the 128-lane axis (one program per 128-ray tile);
triangles are pre-replicated across lanes as (T_pad, 128) component arrays
so a chunk of 8 triangles loads as one aligned (8, 128) vector — Mosaic
permits no scalar loads at dynamic lane offsets, and the replication turns
the tri broadcast into a plain tile read.  Each fori_loop step tests
8 triangles x 128 rays and folds the result into a (1, 128) running best.

Used when the scene's triangle count is below ``BRUTE_FORCE_MAX``
(Cornell-box-class scenes); larger scenes take the threaded-BVH path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import Float, Int

LANES = 128
CHUNK = 8  # triangles per loop step (sublane tile)
BIG = 3.0e37


def _mt_chunk(tri, c, ox, oy, oz, dx, dy, dz, tmin, tmax):
    """Test 8 triangles (chunk c) against 128 rays; returns (hit, t, u, v)
    each (8, 128)."""
    s = pl.multiple_of(c * CHUNK, CHUNK)
    p0x = tri[0][pl.ds(s, CHUNK), :]
    p0y = tri[1][pl.ds(s, CHUNK), :]
    p0z = tri[2][pl.ds(s, CHUNK), :]
    e1x = tri[3][pl.ds(s, CHUNK), :]
    e1y = tri[4][pl.ds(s, CHUNK), :]
    e1z = tri[5][pl.ds(s, CHUNK), :]
    e2x = tri[6][pl.ds(s, CHUNK), :]
    e2y = tri[7][pl.ds(s, CHUNK), :]
    e2z = tri[8][pl.ds(s, CHUNK), :]

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
        & (t > tmin) & (t < tmax)
    )
    return hit, t, u, v


def _closest_kernel(*refs):
    tri = refs[0:9]
    o_ref, d_ref, lim_ref = refs[9], refs[10], refs[11]
    t_ref, u_ref, v_ref, idx_ref = refs[12], refs[13], refs[14], refs[15]
    T = tri[0].shape[0]

    ox = o_ref[0:1, :]
    oy = o_ref[1:2, :]
    oz = o_ref[2:3, :]
    dx = d_ref[0:1, :]
    dy = d_ref[1:2, :]
    dz = d_ref[2:3, :]
    tmin = lim_ref[0:1, :]
    tmax = lim_ref[1:2, :]

    sub_iota = jax.lax.broadcasted_iota(Int, (CHUNK, LANES), 0)

    def body(c, carry):
        t_b, u_b, v_b, i_b = carry
        hit, t, u, v = _mt_chunk(tri, c, ox, oy, oz, dx, dy, dz, tmin, t_b)
        tm = jnp.where(hit, t, BIG)
        # fold the 8-triangle chunk into the per-ray best (min over sublanes)
        tmin8 = jnp.min(tm, axis=0, keepdims=True)
        better = tmin8 < t_b
        is_min = tm <= tmin8  # ties resolve to the lowest sublane via argmax
        first = jnp.argmax(is_min, axis=0)[None, :]
        sel = lambda a: jnp.take_along_axis(a, first, axis=0)
        idx_new = c * CHUNK + first
        t_b = jnp.where(better, tmin8, t_b)
        u_b = jnp.where(better, sel(u), u_b)
        v_b = jnp.where(better, sel(v), v_b)
        i_b = jnp.where(better, idx_new, i_b)
        return t_b, u_b, v_b, i_b

    init = (
        jnp.full((1, LANES), BIG, Float),
        jnp.zeros((1, LANES), Float),
        jnp.zeros((1, LANES), Float),
        jnp.zeros((1, LANES), Int),
    )
    t_b, u_b, v_b, i_b = jax.lax.fori_loop(0, T // CHUNK, body, init)
    t_ref[...] = t_b
    u_ref[...] = u_b
    v_ref[...] = v_b
    idx_ref[...] = i_b


def _anyhit_kernel(*refs):
    tri = refs[0:9]
    o_ref, d_ref, lim_ref, hit_ref = refs[9], refs[10], refs[11], refs[12]
    T = tri[0].shape[0]
    ox = o_ref[0:1, :]
    oy = o_ref[1:2, :]
    oz = o_ref[2:3, :]
    dx = d_ref[0:1, :]
    dy = d_ref[1:2, :]
    dz = d_ref[2:3, :]
    tmin = lim_ref[0:1, :]
    tmax = lim_ref[1:2, :]

    def body(c, acc):
        hit, _t, _u, _v = _mt_chunk(tri, c, ox, oy, oz, dx, dy, dz, tmin, tmax)
        return acc | jnp.any(hit, axis=0, keepdims=True)

    acc = jax.lax.fori_loop(
        0, T // CHUNK, body, jnp.zeros((1, LANES), jnp.bool_)
    )
    hit_ref[...] = acc.astype(Int)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _tri_specs(T_pad):
    return [
        pl.BlockSpec((T_pad, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for _ in range(9)
    ]


def _ray_specs():
    bs = lambda rows: pl.BlockSpec((rows, 1, LANES), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
    return [bs(3), bs(3), bs(2)]


def replicate_tris(geom):
    """(9, T_pad, 128) lane-replicated triangle component arrays."""
    comps = jnp.concatenate(
        [geom.tri_p0.T, geom.tri_e1.T, geom.tri_e2.T], axis=0
    )  # (9, T)
    T = comps.shape[1]
    T_pad = max(-(-T // CHUNK) * CHUNK, CHUNK)
    comps = jnp.pad(comps, ((0, 0), (0, T_pad - T)))
    return jnp.broadcast_to(comps[:, :, None], (9, T_pad, LANES))


def _prep_rays(o, d, tmin, tmax):
    n = o.shape[0]
    n_pad = -n % LANES
    npad = n + n_pad
    g = npad // LANES
    o_t = jnp.pad(o, ((0, n_pad), (0, 0))).T.reshape(3, g, LANES)
    d_t = jnp.pad(d, ((0, n_pad), (0, 0)), constant_values=1.0).T.reshape(3, g, LANES)
    tmin = jnp.broadcast_to(jnp.asarray(tmin, Float), (n,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, Float), (n,))
    lim = jnp.stack([
        jnp.pad(tmin, (0, n_pad)),
        jnp.pad(tmax, (0, n_pad), constant_values=-1.0),
    ]).reshape(2, g, LANES)
    return o_t, d_t, lim, npad, g


def closest_tris(tri_rep, o, d, tmin, tmax):
    """Closest hit. tri_rep from :func:`replicate_tris`.
    Returns (t, u, v, idx, hit) flat (N,) arrays."""
    n = o.shape[0]
    o_t, d_t, lim, npad, g = _prep_rays(o, d, tmin, tmax)
    T_pad = tri_rep.shape[1]

    out_bs = pl.BlockSpec((1, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    t, u, v, idx = pl.pallas_call(
        _closest_kernel,
        grid=(g,),
        in_specs=_tri_specs(T_pad) + _ray_specs(),
        out_specs=[out_bs] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((g, LANES), Float),
            jax.ShapeDtypeStruct((g, LANES), Float),
            jax.ShapeDtypeStruct((g, LANES), Float),
            jax.ShapeDtypeStruct((g, LANES), Int),
        ],
    )(*[tri_rep[k] for k in range(9)], o_t, d_t, lim)
    t = t.reshape(-1)[:n]
    return (t, u.reshape(-1)[:n], v.reshape(-1)[:n], idx.reshape(-1)[:n],
            t < BIG)


def anyhit_tris(tri_rep, o, d, tmin, tmax):
    n = o.shape[0]
    o_t, d_t, lim, npad, g = _prep_rays(o, d, tmin, tmax)
    T_pad = tri_rep.shape[1]
    out_bs = pl.BlockSpec((1, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    hit = pl.pallas_call(
        _anyhit_kernel,
        grid=(g,),
        in_specs=_tri_specs(T_pad) + _ray_specs(),
        out_specs=out_bs,
        out_shape=jax.ShapeDtypeStruct((g, LANES), Int),
    )(*[tri_rep[k] for k in range(9)], o_t, d_t, lim)
    return hit.reshape(-1)[:n] > 0
