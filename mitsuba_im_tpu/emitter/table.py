"""Emitter tables + next-event-estimation sampling.

Capability parity with ``/root/reference/src/emitters/`` (area, point, spot,
directional, collimated, constant, envmap w/ 2D-CDF importance sampling) and
the scene-level direct sampling API (``src/librender/scene.cpp:860-884``
``sampleEmitterDirect`` / ``pdfEmitterDirect``).

Design notes (TPU-first):
- emitter selection is a Distribution1D over per-emitter weights (uniform by
  default, like the reference's equal sampling weights);
- area emitters sample *uniformly by area* over their shape (triangle CDF /
  analytic sphere/disk) and convert to solid angle.  The reference uses
  cone sampling for spheres — same estimator, different variance profile;
- the environment map importance-samples a luminance x sin(theta) 2D CDF
  (reference ``envmap.cpp``), lat-long with Y-up convention
  (u = atan2(x, -z)/2pi, v = acos(y)/pi).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.types import pytree_dataclass, static_field, Float, Int, INVALID
from ..core import math as m
from ..core import warp
from ..core.distribution import Distribution1D, Distribution2D
from ..core.spectrum import luminance
from ..scene.geometry import Geometry

EM_AREA = 0
EM_POINT = 1
EM_SPOT = 2
EM_DIRECTIONAL = 3
EM_CONSTANT = 4
EM_ENVMAP = 5
EM_COLLIMATED = 6

# area-emitter backing geometry kinds
AK_TRIMESH = 0
AK_SPHERE = 1
AK_DISK = 2


@pytree_dataclass
class EmitterTable:
    type: jax.Array  # (E,)
    radiance: jax.Array  # (E, 3) area/constant/envmap-scale radiance
    intensity: jax.Array  # (E, 3) point/spot/directional irradiance
    position: jax.Array  # (E, 3)
    direction: jax.Array  # (E, 3) unit
    cos_cutoff: jax.Array  # (E,) spot total angle cos
    cos_falloff: jax.Array  # (E,) spot falloff-begin cos
    shape: jax.Array  # (E,) area: shape id
    area_kind: jax.Array  # (E,) AK_*
    prim: jax.Array  # (E,) sphere/disk prim index for analytic area emitters
    total_area: jax.Array  # (E,)
    tri_cdf: jax.Array  # (E, Tm+1) per-emitter triangle area CDF
    tri_idx: jax.Array  # (E, Tm) global triangle ids
    select: Distribution1D
    env_rows: jax.Array  # (H, W, 3) envmap texels (or (1,1,3))
    env_dist: Distribution2D
    env_to_world: jax.Array  # (3, 3)
    env_to_local: jax.Array  # (3, 3)
    bsphere_center: jax.Array  # (3,)
    bsphere_radius: jax.Array  # ()
    env_index: int = static_field(default=-1)  # static: which row is envmap
    n_emitters: int = static_field(default=0)
    used_types: tuple = static_field(default=())
    used_area_kinds: tuple = static_field(default=())


class DirectSample(NamedTuple):
    d: jax.Array  # (..., 3) unit direction ref -> emitter
    dist: jax.Array  # (...,) distance to the sampled point
    value: jax.Array  # (..., 3) emitted radiance (delta: intensity/r^2)
    pdf: jax.Array  # (...,) solid-angle pdf incl. selection (delta: discrete)
    delta: jax.Array  # (...,) bool
    n: jax.Array  # (..., 3) emitter surface normal at sampled point
    emitter: jax.Array  # (...,) int32


def build_emitters(records: list[dict], geom_host: dict, bsphere) -> EmitterTable:
    """records: list of per-emitter host dicts; geom_host holds numpy tri
    arrays (p0/e1/e2/shape) for area-CDF construction."""
    E = max(len(records), 1)
    recs = records or [dict(type=EM_POINT, intensity=np.zeros(3), position=np.zeros(3))]

    def get(r, k, d):
        return np.asarray(r.get(k, d), np.float64)

    tri_shape = geom_host.get("shape", np.zeros(0, np.int32))
    tri_p0 = geom_host.get("p0", np.zeros((0, 3)))
    tri_e1 = geom_host.get("e1", np.zeros((0, 3)))
    tri_e2 = geom_host.get("e2", np.zeros((0, 3)))
    areas_all = 0.5 * np.linalg.norm(np.cross(tri_e1, tri_e2), axis=-1) if len(tri_p0) else np.zeros(0)

    tmax = 1
    per_em_tris = []
    for r in recs:
        if r.get("type") == EM_AREA and r.get("area_kind", AK_TRIMESH) == AK_TRIMESH:
            ids = np.nonzero(tri_shape == r["shape"])[0]
            per_em_tris.append(ids)
            tmax = max(tmax, len(ids))
        else:
            per_em_tris.append(np.zeros(0, np.int64))

    tri_cdf = np.zeros((E, tmax + 1), np.float32)
    tri_idx = np.zeros((E, tmax), np.int32)
    total_area = np.zeros(E, np.float32)
    for i, (r, ids) in enumerate(zip(recs, per_em_tris)):
        if r.get("type") == EM_AREA:
            kind = r.get("area_kind", AK_TRIMESH)
            if kind == AK_TRIMESH and len(ids):
                a = areas_all[ids]
                total_area[i] = a.sum()
                cdf = np.concatenate([[0.0], np.cumsum(a / max(a.sum(), 1e-30))])
                cdf[-1] = 1.0
                tri_cdf[i, : len(cdf)] = cdf
                tri_cdf[i, len(cdf):] = 1.0
                tri_idx[i, : len(ids)] = ids
            else:
                total_area[i] = r.get("surface_area", 1.0)

    env_index = -1
    env_pix = np.zeros((1, 1, 3), np.float32)
    env_rot = np.eye(3)
    for i, r in enumerate(recs):
        if r.get("type") == EM_ENVMAP:
            env_index = i
            env_pix = np.asarray(r["pixels"], np.float32)
            env_rot = np.asarray(r.get("to_world_rot", np.eye(3)), np.float64)
        elif r.get("type") == EM_CONSTANT and env_index < 0:
            env_index = i

    # 2D sampling weights: luminance * sin(theta)
    H, W = env_pix.shape[:2]
    lum = (
        env_pix[..., 0] * 0.212671
        + env_pix[..., 1] * 0.715160
        + env_pix[..., 2] * 0.072169
    )
    sin_t = np.sin((np.arange(H) + 0.5) / H * np.pi)[:, None]
    env_dist = Distribution2D.from_weights(jnp.asarray(lum * sin_t + 1e-12, Float))

    g = lambda k, d, dt: jnp.asarray(
        np.stack([get(r, k, d) for r in recs]), dt
    )
    center, radius = bsphere
    return EmitterTable(
        type=g("type", EM_POINT, Int),
        radiance=g("radiance", np.zeros(3), Float),
        intensity=g("intensity", np.zeros(3), Float),
        position=g("position", np.zeros(3), Float),
        direction=g("direction", np.array([0, 0, 1.0]), Float),
        cos_cutoff=g("cos_cutoff", -1.0, Float),
        cos_falloff=g("cos_falloff", -1.0, Float),
        shape=g("shape", INVALID, Int),
        area_kind=g("area_kind", AK_TRIMESH, Int),
        prim=g("prim", 0, Int),
        total_area=jnp.asarray(total_area, Float),
        tri_cdf=jnp.asarray(tri_cdf, Float),
        tri_idx=jnp.asarray(tri_idx, Int),
        select=Distribution1D.from_weights(
            jnp.asarray([r.get("weight", 1.0) for r in recs], Float)
        ),
        env_rows=jnp.asarray(env_pix, Float),
        env_dist=env_dist,
        env_to_world=jnp.asarray(env_rot, Float),
        env_to_local=jnp.asarray(env_rot.T, Float),
        bsphere_center=jnp.asarray(center, Float),
        bsphere_radius=jnp.asarray(radius, Float),
        env_index=env_index,
        n_emitters=len(records),
        used_types=tuple(sorted({int(r["type"]) for r in recs})),
        used_area_kinds=tuple(sorted({
            int(r.get("area_kind", AK_TRIMESH))
            for r in recs if r.get("type") == EM_AREA
        })),
    )


# ---------------------------------------------------------------------------
# Envmap helpers
# ---------------------------------------------------------------------------

def _env_uv_from_dir(em: EmitterTable, d_world):
    d = d_world @ em.env_to_local.T
    u = jnp.arctan2(d[..., 0], -d[..., 2]) * (0.5 / jnp.pi)
    u = jnp.where(u < 0, u + 1.0, u)
    v = m.safe_acos(d[..., 1]) / jnp.pi
    return jnp.stack([u, v], axis=-1)


def _env_dir_from_uv(em: EmitterTable, uv):
    phi = uv[..., 0] * 2.0 * jnp.pi
    theta = uv[..., 1] * jnp.pi
    st, ct = jnp.sin(theta), jnp.cos(theta)
    d_local = jnp.stack([st * jnp.sin(phi), ct, -st * jnp.cos(phi)], axis=-1)
    return d_local @ em.env_to_world.T


def _env_lookup(em: EmitterTable, uv, scale):
    H, W = em.env_rows.shape[:2]
    fx = uv[..., 0] * W - 0.5
    fy = uv[..., 1] * H - 0.5
    x0 = jnp.floor(fx).astype(Int)
    y0 = jnp.floor(fy).astype(Int)
    dx = fx - x0
    dy = fy - y0

    def texel(x, y):
        x = jnp.mod(x, W)
        y = jnp.clip(y, 0, H - 1)
        return em.env_rows[y, x]

    return scale * (
        texel(x0, y0) * ((1 - dx) * (1 - dy))[..., None]
        + texel(x0 + 1, y0) * (dx * (1 - dy))[..., None]
        + texel(x0, y0 + 1) * ((1 - dx) * dy)[..., None]
        + texel(x0 + 1, y0 + 1) * (dx * dy)[..., None]
    )


def eval_environment(em: EmitterTable, d_world) -> jax.Array:
    """Radiance from the environment for escaped rays
    (``scene.h:910`` evalEnvironment)."""
    if em.env_index < 0 or em.n_emitters == 0:
        return jnp.zeros(d_world.shape[:-1] + (3,), Float)
    i = em.env_index
    is_const = em.type[i] == EM_CONSTANT
    uv = _env_uv_from_dir(em, d_world)
    envval = _env_lookup(em, uv, em.radiance[i])
    return jnp.where(is_const, em.radiance[i], envval)


def env_pdf_sa(em: EmitterTable, d_world) -> jax.Array:
    """Solid-angle pdf of sample_direct drawing direction d toward the env."""
    if em.env_index < 0:
        return jnp.zeros(d_world.shape[:-1], Float)
    i = em.env_index
    is_const = em.type[i] == EM_CONSTANT
    uv = _env_uv_from_dir(em, d_world)
    pdf_uv = em.env_dist.pdf_continuous(uv)
    theta = uv[..., 1] * jnp.pi
    sin_t = jnp.maximum(jnp.sin(theta), 1e-6)
    pdf_env = pdf_uv / (2.0 * jnp.pi * jnp.pi * sin_t)
    return jnp.where(is_const, warp.INV_FOURPI, pdf_env)


# ---------------------------------------------------------------------------
# Direct sampling (NEE)
# ---------------------------------------------------------------------------

def sample_direct(em: EmitterTable, geom: Geometry, ref_p: jax.Array,
                  u_sel: jax.Array, u2: jax.Array) -> DirectSample:
    """Sample a direction toward one emitter from ref_p.

    Returns value/pdf such that the unbiased contribution is
    ``value * bsdf_eval / pdf`` (with MIS vs bsdf_pdf for non-delta).
    """
    shape = ref_p.shape[:-1]
    if em.n_emitters == 0:
        z = jnp.zeros(shape, Float)
        return DirectSample(
            d=jnp.zeros(shape + (3,), Float), dist=z,
            value=jnp.zeros(shape + (3,), Float), pdf=z,
            delta=jnp.zeros(shape, bool), n=jnp.zeros(shape + (3,), Float),
            emitter=jnp.full(shape, INVALID, Int),
        )

    if em.select.pmf.shape[0] == 1:
        eid = jnp.zeros(shape, Int)
        sel_pmf = jnp.ones(shape, Float)
    else:
        eid, sel_pmf = em.select.sample(u_sel)

    from ..core.gather import RowBundle

    eb = (
        RowBundle()
        .add("type", em.type).add("radiance", em.radiance)
        .add("intensity", em.intensity).add("position", em.position)
        .add("direction", em.direction).add("cos_cutoff", em.cos_cutoff)
        .add("cos_falloff", em.cos_falloff).add("total_area", em.total_area)
        .add("area_kind", em.area_kind).add("prim", em.prim)
    ).lookup(eid)
    etype = eb["type"]

    d = jnp.zeros(shape + (3,), Float)
    dist = jnp.full(shape, 1.0, Float)
    value = jnp.zeros(shape + (3,), Float)
    pdf = jnp.zeros(shape, Float)
    delta = jnp.zeros(shape, bool)
    n_out = jnp.zeros(shape + (3,), Float)

    far = 2.0 * em.bsphere_radius + 1.0

    for t in em.used_types:
        selm = etype == t
        if t == EM_AREA:
            p_s, n_s, pos_pdf_a = _sample_area_position(em, geom, eid, u2, eb)
            dvec = p_s - ref_p
            r2 = jnp.maximum(m.dot(dvec, dvec), 1e-12)
            r = jnp.sqrt(r2)
            du = dvec / r[..., None]
            cos_emit = m.dot(n_s, -du)
            front = cos_emit > 1e-6
            pdf_sa = pos_pdf_a * r2 / jnp.maximum(cos_emit, 1e-8)
            val = jnp.where(front[..., None], eb["radiance"], 0.0)
            d, dist, value, pdf, delta, n_out = _sel6(
                selm, (du, r, val, jnp.where(front, pdf_sa, 0.0),
                       jnp.zeros(shape, bool), n_s),
                (d, dist, value, pdf, delta, n_out),
            )
        elif t in (EM_POINT, EM_SPOT):
            dvec = eb["position"] - ref_p
            r2 = jnp.maximum(m.dot(dvec, dvec), 1e-12)
            r = jnp.sqrt(r2)
            du = dvec / r[..., None]
            val = eb["intensity"] / r2[..., None]
            if t == EM_SPOT:
                cd = m.dot(-du, eb["direction"])
                cc = eb["cos_cutoff"]
                cf = eb["cos_falloff"]
                fall = jnp.clip((cd - cc) / jnp.maximum(cf - cc, 1e-6), 0.0, 1.0)
                val = val * jnp.where(cd > cc, fall, 0.0)[..., None]
            d, dist, value, pdf, delta, n_out = _sel6(
                selm, (du, r, val, jnp.ones(shape), jnp.ones(shape, bool), -du),
                (d, dist, value, pdf, delta, n_out),
            )
        elif t == EM_DIRECTIONAL:
            du = jnp.broadcast_to(-eb["direction"], shape + (3,))
            val = jnp.broadcast_to(eb["intensity"], shape + (3,))
            d, dist, value, pdf, delta, n_out = _sel6(
                selm,
                (du, jnp.full(shape, far), val, jnp.ones(shape),
                 jnp.ones(shape, bool), -du),
                (d, dist, value, pdf, delta, n_out),
            )
        elif t in (EM_CONSTANT, EM_ENVMAP):
            if t == EM_CONSTANT:
                du = warp.square_to_uniform_sphere(u2)
                val = jnp.broadcast_to(eb["radiance"], shape + (3,))
                pdf_sa = jnp.full(shape, warp.INV_FOURPI, Float)
            else:
                uv, pdf_uv = em.env_dist.sample_continuous(u2)
                du = _env_dir_from_uv(em, uv)
                theta = uv[..., 1] * jnp.pi
                sin_t = jnp.maximum(jnp.sin(theta), 1e-6)
                pdf_sa = pdf_uv / (2.0 * jnp.pi * jnp.pi * sin_t)
                val = _env_lookup(em, uv, eb["radiance"])
            d, dist, value, pdf, delta, n_out = _sel6(
                selm,
                (du, jnp.full(shape, far), val, pdf_sa,
                 jnp.zeros(shape, bool), -du),
                (d, dist, value, pdf, delta, n_out),
            )
        elif t == EM_COLLIMATED:
            # measure-zero beam: direct sampling hits it with prob 0
            continue

    return DirectSample(
        d=d, dist=dist, value=value, pdf=pdf * sel_pmf, delta=delta, n=n_out,
        emitter=eid.astype(Int),
    )


def _sel6(mask, new, old):
    out = []
    for nv, ov in zip(new, old):
        mm = mask[..., None] if nv.ndim > mask.ndim else mask
        out.append(jnp.where(mm, nv, ov))
    return tuple(out)


def _sample_area_position(em: EmitterTable, geom: Geometry, eid, u2, eb):
    """Uniform-by-area point on the emitter's shape; returns (p, n, pdf_area).

    Only the area-kinds present in the scene (static ``used_area_kinds``)
    are compiled; triangle CDF inversion uses a vectorized compare-sum
    (cheaper than a per-lane binary search on the VPU for typical emissive
    triangle counts)."""
    kinds = em.used_area_kinds or (AK_TRIMESH,)
    kind = eb["area_kind"]
    shape = u2.shape[:-1]
    p = jnp.zeros(shape + (3,), Float)
    n = jnp.zeros(shape + (3,), Float)

    if AK_TRIMESH in kinds:
        Tm = em.tri_idx.shape[1]
        single = em.tri_cdf.shape[0] == 1
        cdf = em.tri_cdf[0] if single else em.tri_cdf[eid]  # (Tm+1,) | (...,Tm+1)
        u0 = u2[..., 0]
        # index = #{k >= 1 : cdf[k] <= u}
        if single:
            li = jnp.sum((cdf[1:][None, :] <= u0[..., None]), axis=-1)
        else:
            li = jnp.sum(cdf[..., 1:] <= u0[..., None], axis=-1)
        li = jnp.clip(li, 0, Tm - 1).astype(Int)
        from ..core.gather import RowBundle, gather_rows

        if single:
            lo = gather_rows(cdf, li)
            hi = gather_rows(cdf, li + 1)
            tri = gather_rows(em.tri_idx[0], li)
        else:
            lo = jnp.take_along_axis(cdf, li[..., None], axis=-1)[..., 0]
            hi = jnp.take_along_axis(cdf, (li + 1)[..., None], axis=-1)[..., 0]
            tri = em.tri_idx[eid, li]
        u0r = jnp.clip((u0 - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
        bary = warp.square_to_uniform_triangle(
            jnp.stack([u0r, u2[..., 1]], axis=-1)
        )
        tg = (
            RowBundle()
            .add("p0", geom.tri_p0).add("e1", geom.tri_e1).add("e2", geom.tri_e2)
        ).lookup(tri)
        p_tri = (
            tg["p0"]
            + tg["e1"] * bary[..., 0:1]
            + tg["e2"] * bary[..., 1:2]
        )
        n_tri = m.normalize(m.cross(tg["e1"], tg["e2"]))
        sel = (kind == AK_TRIMESH)[..., None]
        p = jnp.where(sel, p_tri, p)
        n = jnp.where(sel, n_tri, n)

    prim = eb["prim"]
    if AK_SPHERE in kinds:
        dir_s = warp.square_to_uniform_sphere(u2)
        p_sph = geom.sph_center[prim] + dir_s * geom.sph_radius[prim][..., None]
        sel = (kind == AK_SPHERE)[..., None]
        p = jnp.where(sel, p_sph, p)
        n = jnp.where(sel, dir_s, n)

    if AK_DISK in kinds:
        pd = warp.square_to_uniform_disk_concentric(u2)
        p_disk = (
            geom.disk_center[prim]
            + geom.disk_s[prim] * (pd[..., 0] * geom.disk_radius[prim])[..., None]
            + geom.disk_t[prim] * (pd[..., 1] * geom.disk_radius[prim])[..., None]
        )
        sel = (kind == AK_DISK)[..., None]
        p = jnp.where(sel, p_disk, p)
        n = jnp.where(sel, geom.disk_n[prim], n)

    pdf_area = 1.0 / jnp.maximum(eb["total_area"], 1e-12)
    return p, n, pdf_area


def pdf_direct_area(em: EmitterTable, emitter_id, ref_p, p_emit, n_emit) -> jax.Array:
    """Solid-angle pdf that sample_direct would have produced the direction
    hitting an *area* emitter at p_emit (``Scene::pdfEmitterDirect``)."""
    if em.n_emitters == 0:
        return jnp.zeros(ref_p.shape[:-1], Float)
    from ..core.gather import RowBundle

    eid = jnp.where(emitter_id == INVALID, 0, emitter_id)
    eb = (
        RowBundle()
        .add("pmf", em.select.pmf).add("total_area", em.total_area)
        .add("type", em.type)
    ).lookup(eid)
    dvec = p_emit - ref_p
    r2 = jnp.maximum(m.dot(dvec, dvec), 1e-12)
    du = dvec * jax.lax.rsqrt(r2)[..., None]
    cos_e = m.dot(n_emit, -du)
    pdf_sa = (1.0 / jnp.maximum(eb["total_area"], 1e-12)) * r2 / jnp.maximum(cos_e, 1e-8)
    valid = (emitter_id != INVALID) & (eb["type"] == EM_AREA) & (cos_e > 1e-6)
    return jnp.where(valid, pdf_sa * eb["pmf"], 0.0)


def pdf_direct_env(em: EmitterTable, d_world) -> jax.Array:
    """Selection-weighted solid-angle pdf for env/constant directions."""
    if em.env_index < 0:
        return jnp.zeros(d_world.shape[:-1], Float)
    return env_pdf_sa(em, d_world) * em.select.pmf[em.env_index]


def emitted_radiance(em: EmitterTable, shape_emitter_id, n_surf, wo_world) -> jax.Array:
    """Le(x, wo) for a surface hit on an area emitter (front side only)."""
    if em.n_emitters == 0:
        return jnp.zeros(wo_world.shape[:-1] + (3,), Float)
    from ..core.gather import RowBundle

    eid = jnp.where(shape_emitter_id == INVALID, 0, shape_emitter_id)
    eb = RowBundle().add("type", em.type).add("radiance", em.radiance).lookup(eid)
    front = m.dot(n_surf, wo_world) > 0
    valid = (shape_emitter_id != INVALID) & (eb["type"] == EM_AREA) & front
    return jnp.where(valid[..., None], eb["radiance"], 0.0)


# ---------------------------------------------------------------------------
# Component-SoA API (canonical for the wavefront hot path)
# ---------------------------------------------------------------------------

class DirectSample3(NamedTuple):
    d: object  # V3 unit direction ref -> emitter
    dist: jax.Array
    value: object  # V3 emitted radiance (delta: intensity/r^2)
    pdf: jax.Array  # solid-angle pdf incl. selection (delta: discrete)
    delta: jax.Array  # bool
    n: object  # V3 emitter surface normal at sampled point
    emitter: jax.Array  # int32


def _rot_v(mat: jax.Array, d):
    """Apply a 3x3 scalar rotation to a V3 (matvec as fused scalar ops)."""
    from ..core.v3 import V3

    return V3(
        mat[0, 0] * d.x + mat[0, 1] * d.y + mat[0, 2] * d.z,
        mat[1, 0] * d.x + mat[1, 1] * d.y + mat[1, 2] * d.z,
        mat[2, 0] * d.x + mat[2, 1] * d.y + mat[2, 2] * d.z,
    )


def _env_uv_from_dir_v(em: EmitterTable, d):
    dl = _rot_v(em.env_to_local, d)
    u = jnp.arctan2(dl.x, -dl.z) * (0.5 / jnp.pi)
    u = jnp.where(u < 0, u + 1.0, u)
    vv = jnp.arccos(jnp.clip(dl.y, -1.0, 1.0)) / jnp.pi
    return u, vv


def _env_dir_from_uv_v(em: EmitterTable, u, vv):
    from ..core.v3 import V3

    phi = u * 2.0 * jnp.pi
    theta = vv * jnp.pi
    st, ct = jnp.sin(theta), jnp.cos(theta)
    d_local = V3(st * jnp.sin(phi), ct, -st * jnp.cos(phi))
    return _rot_v(em.env_to_world, d_local)


def _env_lookup_v(em: EmitterTable, u, vv, scale):
    from ..core.v3 import V3

    H, W = em.env_rows.shape[:2]
    fx = u * W - 0.5
    fy = vv * H - 0.5
    x0 = jnp.floor(fx).astype(Int)
    y0 = jnp.floor(fy).astype(Int)
    dx = fx - x0
    dy = fy - y0

    def texel(x, y):
        x = jnp.mod(x, W)
        y = jnp.clip(y, 0, H - 1)
        return V3.from_array(em.env_rows[y, x])

    return scale * (
        texel(x0, y0) * ((1 - dx) * (1 - dy))
        + texel(x0 + 1, y0) * (dx * (1 - dy))
        + texel(x0, y0 + 1) * ((1 - dx) * dy)
        + texel(x0 + 1, y0 + 1) * (dx * dy)
    )


def eval_environment_v(em: EmitterTable, d_world):
    """SoA evalEnvironment: d_world is V3 -> V3 radiance."""
    from ..core import v3 as v

    if em.env_index < 0 or em.n_emitters == 0:
        return v.zeros(d_world.x.shape)
    i = em.env_index
    rad = v.V3(em.radiance[i, 0], em.radiance[i, 1], em.radiance[i, 2])
    is_const = em.type[i] == EM_CONSTANT
    u, vv = _env_uv_from_dir_v(em, d_world)
    envval = _env_lookup_v(em, u, vv, rad)
    return v.where(is_const, rad.broadcast_to(d_world.x.shape), envval)


def env_pdf_sa_v(em: EmitterTable, d_world) -> jax.Array:
    if em.env_index < 0:
        return jnp.zeros(d_world.x.shape, Float)
    i = em.env_index
    is_const = em.type[i] == EM_CONSTANT
    u, vv = _env_uv_from_dir_v(em, d_world)
    pdf_uv = em.env_dist.pdf_continuous(jnp.stack([u, vv], axis=-1))
    theta = vv * jnp.pi
    sin_t = jnp.maximum(jnp.sin(theta), 1e-6)
    pdf_env = pdf_uv / (2.0 * jnp.pi * jnp.pi * sin_t)
    return jnp.where(is_const, warp.INV_FOURPI, pdf_env)


def pdf_direct_env_v(em: EmitterTable, d_world) -> jax.Array:
    if em.env_index < 0:
        return jnp.zeros(d_world.x.shape, Float)
    return env_pdf_sa_v(em, d_world) * em.select.pmf[em.env_index]


def pdf_direct_area_v(em: EmitterTable, emitter_id, ref_p, p_emit,
                      n_emit) -> jax.Array:
    """SoA Scene::pdfEmitterDirect for area emitters (V3 positions)."""
    from ..core import v3 as v

    if em.n_emitters == 0:
        return jnp.zeros(ref_p.x.shape, Float)
    eid = jnp.where(emitter_id == INVALID, 0, emitter_id)
    pmf = v.gather_col(em.select.pmf, eid)
    total_area = v.gather_col(em.total_area, eid)
    etype = v.gather_col(em.type, eid)
    dvec = p_emit - ref_p
    r2 = jnp.maximum(dvec.dot(dvec), 1e-12)
    du = dvec * jax.lax.rsqrt(r2)
    cos_e = n_emit.dot(-du)
    pdf_sa = (1.0 / jnp.maximum(total_area, 1e-12)) * r2 / jnp.maximum(
        cos_e, 1e-8)
    valid = (emitter_id != INVALID) & (etype == EM_AREA) & (cos_e > 1e-6)
    return jnp.where(valid, pdf_sa * pmf, 0.0)


def emitted_radiance_v(em: EmitterTable, shape_emitter_id, n_surf, wo_world):
    """SoA Le(x, wo) for area-emitter hits (front side only)."""
    from ..core import v3 as v

    if em.n_emitters == 0:
        return v.zeros(wo_world.x.shape)
    eid = jnp.where(shape_emitter_id == INVALID, 0, shape_emitter_id)
    etype = v.gather_col(em.type, eid)
    rad = v.gather_v3(em.radiance, eid)
    front = n_surf.dot(wo_world) > 0
    valid = (shape_emitter_id != INVALID) & (etype == EM_AREA) & front
    return v.V3(jnp.where(valid, rad.x, 0.0), jnp.where(valid, rad.y, 0.0),
                jnp.where(valid, rad.z, 0.0))


def _sample_area_position_v(em: EmitterTable, geom: Geometry, eid,
                            u2a, u2b, kind, prim, total_area):
    """SoA uniform-by-area emitter point; returns (p, n, pdf_area) with V3."""
    from ..core import v3 as v

    kinds = em.used_area_kinds or (AK_TRIMESH,)
    shape = u2a.shape
    p = v.zeros(shape)
    n = v.zeros(shape)

    if AK_TRIMESH in kinds:
        Tm = em.tri_idx.shape[1]
        single = em.tri_cdf.shape[0] == 1
        u0 = u2a
        if single:
            cdf = em.tri_cdf[0]
            if Tm <= v.SELECT_MAX:
                li = jnp.zeros(shape, Int)
                for k in range(1, Tm + 1):
                    li = li + (cdf[k] <= u0).astype(Int)
            else:
                li = jnp.sum(cdf[1:][None, :] <= u0[..., None], axis=-1)
            li = jnp.clip(li, 0, Tm - 1).astype(Int)
            lo = v.gather_col(cdf, li)
            hi = v.gather_col(cdf, li + 1)
            tri = v.gather_col(em.tri_idx[0], li)
        else:
            cdf = em.tri_cdf[eid]
            li = jnp.sum(cdf[..., 1:] <= u0[..., None], axis=-1)
            li = jnp.clip(li, 0, Tm - 1).astype(Int)
            lo = jnp.take_along_axis(cdf, li[..., None], axis=-1)[..., 0]
            hi = jnp.take_along_axis(cdf, (li + 1)[..., None], axis=-1)[..., 0]
            tri = em.tri_idx[eid, li]
        u0r = jnp.clip((u0 - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
        b0, b1 = v.square_to_uniform_triangle(u0r, u2b)
        from ..scene.geometry import _gather3_v

        p0 = _gather3_v(geom.tri_p0, tri)
        e1 = _gather3_v(geom.tri_e1, tri)
        e2 = _gather3_v(geom.tri_e2, tri)
        p_tri = p0 + e1 * b0 + e2 * b1
        n_tri = e1.cross(e2).normalized()
        sel = kind == AK_TRIMESH
        p = v.where(sel, p_tri, p)
        n = v.where(sel, n_tri, n)

    if AK_SPHERE in kinds:
        from ..scene.geometry import _gather3_v

        dir_s = v.square_to_uniform_sphere(u2a, u2b)
        sc = _gather3_v(geom.sph_center, prim)
        sr = v.gather_col(geom.sph_radius, prim) \
            if geom.sph_radius.shape[0] <= v.SELECT_MAX else geom.sph_radius[prim]
        p_sph = sc + dir_s * sr
        sel = kind == AK_SPHERE
        p = v.where(sel, p_sph, p)
        n = v.where(sel, dir_s, n)

    if AK_DISK in kinds:
        from ..scene.geometry import _gather3_v

        pd = warp.square_to_uniform_disk_concentric(
            jnp.stack([u2a, u2b], axis=-1))
        dc = _gather3_v(geom.disk_center, prim)
        dsx = _gather3_v(geom.disk_s, prim)
        dtx = _gather3_v(geom.disk_t, prim)
        dnx = _gather3_v(geom.disk_n, prim)
        dr = v.gather_col(geom.disk_radius, prim) \
            if geom.disk_radius.shape[0] <= v.SELECT_MAX else geom.disk_radius[prim]
        p_disk = dc + dsx * (pd[..., 0] * dr) + dtx * (pd[..., 1] * dr)
        sel = kind == AK_DISK
        p = v.where(sel, p_disk, p)
        n = v.where(sel, dnx, n)

    pdf_area = 1.0 / jnp.maximum(total_area, 1e-12)
    return p, n, pdf_area


def sample_direct_v(em: EmitterTable, geom: Geometry, ref_p, u_sel,
                    u2a, u2b) -> DirectSample3:
    """SoA Scene::sampleEmitterDirect: ref_p is V3, uniforms flat (N,)."""
    from ..core import v3 as v

    shape = ref_p.x.shape
    if em.n_emitters == 0:
        z = jnp.zeros(shape, Float)
        return DirectSample3(
            d=v.zeros(shape), dist=z, value=v.zeros(shape), pdf=z,
            delta=jnp.zeros(shape, bool), n=v.zeros(shape),
            emitter=jnp.full(shape, INVALID, Int),
        )

    if em.select.pmf.shape[0] == 1:
        eid = jnp.zeros(shape, Int)
        sel_pmf = jnp.ones(shape, Float)
    else:
        eid, sel_pmf = em.select.sample(u_sel)

    etype = v.gather_col(em.type, eid)
    radiance = v.gather_v3(em.radiance, eid)
    intensity = v.gather_v3(em.intensity, eid)
    position = v.gather_v3(em.position, eid)
    direction = v.gather_v3(em.direction, eid)
    kind = v.gather_col(em.area_kind, eid)
    prim = v.gather_col(em.prim, eid)
    total_area = v.gather_col(em.total_area, eid)

    d = v.zeros(shape)
    dist = jnp.full(shape, 1.0, Float)
    value = v.zeros(shape)
    pdf = jnp.zeros(shape, Float)
    delta = jnp.zeros(shape, bool)
    n_out = v.zeros(shape)

    far = 2.0 * em.bsphere_radius + 1.0

    for t in em.used_types:
        selm = etype == t
        if t == EM_AREA:
            p_s, n_s, pos_pdf_a = _sample_area_position_v(
                em, geom, eid, u2a, u2b, kind, prim, total_area)
            dvec = p_s - ref_p
            r2 = jnp.maximum(dvec.dot(dvec), 1e-12)
            r = jnp.sqrt(r2)
            du = dvec * (1.0 / r)
            cos_emit = n_s.dot(-du)
            front = cos_emit > 1e-6
            pdf_sa = pos_pdf_a * r2 / jnp.maximum(cos_emit, 1e-8)
            val = v.where(front, radiance, v.zeros(shape))
            d, dist, value, pdf, delta, n_out = _sel6_v(
                selm, (du, r, val, jnp.where(front, pdf_sa, 0.0),
                       jnp.zeros(shape, bool), n_s),
                (d, dist, value, pdf, delta, n_out),
            )
        elif t in (EM_POINT, EM_SPOT):
            dvec = position - ref_p
            r2 = jnp.maximum(dvec.dot(dvec), 1e-12)
            r = jnp.sqrt(r2)
            du = dvec * (1.0 / r)
            val = intensity * (1.0 / r2)
            if t == EM_SPOT:
                cd = (-du).dot(direction)
                cc = v.gather_col(em.cos_cutoff, eid)
                cf = v.gather_col(em.cos_falloff, eid)
                fall = jnp.clip((cd - cc) / jnp.maximum(cf - cc, 1e-6),
                                0.0, 1.0)
                val = val * jnp.where(cd > cc, fall, 0.0)
            d, dist, value, pdf, delta, n_out = _sel6_v(
                selm, (du, r, val, jnp.ones(shape), jnp.ones(shape, bool),
                       -du),
                (d, dist, value, pdf, delta, n_out),
            )
        elif t == EM_DIRECTIONAL:
            du = (-direction).broadcast_to(shape)
            val = intensity.broadcast_to(shape)
            d, dist, value, pdf, delta, n_out = _sel6_v(
                selm,
                (du, jnp.full(shape, far), val, jnp.ones(shape),
                 jnp.ones(shape, bool), -du),
                (d, dist, value, pdf, delta, n_out),
            )
        elif t in (EM_CONSTANT, EM_ENVMAP):
            if t == EM_CONSTANT:
                du = v.square_to_uniform_sphere(u2a, u2b)
                val = radiance.broadcast_to(shape)
                pdf_sa = jnp.full(shape, warp.INV_FOURPI, Float)
            else:
                uv, pdf_uv = em.env_dist.sample_continuous(
                    jnp.stack([u2a, u2b], axis=-1))
                uu, vv = uv[..., 0], uv[..., 1]
                du = _env_dir_from_uv_v(em, uu, vv)
                theta = vv * jnp.pi
                sin_t = jnp.maximum(jnp.sin(theta), 1e-6)
                pdf_sa = pdf_uv / (2.0 * jnp.pi * jnp.pi * sin_t)
                val = _env_lookup_v(em, uu, vv, radiance)
            d, dist, value, pdf, delta, n_out = _sel6_v(
                selm,
                (du, jnp.full(shape, far), val, pdf_sa,
                 jnp.zeros(shape, bool), -du),
                (d, dist, value, pdf, delta, n_out),
            )
        elif t == EM_COLLIMATED:
            # measure-zero beam: direct sampling hits it with prob 0
            continue

    return DirectSample3(
        d=d, dist=dist, value=value, pdf=pdf * sel_pmf, delta=delta,
        n=n_out, emitter=eid.astype(Int),
    )


def _sel6_v(mask, new, old):
    from ..core import v3 as v

    out = []
    for nv, ov in zip(new, old):
        if isinstance(nv, v.V3):
            out.append(v.where(mask, nv, ov))
        else:
            out.append(jnp.where(mask, nv, ov))
    return tuple(out)
