"""Direct illumination, ambient occlusion, and AOV/field integrators.

Parity: ``/root/reference/src/integrators/direct/direct.cpp`` (MIS-split
emitter/BSDF samples), ``direct/ao.cpp``, ``misc/field.cpp``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import Float, INVALID, EPSILON, SHADOW_EPSILON
from ..core import math as m
from ..core import rng as mrng
from ..bsdf.eval import bsdf_eval, bsdf_pdf, bsdf_sample
from ..emitter import table as em
from ..scene.scene import Scene
from .path import mi_weight


def direct_li(scene: Scene, sampler, o, d, emitter_samples=1, bsdf_samples=1,
              hide_emitters=False):
    """MIS direct illumination with sample-count-weighted heuristics
    (direct.cpp:198-320)."""
    hit = scene.ray_intersect(o, d)
    it = scene.interaction(o, d, hit)
    li = jnp.zeros(o.shape[:-1] + (3,), Float)

    esc = ~it.valid
    if not hide_emitters:
        li += jnp.where(esc[..., None], em.eval_environment(scene.emitters, d), 0.0)
        le = em.emitted_radiance(scene.emitters, scene.emitter_at(it), it.ns, -d)
        li += jnp.where(it.valid[..., None], le, 0.0)

    frame = (it.ss, it.ts_, it.ns)
    p = scene.bsdf_at(it)
    frac_lum = emitter_samples / max(emitter_samples + bsdf_samples, 1)
    frac_bsdf = 1.0 - frac_lum
    w_lum = 1.0 / max(emitter_samples, 1)
    w_bsdf = 1.0 / max(bsdf_samples, 1)

    s = sampler
    for _ in range(emitter_samples):
        s, blk = mrng.next_block4(s)
        ds = em.sample_direct(scene.emitters, scene.geom, it.p, blk[..., 0], blk[..., 1:3])
        wo_l = m.Frame.to_local(frame, ds.d)
        f = bsdf_eval(p, it.wi_local, wo_l)
        pdf_b = bsdf_pdf(p, it.wi_local, wo_l)
        occ = scene.occluded(it.p, ds.d, EPSILON, ds.dist * (1 - SHADOW_EPSILON))
        mw = jnp.where(
            ds.delta, 1.0, mi_weight(ds.pdf * frac_lum, pdf_b * frac_bsdf)
        )
        contrib = ds.value * f * m.safe_div(mw * w_lum, ds.pdf)[..., None]
        li += jnp.where((it.valid & ~occ & (ds.pdf > 0))[..., None], contrib, 0.0)

    for _ in range(bsdf_samples):
        s, blk = mrng.next_block4(s)
        bs = bsdf_sample(p, it.wi_local, blk[..., 0], blk[..., 1:3], blk[..., 3])
        wo_w = m.Frame.to_world(frame, bs.wo)
        hit2 = scene.ray_intersect(it.p, wo_w)
        it2 = scene.interaction(it.p, wo_w, hit2)
        le2 = em.emitted_radiance(scene.emitters, scene.emitter_at(it2), it2.ns, -wo_w)
        lum_pdf = jnp.where(
            bs.delta, 0.0,
            jnp.where(
                it2.valid,
                em.pdf_direct_area(scene.emitters, scene.emitter_at(it2), it.p, it2.p, it2.ns),
                em.pdf_direct_env(scene.emitters, wo_w),
            ),
        )
        val = jnp.where(
            it2.valid[..., None], le2, em.eval_environment(scene.emitters, wo_w)
        )
        mw = mi_weight(bs.pdf * frac_bsdf, lum_pdf * frac_lum)
        li += jnp.where(
            it.valid[..., None], bs.weight * val * (mw * w_bsdf)[..., None], 0.0
        )

    return li, s


def ao_li(scene: Scene, sampler, o, d, shading_samples=1, ray_length=-1.0):
    """Ambient occlusion (ao.cpp): cosine-hemisphere visibility."""
    hit = scene.ray_intersect(o, d)
    it = scene.interaction(o, d, hit)
    if ray_length < 0:
        # auto length = bounding-sphere radius / 2 (ao.cpp default)
        ray_length = scene.emitters.bsphere_radius * 0.5
    frame = (it.ss, it.ts_, it.ns)
    s = sampler
    acc = jnp.zeros(o.shape[:-1], Float)
    for _ in range(shading_samples):
        s, blk = mrng.next_block4(s)
        from ..core import warp

        wo_local = warp.square_to_cosine_hemisphere(blk[..., :2])
        wo_w = m.Frame.to_world(frame, wo_local)
        occ = scene.occluded(it.p, wo_w, EPSILON, ray_length)
        acc += jnp.where(it.valid & ~occ, 1.0, 0.0)
    acc = acc / max(shading_samples, 1)
    return jnp.broadcast_to(acc[..., None], acc.shape + (3,)), s


def field_li(scene: Scene, sampler, o, d, field="position"):
    """AOV extraction (field.cpp): position/relPosition/distance/normal/
    geoNormal/uv/albedo/shapeIndex/primIndex."""
    hit = scene.ray_intersect(o, d)
    it = scene.interaction(o, d, hit)
    v = it.valid[..., None]
    if field in ("position", "relPosition"):
        out = it.p
    elif field == "distance":
        out = jnp.broadcast_to(hit.t[..., None], it.p.shape)
    elif field in ("normal", "shNormal"):
        out = it.ns
    elif field == "geoNormal":
        out = it.ng
    elif field == "uv":
        out = jnp.concatenate([it.uv, jnp.zeros_like(it.uv[..., :1])], axis=-1)
    elif field == "albedo":
        p = scene.bsdf_at(it)
        out = p.refl
    elif field == "shapeIndex":
        out = jnp.broadcast_to(it.shape[..., None].astype(Float), it.p.shape)
    elif field == "primIndex":
        out = jnp.broadcast_to(hit.prim[..., None].astype(Float), it.p.shape)
    else:
        raise ValueError(f"unknown field '{field}'")
    return jnp.where(v, out, 0.0), sampler


def motion_li(scene: Scene, sampler, o, d, prev_to_world=None,
              width=1, height=1):
    """Screen-space motion vectors (misc/motion.cpp analog).

    The reference differentiates the film projection with forward-mode
    autodiff (``core/autodiff.h``); here the previous-frame sensor pose is
    evaluated from an AnimatedTransform (core/track.py) or an explicit
    ``prev_to_world`` matrix and the hit point is re-projected — the motion
    vector is the film-space displacement in pixels (R=dx, G=dy, B=depth).
    """
    import jax.numpy as jnp
    from ..sensor.table import connect

    hit = scene.ray_intersect(o, d)
    it = scene.interaction(o, d, hit)
    uv_now, _, _, _, ok_now = connect(scene.sensor, it.p)
    if prev_to_world is None:
        uv_prev, ok_prev = uv_now, ok_now
    else:
        m_prev = jnp.asarray(prev_to_world, Float)
        inv_prev = jnp.linalg.inv(m_prev)
        prev_sensor = scene.sensor.replace(to_world=m_prev,
                                           to_camera=inv_prev)
        uv_prev, _, _, _, ok_prev = connect(prev_sensor, it.p)
    res = jnp.asarray([width, height], Float)
    mv = (uv_now - uv_prev) * res
    out = jnp.concatenate([mv, hit.t[..., None]], axis=-1)
    v = (it.valid & ok_now & ok_prev)[..., None]
    return jnp.where(v, out, 0.0), sampler
