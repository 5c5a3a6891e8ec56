"""Participating media tables + phase functions.

Parity targets: ``/root/reference/src/medium/homogeneous.cpp`` (closed-form
transmittance + distance sampling), phase functions ``isotropic``/``hg``/
``rayleigh`` (``src/phase/``), and the attenuated shadow-ray capability
(``Scene::sampleAttenuatedEmitterDirect``).

Round-1 scope: homogeneous media bounded by scene shapes (or a global
camera medium).  Heterogeneous grid volumes (Woodcock tracking) follow in
the next pass; the table carries per-medium sigma_s/sigma_a so the
integrator is already medium-id driven.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.types import pytree_dataclass, static_field, Float, Int, INVALID
from ..core import math as m
from ..core.math import Frame, vec3, safe_sqrt

PH_ISOTROPIC = 0
PH_HG = 1
PH_RAYLEIGH = 2

INV_FOURPI = 1.0 / (4.0 * jnp.pi)


@pytree_dataclass
class MediumTable:
    sigma_s: jax.Array  # (M, 3)
    sigma_a: jax.Array  # (M, 3)
    sigma_t: jax.Array  # (M, 3)
    phase_type: jax.Array  # (M,)
    g: jax.Array  # (M,) HG asymmetry
    n_media: int = static_field(default=0)
    used_phase: tuple = static_field(default=())

    @property
    def any(self):
        return self.n_media > 0


def build_media(records: list[dict]) -> MediumTable:
    recs = records or [dict(sigma_s=np.zeros(3), sigma_a=np.zeros(3), scale=1.0,
                            phase=dict(type=PH_ISOTROPIC, g=0.0))]
    ss = np.stack([np.asarray(r["sigma_s"], np.float64) * r.get("scale", 1.0) for r in recs])
    sa = np.stack([np.asarray(r["sigma_a"], np.float64) * r.get("scale", 1.0) for r in recs])
    pt = np.asarray([r.get("phase", {}).get("type", PH_ISOTROPIC) for r in recs], np.int32)
    g = np.asarray([r.get("phase", {}).get("g", 0.0) for r in recs], np.float64)
    return MediumTable(
        sigma_s=jnp.asarray(ss, Float), sigma_a=jnp.asarray(sa, Float),
        sigma_t=jnp.asarray(ss + sa, Float),
        phase_type=jnp.asarray(pt, Int), g=jnp.asarray(g, Float),
        n_media=len(records),
        used_phase=tuple(sorted(set(int(x) for x in pt))),
    )


def medium_params(media: MediumTable, mid: jax.Array):
    """Per-lane (sigma_s, sigma_t, phase_type, g); vacuum for INVALID."""
    from ..core.gather import RowBundle

    idx = jnp.where(mid == INVALID, 0, mid)
    b = (
        RowBundle()
        .add("sigma_s", media.sigma_s).add("sigma_t", media.sigma_t)
        .add("phase_type", media.phase_type).add("g", media.g)
    ).lookup(idx)
    vac = (mid == INVALID)[..., None]
    return (
        jnp.where(vac, 0.0, b["sigma_s"]),
        jnp.where(vac, 0.0, b["sigma_t"]),
        b["phase_type"],
        b["g"],
    )


def transmittance(sigma_t: jax.Array, dist: jax.Array) -> jax.Array:
    """Homogeneous Beer-Lambert transmittance; (..., 3)."""
    return jnp.exp(-sigma_t * jnp.minimum(dist, 1e30)[..., None])


def sample_distance(sigma_t: jax.Array, u: jax.Array):
    """Channel-averaged free-flight sampling.

    Returns (t, pdf_continue(t), pdf_surface = P[t' > t_surf]-density form):
    callers compare t with the surface distance; weights follow the
    standard homogeneous estimator (homogeneous.cpp sampleDistance).
    """
    st_bar = jnp.maximum(jnp.mean(sigma_t, axis=-1), 1e-20)
    t = -jnp.log(jnp.maximum(1.0 - u, 1e-20)) / st_bar
    return t, st_bar


# ---------------------------------------------------------------------------
# Phase functions (local frame: wi toward previous vertex, like BSDFs)
# ---------------------------------------------------------------------------

def phase_eval(ptype, g, wi, wo):
    """p(wi -> wo), normalized over the sphere."""
    cos_theta = m.dot(-wi, wo)  # angle from the propagation direction
    iso = jnp.full(cos_theta.shape, INV_FOURPI)

    # HG: forward-peaked for g > 0 (theta = 0 -> (1-g)^3 denominator)
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    hg = INV_FOURPI * (1.0 - g * g) / jnp.maximum(denom * safe_sqrt(denom), 1e-8)

    ray = (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_theta * cos_theta)

    out = iso
    out = jnp.where(ptype == PH_HG, hg, out)
    out = jnp.where(ptype == PH_RAYLEIGH, ray, out)
    return out


def phase_sample(ptype, g, wi, u2):
    """Sample wo; returns (wo, pdf). HG exact inverse-CDF; isotropic uniform;
    Rayleigh exact via Cardano cubic inversion (phase/rayleigh.cpp)."""
    from ..core import warp

    # isotropic
    wo_iso = warp.square_to_uniform_sphere(u2)

    # Henyey-Greenstein
    safe_g = jnp.where(jnp.abs(g) < 1e-4, 1e-4, g)
    sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u2[..., 0])
    cos_hg = (1.0 + g * g - sqr * sqr) / (2.0 * safe_g)
    cos_hg = jnp.where(jnp.abs(g) < 1e-4, 1.0 - 2.0 * u2[..., 0], cos_hg)
    cos_hg = jnp.clip(cos_hg, -1.0, 1.0)
    sin_hg = safe_sqrt(1.0 - cos_hg * cos_hg)
    phi = 2.0 * jnp.pi * u2[..., 1]
    frame = Frame.from_normal(-wi)
    wo_hg = Frame.to_world(
        frame, vec3(sin_hg * jnp.cos(phi), sin_hg * jnp.sin(phi), cos_hg)
    )

    # Rayleigh: invert u = (3x + x^3 + 4)/8 for x = cos
    z = 2.0 * (2.0 * u2[..., 0] - 1.0)
    A = jnp.cbrt(z + jnp.sqrt(z * z + 1.0))
    cos_r = jnp.clip(A - 1.0 / A, -1.0, 1.0)
    sin_r = safe_sqrt(1.0 - cos_r * cos_r)
    wo_ray = Frame.to_world(
        frame, vec3(sin_r * jnp.cos(phi), sin_r * jnp.sin(phi), cos_r)
    )

    wo = wo_iso
    wo = jnp.where((ptype == PH_HG)[..., None], wo_hg, wo)
    wo = jnp.where((ptype == PH_RAYLEIGH)[..., None], wo_ray, wo)
    pdf = phase_eval(ptype, g, wi, wo)
    return wo, pdf
