"""Microfacet distributions: GGX / Beckmann / Phong, Smith shadowing,
visible-normal sampling for GGX.

Reference: ``/root/reference/src/bsdfs/microfacet.h`` (Beckmann/GGX/Phong
with VNDF sampling).  Here GGX uses Heitz's VNDF sampling; Beckmann and
Phong sample the full NDF — sampling pdf and ``pdf()`` are consistent per
distribution, which is what unbiasedness and the chi-square tests require.
Anisotropy (alpha_u != alpha_v) is supported for GGX and Beckmann.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.math import Frame, safe_sqrt, vec3

DIST_BECKMANN = 0
DIST_GGX = 1
DIST_PHONG = 2

INV_PI = 1.0 / jnp.pi


def _stretch(v, au, av):
    return m.normalize(vec3(v[..., 0] * au, v[..., 1] * av, v[..., 2]))


def ndf(dist, m_vec, au, av):
    """D(m): density of microfacet normals (projected-area normalized)."""
    ct = Frame.cos_theta(m_vec)
    ct2 = ct * ct
    valid = ct > 0
    x2 = m_vec[..., 0] ** 2
    y2 = m_vec[..., 1] ** 2

    # Beckmann
    exponent_b = -(x2 / (au * au) + y2 / (av * av)) / jnp.maximum(ct2, 1e-12)
    d_beck = jnp.exp(exponent_b) / jnp.maximum(jnp.pi * au * av * ct2 * ct2, 1e-20)

    # GGX
    denom = x2 / (au * au) + y2 / (av * av) + ct2
    d_ggx = 1.0 / jnp.maximum(jnp.pi * au * av * denom * denom, 1e-20)

    # Phong (isotropic, exponent derived from alpha_u)
    exp_p = 2.0 / jnp.maximum(au * au, 1e-12) - 2.0
    d_phong = (exp_p + 2.0) * (0.5 * INV_PI) * jnp.power(jnp.maximum(ct, 1e-12), exp_p)

    d = jnp.where(dist == DIST_GGX, d_ggx, jnp.where(dist == DIST_PHONG, d_phong, d_beck))
    return jnp.where(valid, d, 0.0)


def _project_roughness2(v, au, av):
    """Squared roughness along v's azimuth (for anisotropic Smith)."""
    inv_st2 = m.safe_div(1.0, Frame.sin_theta2(v), fallback=1.0)
    cos_phi2 = v[..., 0] ** 2 * inv_st2
    sin_phi2 = v[..., 1] ** 2 * inv_st2
    iso = Frame.sin_theta2(v) <= 1e-12
    a2 = jnp.where(iso, au * au, cos_phi2 * au * au + sin_phi2 * av * av)
    return a2


def smith_g1(dist, v, m_vec, au, av):
    """Smith masking for direction v given microfacet normal m."""
    ct = Frame.cos_theta(v)
    # sidedness: v must be on the same side as m
    chi = (m.dot(v, m_vec) * ct) > 0
    tan2 = Frame.tan_theta2(v)
    a2 = _project_roughness2(v, au, av)

    # GGX closed form
    g_ggx = 2.0 / (1.0 + jnp.sqrt(1.0 + a2 * tan2))

    # Beckmann rational fit (same used by the reference & Walter07) — also
    # used for Phong via equivalent exponent.
    a = 1.0 / jnp.maximum(jnp.sqrt(a2) * jnp.sqrt(jnp.maximum(tan2, 0.0)), 1e-12)
    a_beck = jnp.where(dist == DIST_PHONG,
                       jnp.sqrt((2.0 / jnp.maximum(au * au, 1e-12)) * 0.5) /
                       jnp.maximum(jnp.sqrt(jnp.maximum(tan2, 0.0)), 1e-12),
                       a)
    ab = a_beck
    g_rat = jnp.where(
        ab >= 1.6,
        1.0,
        (3.535 * ab + 2.181 * ab * ab) / (1.0 + 2.276 * ab + 2.577 * ab * ab),
    )

    g = jnp.where(dist == DIST_GGX, g_ggx, g_rat)
    g = jnp.where(tan2 <= 1e-16, 1.0, g)
    return jnp.where(chi, g, 0.0)


def smith_g2(dist, wi, wo, m_vec, au, av):
    return smith_g1(dist, wi, m_vec, au, av) * smith_g1(dist, wo, m_vec, au, av)


def sample_ggx_vndf(wi, au, av, u2):
    """Heitz 2018 VNDF sampling for GGX (handles wi from either side)."""
    flip = Frame.cos_theta(wi) < 0
    wi_f = jnp.where(flip[..., None], -wi, wi)
    vh = m.normalize(vec3(au * wi_f[..., 0], av * wi_f[..., 1], wi_f[..., 2]))
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    t1 = jnp.where(
        (lensq > 1e-14)[..., None],
        vec3(-vh[..., 1], vh[..., 0], jnp.zeros_like(lensq))
        * jax.lax.rsqrt(jnp.maximum(lensq, 1e-14))[..., None],
        vec3(jnp.ones_like(lensq), jnp.zeros_like(lensq), jnp.zeros_like(lensq)),
    )
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u2[..., 0])
    phi = 2.0 * jnp.pi * u2[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * safe_sqrt(1.0 - p1 * p1) + s * p2
    nh = (
        p1[..., None] * t1
        + p2[..., None] * t2
        + safe_sqrt(1.0 - p1 * p1 - p2 * p2)[..., None] * vh
    )
    mvec = m.normalize(
        vec3(au * nh[..., 0], av * nh[..., 1], jnp.maximum(nh[..., 2], 1e-6))
    )
    return jnp.where(flip[..., None], jnp.asarray(mvec), mvec)  # m always upper hemisphere


def sample_visible(dist, wi, au, av, u2):
    """Sample a microfacet normal; returns (m, pdf(m))."""
    # GGX: VNDF
    m_ggx = sample_ggx_vndf(wi, au, av, u2)

    # Beckmann: full NDF sampling (isotropic & anisotropic)
    phi_b = 2.0 * jnp.pi * u2[..., 1]
    # anisotropic azimuth remap
    phi_b_aniso = jnp.arctan2(av * jnp.sin(phi_b), au * jnp.cos(phi_b))
    cp, sp = jnp.cos(phi_b_aniso), jnp.sin(phi_b_aniso)
    a2inv = cp * cp / jnp.maximum(au * au, 1e-12) + sp * sp / jnp.maximum(av * av, 1e-12)
    log_u = jnp.log(jnp.maximum(1.0 - u2[..., 0], 1e-20))
    tan2_b = -log_u / jnp.maximum(a2inv, 1e-12)
    ct_b = jax.lax.rsqrt(1.0 + tan2_b)
    st_b = safe_sqrt(1.0 - ct_b * ct_b)
    m_beck = vec3(st_b * cp, st_b * sp, ct_b)

    # Phong: cos^n sampling
    exp_p = 2.0 / jnp.maximum(au * au, 1e-12) - 2.0
    ct_p = jnp.power(jnp.maximum(u2[..., 0], 1e-20), 1.0 / (exp_p + 2.0))
    st_p = safe_sqrt(1.0 - ct_p * ct_p)
    phi_p = 2.0 * jnp.pi * u2[..., 1]
    m_ph = vec3(st_p * jnp.cos(phi_p), st_p * jnp.sin(phi_p), ct_p)

    mvec = jnp.where(
        (dist == DIST_GGX)[..., None],
        m_ggx,
        jnp.where((dist == DIST_PHONG)[..., None], m_ph, m_beck),
    )
    return mvec, pdf_visible(dist, wi, mvec, au, av)


def pdf_visible(dist, wi, m_vec, au, av):
    """pdf of sample_visible in the half-vector measure."""
    d = ndf(dist, m_vec, au, av)
    ct_i = Frame.cos_theta(wi)
    # GGX VNDF pdf: G1(wi) |wi.m| D / |cos_i|
    pdf_ggx = (
        smith_g1(DIST_GGX * jnp.ones_like(m_vec[..., 0], dtype=jnp.int32), wi, m_vec, au, av)
        * jnp.abs(m.dot(wi, m_vec))
        * d
        / jnp.maximum(jnp.abs(ct_i), 1e-8)
    )
    # NDF pdf: D * cos_m
    pdf_ndf = d * jnp.maximum(Frame.cos_theta(m_vec), 0.0)
    return jnp.where(dist == DIST_GGX, pdf_ggx, pdf_ndf)
