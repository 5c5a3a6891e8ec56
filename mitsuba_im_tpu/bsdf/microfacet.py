"""Microfacet distributions: GGX / Beckmann / Phong, Smith shadowing,
visible-normal sampling for GGX.

Reference: ``/root/reference/src/bsdfs/microfacet.h`` (Beckmann/GGX/Phong
with VNDF sampling).  Here GGX uses Heitz's VNDF sampling; Beckmann and
Phong sample the full NDF — sampling pdf and ``pdf()`` are consistent per
distribution, which is what unbiasedness and the chi-square tests require.
Anisotropy (alpha_u != alpha_v) is supported for GGX and Beckmann.

Canonical implementations are component-SoA (directions are
:class:`~mitsuba_im_tpu.core.v3.V3`); the ``(..., 3)``-array entry points at
the bottom are thin wrappers for not-yet-migrated callers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import v3 as v
from ..core.v3 import V3, safe_div

DIST_BECKMANN = 0
DIST_GGX = 1
DIST_PHONG = 2

INV_PI = 1.0 / jnp.pi


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def ndf_v(dist, m_vec: V3, au, av):
    """D(m): density of microfacet normals (projected-area normalized)."""
    ct = m_vec.z
    ct2 = ct * ct
    valid = ct > 0
    x2 = m_vec.x * m_vec.x
    y2 = m_vec.y * m_vec.y

    # Beckmann
    exponent_b = -(x2 / (au * au) + y2 / (av * av)) / jnp.maximum(ct2, 1e-12)
    d_beck = jnp.exp(exponent_b) / jnp.maximum(
        jnp.pi * au * av * ct2 * ct2, 1e-20)

    # GGX
    denom = x2 / (au * au) + y2 / (av * av) + ct2
    d_ggx = 1.0 / jnp.maximum(jnp.pi * au * av * denom * denom, 1e-20)

    # Phong (isotropic, exponent derived from alpha_u)
    exp_p = 2.0 / jnp.maximum(au * au, 1e-12) - 2.0
    d_phong = (exp_p + 2.0) * (0.5 * INV_PI) * jnp.power(
        jnp.maximum(ct, 1e-12), exp_p)

    d = jnp.where(dist == DIST_GGX, d_ggx,
                  jnp.where(dist == DIST_PHONG, d_phong, d_beck))
    return jnp.where(valid, d, 0.0)


def _project_roughness2_v(w: V3, au, av):
    """Squared roughness along w's azimuth (for anisotropic Smith)."""
    st2 = v.sin_theta2(w)
    inv_st2 = safe_div(1.0, st2, fallback=1.0)
    cos_phi2 = w.x * w.x * inv_st2
    sin_phi2 = w.y * w.y * inv_st2
    iso = st2 <= 1e-12
    return jnp.where(iso, au * au, cos_phi2 * au * au + sin_phi2 * av * av)


def smith_g1_v(dist, w: V3, m_vec: V3, au, av):
    """Smith masking for direction w given microfacet normal m."""
    ct = w.z
    chi = (w.dot(m_vec) * ct) > 0
    tan2 = v.tan_theta2(w)
    a2 = _project_roughness2_v(w, au, av)

    # GGX closed form
    g_ggx = 2.0 / (1.0 + jnp.sqrt(1.0 + a2 * tan2))

    # Beckmann rational fit (same used by the reference & Walter07) — also
    # used for Phong via equivalent exponent.
    a = 1.0 / jnp.maximum(
        jnp.sqrt(a2) * jnp.sqrt(jnp.maximum(tan2, 0.0)), 1e-12)
    a_beck = jnp.where(
        dist == DIST_PHONG,
        jnp.sqrt((2.0 / jnp.maximum(au * au, 1e-12)) * 0.5)
        / jnp.maximum(jnp.sqrt(jnp.maximum(tan2, 0.0)), 1e-12),
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


def smith_g2_v(dist, wi: V3, wo: V3, m_vec: V3, au, av):
    return smith_g1_v(dist, wi, m_vec, au, av) * smith_g1_v(
        dist, wo, m_vec, au, av)


def sample_ggx_vndf_v(wi: V3, au, av, u1, u2):
    """Heitz 2018 VNDF sampling for GGX (handles wi from either side)."""
    flip = wi.z < 0
    wi_f = v.where(flip, -wi, wi)
    vh = V3(au * wi_f.x, av * wi_f.y, wi_f.z).normalized()
    lensq = vh.x * vh.x + vh.y * vh.y
    inv_len = jax.lax.rsqrt(jnp.maximum(lensq, 1e-14))
    good = lensq > 1e-14
    t1 = V3(
        jnp.where(good, -vh.y * inv_len, 1.0),
        jnp.where(good, vh.x * inv_len, 0.0),
        jnp.zeros_like(lensq),
    )
    t2 = vh.cross(t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh.z)
    p2 = (1.0 - s) * safe_sqrt(1.0 - p1 * p1) + s * p2
    nh = t1 * p1 + t2 * p2 + vh * safe_sqrt(1.0 - p1 * p1 - p2 * p2)
    return V3(au * nh.x, av * nh.y, jnp.maximum(nh.z, 1e-6)).normalized()


def sample_visible_v(dist, wi: V3, au, av, u1, u2):
    """Sample a microfacet normal; returns (m, pdf(m))."""
    # GGX: VNDF
    m_ggx = sample_ggx_vndf_v(wi, au, av, u1, u2)

    # Beckmann: full NDF sampling (isotropic & anisotropic)
    phi_b = 2.0 * jnp.pi * u2
    phi_b_aniso = jnp.arctan2(av * jnp.sin(phi_b), au * jnp.cos(phi_b))
    cp, sp = jnp.cos(phi_b_aniso), jnp.sin(phi_b_aniso)
    a2inv = (cp * cp / jnp.maximum(au * au, 1e-12)
             + sp * sp / jnp.maximum(av * av, 1e-12))
    log_u = jnp.log(jnp.maximum(1.0 - u1, 1e-20))
    tan2_b = -log_u / jnp.maximum(a2inv, 1e-12)
    ct_b = jax.lax.rsqrt(1.0 + tan2_b)
    st_b = safe_sqrt(1.0 - ct_b * ct_b)
    m_beck = V3(st_b * cp, st_b * sp, ct_b)

    # Phong: cos^n sampling
    exp_p = 2.0 / jnp.maximum(au * au, 1e-12) - 2.0
    ct_p = jnp.power(jnp.maximum(u1, 1e-20), 1.0 / (exp_p + 2.0))
    st_p = safe_sqrt(1.0 - ct_p * ct_p)
    phi_p = 2.0 * jnp.pi * u2
    m_ph = V3(st_p * jnp.cos(phi_p), st_p * jnp.sin(phi_p), ct_p)

    mvec = v.where(dist == DIST_GGX, m_ggx,
                   v.where(dist == DIST_PHONG, m_ph, m_beck))
    return mvec, pdf_visible_v(dist, wi, mvec, au, av)


def pdf_visible_v(dist, wi: V3, m_vec: V3, au, av):
    """pdf of sample_visible in the half-vector measure."""
    d = ndf_v(dist, m_vec, au, av)
    ct_i = wi.z
    ggx_code = jnp.full(m_vec.x.shape, DIST_GGX, jnp.int32)
    pdf_ggx = (
        smith_g1_v(ggx_code, wi, m_vec, au, av)
        * jnp.abs(wi.dot(m_vec))
        * d
        / jnp.maximum(jnp.abs(ct_i), 1e-8)
    )
    pdf_ndf = d * jnp.maximum(m_vec.z, 0.0)
    return jnp.where(dist == DIST_GGX, pdf_ggx, pdf_ndf)


# ---------------------------------------------------------------------------
# (..., 3)-array compatibility wrappers
# ---------------------------------------------------------------------------

def ndf(dist, m_vec, au, av):
    return ndf_v(dist, V3.from_array(m_vec), au, av)


def smith_g1(dist, w, m_vec, au, av):
    return smith_g1_v(dist, V3.from_array(w), V3.from_array(m_vec), au, av)


def smith_g2(dist, wi, wo, m_vec, au, av):
    return smith_g2_v(dist, V3.from_array(wi), V3.from_array(wo),
                      V3.from_array(m_vec), au, av)


def sample_ggx_vndf(wi, au, av, u2):
    return sample_ggx_vndf_v(
        V3.from_array(wi), au, av, u2[..., 0], u2[..., 1]).to_array()


def sample_visible(dist, wi, au, av, u2):
    mvec, pdf = sample_visible_v(
        dist, V3.from_array(wi), au, av, u2[..., 0], u2[..., 1])
    return mvec.to_array(), pdf


def pdf_visible(dist, wi, m_vec, au, av):
    return pdf_visible_v(dist, V3.from_array(wi), V3.from_array(m_vec),
                         au, av)
