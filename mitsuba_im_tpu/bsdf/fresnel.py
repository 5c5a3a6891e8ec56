"""Fresnel terms (reference ``/root/reference/src/libcore/util.cpp``
fresnelDielectricExt / fresnelConductorExact, ``bsdfs/ior.h``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import safe_sqrt


def fresnel_dielectric(cos_theta_i: jax.Array, eta: jax.Array):
    """Unpolarized Fresnel for dielectrics with relative IOR ``eta`` =
    int_ior/ext_ior (w.r.t. the normal side).

    Handles entering/exiting via the sign of cos_theta_i.  Returns
    (F, cos_theta_t, eta_it, eta_ti) where cos_theta_t carries the opposite
    sign of cos_theta_i (transmitted side) and eta_ti = 1/eta_rel is the
    factor for radiance scaling.
    """
    outside = cos_theta_i >= 0.0
    eta_rel = jnp.where(outside, eta, 1.0 / eta)
    eta_ti = 1.0 / eta_rel

    ci = jnp.abs(cos_theta_i)
    sin2_t = eta_ti * eta_ti * jnp.maximum(0.0, 1.0 - ci * ci)
    tir = sin2_t >= 1.0
    ct = safe_sqrt(1.0 - sin2_t)

    rs = (ci - eta_rel * ct) / jnp.where(tir, 1.0, ci + eta_rel * ct)
    rp = (eta_rel * ci - ct) / jnp.where(tir, 1.0, eta_rel * ci + ct)
    F = jnp.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))
    cos_theta_t = jnp.where(cos_theta_i >= 0, -ct, ct)
    return F, cos_theta_t, eta_rel, eta_ti


def fresnel_conductor_v(cos_theta_i, eta, k):
    """Exact unpolarized conductor Fresnel in component-SoA form;
    eta, k are V3 rgb, cos_theta_i flat (N,).  Returns V3."""
    ci = jnp.clip(jnp.abs(cos_theta_i), 0.0, 1.0)
    ci2 = ci * ci
    si2 = 1.0 - ci2
    e2 = eta * eta
    k2 = k * k

    from ..core.v3 import V3

    t0 = e2 - k2 - si2
    a2b2_sq = t0 * t0 + e2 * k2 * 4.0
    a2b2 = V3(safe_sqrt(a2b2_sq.x), safe_sqrt(a2b2_sq.y), safe_sqrt(a2b2_sq.z))
    t1 = a2b2 + ci2
    half = (a2b2 + t0) * 0.5
    a = V3(safe_sqrt(half.x), safe_sqrt(half.y), safe_sqrt(half.z))
    t2 = a * (2.0 * ci)
    rs = (t1 - t2) / (t1 + t2).maximum(1e-20)
    t3 = a2b2 * ci2 + si2 * si2
    t4 = t2 * si2
    rp = rs * ((t3 - t4) / (t3 + t4).maximum(1e-20))
    return (rp + rs) * 0.5


def fresnel_conductor(cos_theta_i: jax.Array, eta: jax.Array, k: jax.Array) -> jax.Array:
    """Exact unpolarized conductor Fresnel; eta, k are (..., 3) rgb."""
    ci = jnp.clip(jnp.abs(cos_theta_i), 0.0, 1.0)[..., None]
    ci2 = ci * ci
    si2 = 1.0 - ci2
    e2 = eta * eta
    k2 = k * k

    t0 = e2 - k2 - si2
    a2b2 = safe_sqrt(t0 * t0 + 4.0 * e2 * k2)
    t1 = a2b2 + ci2
    a = safe_sqrt(0.5 * (a2b2 + t0))
    t2 = 2.0 * a * ci
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
    t3 = ci2 * a2b2 + si2 * si2
    t4 = t2 * si2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
    return 0.5 * (rp + rs)


def fresnel_diffuse_reflectance(eta: jax.Array) -> jax.Array:
    """Average Fresnel reflectance for diffuse internal scattering
    (reference ``libcore/util.cpp`` fresnelDiffuseReflectance fast approx,
    d'Eon & Irving fits)."""
    eta = jnp.asarray(eta)
    inv_eta = 1.0 / eta
    approx_lt1 = (
        -0.4399
        + 0.7099 * inv_eta
        - 0.3319 * inv_eta ** 2
        + 0.0636 * inv_eta ** 3
    )
    inv_eta2 = inv_eta * inv_eta
    inv_eta3 = inv_eta2 * inv_eta
    approx_ge1 = (
        0.919317
        - 3.4793 * inv_eta
        + 6.75335 * inv_eta2
        - 7.80989 * inv_eta3
        + 4.98554 * inv_eta3 * inv_eta
        - 1.36881 * inv_eta3 * inv_eta2
    )
    return jnp.where(eta < 1.0, approx_lt1, approx_ge1)
