"""BSDF evaluate / pdf / sample with static type dispatch.

Conventions follow the reference (``include/mitsuba/render/bsdf.h``): all
directions live in the local shading frame (+z = shading normal), ``wi``
points toward the camera/previous vertex, ``eval`` returns f * |cos_theta_o|
for the *smooth* components only, and ``sample`` returns the importance
weight f*cos/pdf.  Delta components return eval = pdf = 0 so NEE and MIS
compose exactly like the reference path tracer (``path.cpp:119-290``).

Each lobe family cites its reference plugin in the function docstring.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.math import Frame, vec3, safe_sqrt
from ..core import warp
from .common import (
    LaneParams, DIFFUSE, ROUGHDIFFUSE, CONDUCTOR, ROUGHCONDUCTOR, DIELECTRIC,
    THINDIELECTRIC, ROUGHDIELECTRIC, PLASTIC, ROUGHPLASTIC, PHONG, WARD,
    NULL_BSDF, DIFFTRANS, HK, FLAG_TWOSIDED,
)
from .fresnel import fresnel_dielectric, fresnel_conductor, fresnel_diffuse_reflectance
from . import microfacet as mf

INV_PI = 1.0 / jnp.pi


class BSDFSample(NamedTuple):
    wo: jax.Array  # (..., 3)
    weight: jax.Array  # (..., 3) f*cos/pdf (includes discrete lobe probs)
    pdf: jax.Array  # (...,) solid-angle pdf of smooth lobes (delta: 1.0)
    delta: jax.Array  # (...,) bool — sampled a delta component
    eta: jax.Array  # (...,) relative-IOR change along the sampled lobe
    null_passthrough: jax.Array  # (...,) bool — mask/null straight-through


def _zero3(x):
    return jnp.zeros(x.shape + (3,), x.dtype)


def _maybe_flip(p: LaneParams, wi, wo=None):
    """Twosided wrapper: mirror the frame for back-facing lanes."""
    flip = ((p.flags & FLAG_TWOSIDED) != 0) & (Frame.cos_theta(wi) < 0)
    fz = jnp.where(flip, -1.0, 1.0)[..., None]
    scale = jnp.concatenate([jnp.ones_like(fz), jnp.ones_like(fz), fz], axis=-1)
    wi2 = wi * scale
    if wo is None:
        return wi2, flip
    return wi2, wo * scale, flip


# ---------------------------------------------------------------------------
# Smooth-component eval / pdf per type
# ---------------------------------------------------------------------------

def _eval_diffuse(p, wi, wo):
    """src/bsdfs/diffuse.cpp"""
    ok = (Frame.cos_theta(wi) > 0) & (Frame.cos_theta(wo) > 0)
    val = p.refl * (INV_PI * jnp.maximum(Frame.cos_theta(wo), 0.0))[..., None]
    return jnp.where(ok[..., None], val, 0.0)


def _pdf_diffuse(p, wi, wo):
    ok = (Frame.cos_theta(wi) > 0) & (Frame.cos_theta(wo) > 0)
    return jnp.where(ok, warp.square_to_cosine_hemisphere_pdf(wo), 0.0)


def _eval_roughdiffuse(p, wi, wo):
    """Oren-Nayar (src/bsdfs/roughdiffuse.cpp, full model).  sigma is the
    Beckmann-style alpha converted with the reference's 1/sqrt(2) factor."""
    ci, co = Frame.cos_theta(wi), Frame.cos_theta(wo)
    ok = (ci > 0) & (co > 0)
    sigma = p.alpha_u * 0.70711
    s2 = sigma * sigma
    A = 1.0 - s2 / (2.0 * (s2 + 0.33))
    B = 0.45 * s2 / (s2 + 0.09)
    sin_a = Frame.sin_theta(jnp.where((ci < co)[..., None], wi, wo))
    tan_b = Frame.tan_theta(jnp.where((ci < co)[..., None], wo, wi))
    # cos(phi_i - phi_o)
    cpd = Frame.cos_phi(wi) * Frame.cos_phi(wo) + Frame.sin_phi(wi) * Frame.sin_phi(wo)
    val = p.refl * (
        INV_PI * co * (A + B * jnp.maximum(cpd, 0.0) * sin_a * tan_b)
    )[..., None]
    return jnp.where(ok[..., None], val, 0.0)


def _eval_roughconductor(p, wi, wo):
    """src/bsdfs/roughconductor.cpp: D*G*F/(4 cos_i) (already x cos_o)."""
    ci, co = Frame.cos_theta(wi), Frame.cos_theta(wo)
    ok = (ci > 0) & (co > 0)
    h = m.normalize(wi + wo)
    D = mf.ndf(p.dist, h, p.alpha_u, p.alpha_v)
    G = mf.smith_g2(p.dist, wi, wo, h, p.alpha_u, p.alpha_v)
    F = fresnel_conductor(m.dot(wi, h), p.eta, p.k)
    val = p.spec * F * (D * G / jnp.maximum(4.0 * ci, 1e-8))[..., None]
    return jnp.where(ok[..., None] & (D > 0)[..., None], val, 0.0)


def _pdf_roughconductor(p, wi, wo):
    ci, co = Frame.cos_theta(wi), Frame.cos_theta(wo)
    ok = (ci > 0) & (co > 0)
    h = m.normalize(wi + wo)
    pm = mf.pdf_visible(p.dist, wi, h, p.alpha_u, p.alpha_v)
    return jnp.where(ok, pm / jnp.maximum(4.0 * jnp.abs(m.dot(wo, h)), 1e-8), 0.0)


def _rough_dielectric_halfvec(p, wi, wo):
    ci = Frame.cos_theta(wi)
    reflecting = ci * Frame.cos_theta(wo) > 0
    eta_i = jnp.where(ci > 0, 1.0, p.eta_s)
    eta_o = jnp.where(ci > 0, p.eta_s, 1.0)
    h_r = wi + wo
    h_t = -(wi * eta_i[..., None] + wo * eta_o[..., None])
    h = m.normalize(jnp.where(reflecting[..., None], h_r, h_t))
    h = h * jnp.where(Frame.cos_theta(h) < 0, -1.0, 1.0)[..., None]
    return h, reflecting, eta_i, eta_o


def _eval_roughdielectric(p, wi, wo):
    """src/bsdfs/roughdielectric.cpp (Walter et al. 2007), radiance mode."""
    ci, co = Frame.cos_theta(wi), Frame.cos_theta(wo)
    h, reflecting, eta_i, eta_o = _rough_dielectric_halfvec(p, wi, wo)
    D = mf.ndf(p.dist, h, p.alpha_u, p.alpha_v)
    G = mf.smith_g2(p.dist, wi, wo, h, p.alpha_u, p.alpha_v)
    F, _, _, _ = fresnel_dielectric(m.dot(wi, h), p.eta_s)

    # reflection branch
    val_r = p.spec * (F * D * G / jnp.maximum(4.0 * jnp.abs(ci), 1e-8))[..., None]

    # transmission branch
    wih = m.dot(wi, h)
    woh = m.dot(wo, h)
    sqrt_denom = eta_i * wih + eta_o * woh
    # radiance solid-angle compression: (1/eta_crossing)^2
    eta_rel = eta_o / eta_i
    factor = (1.0 / eta_rel) ** 2
    val_t_scalar = (
        jnp.abs(wih * woh / jnp.maximum(jnp.abs(ci * co), 1e-8))
        * (eta_o * eta_o * (1.0 - F) * D * G)
        / jnp.maximum(sqrt_denom * sqrt_denom, 1e-12)
        * factor
        * jnp.abs(co)
    )
    val_t = p.trans * val_t_scalar[..., None]

    valid = (D > 0) & (jnp.abs(ci) > 1e-7)
    out = jnp.where(reflecting[..., None], val_r, val_t)
    return jnp.where(valid[..., None], out, 0.0)


def _pdf_roughdielectric(p, wi, wo):
    h, reflecting, eta_i, eta_o = _rough_dielectric_halfvec(p, wi, wo)
    pm = mf.pdf_visible(p.dist, jnp.where((Frame.cos_theta(wi) < 0)[..., None], -wi, wi), h, p.alpha_u, p.alpha_v)
    F, _, _, _ = fresnel_dielectric(m.dot(wi, h), p.eta_s)
    prob = jnp.where(reflecting, F, 1.0 - F)
    woh = m.dot(wo, h)
    wih = m.dot(wi, h)
    # route validity (the sampler rejects side-violating lobes, matching the
    # reference roughdielectric.cpp): reflection needs wi, wo on the same
    # side of h; transmission on opposite sides.
    valid = jnp.where(reflecting, wih * woh > 0, wih * woh < 0)
    sqrt_denom = eta_i * wih + eta_o * woh
    jac_r = 1.0 / jnp.maximum(4.0 * jnp.abs(woh), 1e-8)
    jac_t = (eta_o * eta_o * jnp.abs(woh)) / jnp.maximum(sqrt_denom * sqrt_denom, 1e-12)
    jac = jnp.where(reflecting, jac_r, jac_t)
    return jnp.where(valid, jnp.maximum(pm * prob * jac, 0.0), 0.0)


def _plastic_terms(p, wi, wo):
    """src/bsdfs/plastic.cpp diffuse term + sampling weights."""
    ci, co = Frame.cos_theta(wi), Frame.cos_theta(wo)
    Fi, _, _, _ = fresnel_dielectric(ci, p.eta_s)
    Fo, _, _, _ = fresnel_dielectric(co, p.eta_s)
    fdr_int = fresnel_diffuse_reflectance(1.0 / p.eta_s)
    inv_eta2 = 1.0 / (p.eta_s * p.eta_s)
    # nonlinear=False default: scalar fdr correction
    diff = p.refl / jnp.maximum(1.0 - fdr_int[..., None], 1e-6)
    val = diff * (INV_PI * jnp.maximum(co, 0.0) * inv_eta2 * (1.0 - Fi) * (1.0 - Fo))[..., None]
    return val, Fi


def _spec_sampling_weight(p):
    s = jnp.mean(p.spec, axis=-1)
    d = jnp.mean(p.refl, axis=-1)
    return s / jnp.maximum(s + d, 1e-8)


def _prob_specular(p, Fi):
    sw = _spec_sampling_weight(p)
    ps = Fi * sw
    pd = (1.0 - Fi) * (1.0 - sw)
    return ps / jnp.maximum(ps + pd, 1e-8)


def _eval_plastic(p, wi, wo):
    ok = (Frame.cos_theta(wi) > 0) & (Frame.cos_theta(wo) > 0)
    val, _ = _plastic_terms(p, wi, wo)
    return jnp.where(ok[..., None], val, 0.0)


def _pdf_plastic(p, wi, wo):
    ok = (Frame.cos_theta(wi) > 0) & (Frame.cos_theta(wo) > 0)
    Fi, _, _, _ = fresnel_dielectric(Frame.cos_theta(wi), p.eta_s)
    prob_spec = _prob_specular(p, Fi)
    return jnp.where(ok, warp.square_to_cosine_hemisphere_pdf(wo) * (1.0 - prob_spec), 0.0)


def _eval_roughplastic(p, wi, wo):
    """src/bsdfs/roughplastic.cpp; diffuse internal-scattering attenuation
    approximated with smooth Fresnel (the reference interpolates precomputed
    rough-transmittance tables — a refinement queued for a later pass)."""
    ci, co = Frame.cos_theta(wi), Frame.cos_theta(wo)
    ok = (ci > 0) & (co > 0)
    h = m.normalize(wi + wo)
    D = mf.ndf(p.dist, h, p.alpha_u, p.alpha_v)
    G = mf.smith_g2(p.dist, wi, wo, h, p.alpha_u, p.alpha_v)
    F, _, _, _ = fresnel_dielectric(m.dot(wi, h), p.eta_s)
    spec = p.spec * (F * D * G / jnp.maximum(4.0 * ci, 1e-8))[..., None]
    diff, _ = _plastic_terms(p, wi, wo)
    return jnp.where(ok[..., None], spec + diff, 0.0)


def _pdf_roughplastic(p, wi, wo):
    ci, co = Frame.cos_theta(wi), Frame.cos_theta(wo)
    ok = (ci > 0) & (co > 0)
    h = m.normalize(wi + wo)
    Fi, _, _, _ = fresnel_dielectric(ci, p.eta_s)
    prob_spec = _prob_specular(p, Fi)
    pm = mf.pdf_visible(p.dist, wi, h, p.alpha_u, p.alpha_v)
    pdf_s = pm / jnp.maximum(4.0 * jnp.abs(m.dot(wo, h)), 1e-8)
    pdf_d = warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(ok, prob_spec * pdf_s + (1.0 - prob_spec) * pdf_d, 0.0)


def _eval_phong(p, wi, wo):
    """src/bsdfs/phong.cpp: modified Phong = diffuse + (n+2)/2pi cos^n."""
    ci, co = Frame.cos_theta(wi), Frame.cos_theta(wo)
    ok = (ci > 0) & (co > 0)
    alpha = m.dot(wo, m.reflect(wi))
    n = p.exponent
    spec = p.spec * (
        jnp.where(alpha > 0, jnp.power(jnp.maximum(alpha, 1e-12), n), 0.0)
        * (n + 2.0) * (0.5 * INV_PI) * co
    )[..., None]
    diff = p.refl * (INV_PI * co)[..., None]
    return jnp.where(ok[..., None], spec + diff, 0.0)


def _pdf_phong(p, wi, wo):
    ci, co = Frame.cos_theta(wi), Frame.cos_theta(wo)
    ok = (ci > 0) & (co > 0)
    sw = _spec_sampling_weight(p)
    alpha = jnp.maximum(m.dot(wo, m.reflect(wi)), 0.0)
    n = p.exponent
    pdf_s = jnp.power(jnp.maximum(alpha, 1e-12), n) * (n + 1.0) * (0.5 * INV_PI)
    pdf_s = jnp.where(alpha > 0, pdf_s, 0.0)
    pdf_d = warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(ok, sw * pdf_s + (1.0 - sw) * pdf_d, 0.0)


def _eval_ward(p, wi, wo):
    """src/bsdfs/ward.cpp (balanced variant)."""
    ci, co = Frame.cos_theta(wi), Frame.cos_theta(wo)
    ok = (ci > 0) & (co > 0)
    h = wi + wo
    au, av = p.alpha_u, p.alpha_v
    exp_arg = -(
        (h[..., 0] / au) ** 2 + (h[..., 1] / av) ** 2
    ) / jnp.maximum(h[..., 2] ** 2, 1e-12)
    spec_scalar = jnp.exp(exp_arg) / (
        4.0 * jnp.pi * au * av * jnp.maximum(jnp.sqrt(ci * co), 1e-8)
    )
    spec = p.spec * (spec_scalar * co)[..., None]
    diff = p.refl * (INV_PI * co)[..., None]
    return jnp.where(ok[..., None], spec + diff, 0.0)


def _pdf_ward(p, wi, wo):
    ci, co = Frame.cos_theta(wi), Frame.cos_theta(wo)
    ok = (ci > 0) & (co > 0)
    sw = _spec_sampling_weight(p)
    h = m.normalize(wi + wo)
    au, av = p.alpha_u, p.alpha_v
    exp_arg = -Frame.tan_theta2(h) * (
        Frame.cos_phi(h) ** 2 / (au * au) + Frame.sin_phi(h) ** 2 / (av * av)
    )
    pdf_h = jnp.exp(exp_arg) / (
        jnp.pi * au * av * jnp.maximum(Frame.cos_theta(h) ** 3, 1e-8)
    )
    pdf_s = pdf_h / jnp.maximum(4.0 * jnp.abs(m.dot(wo, h)), 1e-8)
    pdf_d = warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(ok, sw * pdf_s + (1.0 - sw) * pdf_d, 0.0)


def _eval_difftrans(p, wi, wo):
    """src/bsdfs/difftrans.cpp"""
    opposite = Frame.cos_theta(wi) * Frame.cos_theta(wo) < 0
    val = p.trans * (INV_PI * Frame.abs_cos_theta(wo))[..., None]
    return jnp.where(opposite[..., None], val, 0.0)


def _pdf_difftrans(p, wi, wo):
    opposite = Frame.cos_theta(wi) * Frame.cos_theta(wo) < 0
    return jnp.where(opposite, Frame.abs_cos_theta(wo) * INV_PI, 0.0)


def _hg_phase(g, cos_t):
    denom = 1.0 + g * g - 2.0 * g * cos_t
    return (0.25 * INV_PI) * (1.0 - g * g) / jnp.maximum(
        denom * safe_sqrt(denom), 1e-8)


def _hk_pdelta(p, ci):
    """Probability of the attenuated straight-through delta lobe."""
    att = jnp.exp(-p.trans / jnp.maximum(ci, 1e-4)[..., None])
    return jnp.clip(jnp.mean(att, axis=-1), 0.0, 0.95)


def _eval_hk(p, wi, wo):
    """src/bsdfs/hk.cpp (Hanrahan-Krueger 1993): single scattering in a slab
    of optical depth tau (p.trans) with single-scattering albedo (p.refl) and
    HG phase (g = p.alpha_u).  Smooth reflection + transmission terms; the
    attenuated delta transmission is handled in sampling only."""
    ci = jnp.maximum(Frame.abs_cos_theta(wi), 1e-4)
    co = jnp.maximum(Frame.abs_cos_theta(wo), 1e-4)
    same = Frame.cos_theta(wi) * Frame.cos_theta(wo) > 0
    tau = p.trans
    ph = _hg_phase(p.alpha_u, -m.dot(wi, wo))[..., None]

    # reflection: alpha*p/(ci+co) * (1 - e^{-tau(1/ci+1/co)})
    fr = p.refl * ph * (1.0 - jnp.exp(-tau * (1.0 / ci + 1.0 / co)[..., None])) \
        / (ci + co)[..., None]

    # transmission: alpha*p*(e^{-tau/ci} - e^{-tau/co})/(ci - co), with the
    # ci -> co limit alpha*p*tau/ci^2 e^{-tau/ci}
    dm = (ci - co)[..., None]
    ft_reg = (jnp.exp(-tau / ci[..., None]) - jnp.exp(-tau / co[..., None])) \
        / jnp.where(jnp.abs(dm) < 1e-5, 1.0, dm)
    ft_lim = tau / (ci * ci)[..., None] * jnp.exp(-tau / ci[..., None])
    ft = p.refl * ph * jnp.where(jnp.abs(dm) < 1e-5, ft_lim, ft_reg)

    out = jnp.where(same[..., None], fr, ft) * co[..., None]
    return jnp.maximum(out, 0.0)


def _pdf_hk(p, wi, wo):
    ci = Frame.abs_cos_theta(wi)
    pd = _hk_pdelta(p, ci)
    return (1.0 - pd) * 0.5 * Frame.abs_cos_theta(wo) * INV_PI


_EVAL = {
    DIFFUSE: (_eval_diffuse, _pdf_diffuse),
    ROUGHDIFFUSE: (_eval_roughdiffuse, _pdf_diffuse),
    ROUGHCONDUCTOR: (_eval_roughconductor, _pdf_roughconductor),
    ROUGHDIELECTRIC: (_eval_roughdielectric, _pdf_roughdielectric),
    PLASTIC: (_eval_plastic, _pdf_plastic),
    ROUGHPLASTIC: (_eval_roughplastic, _pdf_roughplastic),
    PHONG: (_eval_phong, _pdf_phong),
    WARD: (_eval_ward, _pdf_ward),
    DIFFTRANS: (_eval_difftrans, _pdf_difftrans),
    HK: (_eval_hk, _pdf_hk),
}


def bsdf_eval(p: LaneParams, wi, wo) -> jax.Array:
    """f(wi, wo) * |cos_theta_o| over smooth components (delta types -> 0)."""
    wi, wo, _ = _maybe_flip(p, wi, wo)
    out = _zero3(p.eta_s)
    op = p.opacity[..., None]
    for t in p.used_types:
        if t in _EVAL:
            fn = _EVAL[t][0]
            out = jnp.where((p.type == t)[..., None], fn(p, wi, wo) * op, out)
    return out


def bsdf_pdf(p: LaneParams, wi, wo) -> jax.Array:
    """Solid-angle pdf of bsdf_sample landing at wo (smooth components)."""
    wi, wo, _ = _maybe_flip(p, wi, wo)
    out = jnp.zeros(p.eta_s.shape, p.eta_s.dtype)
    for t in p.used_types:
        if t in _EVAL:
            fn = _EVAL[t][1]
            out = jnp.where(p.type == t, fn(p, wi, wo) * p.opacity, out)
    return out


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def bsdf_sample(p: LaneParams, wi, u_lobe, u2, u_mask=None) -> BSDFSample:
    """Importance-sample the full BSDF.  u_lobe chooses lobes, u2 drives the
    directional warp, u_mask (optional) drives mask-opacity passthrough."""
    wi_f, flip = _maybe_flip(p, wi)
    shape = p.eta_s.shape
    zero = jnp.zeros(shape, wi.dtype)
    wo = jnp.broadcast_to(vec3(zero, zero, zero + 1.0), shape + (3,))
    weight = _zero3(p.eta_s)
    pdf = jnp.zeros(shape)
    delta = jnp.zeros(shape, bool)
    eta = jnp.ones(shape)

    ci = Frame.cos_theta(wi_f)

    for t in p.used_types:
        sel = p.type == t
        if t == DIFFUSE or t == ROUGHDIFFUSE:
            wo_t = warp.square_to_cosine_hemisphere(u2)
            pdf_t = warp.square_to_cosine_hemisphere_pdf(wo_t)
            if t == DIFFUSE:
                w_t = jnp.where((ci > 0)[..., None], p.refl, 0.0)
            else:
                ev = _eval_roughdiffuse(p, wi_f, wo_t)
                w_t = m.safe_div(ev, pdf_t[..., None])
            wo, weight, pdf, delta, eta = _sel(
                sel, (wo_t, w_t, pdf_t, jnp.zeros(shape, bool), jnp.ones(shape)),
                (wo, weight, pdf, delta, eta),
            )
        elif t == CONDUCTOR:
            wo_t = m.reflect(wi_f)
            F = fresnel_conductor(ci, p.eta, p.k)
            w_t = jnp.where((ci > 0)[..., None], p.spec * F, 0.0)
            wo, weight, pdf, delta, eta = _sel(
                sel, (wo_t, w_t, jnp.ones(shape), jnp.ones(shape, bool), jnp.ones(shape)),
                (wo, weight, pdf, delta, eta),
            )
        elif t in (ROUGHCONDUCTOR, ROUGHDIELECTRIC, ROUGHPLASTIC, PLASTIC,
                   PHONG, WARD, DIFFTRANS):
            out = _sample_smooth_family(t, p, wi_f, ci, u_lobe, u2, shape)
            wo, weight, pdf, delta, eta = _sel(
                sel, out, (wo, weight, pdf, delta, eta)
            )
        elif t == DIELECTRIC:
            F, cos_t, eta_rel, eta_ti = fresnel_dielectric(ci, p.eta_s)
            refl = u_lobe < F
            wo_r = m.reflect(wi_f)
            n_up = jnp.broadcast_to(vec3(zero, zero, zero + 1.0), shape + (3,))
            wo_t = m.refract_n(wi_f, n_up, eta_ti, cos_t)
            wo_t = m.normalize(wo_t)
            w_r = p.spec
            w_t = p.trans * (eta_ti * eta_ti)[..., None]
            wo_d = jnp.where(refl[..., None], wo_r, wo_t)
            w_d = jnp.where(refl[..., None], w_r, w_t)
            eta_d = jnp.where(refl, 1.0, eta_rel)
            wo, weight, pdf, delta, eta = _sel(
                sel, (wo_d, w_d, jnp.ones(shape), jnp.ones(shape, bool), eta_d),
                (wo, weight, pdf, delta, eta),
            )
        elif t == THINDIELECTRIC:
            F, _, _, _ = fresnel_dielectric(jnp.abs(ci), p.eta_s)
            R = jnp.where(F < 1.0, 2.0 * F / (1.0 + F), 1.0)
            refl = u_lobe < R
            wo_d = jnp.where(refl[..., None], m.reflect(wi_f), -wi_f)
            w_d = jnp.where(refl[..., None], p.spec, p.trans)
            wo, weight, pdf, delta, eta = _sel(
                sel, (wo_d, w_d, jnp.ones(shape), jnp.ones(shape, bool), jnp.ones(shape)),
                (wo, weight, pdf, delta, eta),
            )
        elif t == HK:
            # delta transmission vs cosine-sampled single scattering
            aci = jnp.maximum(jnp.abs(ci), 1e-4)
            pd = _hk_pdelta(p, aci)
            pick_delta = u_lobe < pd
            u_re = jnp.clip((u_lobe - pd) / jnp.maximum(1.0 - pd, 1e-8),
                            0.0, 0.999999)
            down = u_re < 0.5  # transmission side
            base = warp.square_to_cosine_hemisphere(u2)
            sgn = jnp.where(down, -jnp.sign(ci), jnp.sign(ci))
            wo_s = base * jnp.stack(
                [jnp.ones_like(sgn), jnp.ones_like(sgn), sgn], axis=-1)
            pdf_s = (1.0 - pd) * 0.5 * Frame.abs_cos_theta(wo_s) * INV_PI
            w_s = m.safe_div(_eval_hk(p, wi_f, wo_s), pdf_s[..., None])
            att = jnp.exp(-p.trans / aci[..., None])
            w_d = att / jnp.maximum(pd, 1e-8)[..., None]
            wo_t = jnp.where(pick_delta[..., None], -wi_f, wo_s)
            w_t = jnp.where(pick_delta[..., None], w_d, w_s)
            pdf_t = jnp.where(pick_delta, 1.0, jnp.maximum(pdf_s, 1e-20))
            wo, weight, pdf, delta, eta = _sel(
                sel, (wo_t, w_t, pdf_t, pick_delta, jnp.ones(shape)),
                (wo, weight, pdf, delta, eta),
            )
        elif t == NULL_BSDF:
            wo, weight, pdf, delta, eta = _sel(
                sel,
                (-wi_f, jnp.ones(shape + (3,)), jnp.ones(shape),
                 jnp.ones(shape, bool), jnp.ones(shape)),
                (wo, weight, pdf, delta, eta),
            )

    null_pass = jnp.zeros(shape, bool)
    for t in p.used_types:
        if t == NULL_BSDF:
            null_pass = null_pass | (p.type == t)

    # mask opacity passthrough: with prob 1-opacity go straight through
    if u_mask is not None:
        has_mask = jnp.any(p.opacity < 1.0)
        passthrough = u_mask >= p.opacity
        wo = jnp.where(passthrough[..., None], -wi_f, wo)
        weight = jnp.where(passthrough[..., None], jnp.ones_like(weight), weight)
        pdf = jnp.where(passthrough, 1.0, pdf)
        delta = jnp.where(passthrough, True, delta)
        eta = jnp.where(passthrough, 1.0, eta)
        null_pass = null_pass | passthrough
        del has_mask

    # un-flip for twosided lanes
    fz = jnp.where(flip, -1.0, 1.0)[..., None]
    scale = jnp.concatenate([jnp.ones_like(fz), jnp.ones_like(fz), fz], axis=-1)
    wo = wo * scale
    return BSDFSample(wo=wo, weight=weight, pdf=pdf, delta=delta, eta=eta,
                      null_passthrough=null_pass)


def _sel(mask, new, old):
    out = []
    for n, o in zip(new, old):
        mm = mask[..., None] if n.ndim == o.ndim and n.ndim > mask.ndim else mask
        out.append(jnp.where(mm, n, o))
    return tuple(out)


def _sample_smooth_family(t, p, wi, ci, u_lobe, u2, shape):
    """Types sampled by 'draw direction, weight = eval/pdf'."""
    if t == ROUGHCONDUCTOR:
        h, _ = mf.sample_visible(p.dist, wi, p.alpha_u, p.alpha_v, u2)
        wo = m.reflect_n(wi, h)
        wo = m.normalize(wo)
    elif t == ROUGHDIELECTRIC:
        h, _ = mf.sample_visible(
            p.dist, jnp.where((ci < 0)[..., None], -wi, wi), p.alpha_u, p.alpha_v, u2
        )
        c = m.dot(wi, h)
        F, cos_t, eta_rel, eta_ti = fresnel_dielectric(c, p.eta_s)
        refl = u_lobe < F
        wo_r = m.normalize(m.reflect_n(wi, h))
        wo_t = m.normalize(h * (eta_ti * c + cos_t)[..., None] - wi * eta_ti[..., None])
        wo = jnp.where(refl[..., None], wo_r, wo_t)
        # hemisphere rejection as in the reference roughdielectric.cpp:
        # reflection must stay on wi's side, transmission must cross.
        same_side = Frame.cos_theta(wi) * Frame.cos_theta(wo) > 0
        side_ok = jnp.where(refl, same_side, ~same_side)
        ev = _eval_roughdielectric(p, wi, wo)
        pdf = _pdf_roughdielectric(p, wi, wo)
        w = m.safe_div(ev, pdf[..., None])
        eta_out = jnp.where(refl, 1.0, eta_rel)
        ok = (pdf > 1e-12) & side_ok
        return (wo, jnp.where(ok[..., None], w, 0.0), jnp.maximum(pdf, 1e-20),
                jnp.zeros(shape, bool), eta_out)
    elif t in (PLASTIC, ROUGHPLASTIC):
        Fi, _, _, _ = fresnel_dielectric(ci, p.eta_s)
        prob_spec = _prob_specular(p, Fi)
        pick_spec = u_lobe < prob_spec
        wo_d = warp.square_to_cosine_hemisphere(u2)
        if t == PLASTIC:
            wo_s = m.reflect(wi)
            # specular lobe is delta
            w_spec = p.spec * (Fi / jnp.maximum(prob_spec, 1e-8))[..., None]
            diff_val = _eval_plastic(p, wi, wo_d)
            pdf_d = warp.square_to_cosine_hemisphere_pdf(wo_d) * (1.0 - prob_spec)
            w_diff = m.safe_div(diff_val, pdf_d[..., None])
            wo = jnp.where(pick_spec[..., None], wo_s, wo_d)
            w = jnp.where(pick_spec[..., None], w_spec, w_diff)
            pdf = jnp.where(pick_spec, 1.0, jnp.maximum(pdf_d, 1e-20))
            valid = (ci > 0) & ((pick_spec) | (pdf > 1e-12))
            return (wo, jnp.where(valid[..., None], w, 0.0), pdf, pick_spec,
                    jnp.ones(shape))
        else:
            h, _ = mf.sample_visible(p.dist, wi, p.alpha_u, p.alpha_v, u2)
            wo_s = m.normalize(m.reflect_n(wi, h))
            wo = jnp.where(pick_spec[..., None], wo_s, wo_d)
    elif t == PHONG:
        sw = _spec_sampling_weight(p)
        pick_spec = u_lobe < sw
        n = p.exponent
        ct = jnp.power(jnp.maximum(u2[..., 0], 1e-20), 1.0 / (n + 1.0))
        st = safe_sqrt(1.0 - ct * ct)
        phi = 2.0 * jnp.pi * u2[..., 1]
        local = vec3(st * jnp.cos(phi), st * jnp.sin(phi), ct)
        r = m.reflect(wi)
        fr = Frame.from_normal(m.normalize(r))
        wo_s = Frame.to_world(fr, local)
        wo_d = warp.square_to_cosine_hemisphere(u2)
        wo = jnp.where(pick_spec[..., None], wo_s, wo_d)
    elif t == WARD:
        sw = _spec_sampling_weight(p)
        pick_spec = u_lobe < sw
        au, av = p.alpha_u, p.alpha_v
        phi_h = jnp.arctan2(av * jnp.sin(2 * jnp.pi * u2[..., 1]),
                            au * jnp.cos(2 * jnp.pi * u2[..., 1]))
        cp, sp = jnp.cos(phi_h), jnp.sin(phi_h)
        denom = cp * cp / (au * au) + sp * sp / (av * av)
        t2 = -jnp.log(jnp.maximum(u2[..., 0], 1e-20)) / jnp.maximum(denom, 1e-12)
        ct = jax.lax.rsqrt(1.0 + t2)
        st = safe_sqrt(1.0 - ct * ct)
        h = vec3(st * cp, st * sp, ct)
        wo_s = m.normalize(m.reflect_n(wi, h))
        wo_d = warp.square_to_cosine_hemisphere(u2)
        wo = jnp.where(pick_spec[..., None], wo_s, wo_d)
    elif t == DIFFTRANS:
        # cosine hemisphere on the side opposite wi
        base = warp.square_to_cosine_hemisphere(u2)
        sign = jnp.where(ci > 0, -1.0, 1.0)
        wo = base * jnp.stack(
            [jnp.ones_like(sign), jnp.ones_like(sign), sign], axis=-1
        )
    else:
        raise AssertionError(t)

    evf, pdff = _EVAL[t]
    ev = evf(p, wi, wo)
    pdf = pdff(p, wi, wo)
    ok = pdf > 1e-12
    w = m.safe_div(ev, pdf[..., None])
    return (wo, jnp.where(ok[..., None], w, 0.0), jnp.maximum(pdf, 1e-20),
            jnp.zeros(shape, bool), jnp.ones(shape))
