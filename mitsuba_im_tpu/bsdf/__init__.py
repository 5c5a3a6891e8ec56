"""BSDF plugin factories (scene-XML surface of ``/root/reference/src/bsdfs/``).

Each factory maps a ``Properties`` bag to a parameter record consumed by
``bsdf.common.build_table``.  Nested wrappers (twosided, mask, bumpmap) fold
into flags/links on the inner record.
"""
from __future__ import annotations

import numpy as np

from ..core.registry import register
from ..core.properties import Properties
from . import common as bc
from .microfacet import DIST_BECKMANN, DIST_GGX, DIST_PHONG
from .ior import lookup_dielectric, lookup_conductor

from .common import *  # noqa: F401,F403 (re-export table API)
from .eval import bsdf_eval, bsdf_pdf, bsdf_sample  # noqa: F401

_DISTS = {"beckmann": DIST_BECKMANN, "ggx": DIST_GGX, "phong": DIST_PHONG,
          "as": DIST_BECKMANN}


def _texture_or_rgb(props: Properties, ctx, name, default):
    """Returns (rgb, tex_id). Child textures were pre-instantiated by the
    loader and stored in props.children[name] as texture ids."""
    if name in props.children:
        return np.zeros(3), props.children[name]
    if name in props:
        return props.get_spectrum(name), -1
    # record default query for introspection
    props.get_spectrum(name, np.asarray(default, np.float64))
    return np.asarray(default, np.float64), -1


def _alpha(props: Properties, ctx, rec):
    if "alpha" in props.children:
        rec["alpha_tex"] = props.children["alpha"]
        rec["alpha_u"] = rec["alpha_v"] = 0.1
    else:
        a = props.get_float("alpha", 0.1)
        rec["alpha_u"] = props.get_float("alphaU", a)
        rec["alpha_v"] = props.get_float("alphaV", a)
    rec["dist"] = _DISTS.get(props.get_string("distribution", "beckmann"), DIST_BECKMANN)


def _eta_dielectric(props: Properties):
    int_ior = props.get_float("intIOR", 0.0) if "intIOR" in props else None
    ext_ior = props.get_float("extIOR", 0.0) if "extIOR" in props else None
    if int_ior is None:
        int_ior = lookup_dielectric(props.get_string("intIORMaterial", "bk7"))
    if ext_ior is None:
        ext_ior = lookup_dielectric(props.get_string("extIORMaterial", "air"))
    if isinstance(int_ior, str):
        int_ior = lookup_dielectric(int_ior)
    return float(int_ior) / float(ext_ior)


def _simple(name, type_code):
    @register("bsdf", name)
    def factory(props: Properties, ctx=None, _tc=type_code):
        rec = bc.default_record()
        rec["type"] = _tc
        if _tc in (bc.DIFFUSE, bc.ROUGHDIFFUSE):
            rec["refl"], rec["refl_tex"] = _texture_or_rgb(props, ctx, "reflectance", [0.5] * 3)
            if _tc == bc.ROUGHDIFFUSE:
                rec["alpha_u"] = rec["alpha_v"] = props.get_float("alpha", 0.2)
        return rec

    return factory


_simple("diffuse", bc.DIFFUSE)
_simple("roughdiffuse", bc.ROUGHDIFFUSE)


@register("bsdf", "conductor")
def _conductor(props: Properties, ctx=None, rough=False):
    rec = bc.default_record()
    rec["type"] = bc.ROUGHCONDUCTOR if rough else bc.CONDUCTOR
    mat = props.get_string("material", "Cu")
    eta, k = lookup_conductor(mat)
    if "eta" in props:
        eta = props.get_spectrum("eta")
    if "k" in props:
        k = props.get_spectrum("k")
    ext = props.get_float("extEta", 1.000277)
    rec["eta"] = np.asarray(eta) / ext
    rec["k"] = np.asarray(k) / ext
    rec["spec"], rec["spec_tex"] = _texture_or_rgb(props, ctx, "specularReflectance", [1.0] * 3)
    if rough:
        _alpha(props, ctx, rec)
    return rec


@register("bsdf", "roughconductor")
def _roughconductor(props, ctx=None):
    return _conductor(props, ctx, rough=True)


@register("bsdf", "dielectric")
def _dielectric(props: Properties, ctx=None, tc=bc.DIELECTRIC):
    rec = bc.default_record()
    rec["type"] = tc
    rec["eta_s"] = _eta_dielectric(props)
    rec["spec"], rec["spec_tex"] = _texture_or_rgb(props, ctx, "specularReflectance", [1.0] * 3)
    rec["trans"], rec["trans_tex"] = _texture_or_rgb(props, ctx, "specularTransmittance", [1.0] * 3)
    if tc == bc.ROUGHDIELECTRIC:
        _alpha(props, ctx, rec)
    return rec


@register("bsdf", "thindielectric")
def _thindielectric(props, ctx=None):
    return _dielectric(props, ctx, tc=bc.THINDIELECTRIC)


@register("bsdf", "roughdielectric")
def _roughdielectric(props, ctx=None):
    return _dielectric(props, ctx, tc=bc.ROUGHDIELECTRIC)


@register("bsdf", "plastic")
def _plastic(props: Properties, ctx=None, rough=False):
    rec = bc.default_record()
    rec["type"] = bc.ROUGHPLASTIC if rough else bc.PLASTIC
    rec["eta_s"] = _eta_dielectric(props)
    rec["refl"], rec["refl_tex"] = _texture_or_rgb(props, ctx, "diffuseReflectance", [0.5] * 3)
    rec["spec"], rec["spec_tex"] = _texture_or_rgb(props, ctx, "specularReflectance", [1.0] * 3)
    props.get_bool("nonlinear", False)
    if rough:
        _alpha(props, ctx, rec)
    return rec


@register("bsdf", "roughplastic")
def _roughplastic(props, ctx=None):
    return _plastic(props, ctx, rough=True)


@register("bsdf", "coating")
def _coating(props: Properties, ctx=None, rough=False):
    """Smooth dielectric coating (``src/bsdfs/coating.cpp``): layered model
    with refraction into the coat, substrate eval in the refracted frame,
    and sigmaA*thickness Beer absorption.  Diffuse-class substrates use the
    exact layered lobe; other substrates degrade to plastic over the
    substrate color with a loud substitution warning."""
    from ..core.registry import warn_substitution

    rec = props.children.get("bsdf", None)
    if isinstance(rec, dict):
        base = dict(rec)
    else:
        base = bc.default_record()
    out = bc.default_record()
    out["eta_s"] = _eta_dielectric(props)
    out["refl"] = base.get("refl", np.full(3, 0.5))
    out["refl_tex"] = base.get("refl_tex", -1)
    thickness = props.get_float("thickness", 1.0)
    sigma_a = props.get_spectrum("sigmaA", np.zeros(3))
    out["trans"] = np.asarray(sigma_a, np.float64) * thickness
    out["spec"] = props.get_spectrum("specularReflectance", np.ones(3))
    if base.get("type", bc.DIFFUSE) in (bc.DIFFUSE, bc.ROUGHDIFFUSE):
        out["type"] = bc.COATING
        if base.get("type") == bc.ROUGHDIFFUSE:
            warn_substitution(
                "coating", "rough-diffuse substrate treated as Lambertian "
                "inside the coat (Oren-Nayar term dropped)")
    else:
        out["type"] = bc.PLASTIC
        warn_substitution(
            "coating", "non-diffuse substrate approximated as plastic over "
            "the substrate color (layered eval limited to diffuse bases)")
    if rough:
        warn_substitution(
            "roughcoating", "coat interface treated as smooth (substrate "
            "refraction + absorption are exact; coat roughness dropped)")
    return out


@register("bsdf", "roughcoating")
def _roughcoating(props, ctx=None):
    return _coating(props, ctx, rough=True)


@register("bsdf", "phong")
def _phong(props: Properties, ctx=None):
    rec = bc.default_record()
    rec["type"] = bc.PHONG
    rec["exponent"] = props.get_float("exponent", 30.0)
    rec["refl"], rec["refl_tex"] = _texture_or_rgb(props, ctx, "diffuseReflectance", [0.5] * 3)
    rec["spec"], rec["spec_tex"] = _texture_or_rgb(props, ctx, "specularReflectance", [0.2] * 3)
    return rec


@register("bsdf", "ward")
def _ward(props: Properties, ctx=None):
    rec = bc.default_record()
    rec["type"] = bc.WARD
    rec["alpha_u"] = props.get_float("alphaU", props.get_float("alpha", 0.1))
    rec["alpha_v"] = props.get_float("alphaV", props.get_float("alpha", 0.1))
    rec["refl"], rec["refl_tex"] = _texture_or_rgb(props, ctx, "diffuseReflectance", [0.5] * 3)
    rec["spec"], rec["spec_tex"] = _texture_or_rgb(props, ctx, "specularReflectance", [0.2] * 3)
    props.get_string("variant", "balanced")
    return rec


@register("bsdf", "null")
def _null(props, ctx=None):
    rec = bc.default_record()
    rec["type"] = bc.NULL_BSDF
    return rec


@register("bsdf", "difftrans")
def _difftrans(props: Properties, ctx=None):
    rec = bc.default_record()
    rec["type"] = bc.DIFFTRANS
    rec["trans"], rec["trans_tex"] = _texture_or_rgb(props, ctx, "transmittance", [0.5] * 3)
    return rec


@register("bsdf", "twosided")
def _twosided(props: Properties, ctx=None):
    """Wrapper: sets the twosided flag on the nested record."""
    inner = props.children.get("bsdf")
    rec = dict(inner) if isinstance(inner, dict) else bc.default_record()
    rec["flags"] = rec.get("flags", 0) | bc.FLAG_TWOSIDED
    return rec


@register("bsdf", "mask")
def _mask(props: Properties, ctx=None):
    """Opacity mask wrapping a nested BSDF; the nested record is registered
    separately by the loader and linked via ``nested``."""
    inner = props.children.get("bsdf")
    rec = bc.default_record()
    rec["type"] = bc.MASK
    rec["opacity"], rec["opacity_tex"] = _texture_or_rgb(props, ctx, "opacity", [0.5] * 3)
    if ctx is not None and isinstance(inner, dict):
        rec["nested"] = ctx.add_bsdf(inner)
    return rec


def _nested_id(ctx, rec):
    if isinstance(rec, (int, np.integer)):
        return int(rec)
    return ctx.add_bsdf(rec if isinstance(rec, dict) else bc.default_record())


def _blend_record(ctx, rec_a, rec_b, weight, weight_tex=-1):
    """One BLEND table row selecting rec_b with probability ``weight``."""
    out = bc.default_record()
    out["type"] = bc.BLEND
    out["weight"] = float(np.clip(weight, 0.0, 1.0))
    out["weight_tex"] = weight_tex
    if ctx is not None:
        out["nested"] = _nested_id(ctx, rec_a)
        out["nested2"] = _nested_id(ctx, rec_b)
    return out


@register("bsdf", "blendbsdf")
def _blend(props: Properties, ctx=None):
    """blendbsdf.cpp: convex combination of two nested BSDFs; realized as
    per-vertex stochastic component selection (see bsdf.common.resolve)."""
    w = props.get_float("weight", 0.5)
    wtex = props.children.get("weight", -1)
    if not isinstance(wtex, (int, np.integer)):
        wtex = -1
    inners = props.children.get("bsdf_list", [])
    if len(inners) >= 2:
        return _blend_record(ctx, inners[0], inners[1], w, int(wtex))
    if inners:
        return dict(inners[0])
    return bc.default_record()


@register("bsdf", "mixturebsdf")
def _mixture(props: Properties, ctx=None):
    """mixturebsdf.cpp: N-way weighted mixture, folded into a binary tree of
    BLEND rows (each level stochastically selects one side).  Weight deficit
    (sum < 1) blends against a black absorber like the reference's implicit
    scale."""
    weights = [float(x) for x in props.get_string("weights", "1").split(",")]
    inners = props.children.get("bsdf_list", [])
    if not inners:
        return bc.default_record()
    if len(inners) == 1:
        return dict(inners[0])
    weights = weights[: len(inners)] + [1.0] * (len(inners) - len(weights))
    total = sum(weights)
    acc = dict(inners[0])
    acc_w = weights[0]
    for nxt, w_n in zip(inners[1:], weights[1:]):
        acc = _blend_record(ctx, acc, nxt,
                            w_n / max(acc_w + w_n, 1e-8))
        acc_w += w_n
    if total < 0.999:  # remaining probability absorbs
        black = bc.default_record()
        black["refl"] = np.zeros(3)
        acc = _blend_record(ctx, black, acc, total)
    return acc


def _wrap_bump(props: Properties, ctx, kind):
    inner = props.children.get("bsdf")
    rec = dict(inner) if isinstance(inner, dict) else bc.default_record()
    tex = props.children.get("texture",
                             props.children.get("map",
                                                props.children.get("normals")))
    if isinstance(tex, (int, np.integer)):
        rec["bump_tex"] = int(tex)
        rec["bump_kind"] = kind
        rec["bump_scale"] = props.get_float("scale", 1.0)
    return rec


@register("bsdf", "bumpmap")
def _bumpmap(props: Properties, ctx=None):
    """bumpmap.cpp: height-texture gradient tilts the shading frame
    (applied in Scene.interaction so every integrator inherits it)."""
    return _wrap_bump(props, ctx, bc.BUMP_HEIGHT)


@register("bsdf", "normalmap")
def _normalmap(props: Properties, ctx=None):
    """normalmap.cpp: tangent-space normal texture replaces the frame."""
    return _wrap_bump(props, ctx, bc.BUMP_NORMAL)


@register("bsdf", "hk")
def _hk(props: Properties, ctx=None):
    """hk.cpp (Hanrahan-Krueger): single scattering in a thin slab with an
    attenuated delta transmission.  Stores albedo rgb in ``refl``, optical
    depth tau rgb in ``trans``, HG asymmetry in ``alpha_u``."""
    rec = bc.default_record()
    rec["type"] = bc.HK
    thickness = props.get_float("thickness", 1.0)
    if "sigmaS" in props or "sigmaA" in props:
        s = props.get_spectrum("sigmaS", np.full(3, 2.0))
        a = props.get_spectrum("sigmaA", np.full(3, 0.05))
    elif "sigmaT" in props:
        st = props.get_spectrum("sigmaT")
        al = props.get_spectrum("albedo", np.full(3, 0.8))
        s, a = st * al, st * (1 - al)
    else:
        s, a = np.full(3, 2.0), np.full(3, 0.05)
    st = np.maximum(np.asarray(s) + np.asarray(a), 1e-8)
    rec["refl"] = np.asarray(s) / st  # single-scattering albedo
    rec["trans"] = st * thickness  # optical depth tau
    phase = props.children.get("phase", dict(g=0.0))
    rec["alpha_u"] = rec["alpha_v"] = float(phase.get("g", 0.0)) if isinstance(phase, dict) else 0.0
    return rec


@register("bsdf", "irawan")
def _irawan(props: Properties, ctx=None):
    """Irawan & Marschner woven cloth (src/bsdfs/irawan.cpp): parses the
    weave-pattern DSL (with $var substitution from these Properties),
    MC-normalizes the specular term (configure() pre-pass), and stores
    the pattern as static weave data on the BSDF record."""
    from . import irawan as ir

    repeat_u = props.get_float("repeatU", 1.0)
    repeat_v = props.get_float("repeatV", 1.0)
    if "filename" in props:
        fname = props.get_string("filename")
        path = ctx.resolve_path(fname) if ctx is not None else fname
        with open(path, "r") as f:
            text = f.read()
    else:
        text = ir.PLAIN_WEAVE
    pat = ir.parse_weave(text, props, repeatU=repeat_u, repeatV=repeat_v)
    pat = ir.compute_normalization(pat)

    rec = bc.default_record()
    rec["type"] = bc.IRAWAN
    rec["weave"] = pat
    return rec
