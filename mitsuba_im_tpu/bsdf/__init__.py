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
def _coating(props: Properties, ctx=None):
    """Smooth coating: approximated as plastic over the nested BSDF's
    diffuse color (full layered model planned)."""
    rec = props.children.get("bsdf", None)
    if isinstance(rec, dict):
        base = dict(rec)
    else:
        base = bc.default_record()
    base_refl = base.get("refl", np.full(3, 0.5))
    out = bc.default_record()
    out["type"] = bc.PLASTIC
    out["eta_s"] = _eta_dielectric(props)
    out["refl"] = base_refl
    out["refl_tex"] = base.get("refl_tex", -1)
    return out


@register("bsdf", "roughcoating")
def _roughcoating(props, ctx=None):
    out = _coating(props, ctx)
    out["type"] = bc.ROUGHPLASTIC
    _alpha(props, ctx, out)
    return out


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


@register("bsdf", "blendbsdf")
def _blend(props: Properties, ctx=None):
    """Blend of two BSDFs; current build folds to the higher-weight side
    (stochastic per-lane blend planned)."""
    w = props.get_float("weight", 0.5)
    inners = props.children.get("bsdf_list", [])
    if len(inners) >= 2:
        rec = dict(inners[0] if w < 0.5 else inners[1])
    elif inners:
        rec = dict(inners[0])
    else:
        rec = bc.default_record()
    return rec


@register("bsdf", "mixturebsdf")
def _mixture(props: Properties, ctx=None):
    weights = [float(x) for x in props.get_string("weights", "1").split(",")]
    inners = props.children.get("bsdf_list", [])
    if inners:
        rec = dict(inners[int(np.argmax(weights[: len(inners)]))])
    else:
        rec = bc.default_record()
    return rec


@register("bsdf", "bumpmap")
def _bumpmap(props: Properties, ctx=None):
    """Bump mapping currently passes through the nested BSDF (frame
    perturbation planned)."""
    inner = props.children.get("bsdf")
    return dict(inner) if isinstance(inner, dict) else bc.default_record()


@register("bsdf", "normalmap")
def _normalmap(props: Properties, ctx=None):
    inner = props.children.get("bsdf")
    return dict(inner) if isinstance(inner, dict) else bc.default_record()


@register("bsdf", "hk")
def _hk(props: Properties, ctx=None):
    """Hanrahan-Krueger: thin slab approximation -> difftrans + diffuse mix."""
    rec = bc.default_record()
    rec["type"] = bc.DIFFTRANS
    return rec


@register("bsdf", "irawan")
def _irawan(props: Properties, ctx=None):
    """Woven cloth: approximated as roughdiffuse (full model planned)."""
    rec = bc.default_record()
    rec["type"] = bc.ROUGHDIFFUSE
    rec["alpha_u"] = rec["alpha_v"] = 0.4
    return rec
