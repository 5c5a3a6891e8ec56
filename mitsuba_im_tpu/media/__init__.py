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
    rec = dict(
        kind="heterogeneous",
        scale=props.get_float("scale", 1.0),
        phase=props.children.get("phase", dict(type=PH_ISOTROPIC, g=0.0)),
        volumes=props.children.get("volume_list", []),
    )
    if ctx is not None:
        ctx.media_records.append(rec)
        rec["id"] = len(ctx.media_records) - 1
    return rec


@register("volume", "constvolume")
def _constvolume(props: Properties, ctx=None):
    v = props.get_spectrum("value", np.ones(3)) if "value" in props else np.ones(3)
    return dict(kind="const", value=np.asarray(v))


@register("volume", "gridvolume")
def _gridvolume(props: Properties, ctx=None):
    return dict(kind="grid", filename=props.get_string("filename", ""))


@register("volume", "hgridvolume")
def _hgridvolume(props: Properties, ctx=None):
    return dict(kind="grid", filename=props.get_string("prefix", ""))


@register("volume", "volcache")
def _volcache(props: Properties, ctx=None):
    return props.children.get("volume", dict(kind="const", value=np.ones(3)))
