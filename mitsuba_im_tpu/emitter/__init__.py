"""Emitter plugin factories (``/root/reference/src/emitters/``)."""
from __future__ import annotations

import numpy as np

from ..core.registry import register
from ..core.properties import Properties
from ..core.transform import Transform
from . import table as et
from .table import *  # noqa: F401,F403


@register("emitter", "area")
def _area(props: Properties, ctx=None):
    return dict(
        type=et.EM_AREA,
        radiance=props.get_spectrum("radiance", np.ones(3)),
        weight=props.get_float("samplingWeight", 1.0),
    )


@register("emitter", "point")
def _point(props: Properties, ctx=None):
    to_world = props.get_transform("toWorld", Transform())
    pos = props.get_point("position", None) if "position" in props else to_world.apply_point([0, 0, 0])
    return dict(
        type=et.EM_POINT,
        intensity=props.get_spectrum("intensity", np.ones(3)),
        position=pos,
        weight=props.get_float("samplingWeight", 1.0),
    )


@register("emitter", "spot")
def _spot(props: Properties, ctx=None):
    to_world = props.get_transform("toWorld", Transform())
    cutoff = props.get_float("cutoffAngle", 20.0)
    beam = props.get_float("beamWidth", cutoff * 3.0 / 4.0)
    return dict(
        type=et.EM_SPOT,
        intensity=props.get_spectrum("intensity", np.ones(3)),
        position=to_world.apply_point([0, 0, 0]),
        direction=_unit(to_world.apply_vector([0, 0, 1])),
        cos_cutoff=np.cos(np.deg2rad(cutoff)),
        cos_falloff=np.cos(np.deg2rad(beam)),
        weight=props.get_float("samplingWeight", 1.0),
    )


@register("emitter", "directional")
def _directional(props: Properties, ctx=None):
    to_world = props.get_transform("toWorld", Transform())
    d = props.get_vector("direction", None) if "direction" in props else to_world.apply_vector([0, 0, 1])
    return dict(
        type=et.EM_DIRECTIONAL,
        intensity=props.get_spectrum("irradiance", np.ones(3)),
        direction=_unit(d),
        weight=props.get_float("samplingWeight", 1.0),
    )


@register("emitter", "collimated")
def _collimated(props: Properties, ctx=None):
    to_world = props.get_transform("toWorld", Transform())
    return dict(
        type=et.EM_COLLIMATED,
        intensity=props.get_spectrum("power", np.ones(3)),
        position=to_world.apply_point([0, 0, 0]),
        direction=_unit(to_world.apply_vector([0, 0, 1])),
        weight=props.get_float("samplingWeight", 1.0),
    )


@register("emitter", "constant")
def _constant(props: Properties, ctx=None):
    return dict(
        type=et.EM_CONSTANT,
        radiance=props.get_spectrum("radiance", np.ones(3)),
        weight=props.get_float("samplingWeight", 1.0),
    )


@register("emitter", "envmap")
def _envmap(props: Properties, ctx=None):
    from ..io import bitmap as bmp

    path = props.get_string("filename")
    if ctx is not None and hasattr(ctx, "resolve_path"):
        path = ctx.resolve_path(path)
    pixels = bmp.load(path)[..., :3]
    to_world = props.get_transform("toWorld", Transform())
    return dict(
        type=et.EM_ENVMAP,
        radiance=np.full(3, props.get_float("scale", 1.0)),
        pixels=pixels,
        to_world_rot=to_world.m[:3, :3],
        weight=props.get_float("samplingWeight", 1.0),
    )


@register("emitter", "sky")
def _sky(props: Properties, ctx=None):
    """Hosek-Wilkie sky: current build approximates with a constant dome at
    the model's mean radiance (full model planned)."""
    scale = props.get_float("scale", 1.0)
    turb = props.get_float("turbidity", 3.0)
    mean = np.array([0.22, 0.35, 0.65]) * 20.0 * scale / max(turb, 1.0)
    return dict(type=et.EM_CONSTANT, radiance=mean,
                weight=props.get_float("samplingWeight", 1.0))


@register("emitter", "sun")
def _sun(props: Properties, ctx=None):
    scale = props.get_float("scale", 1.0)
    to_world = props.get_transform("toWorld", Transform())
    d = props.get_vector("sunDirection", None) if "sunDirection" in props else to_world.apply_vector([0, 1, 0])
    return dict(
        type=et.EM_DIRECTIONAL,
        intensity=np.array([1.0, 0.97, 0.92]) * 50.0 * scale,
        direction=-_unit(d),
        weight=props.get_float("samplingWeight", 1.0),
    )


@register("emitter", "sunsky")
def _sunsky(props: Properties, ctx=None):
    return _sky(props, ctx)


def _unit(v):
    v = np.asarray(v, np.float64)
    return v / max(np.linalg.norm(v), 1e-12)
