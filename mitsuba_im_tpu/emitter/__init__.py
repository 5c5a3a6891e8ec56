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


def _sun_dir(props: Properties) -> np.ndarray:
    """Sun direction from explicit ``sunDirection`` or location/time props
    (same parameter surface as the reference's SunParameters,
    ``src/emitters/sunsky/sunmodel.h``)."""
    from .sunsky import sun_direction_from_time

    if "sunDirection" in props:
        return _unit(props.get_vector("sunDirection"))
    d = sun_direction_from_time(
        year=props.get_int("year", 2010), month=props.get_int("month", 7),
        day=props.get_int("day", 10), hour=props.get_float("hour", 15.0),
        minute=props.get_float("minute", 0.0),
        second=props.get_float("second", 0.0),
        latitude=props.get_float("latitude", 35.6894),
        longitude=props.get_float("longitude", 139.6917),
        timezone=props.get_float("timezone", 9.0),
    )
    to_world = props.get_transform("toWorld", Transform())
    return _unit(to_world.apply_vector(d))


def _sky_record(props: Properties) -> dict:
    """Analytic sky baked into a lat-long envmap (sky.cpp architecture:
    precompute at ``resolution``, importance-sample as a bitmap).  Default
    model is Hosek-Wilkie 2012 (the reference's ``skymodel.cpp``);
    ``skyModel="preetham"`` selects the older Preetham 1999 fit."""
    model = props.get_string("skyModel", "hosek")
    if model == "preetham":
        from .sunsky import preetham_sky_pixels

        pixels = preetham_sky_pixels(
            resolution=props.get_int("resolution", 512),
            sun_dir=_sun_dir(props),
            turbidity=props.get_float("turbidity", 3.0),
            stretch=props.get_float("stretch", 1.0),
            scale=props.get_float("scale", 1.0),
            extend=props.get_bool("extend", True),
        )
    else:
        from .hosek import hosek_sky_pixels

        albedo = props.get_spectrum("groundAlbedo", [0.15, 0.15, 0.15])
        pixels = hosek_sky_pixels(
            resolution=props.get_int("resolution", 512),
            sun_dir=_sun_dir(props),
            turbidity=props.get_float("turbidity", 3.0),
            albedo=float(np.mean(albedo)),
            stretch=props.get_float("stretch", 1.0),
            scale=props.get_float("scale", 1.0),
            extend=props.get_bool("extend", True),
        )
    to_world = props.get_transform("toWorld", Transform())
    return dict(
        type=et.EM_ENVMAP,
        radiance=np.ones(3),
        pixels=pixels,
        to_world_rot=to_world.m[:3, :3],
        weight=props.get_float("samplingWeight", 1.0),
    )


def _sun_record(props: Properties) -> dict:
    """Solar disk as a directional emitter with analytic spectral
    extinction (sun.cpp capability; radianceScale via ``scale``)."""
    from .sunsky import sun_radiance_rgb, sun_solid_angle

    d = _sun_dir(props)
    rad = sun_radiance_rgb(d, props.get_float("turbidity", 3.0),
                           props.get_float("scale", 1.0))
    omega = sun_solid_angle(props.get_float("sunRadiusScale", 1.0))
    return dict(
        type=et.EM_DIRECTIONAL,
        intensity=rad * omega,  # irradiance on a sun-facing patch
        direction=-d,
        weight=props.get_float("samplingWeight", 1.0),
    )


@register("emitter", "sky")
def _sky(props: Properties, ctx=None):
    return _sky_record(props)


@register("emitter", "sun")
def _sun(props: Properties, ctx=None):
    return _sun_record(props)


@register("emitter", "sunsky")
def _sunsky(props: Properties, ctx=None):
    """Compound sun + sky (sunsky.cpp): returns both records."""
    return [_sky_record(props), _sun_record(props)]


def _unit(v):
    v = np.asarray(v, np.float64)
    return v / max(np.linalg.norm(v), 1e-12)
