"""Sensor plugin factories (``/root/reference/src/sensors/``)."""
from __future__ import annotations

import numpy as np

from ..core.registry import register
from ..core.properties import Properties
from ..core.transform import Transform
from . import table as st
from .table import *  # noqa: F401,F403


def _common(props: Properties, stype, ctx, **kw):
    aspect = 1.0
    if ctx is not None:
        aspect = ctx.settings.width / max(ctx.settings.height, 1)
    to_world = props.get_transform("toWorld", Transform())
    return st.make_sensor(
        stype, to_world,
        near=props.get_float("nearClip", 1e-2),
        far=props.get_float("farClip", 1e4),
        shutter_open=props.get_float("shutterOpen", 0.0),
        shutter_time=props.get_float("shutterClose", 0.0) - props.get_float("shutterOpen", 0.0),
        aspect=aspect,
        **kw,
    )


@register("sensor", "perspective")
def _perspective(props: Properties, ctx=None):
    fov = props.get_float("fov", 0.0) if "fov" in props else None
    if fov is None and "focalLength" in props:
        # 35mm-equivalent focal length (sensor.cpp convention)
        fl = float(props.get_string("focalLength", "50").replace("mm", ""))
        fov = float(np.rad2deg(2 * np.arctan(36.0 / (2 * fl))))
    if fov is None:
        fov = 45.0
    return _common(
        props, st.S_PERSPECTIVE, ctx,
        fov_deg=fov, fov_axis=props.get_string("fovAxis", "x"),
    )


@register("sensor", "perspective_rdist")
def _perspective_rdist(props: Properties, ctx=None):
    """Radial distortion currently ignored (undistorted perspective)."""
    props.get_string("kc", "0, 0")
    return _perspective(props, ctx)


@register("sensor", "thinlens")
def _thinlens(props: Properties, ctx=None):
    fov = props.get_float("fov", 45.0)
    return _common(
        props, st.S_THINLENS, ctx,
        fov_deg=fov, fov_axis=props.get_string("fovAxis", "x"),
        aperture_radius=props.get_float("apertureRadius", 0.1),
        focus_distance=props.get_float("focusDistance", 1.0),
    )


@register("sensor", "orthographic")
def _orthographic(props: Properties, ctx=None):
    t = props.get_transform("toWorld", Transform())
    sx = float(np.linalg.norm(t.m[:3, 0]))
    sy = float(np.linalg.norm(t.m[:3, 1]))
    return _common(props, st.S_ORTHOGRAPHIC, ctx, scale_x=sx, scale_y=sy)


@register("sensor", "telecentric")
def _telecentric(props: Properties, ctx=None):
    t = props.get_transform("toWorld", Transform())
    return _common(
        props, st.S_TELECENTRIC, ctx,
        scale_x=float(np.linalg.norm(t.m[:3, 0])),
        scale_y=float(np.linalg.norm(t.m[:3, 1])),
        aperture_radius=props.get_float("apertureRadius", 0.1),
        focus_distance=props.get_float("focusDistance", 1.0),
    )


@register("sensor", "spherical")
def _spherical(props: Properties, ctx=None):
    return _common(props, st.S_SPHERICAL, ctx)


@register("sensor", "radiancemeter")
def _radiancemeter(props: Properties, ctx=None):
    return _common(props, st.S_RADIANCEMETER, ctx)


@register("sensor", "irradiancemeter")
def _irradiancemeter(props: Properties, ctx=None):
    return _common(props, st.S_IRRADIANCEMETER, ctx)


@register("sensor", "fluencemeter")
def _fluencemeter(props: Properties, ctx=None):
    return _common(props, st.S_RADIANCEMETER, ctx)
