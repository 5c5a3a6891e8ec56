"""Texture plugin factories (``/root/reference/src/textures/``).

Factories return texture *ids* into the scene's TextureBuilder (ctx).
"""
from __future__ import annotations

import numpy as np

from ..core.registry import register
from ..core.properties import Properties
from . import texture as tx
from .texture import *  # noqa: F401,F403


def _uv(props: Properties):
    return (
        (props.get_float("uscale", 1.0), props.get_float("vscale", 1.0)),
        (props.get_float("uoffset", 0.0), props.get_float("voffset", 0.0)),
    )


@register("texture", "bitmap")
def _bitmap(props: Properties, ctx=None):
    from ..io import bitmap as bmp

    path = props.get_string("filename")
    if ctx is not None and hasattr(ctx, "resolve_path"):
        path = ctx.resolve_path(path)
    gamma = props.get_float("gamma", -1.0)
    pixels = bmp.load(path, gamma_correct=(gamma != 1.0))[..., :3]
    wrap = {"repeat": tx.WRAP_REPEAT, "clamp": tx.WRAP_CLAMP,
            "mirror": tx.WRAP_MIRROR, "zero": tx.WRAP_CLAMP,
            "one": tx.WRAP_CLAMP}[props.get_string("wrapMode", "repeat")]
    props.get_string("filterType", "ewa")
    uvs, uvo = _uv(props)
    if ctx is None:
        return -1
    return ctx.textures.add_bitmap(pixels, uvscale=uvs, uvoffset=uvo, wrap=wrap)


@register("texture", "checkerboard")
def _checker(props: Properties, ctx=None):
    c0 = props.get_spectrum("color0", np.full(3, 0.4))
    c1 = props.get_spectrum("color1", np.full(3, 0.2))
    uvs, uvo = _uv(props)
    if ctx is None:
        return -1
    return ctx.textures.add(
        type=tx.TEX_CHECKER, value0=c0, value1=c1,
        uvscale=np.asarray(uvs), uvoffset=np.asarray(uvo),
    )


@register("texture", "gridtexture")
def _grid(props: Properties, ctx=None):
    c0 = props.get_spectrum("color0", np.full(3, 0.2))
    c1 = props.get_spectrum("color1", np.full(3, 0.4))
    lw = props.get_float("lineWidth", 0.01)
    uvs, uvo = _uv(props)
    if ctx is None:
        return -1
    return ctx.textures.add(
        type=tx.TEX_GRID, value0=c1, value1=c0, param0=lw,
        uvscale=np.asarray(uvs), uvoffset=np.asarray(uvo),
    )


@register("texture", "scale")
def _scale(props: Properties, ctx=None):
    sc = props.get_spectrum("scale", np.ones(3)) if "scale" in props else np.full(3, props.get_float("value", 1.0))
    nested = props.children.get("texture", -1)
    if ctx is None:
        return -1
    if isinstance(nested, (int, np.integer)) and nested >= 0:
        return ctx.textures.add(type=tx.TEX_SCALE, value0=sc, nested=int(nested))
    base = props.get_spectrum("value", np.ones(3)) if "value" in props else np.ones(3)
    return ctx.textures.add_constant(np.asarray(base) * sc)


@register("texture", "wireframe")
def _wireframe(props: Properties, ctx=None):
    """Wireframe needs barycentric distance-to-edge; approximated by grid."""
    c0 = props.get_spectrum("interiorColor", np.full(3, 0.5))
    c1 = props.get_spectrum("edgeColor", np.full(3, 0.1))
    lw = props.get_float("lineWidth", 0.01)
    if ctx is None:
        return -1
    return ctx.textures.add(type=tx.TEX_GRID, value0=c0, value1=c1, param0=lw)


@register("texture", "vertexcolors")
def _vertexcolors(props: Properties, ctx=None):
    """Vertex colors: constant fallback (per-vertex attribute fetch planned)."""
    if ctx is None:
        return -1
    return ctx.textures.add_constant(np.full(3, 0.5))


@register("texture", "curvature")
def _curvature(props: Properties, ctx=None):
    if ctx is None:
        return -1
    return ctx.textures.add_constant(np.full(3, 0.5))
