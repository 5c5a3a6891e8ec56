"""Film + reconstruction-filter plugin factories
(``/root/reference/src/films/``, ``src/rfilters/``)."""
from __future__ import annotations

from ..core.registry import register
from ..core.properties import Properties
from . import film as fm
from .film import *  # noqa: F401,F403


def _apply_film(props: Properties, ctx, fmt):
    if ctx is None:
        return {}
    s = ctx.settings
    s.width = props.get_int("width", 768)
    s.height = props.get_int("height", 576)
    s.film_format = props.get_string("fileFormat", fmt)
    s.banner = props.get_bool("banner", False)
    rf = props.children.get("rfilter")
    if rf:
        s.rfilter = rf["ftype"]
        s.rfilter_radius = rf.get("radius")
    return {}


@register("film", "hdrfilm")
def _hdrfilm(props: Properties, ctx=None):
    props.get_string("pixelFormat", "rgb")
    props.get_string("componentFormat", "float16")
    return _apply_film(props, ctx, "openexr")


@register("film", "ldrfilm")
def _ldrfilm(props: Properties, ctx=None):
    out = _apply_film(props, ctx, "png")
    if ctx is not None:
        ctx.settings.gamma = props.get_float("gamma", -1.0)
        ctx.settings.tonemap = props.get_string("tonemapMethod", "gamma")
        ctx.settings.exposure = props.get_float("exposure", 0.0)
        ctx.settings.key = props.get_float("key", 0.18)
    return out


@register("film", "mfilm")
def _mfilm(props: Properties, ctx=None):
    out = _apply_film(props, ctx, "matlab")
    if ctx is not None and ctx.settings.film_format in ("matlab", "mathematica"):
        ctx.settings.film_format = "numpy"
        ctx.settings.width = props.get_int("width", 1)
        ctx.settings.height = props.get_int("height", 1)
    return out


@register("film", "tiledhdrfilm")
def _tiledhdrfilm(props: Properties, ctx=None):
    """Out-of-core film: bands accumulate into a disk memmap and develop
    streams scanlines into the EXR writer (films/tiledhdrfilm.cpp:101
    capability; see mitsuba_im_tpu.film.tiled)."""
    out = _apply_film(props, ctx, "openexr")
    if ctx is not None:
        ctx.settings.tiled = True
    return out


def _rfilter(name, ftype):
    @register("rfilter", name)
    def make(props: Properties, ctx=None, _ft=ftype):
        radius = None
        if name == "gaussian":
            radius = 4.0 * props.get_float("stddev", 0.5)
        elif name == "lanczos":
            radius = float(props.get_int("lobes", 3))
        return dict(ftype=_ft, radius=radius)

    return make


for n, ft in fm.FILTER_NAMES.items():
    _rfilter(n, ft)
