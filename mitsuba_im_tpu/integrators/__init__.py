"""Integrator plugin factories (``/root/reference/src/integrators/``).

Factories record the integrator name + its parameters into the render
settings; the render layer dispatches to the matching wavefront kernel.
Integrators whose TPU kernel is still queued (bdpt/mlt/pssmlt/erpt/photon
mappers) currently fall back to the path tracer — same converged image for
scenes without the specialized-transport need, flagged with a warning.
"""
from __future__ import annotations

import warnings

from ..core.registry import register
from ..core.properties import Properties

IMPLEMENTED = ("path", "volpath", "volpath_simple", "direct", "ao", "field",
               "ptracer", "adaptive", "multichannel", "irrcache", "motion")


def _mc_props(props: Properties) -> dict:
    return dict(
        max_depth=props.get_int("maxDepth", -1),
        rr_depth=props.get_int("rrDepth", 5),
        strict_normals=props.get_bool("strictNormals", False),
        hide_emitters=props.get_bool("hideEmitters", False),
    )


def _set(ctx, name, ip):
    if ctx is not None:
        ctx.settings.integrator = name
        ctx.settings.integrator_props = ip
    return dict(name=name, **ip)


@register("integrator", "path")
def _path(props: Properties, ctx=None):
    return _set(ctx, "path", _mc_props(props))


@register("integrator", "volpath")
def _volpath(props: Properties, ctx=None):
    return _set(ctx, "volpath", _mc_props(props))


@register("integrator", "volpath_simple")
def _volpath_simple(props: Properties, ctx=None):
    return _set(ctx, "volpath", _mc_props(props))


@register("integrator", "direct")
def _direct(props: Properties, ctx=None):
    ip = dict(
        emitter_samples=props.get_int("emitterSamples", props.get_int("shadingSamples", 1)),
        bsdf_samples=props.get_int("bsdfSamples", props.get_int("shadingSamples", 1)),
        strict_normals=props.get_bool("strictNormals", False),
        hide_emitters=props.get_bool("hideEmitters", False),
    )
    return _set(ctx, "direct", ip)


@register("integrator", "ao")
def _ao(props: Properties, ctx=None):
    ip = dict(
        shading_samples=props.get_int("shadingSamples", 1),
        ray_length=props.get_float("rayLength", -1.0),
    )
    return _set(ctx, "ao", ip)


@register("integrator", "field")
def _field(props: Properties, ctx=None):
    ip = dict(field=props.get_string("field", "position"))
    return _set(ctx, "field", ip)


@register("integrator", "ptracer")
def _ptracer(props: Properties, ctx=None):
    ip = _mc_props(props)
    ip["granularity"] = props.get_int("granularity", 200000)
    return _set(ctx, "ptracer", ip)


@register("integrator", "adaptive")
def _adaptive(props: Properties, ctx=None):
    ip = dict(
        max_error=props.get_float("maxError", 0.05),
        p_value=props.get_float("pValue", 0.05),
        max_spp=props.get_int("maxSampleFactor", 32),
        nested=props.children.get("integrator", dict(name="path")),
    )
    return _set(ctx, "adaptive", ip)


@register("integrator", "multichannel")
def _multichannel(props: Properties, ctx=None):
    subs = props.children.get("integrator_list", [])
    return _set(ctx, "multichannel", dict(children=subs))


@register("integrator", "irrcache")
def _irrcache(props: Properties, ctx=None):
    warnings.warn("irrcache: running the nested integrator directly")
    nested = props.children.get("integrator", dict(name="path"))
    if ctx is not None:
        ctx.settings.integrator = nested.get("name", "path")
        ctx.settings.integrator_props = {
            k: v for k, v in nested.items() if k != "name"
        }
    return nested


def _fallback(name):
    @register("integrator", name)
    def make(props: Properties, ctx=None, _n=name):
        warnings.warn(
            f"integrator '{_n}' has no TPU kernel yet; falling back to 'path'"
        )
        return _set(ctx, "path", _mc_props(props))

    return make


for _n in ("bdpt", "mlt", "pssmlt", "erpt", "photonmapper", "ppm", "sppm",
           "vpl", "motion"):
    _fallback(_n)
