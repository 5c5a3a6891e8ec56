"""Sampler plugin factories (``/root/reference/src/samplers/``).

All samplers share the stateless counter-based substrate in
``core.rng``; plugin choice selects the stratification/low-discrepancy
strategy for the image-plane dimensions (the reference's ldsampler/sobol/
halton behave the same way for the dimensions that matter most).
"""
from __future__ import annotations

from ..core.registry import register
from ..core.properties import Properties
from ..core import rng as mrng


def _factory(kind):
    def make(props: Properties, ctx=None):
        spp = props.get_int("sampleCount", 4)
        cfg = dict(kind=kind, spp=spp, scramble=props.get_int("scramble", 0))
        if ctx is not None:
            ctx.settings.spp = spp
            ctx.settings.sampler = _NAMES[kind]
            ctx.settings.seed = cfg["scramble"]
        return cfg

    return make


_NAMES = {
    mrng.INDEPENDENT: "independent",
    mrng.STRATIFIED: "stratified",
    mrng.LDSAMPLER: "ldsampler",
    mrng.SOBOL: "sobol",
    mrng.HALTON: "halton",
    mrng.HAMMERSLEY: "hammersley",
}

for kind, name in _NAMES.items():
    register("sampler", name)(_factory(kind))

KIND_BY_NAME = {v: k for k, v in _NAMES.items()}
