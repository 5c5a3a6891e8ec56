"""Exact mid-render checkpoint/resume.

An upgrade over the reference, which only has periodic partial-image flush
(``mitsuba -r``) and job-level skip (``-x``) — see SURVEY.md §5.  Because
the sampler is a pure function of (seed, pixel, sample index), saving
(film accumulator, spp done, seed, settings) is an *exact* resume point:
continuing produces bitwise-identical results to an uninterrupted render.
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

from ..film.film import Film
from ..scene.build import RenderSettings


def save_checkpoint(path: str, film: Film, spp_done: int,
                    settings: RenderSettings) -> None:
    np.savez_compressed(
        path if path.endswith(".npz") else path + ".npz",
        film=np.asarray(film.data),
        spp_done=spp_done,
        width=film.width, height=film.height,
        ftype=film.ftype, radius=film.radius,
        seed=settings.seed,
        settings=json.dumps({
            "width": settings.width, "height": settings.height,
            "spp": settings.spp, "sampler": settings.sampler,
            "seed": settings.seed, "integrator": settings.integrator,
            "integrator_props": settings.integrator_props,
            "rfilter": settings.rfilter,
            "rfilter_radius": settings.rfilter_radius,
        }),
    )


def load_checkpoint(path: str) -> tuple[Film, int, RenderSettings]:
    if not path.endswith(".npz"):
        path = path + ".npz"
    z = np.load(path, allow_pickle=False)
    film = Film(
        data=jnp.asarray(z["film"]),
        width=int(z["width"]), height=int(z["height"]),
        ftype=int(z["ftype"]), radius=float(z["radius"]),
    )
    cfg = json.loads(str(z["settings"]))
    settings = RenderSettings(**{k: v for k, v in cfg.items()})
    return film, int(z["spp_done"]), settings
