"""Compiled scene: one pytree holding every table the kernels need.

The TPU analog of the reference ``Scene`` object
(``/root/reference/include/mitsuba/render/scene.h:49``): geometry + BVH +
BSDF/texture/emitter tables + sensor + per-shape attribute maps, all
device-resident arrays.  Being a pytree, the entire scene flows through
``jax.jit`` arguments, can be donated, replicated or sharded with
``jax.sharding``, and is differentiable where its leaves are.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import pytree_dataclass, static_field, Float, Int, INVALID, EPSILON, SHADOW_EPSILON
from ..accel.bvh import FlatBVH
from ..accel import intersect as isect
from ..bsdf.common import BSDFTable, LaneParams, resolve as bsdf_resolve
from ..emitter.table import EmitterTable
from ..sensor.table import Sensor
from ..texture.texture import TextureTable
from ..media.medium import MediumTable
from .geometry import Geometry, Hit, Interaction, compute_interaction


@pytree_dataclass
class Scene:
    geom: Geometry
    bvh: FlatBVH
    bsdfs: BSDFTable
    textures: TextureTable
    emitters: EmitterTable
    media: MediumTable
    clusters: object  # ClusterSet or None (big-scene TPU intersector)
    sensor: Sensor
    shape_bsdf: jax.Array  # (S,) int32
    shape_emitter: jax.Array  # (S,) int32
    shape_interior: jax.Array  # (S,) int32 medium ids
    shape_exterior: jax.Array  # (S,) int32
    shape_subsurface: jax.Array | None = None  # (S,) int32 subsurface ids
    subsurface: object = None  # SubsurfaceTable or None
    use_bvh: bool = static_field(default=False)
    camera_medium: int = static_field(default=-1)

    # -- queries (scene.h rayIntersect / isOccluded analogs) ---------------
    def ray_intersect(self, o, d, tmin=EPSILON, tmax=1e30) -> Hit:
        return isect.intersect(
            self.geom, o, d, tmin, tmax,
            bvh=self.bvh if self.use_bvh else None, clusters=self.clusters,
        )

    def occluded(self, o, d, tmin, tmax) -> jax.Array:
        return isect.occluded(
            self.geom, o, d, tmin, tmax,
            bvh=self.bvh if self.use_bvh else None, clusters=self.clusters,
        )

    def interaction(self, o, d, hit: Hit) -> Interaction:
        return compute_interaction(self.geom, o, d, hit)

    def bsdf_at(self, it: Interaction) -> LaneParams:
        from ..core.gather import gather_rows

        sid = jnp.where(it.shape == INVALID, 0, it.shape)
        bid = gather_rows(self.shape_bsdf, sid)
        return bsdf_resolve(self.bsdfs, self.textures, bid, it.uv)

    def emitter_at(self, it: Interaction) -> jax.Array:
        from ..core.gather import gather_rows

        sid = jnp.where(it.shape == INVALID, 0, it.shape)
        return jnp.where(it.shape == INVALID, INVALID,
                         gather_rows(self.shape_emitter, sid))

    def subsurface_at(self, shape_id, valid) -> jax.Array:
        from ..core.gather import gather_rows

        if self.shape_subsurface is None:
            return jnp.full(shape_id.shape, INVALID, Int)
        sid = jnp.where(valid, shape_id, 0)
        return jnp.where(valid, gather_rows(self.shape_subsurface, sid),
                         INVALID)
