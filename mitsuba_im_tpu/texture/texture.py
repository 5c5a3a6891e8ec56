"""Texture system: constant / bitmap (atlas) / procedural, SoA dispatch.

Reference surface: ``/root/reference/src/textures/`` (bitmap w/ MIP+EWA,
checkerboard, gridtexture, scale, wireframe, curvature, vertexcolors) and
``include/mitsuba/render/mipmap.h``.  TPU design: all bitmap textures are
packed into one flat HBM atlas; evaluation is a bilinear 4-gather; procedural
types evaluate inline.  Dispatch is by integer type code with only the types
present in the scene compiled in (static ``used_types``).

MIP/EWA filtering is planned for the anisotropic path; current filtering is
bilinear (the reference's interactive preview path effectively uses the same).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.types import pytree_dataclass, static_field, Float, Int, INVALID

TEX_CONST = 0
TEX_BITMAP = 1
TEX_CHECKER = 2
TEX_GRID = 3
TEX_SCALE = 4  # value0 * nested
TEX_WIREFRAME = 5
TEX_VERTEXCOLORS = 6
TEX_CURVATURE = 7

WRAP_REPEAT = 0
WRAP_CLAMP = 1
WRAP_MIRROR = 2


@pytree_dataclass
class TextureTable:
    type: jax.Array  # (X,) int32
    value0: jax.Array  # (X, 3) const color / checker c0 / scale factor
    value1: jax.Array  # (X, 3) checker c1 / grid line color
    offset: jax.Array  # (X,) int32 start into atlas (bitmap)
    width: jax.Array  # (X,) int32
    height: jax.Array  # (X,) int32
    uvscale: jax.Array  # (X, 2)
    uvoffset: jax.Array  # (X, 2)
    param0: jax.Array  # (X,) scalar (grid lineWidth etc.)
    wrap: jax.Array  # (X,) int32
    nested: jax.Array  # (X,) int32 (scale wrapper)
    gamma_srgb: jax.Array  # (X,) int32 (bitmap stored sRGB -> delinearize)
    atlas: jax.Array  # (P, 3) all bitmap texels, row-major concatenated
    used_types: tuple = static_field(default=(TEX_CONST,))


class TextureBuilder:
    """Host-side accumulator producing a TextureTable."""

    def __init__(self):
        self.records: list[dict] = []
        self.atlas_parts: list[np.ndarray] = []
        self.atlas_size = 0

    def add(self, **kw) -> int:
        rec = dict(
            type=TEX_CONST,
            value0=np.zeros(3), value1=np.zeros(3),
            offset=0, width=0, height=0,
            uvscale=np.ones(2), uvoffset=np.zeros(2),
            param0=0.0, wrap=WRAP_REPEAT, nested=INVALID, gamma_srgb=0,
        )
        rec.update(kw)
        self.records.append(rec)
        return len(self.records) - 1

    def add_constant(self, rgb) -> int:
        return self.add(type=TEX_CONST, value0=np.asarray(rgb, np.float64))

    def add_bitmap(self, pixels: np.ndarray, uvscale=(1, 1), uvoffset=(0, 0),
                   wrap=WRAP_REPEAT) -> int:
        """pixels: (H, W, 3) float32 linear RGB."""
        h, w = pixels.shape[:2]
        flat = np.asarray(pixels, np.float32).reshape(-1, 3)
        off = self.atlas_size
        self.atlas_parts.append(flat)
        self.atlas_size += len(flat)
        return self.add(
            type=TEX_BITMAP, offset=off, width=w, height=h,
            uvscale=np.asarray(uvscale, np.float64),
            uvoffset=np.asarray(uvoffset, np.float64), wrap=wrap,
        )

    def build(self) -> TextureTable:
        recs = self.records or [dict(
            type=TEX_CONST, value0=np.zeros(3), value1=np.zeros(3), offset=0,
            width=0, height=0, uvscale=np.ones(2), uvoffset=np.zeros(2),
            param0=0.0, wrap=0, nested=INVALID, gamma_srgb=0,
        )]
        atlas = (
            np.concatenate(self.atlas_parts, axis=0)
            if self.atlas_parts
            else np.zeros((1, 3), np.float32)
        )
        g = lambda k, dt: jnp.asarray(np.stack([np.asarray(r[k]) for r in recs]), dt)
        return TextureTable(
            type=g("type", Int), value0=g("value0", Float), value1=g("value1", Float),
            offset=g("offset", Int), width=g("width", Int), height=g("height", Int),
            uvscale=g("uvscale", Float), uvoffset=g("uvoffset", Float),
            param0=g("param0", Float), wrap=g("wrap", Int), nested=g("nested", Int),
            gamma_srgb=g("gamma_srgb", Int),
            atlas=jnp.asarray(atlas, Float),
            used_types=tuple(sorted({int(r["type"]) for r in recs})),
        )


def _wrap_coord(x, n, wrap_mode):
    """Integer texel coordinate wrapping, vectorized over modes."""
    n = jnp.maximum(n, 1)
    rep = jnp.mod(x, n)
    clmp = jnp.clip(x, 0, n - 1)
    period = 2 * n
    mx = jnp.mod(x, period)
    mir = jnp.where(mx >= n, period - 1 - mx, mx)
    return jnp.where(wrap_mode == WRAP_REPEAT, rep,
                     jnp.where(wrap_mode == WRAP_CLAMP, clmp, mir))


def eval_texture_v(table: TextureTable, tex_id: jax.Array, uv_u: jax.Array,
                   uv_v: jax.Array, const_rgb=None):
    """Component-SoA texture evaluation -> V3.

    Same dispatch as :func:`eval_texture` but every intermediate is a flat
    (N,) array (full tile density); table columns resolve through fused
    select chains for small tables.
    """
    from ..core import v3 as v

    tid = jnp.where(tex_id == INVALID, 0, tex_id)
    X = table.type.shape[0]
    small = X <= v.SELECT_MAX
    if small:
        gc = lambda col: v.gather_col(col, tid)
        g3 = lambda tab: v.gather_v3(tab, tid)
        g2 = lambda tab: (v.gather_col(tab[:, 0], tid),
                          v.gather_col(tab[:, 1], tid))
    else:
        gc = lambda col: col[tid]
        g3 = lambda tab: v.V3.from_array(tab[tid])
        g2 = lambda tab: (tab[tid][..., 0], tab[tid][..., 1])

    ttype = gc(table.type)
    out = v.zeros(uv_u.shape)
    su, sv = g2(table.uvscale)
    ou, ov = g2(table.uvoffset)
    us = uv_u * su + ou
    vs = uv_v * sv + ov

    if TEX_CONST in table.used_types:
        out = v.where(ttype == TEX_CONST, g3(table.value0), out)

    if TEX_BITMAP in table.used_types:
        w = gc(table.width)
        h = gc(table.height)
        wrap = gc(table.wrap)
        off = gc(table.offset)
        fx = us * w.astype(Float) - 0.5
        fy = vs * h.astype(Float) - 0.5
        x0 = jnp.floor(fx).astype(Int)
        y0 = jnp.floor(fy).astype(Int)
        dx = fx - x0.astype(Float)
        dy = fy - y0.astype(Float)

        def texel(xi, yi):
            xi = _wrap_coord(xi, w, wrap)
            yi = _wrap_coord(yi, h, wrap)
            idx = off + yi * jnp.maximum(w, 1) + xi
            idx = jnp.clip(idx, 0, table.atlas.shape[0] - 1)
            return v.V3.from_array(table.atlas[idx])

        c = (
            texel(x0, y0) * ((1 - dx) * (1 - dy))
            + texel(x0 + 1, y0) * (dx * (1 - dy))
            + texel(x0, y0 + 1) * ((1 - dx) * dy)
            + texel(x0 + 1, y0 + 1) * (dx * dy)
        )
        out = v.where(ttype == TEX_BITMAP, c, out)

    if TEX_CHECKER in table.used_types:
        xi = jnp.floor(us * 2.0).astype(Int)
        yi = jnp.floor(vs * 2.0).astype(Int)
        even = jnp.mod(xi + yi, 2) == 0
        c = v.where(even, g3(table.value0), g3(table.value1))
        out = v.where(ttype == TEX_CHECKER, c, out)

    if TEX_GRID in table.used_types:
        lw = gc(table.param0)
        fx = us - jnp.floor(us)
        fy = vs - jnp.floor(vs)
        on_line = (fx < lw) | (fx > 1 - lw) | (fy < lw) | (fy > 1 - lw)
        c = v.where(on_line, g3(table.value1), g3(table.value0))
        out = v.where(ttype == TEX_GRID, c, out)

    if TEX_SCALE in table.used_types:
        nested = gc(table.nested)
        nested = jnp.where(nested == INVALID, 0, nested)
        base = eval_texture_v(
            table.replace(used_types=tuple(
                t for t in table.used_types if t != TEX_SCALE)),
            nested, uv_u, uv_v, None,
        )
        out = v.where(ttype == TEX_SCALE, base * g3(table.value0), out)

    if const_rgb is not None:
        out = v.where(tex_id == INVALID, const_rgb, out)
    return out


def eval_texture(table: TextureTable, tex_id: jax.Array, uv: jax.Array,
                 const_rgb: jax.Array | None = None) -> jax.Array:
    """Evaluate textures per lane.

    tex_id: (...,) int32; INVALID lanes return ``const_rgb`` (or zeros).
    uv: (..., 2).
    """
    from ..core.gather import RowBundle

    tid = jnp.where(tex_id == INVALID, 0, tex_id)
    tb = (
        RowBundle()
        .add("type", table.type).add("value0", table.value0)
        .add("value1", table.value1).add("offset", table.offset)
        .add("width", table.width).add("height", table.height)
        .add("uvscale", table.uvscale).add("uvoffset", table.uvoffset)
        .add("param0", table.param0).add("wrap", table.wrap)
        .add("nested", table.nested)
    ).lookup(tid)
    ttype = tb["type"]
    out = jnp.zeros(uv.shape[:-1] + (3,), Float)

    uvs = uv * tb["uvscale"] + tb["uvoffset"]

    if TEX_CONST in table.used_types:
        out = jnp.where((ttype == TEX_CONST)[..., None], tb["value0"], out)

    if TEX_BITMAP in table.used_types:
        w = tb["width"]
        h = tb["height"]
        wrap = tb["wrap"]
        fx = uvs[..., 0] * w.astype(Float) - 0.5
        fy = uvs[..., 1] * h.astype(Float) - 0.5
        x0 = jnp.floor(fx).astype(Int)
        y0 = jnp.floor(fy).astype(Int)
        dx = fx - x0.astype(Float)
        dy = fy - y0.astype(Float)

        def texel(xi, yi):
            xi = _wrap_coord(xi, w, wrap)
            yi = _wrap_coord(yi, h, wrap)
            idx = tb["offset"] + yi * jnp.maximum(w, 1) + xi
            idx = jnp.clip(idx, 0, table.atlas.shape[0] - 1)
            return table.atlas[idx]

        c = (
            texel(x0, y0) * ((1 - dx) * (1 - dy))[..., None]
            + texel(x0 + 1, y0) * (dx * (1 - dy))[..., None]
            + texel(x0, y0 + 1) * ((1 - dx) * dy)[..., None]
            + texel(x0 + 1, y0 + 1) * (dx * dy)[..., None]
        )
        out = jnp.where((ttype == TEX_BITMAP)[..., None], c, out)

    if TEX_CHECKER in table.used_types:
        xi = jnp.floor(uvs[..., 0] * 2.0).astype(Int)
        yi = jnp.floor(uvs[..., 1] * 2.0).astype(Int)
        even = jnp.mod(xi + yi, 2) == 0
        c = jnp.where(even[..., None], tb["value0"], tb["value1"])
        out = jnp.where((ttype == TEX_CHECKER)[..., None], c, out)

    if TEX_GRID in table.used_types:
        lw = tb["param0"]
        fx = uvs[..., 0] - jnp.floor(uvs[..., 0])
        fy = uvs[..., 1] - jnp.floor(uvs[..., 1])
        on_line = (
            (fx < lw) | (fx > 1 - lw) | (fy < lw) | (fy > 1 - lw)
        )
        c = jnp.where(on_line[..., None], tb["value1"], tb["value0"])
        out = jnp.where((ttype == TEX_GRID)[..., None], c, out)

    if TEX_SCALE in table.used_types:
        nested = jnp.where(tb["nested"] == INVALID, 0, tb["nested"])
        # one level of nesting: evaluate nested as const/bitmap inline
        base = eval_texture(
            table.replace(used_types=tuple(t for t in table.used_types if t != TEX_SCALE)),
            nested, uv, None,
        )
        out = jnp.where((ttype == TEX_SCALE)[..., None], base * tb["value0"], out)

    if const_rgb is not None:
        out = jnp.where((tex_id == INVALID)[..., None], const_rgb, out)
    return out
