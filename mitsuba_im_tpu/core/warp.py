"""Sampling warps: square -> sphere/hemisphere/cosine/cone/disk/triangle/...

Capability parity with ``/root/reference/include/mitsuba/core/warp.h:40-120``
and ``src/libcore/warp.cpp``; all functions are batched pure functions
(inputs ``(..., 2)`` or ``(...,)`` uniform samples).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .math import vec3, safe_sqrt
from .types import Float

INV_PI = 1.0 / jnp.pi
INV_TWOPI = 1.0 / (2.0 * jnp.pi)
INV_FOURPI = 1.0 / (4.0 * jnp.pi)


def square_to_uniform_sphere(s: jax.Array) -> jax.Array:
    z = 1.0 - 2.0 * s[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * s[..., 1]
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def square_to_uniform_sphere_pdf() -> float:
    return float(INV_FOURPI)


def square_to_uniform_hemisphere(s: jax.Array) -> jax.Array:
    z = s[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * s[..., 1]
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def square_to_uniform_hemisphere_pdf() -> float:
    return float(INV_TWOPI)


def square_to_cosine_hemisphere(s: jax.Array) -> jax.Array:
    p = square_to_uniform_disk_concentric(s)
    z = safe_sqrt(1.0 - p[..., 0] ** 2 - p[..., 1] ** 2)
    return vec3(p[..., 0], p[..., 1], z)


def square_to_cosine_hemisphere_pdf(d: jax.Array) -> jax.Array:
    return jnp.maximum(d[..., 2], 0.0) * INV_PI


def square_to_uniform_cone(cos_cutoff, s: jax.Array) -> jax.Array:
    cos_theta = (1.0 - s[..., 0]) + s[..., 0] * cos_cutoff
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * jnp.pi * s[..., 1]
    return vec3(jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta)


def square_to_uniform_cone_pdf(cos_cutoff) -> jax.Array:
    return INV_TWOPI / (1.0 - cos_cutoff)


def square_to_uniform_disk(s: jax.Array) -> jax.Array:
    r = jnp.sqrt(s[..., 0])
    phi = 2.0 * jnp.pi * s[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_disk_concentric(s: jax.Array) -> jax.Array:
    """Shirley-Chiu concentric disk mapping (``warp.cpp``)."""
    r1 = 2.0 * s[..., 0] - 1.0
    r2 = 2.0 * s[..., 1] - 1.0
    zero = (r1 == 0.0) & (r2 == 0.0)
    use_r1 = jnp.abs(r1) > jnp.abs(r2)
    r = jnp.where(use_r1, r1, r2)
    safe = jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(
        use_r1,
        (jnp.pi / 4.0) * (r2 / safe),
        (jnp.pi / 2.0) - (r1 / safe) * (jnp.pi / 4.0),
    )
    r = jnp.where(zero, 0.0, r)
    phi = jnp.where(zero, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_triangle(s: jax.Array) -> jax.Array:
    """Barycentric (u, v) uniform on the unit triangle (``warp.cpp``)."""
    a = safe_sqrt(1.0 - s[..., 0])
    return jnp.stack([1.0 - a, a * s[..., 1]], axis=-1)


def square_to_std_normal(s: jax.Array) -> jax.Array:
    """Box-Muller (``warp.cpp`` squareToStdNormal)."""
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - s[..., 0], 1e-38)))
    phi = 2.0 * jnp.pi * s[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_tent(s: jax.Array) -> jax.Array:
    def tent1(x):
        t = 2.0 * x - 1.0
        return jnp.where(
            t < 0.0, jnp.sqrt(jnp.maximum(2.0 * x, 0.0)) - 1.0,
            1.0 - jnp.sqrt(jnp.maximum(2.0 - 2.0 * x, 0.0)),
        )

    return jnp.stack([tent1(s[..., 0]), tent1(s[..., 1])], axis=-1)


def interval_to_nonuniform_tent(a, b, c, s):
    """1D tent on [a, c] peaking at b (``warp.cpp``)."""
    below = s * (c - a) < (b - a)
    factor = jnp.where(below, a - b, c - b)
    s2 = jnp.where(below, s * (a - c) / (a - b), (a - c) * (s - (a - b) / (a - c)) / (b - c))
    return b + factor * (1.0 - safe_sqrt(s2))
