"""Sensors: perspective, thinlens, orthographic, telecentric, spherical,
radiancemeter/irradiancemeter/fluencemeter.

Reference: ``/root/reference/src/sensors/`` and
``include/mitsuba/render/sensor.h:66``.  A sensor is a small pytree with a
static type; ``sample_ray`` maps film-plane uv in [0,1)^2 (+ aperture uv)
to world-space primary rays, vectorized over the wavefront.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.types import pytree_dataclass, static_field, Float
from ..core import math as m
from ..core import warp
from ..core.transform import Transform, xform_point, xform_vector

S_PERSPECTIVE = 0
S_THINLENS = 1
S_ORTHOGRAPHIC = 2
S_SPHERICAL = 3
S_RADIANCEMETER = 4
S_TELECENTRIC = 5
S_IRRADIANCEMETER = 6


@pytree_dataclass
class Sensor:
    to_world: jax.Array  # (4, 4)
    to_camera: jax.Array  # (4, 4) world -> camera
    tan_x: jax.Array  # () tan(fov_x / 2)
    tan_y: jax.Array  # ()
    near: jax.Array
    far: jax.Array
    aperture_radius: jax.Array
    focus_distance: jax.Array
    scale_x: jax.Array  # orthographic half-extents
    scale_y: jax.Array
    shutter_open: jax.Array
    shutter_time: jax.Array
    type: int = static_field(default=S_PERSPECTIVE)


def make_sensor(stype: int, to_world: Transform, fov_deg: float = 45.0,
                fov_axis: str = "x", aspect: float = 1.0,
                near: float = 1e-2, far: float = 1e4,
                aperture_radius: float = 0.0, focus_distance: float = 1.0,
                scale_x: float = 1.0, scale_y: float = 1.0,
                shutter_open: float = 0.0, shutter_time: float = 0.0) -> Sensor:
    """aspect = width/height of the crop window."""
    t = np.tan(np.deg2rad(fov_deg) / 2.0)
    if fov_axis == "x":
        tan_x, tan_y = t, t / aspect
    elif fov_axis == "y":
        tan_x, tan_y = t * aspect, t
    elif fov_axis in ("smaller", "larger"):
        pick_x = (aspect >= 1.0) == (fov_axis == "larger")
        tan_x, tan_y = (t, t / aspect) if pick_x else (t * aspect, t)
    else:  # diagonal
        d = np.hypot(aspect, 1.0)
        tan_x, tan_y = t * aspect / d, t / d
    f = lambda x: jnp.asarray(x, Float)
    return Sensor(
        to_world=f(to_world.m), to_camera=f(to_world.inv),
        tan_x=f(tan_x), tan_y=f(tan_y),
        near=f(near), far=f(far),
        aperture_radius=f(aperture_radius), focus_distance=f(focus_distance),
        scale_x=f(scale_x), scale_y=f(scale_y),
        shutter_open=f(shutter_open), shutter_time=f(shutter_time),
        type=stype,
    )


def sample_ray(sensor: Sensor, uv: jax.Array, u_lens: jax.Array):
    """uv: (..., 2) film position in [0,1)^2; u_lens: (..., 2) aperture.

    Returns (o, d, weight) in world space; weight is the importance factor
    (1 for all supported sensors, matching the reference conventions).
    """
    # Film-to-camera mapping per the reference perspective.cpp
    # cameraToSample = scale(-0.5, -0.5*aspect, 1) . translate(-1, -1/aspect, 0)
    # . perspective: u=0 maps to camera +x (the lookAt "left" vector), v=0 to
    # camera +y (up) — so x decreases with u, y decreases with v.
    x = (1.0 - 2.0 * uv[..., 0]) * sensor.tan_x
    y = (1.0 - 2.0 * uv[..., 1]) * sensor.tan_y
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)

    if sensor.type == S_PERSPECTIVE:
        d_cam = m.normalize(m.vec3(x, y, ones))
        o_cam = jnp.zeros(uv.shape[:-1] + (3,), Float)
    elif sensor.type == S_THINLENS:
        # focus plane at focus_distance; aperture offset on the lens disk
        p_focus = m.vec3(x * sensor.focus_distance, y * sensor.focus_distance,
                         jnp.broadcast_to(sensor.focus_distance, x.shape))
        ap = warp.square_to_uniform_disk_concentric(u_lens) * sensor.aperture_radius
        o_cam = m.vec3(ap[..., 0], ap[..., 1], zeros)
        d_cam = m.normalize(p_focus - o_cam)
    elif sensor.type == S_ORTHOGRAPHIC or sensor.type == S_TELECENTRIC:
        o_cam = m.vec3(
            (1.0 - 2.0 * uv[..., 0]) * sensor.scale_x,
            (1.0 - 2.0 * uv[..., 1]) * sensor.scale_y,
            zeros,
        )
        if sensor.type == S_TELECENTRIC:
            ap = warp.square_to_uniform_disk_concentric(u_lens) * sensor.aperture_radius
            o_cam = o_cam + m.vec3(ap[..., 0], ap[..., 1], zeros)
        d_cam = jnp.broadcast_to(m.vec3(0.0, 0.0, 1.0), o_cam.shape)
    elif sensor.type == S_SPHERICAL:
        # lat-long panorama: u -> phi, v -> theta (reference spherical.cpp)
        phi = (1.0 - 2.0 * uv[..., 0]) * jnp.pi
        theta = uv[..., 1] * jnp.pi
        st, ct = jnp.sin(theta), jnp.cos(theta)
        d_cam = m.vec3(st * jnp.sin(phi), ct, -st * jnp.cos(phi))
        o_cam = jnp.zeros(uv.shape[:-1] + (3,), Float)
    elif sensor.type in (S_RADIANCEMETER, S_IRRADIANCEMETER):
        o_cam = jnp.zeros(uv.shape[:-1] + (3,), Float)
        if sensor.type == S_IRRADIANCEMETER:
            d_cam = warp.square_to_cosine_hemisphere(uv)
        else:
            d_cam = jnp.broadcast_to(m.vec3(0.0, 0.0, 1.0), o_cam.shape)
    else:
        raise ValueError(f"unknown sensor type {sensor.type}")

    o = xform_point(sensor.to_world, o_cam)
    d = m.normalize(xform_vector(sensor.to_world, d_cam))
    return o, d, jnp.ones(uv.shape[:-1], Float)


def sample_ray_v(sensor: Sensor, uv_u, uv_v, u_lens_a, u_lens_b):
    """Component-SoA primary-ray generation: flat (N,) film/aperture
    coordinates -> (o: V3, d: V3, weight).  Same mapping as
    :func:`sample_ray`."""
    from ..core import v3 as v
    from ..core.v3 import V3

    x = (1.0 - 2.0 * uv_u) * sensor.tan_x
    y = (1.0 - 2.0 * uv_v) * sensor.tan_y
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)

    if sensor.type == S_PERSPECTIVE:
        d_cam = V3(x, y, ones).normalized()
        o_cam = v.zeros(x.shape)
    elif sensor.type == S_THINLENS:
        p_focus = V3(x * sensor.focus_distance, y * sensor.focus_distance,
                     jnp.broadcast_to(sensor.focus_distance, x.shape))
        ap = warp.square_to_uniform_disk_concentric(
            jnp.stack([u_lens_a, u_lens_b], axis=-1)) * sensor.aperture_radius
        o_cam = V3(ap[..., 0], ap[..., 1], zeros)
        d_cam = (p_focus - o_cam).normalized()
    elif sensor.type == S_ORTHOGRAPHIC or sensor.type == S_TELECENTRIC:
        o_cam = V3((1.0 - 2.0 * uv_u) * sensor.scale_x,
                   (1.0 - 2.0 * uv_v) * sensor.scale_y, zeros)
        if sensor.type == S_TELECENTRIC:
            ap = warp.square_to_uniform_disk_concentric(
                jnp.stack([u_lens_a, u_lens_b], axis=-1)
            ) * sensor.aperture_radius
            o_cam = o_cam + V3(ap[..., 0], ap[..., 1], zeros)
        d_cam = V3(zeros, zeros, ones)
    elif sensor.type == S_SPHERICAL:
        phi = (1.0 - 2.0 * uv_u) * jnp.pi
        theta = uv_v * jnp.pi
        st, ct = jnp.sin(theta), jnp.cos(theta)
        d_cam = V3(st * jnp.sin(phi), ct, -st * jnp.cos(phi))
        o_cam = v.zeros(x.shape)
    elif sensor.type in (S_RADIANCEMETER, S_IRRADIANCEMETER):
        o_cam = v.zeros(x.shape)
        if sensor.type == S_IRRADIANCEMETER:
            d_cam = v.square_to_cosine_hemisphere(uv_u, uv_v)
        else:
            d_cam = V3(zeros, zeros, ones)
    else:
        raise ValueError(f"unknown sensor type {sensor.type}")

    tw = sensor.to_world
    o = V3(
        tw[0, 0] * o_cam.x + tw[0, 1] * o_cam.y + tw[0, 2] * o_cam.z + tw[0, 3],
        tw[1, 0] * o_cam.x + tw[1, 1] * o_cam.y + tw[1, 2] * o_cam.z + tw[1, 3],
        tw[2, 0] * o_cam.x + tw[2, 1] * o_cam.y + tw[2, 2] * o_cam.z + tw[2, 3],
    )
    d = V3(
        tw[0, 0] * d_cam.x + tw[0, 1] * d_cam.y + tw[0, 2] * d_cam.z,
        tw[1, 0] * d_cam.x + tw[1, 1] * d_cam.y + tw[1, 2] * d_cam.z,
        tw[2, 0] * d_cam.x + tw[2, 1] * d_cam.y + tw[2, 2] * d_cam.z,
    ).normalized()
    return o, d, jnp.ones(x.shape, Float)


def connect(sensor: Sensor, p: jax.Array):
    """Project world points onto the film (light-tracing connections).

    Returns (uv in [0,1)^2, cam_pos world, dist, importance, valid) where
    ``importance`` is the pinhole image-plane importance
    W = 1 / (A_img * cos^3 theta) with A_img = 4 tan_x tan_y, so the
    standard light-tracing estimator I_px = (W*H/N) sum thr * f * G * W
    matches the camera-sampled estimate (Veach 8.2; ptracer.cpp capability).
    Only perspective/thinlens-at-zero-aperture supported for now.
    """
    pc = xform_point(sensor.to_camera, p)
    z = pc[..., 2]
    valid = z > sensor.near
    zs = jnp.where(valid, z, 1.0)
    x_ndc = pc[..., 0] / zs
    y_ndc = pc[..., 1] / zs
    u = 0.5 * (1.0 - x_ndc / sensor.tan_x)
    v = 0.5 * (1.0 - y_ndc / sensor.tan_y)
    valid = valid & (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
    cam_world = sensor.to_world[:3, 3]
    delta = p - cam_world
    dist = jnp.sqrt(jnp.maximum(m.dot(delta, delta), 1e-20))
    cos_theta = z / jnp.maximum(dist, 1e-12)
    a_img = 4.0 * sensor.tan_x * sensor.tan_y
    importance = 1.0 / jnp.maximum(a_img * cos_theta ** 3, 1e-12)
    uv = jnp.stack([u, v], axis=-1)
    return uv, jnp.broadcast_to(cam_world, p.shape), dist, importance, valid
