"""Hosek-Wilkie analytic sky radiance (SIGGRAPH 2012), baked host-side.

Parity target: ``/root/reference/src/emitters/sunsky/skymodel.{h,cpp}`` —
the reference evaluates the model per query on the CPU; here the full sky
dome is evaluated once into a lat-long bitmap at scene build (numpy,
vectorized over all pixels and all 11 spectral bands at once) and then
rides the regular envmap path on device, identical to the Preetham baking
pipeline in :mod:`mitsuba_im_tpu.emitter.sunsky`.

The coefficient tables are the authors' published fitted dataset
(3-clause BSD; regenerate with ``mitsuba_im_tpu/data/gen_hosek.py``) —
the evaluation code below is implemented from the paper's formulas:

  F(theta, gamma) = (1 + c0 exp(c1 / (cos theta + 0.01)))
                  * (c2 + c3 exp(c4 gamma) + c5 cos^2 gamma
                     + c6 chi(c8, gamma) + c7 sqrt(cos theta))
  chi(g, a) = (1 + cos^2 a) / (1 + g^2 - 2 g cos a)^1.5

with the 9 coefficients A..I and the master radiance each blended over a
quintic bezier in the cube-root-warped solar elevation, then bilinearly
over integer turbidity and ground albedo.
"""
from __future__ import annotations

import os

import numpy as np

_DATA = None


def _load():
    global _DATA
    if _DATA is None:
        path = os.path.join(os.path.dirname(__file__), "..", "data",
                            "hosek_sky.npz")
        _DATA = np.load(path)
    return _DATA


def _bezier5(knots, x):
    """Quintic bezier over the knot axis (…, 6, …) at parameter x."""
    w = np.array([
        (1 - x) ** 5,
        5 * (1 - x) ** 4 * x,
        10 * (1 - x) ** 3 * x ** 2,
        10 * (1 - x) ** 2 * x ** 3,
        5 * (1 - x) * x ** 4,
        x ** 5,
    ])
    return np.tensordot(w, knots, axes=([0], [0]))


def hosek_coeffs(turbidity: float, albedo: float, elevation: float):
    """Blend the dataset -> ((11, 9) coefficients, (11,) master radiance).

    turbidity in [1, 10], albedo in [0, 1], solar elevation in radians.
    """
    d = _load()
    data = d["data"]  # (11, 2, 10, 6, 9)
    rad = d["rad"]    # (11, 2, 10, 6)
    t = float(np.clip(turbidity, 1.0, 10.0))
    it = min(int(t), 9)           # bracket [it, it+1] with 1-based tables
    rem = t - it
    a = float(np.clip(albedo, 0.0, 1.0))
    x = (max(elevation, 0.0) / (np.pi / 2.0)) ** (1.0 / 3.0)

    def blend(tab):  # tab: (11, 2, 10, 6, ...)
        lo = _bezier5(np.moveaxis(tab[:, :, it - 1], 2, 0), x)  # (11, 2, ...)
        if it < 10:
            hi = _bezier5(np.moveaxis(tab[:, :, it], 2, 0), x)
            v = (1 - rem) * lo + rem * hi
        else:
            v = lo
        return (1 - a) * v[:, 0] + a * v[:, 1]

    return blend(data), blend(rad)


def _cie_fits(lam):
    from ..core.spectrum import _cie_xyz

    return _cie_xyz(np.asarray(lam, np.float64))


def hosek_sky_pixels(resolution: int, sun_dir: np.ndarray,
                     turbidity: float = 3.0, albedo: float = 0.15,
                     stretch: float = 1.0, scale: float = 1.0,
                     extend: bool = True) -> np.ndarray:
    """Evaluate the Hosek-Wilkie sky into a (res/2, res, 3) lat-long RGB
    bitmap (linear sRGB radiance; CIE-integrated spectral output, same
    photometric convention as the Preetham baking so the two models are
    drop-in interchangeable)."""
    H = resolution // 2
    W = resolution
    sun_dir = np.asarray(sun_dir, np.float64)
    sun_dir = sun_dir / np.linalg.norm(sun_dir)
    elevation = float(np.arcsin(np.clip(sun_dir[1], -1.0, 1.0)))
    coeffs, rad = hosek_coeffs(turbidity, albedo, max(elevation, 0.0))

    # lat-long grid (matches envmap mapping in emitter/table.py)
    v = (np.arange(H) + 0.5) / H
    u = (np.arange(W) + 0.5) / W
    theta = v * np.pi / float(stretch)
    phi = u * 2.0 * np.pi
    st = np.sin(theta)[:, None]
    dirs = np.stack([
        np.broadcast_to(st * np.sin(phi)[None, :], (H, W)),
        np.broadcast_to(np.cos(theta)[:, None], (H, W)),
        np.broadcast_to(-st * np.cos(phi)[None, :], (H, W)),
    ], -1)

    cos_t = np.clip(dirs[..., 1], 0.0, 1.0)  # zenith angle vs up
    below = dirs[..., 1] < 0
    cos_g = np.clip(np.tensordot(dirs, sun_dir, axes=([-1], [0])), -1.0, 1.0)
    gamma = np.arccos(cos_g)

    lam = _load()["wavelengths"]  # (11,)
    # coefficient slots per skymodel.cpp GetRadianceInternal: the mie
    # anisotropy g lives in slot 8 and the sqrt(cos theta) weight in slot 7
    A, B, C, D, E, F, G, I, Hc = [coeffs[:, k] for k in range(9)]
    ct = np.maximum(cos_t, 0.0)[..., None]     # (H, W, 1)
    cg = cos_g[..., None]
    gm = gamma[..., None]
    chi = (1.0 + cg * cg) / np.power(1.0 + Hc * Hc - 2.0 * Hc * cg, 1.5)
    Fv = (1.0 + A * np.exp(B / (ct + 0.01))) * (
        C + D * np.exp(E * gm) + F * cg * cg + G * chi + I * np.sqrt(ct))
    spec = np.maximum(Fv * rad, 0.0)           # (H, W, 11) spectral radiance

    xb, yb, zb = _cie_fits(lam)               # (11,) each
    dl = float(lam[1] - lam[0])
    X = np.tensordot(spec, xb, axes=([-1], [0])) * dl
    Y = np.tensordot(spec, yb, axes=([-1], [0])) * dl
    Z = np.tensordot(spec, zb, axes=([-1], [0])) * dl
    xyz = np.stack([X, Y, Z], -1)
    from ..core.spectrum import xyz_to_rgb
    import jax.numpy as jnp

    rgb = np.asarray(xyz_to_rgb(jnp.asarray(xyz, jnp.float32)))
    rgb = np.clip(rgb, 0.0, None) * scale
    if extend:
        # smooth fade below the horizon (sky.cpp extend semantics)
        fade = np.clip(1.0 + dirs[..., 1] * 4.0, 0.0, 1.0) ** 2
        rgb = np.where(below[..., None], rgb * fade[..., None], rgb)
    else:
        rgb = np.where(below[..., None], 0.0, rgb)
    return rgb.astype(np.float32)
