"""4x4 homogeneous transforms (reference ``include/mitsuba/core/transform.h:415``).

A transform is a pair of numpy/jax ``(4, 4)`` matrices (m, inv).  Host-side
scene construction uses numpy float64 for robustness; compiled scenes carry
float32 arrays.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class Transform:
    """Immutable host-side 4x4 transform with cached inverse."""

    __slots__ = ("m", "inv")

    def __init__(self, m=None, inv=None):
        self.m = np.eye(4) if m is None else np.asarray(m, dtype=np.float64)
        self.inv = np.linalg.inv(self.m) if inv is None else np.asarray(inv, np.float64)

    # -- constructors ------------------------------------------------------
    @staticmethod
    def translate(v):
        m = np.eye(4)
        m[:3, 3] = v
        i = np.eye(4)
        i[:3, 3] = -np.asarray(v, np.float64)
        return Transform(m, i)

    @staticmethod
    def scale(v):
        v = np.broadcast_to(np.asarray(v, np.float64), (3,))
        m = np.diag(np.concatenate([v, [1.0]]))
        i = np.diag(np.concatenate([1.0 / v, [1.0]]))
        return Transform(m, i)

    @staticmethod
    def rotate(axis, angle_deg):
        axis = np.asarray(axis, np.float64)
        axis = axis / np.linalg.norm(axis)
        a = np.deg2rad(angle_deg)
        c, s = np.cos(a), np.sin(a)
        x, y, z = axis
        K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
        R3 = np.eye(3) * c + s * K + (1 - c) * np.outer(axis, axis)
        m = np.eye(4)
        m[:3, :3] = R3
        return Transform(m, m.T)

    @staticmethod
    def look_at(origin, target, up):
        """Camera-to-world: +z toward target, +y up-ish, +x left-handed like
        the reference (``transform.h`` lookAt: x = cross(up, dir))."""
        origin = np.asarray(origin, np.float64)
        d = np.asarray(target, np.float64) - origin
        d = d / np.linalg.norm(d)
        left = np.cross(np.asarray(up, np.float64) / np.linalg.norm(up), d)
        left = left / np.linalg.norm(left)
        new_up = np.cross(d, left)
        m = np.eye(4)
        m[:3, 0] = left
        m[:3, 1] = new_up
        m[:3, 2] = d
        m[:3, 3] = origin
        return Transform(m)

    @staticmethod
    def perspective(fov_deg, near, far):
        """Projective transform used by the perspective sensor
        (``transform.h`` Transform::perspective): maps the view frustum so
        x/y in [-tan(fov/2), ...] -> screen; we only need the mapping of the
        image plane, handled in the sensor directly; kept for completeness."""
        recip = 1.0 / (far - near)
        cot = 1.0 / np.tan(np.deg2rad(fov_deg) / 2.0)
        m = np.array(
            [
                [cot, 0, 0, 0],
                [0, cot, 0, 0],
                [0, 0, far * recip, -near * far * recip],
                [0, 0, 1, 0],
            ]
        )
        return Transform(m)

    @staticmethod
    def from_frame(s, t, n, o=None):
        m = np.eye(4)
        m[:3, 0], m[:3, 1], m[:3, 2] = s, t, n
        if o is not None:
            m[:3, 3] = o
        return Transform(m)

    # -- composition -------------------------------------------------------
    def __matmul__(self, other: "Transform") -> "Transform":
        return Transform(self.m @ other.m, other.inv @ self.inv)

    def inverse(self) -> "Transform":
        return Transform(self.inv, self.m)

    # -- application (host side, numpy) ------------------------------------
    def apply_point(self, p):
        p = np.asarray(p, np.float64)
        r = p @ self.m[:3, :3].T + self.m[:3, 3]
        return r

    def apply_vector(self, v):
        return np.asarray(v, np.float64) @ self.m[:3, :3].T

    def apply_normal(self, n):
        return np.asarray(n, np.float64) @ self.inv[:3, :3]

    @property
    def has_scale(self) -> bool:
        R = self.m[:3, :3]
        g = R.T @ R
        return not np.allclose(g, np.eye(3) * g[0, 0], atol=1e-8)

    def det3(self) -> float:
        return float(np.linalg.det(self.m[:3, :3]))

    def __repr__(self):
        return f"Transform({self.m.tolist()})"


# -- device-side application over batches ----------------------------------

def xform_point(m: jax.Array, p: jax.Array) -> jax.Array:
    """Apply (4,4) matrix to points (..., 3)."""
    return p @ m[:3, :3].T + m[:3, 3]


def xform_vector(m: jax.Array, v: jax.Array) -> jax.Array:
    return v @ m[:3, :3].T


def xform_normal(m_inv: jax.Array, n: jax.Array) -> jax.Array:
    return n @ m_inv[:3, :3]
