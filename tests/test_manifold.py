"""Specular manifold walk tests (libbidir manifold.h / mut_manifold.cpp
analog).

Validation strategy mirrors the reference's path verification idea
(src/libbidir/verification.cpp): after the walk, re-evaluate the specular
constraints from scratch and require them to vanish; where an analytic
solution exists (planar mirror, flat dielectric interface) compare the
converged vertex against it.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_im_tpu.scene.build import SceneBuilder
from mitsuba_im_tpu.scene.mesh import TriMesh
from mitsuba_im_tpu.bsdf import common as bc
from mitsuba_im_tpu.bidir import manifold as mf


def _plane_scene(y=0.0, ny=1.0, half=50.0):
    b = SceneBuilder()
    sid = b.new_shape(b.default_bsdf())
    pts = np.array([[-half, y, -half], [half, y, -half],
                    [half, y, half], [-half, y, half]])
    order = [[0, 1, 2], [2, 3, 0]] if ny > 0 else [[0, 2, 1], [2, 0, 3]]
    m = TriMesh(pts, np.array(order))
    m.normals = np.tile([[0.0, ny, 0.0]], (4, 1))
    m.uvs = np.zeros((4, 2))
    b.add_trimesh(m, sid)
    return b


def test_mirror_reflection_point():
    """K=1 mirror chain: the walk must land on the analytic reflection
    point of a planar mirror (image method)."""
    scene, _ = _plane_scene().build()

    start = jnp.array([[-0.5, 1.0, 0.0]] * 3)
    target = jnp.array([[0.7, 1.0, 0.0],
                        [0.7, 2.0, 0.3],
                        [-0.5, 1.0, 0.4]])
    # analytic: x* divides the segment per equal-angle (image) rule
    def analytic(s, tgt):
        # reflect target across plane y=0, intersect line s->tgt' with plane
        tp = np.array([tgt[0], -tgt[1], tgt[2]])
        lam = s[1] / (s[1] - tp[1])
        return s + lam * (tp - s)

    init = jnp.array([[[-0.3, 0.0, 0.2]]] * 3)  # deliberately wrong guess
    eta = jnp.ones((3, 1))
    p, n, s, conv = mf.manifold_walk(scene, start, init, target, eta,
                                     n_iter=20)
    assert bool(conv.all()), np.asarray(conv)
    for i in range(3):
        expect = analytic(np.asarray(start[i]), np.asarray(target[i]))
        np.testing.assert_allclose(np.asarray(p[i, 0]), expect, atol=1e-4)
    assert bool(mf.reflection_constraint_ok(start, p, target, n, eta).all())


def test_refraction_snell():
    """K=1 refractive vertex on a flat interface: converged point must
    satisfy Snell's law between the two segments."""
    scene, _ = _plane_scene().build()
    eta_v = 1.5

    start = jnp.array([[0.0, 1.0, 0.0]] * 2)
    target = jnp.array([[0.8, -1.0, 0.0], [0.5, -2.0, 0.1]])
    init = jnp.array([[[0.6, 0.0, 0.0]], [[0.05, 0.0, 0.05]]])
    eta = jnp.full((2, 1), eta_v)
    p, n, s, conv = mf.manifold_walk(scene, start, init, target, eta,
                                     n_iter=30)
    assert bool(conv.all()), np.asarray(conv)

    for i in range(2):
        x = np.asarray(p[i, 0])
        wi = np.asarray(start[i]) - x
        wo = np.asarray(target[i]) - x
        sin_i = np.linalg.norm(wi[[0, 2]]) / np.linalg.norm(wi)
        sin_o = np.linalg.norm(wo[[0, 2]]) / np.linalg.norm(wo)
        # generalized half-vector h = wi + eta*wo vanishing tangentially
        # is Snell with sin_i = eta * sin_o for this orientation
        np.testing.assert_allclose(sin_i, eta_v * sin_o, atol=1e-4)


def test_two_bounce_mirror_chain():
    """K=2 chain between two parallel mirrors; verify via constraint
    re-evaluation and the image method (double reflection)."""
    b = _plane_scene(y=0.0, ny=1.0)
    # add a downward-facing mirror at y=2
    sid = b.new_shape(b.default_bsdf())
    half = 50.0
    pts = np.array([[-half, 2.0, -half], [half, 2.0, -half],
                    [half, 2.0, half], [-half, 2.0, half]])
    m = TriMesh(pts, np.array([[0, 2, 1], [2, 0, 3]]))
    m.normals = np.tile([[0.0, -1.0, 0.0]], (4, 1))
    m.uvs = np.zeros((4, 2))
    b.add_trimesh(m, sid)
    scene, _ = b.build()

    start = jnp.array([[-1.0, 1.2, 0.0]])
    target = jnp.array([[1.4, 1.0, 0.0]])
    # image method: reflect target across y=2 then across y=0:
    # t' = (1.4, 3.0, 0) ; t'' = (1.4, -3.0, 0); line start->t'' hits y=0
    s = np.array([-1.0, 1.2, 0.0])
    t2 = np.array([1.4, -3.0, 0.0])
    lam0 = s[1] / (s[1] - t2[1])
    x0 = s + lam0 * (t2 - s)                      # bottom-mirror vertex
    d01 = np.array([t2[0] - x0[0], 3.0 - 0.0, t2[2] - x0[2]])
    lam1 = 2.0 / d01[1]
    x1 = x0 + lam1 * d01                          # top-mirror vertex

    init = jnp.array([[[-0.4, 0.0, 0.1], [0.6, 2.0, -0.1]]])
    eta = jnp.ones((1, 2))
    p, n, sh, conv = mf.manifold_walk(scene, start, init, target, eta,
                                      n_iter=30)
    assert bool(conv.all())
    np.testing.assert_allclose(np.asarray(p[0, 0]), x0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p[0, 1]), x1, atol=1e-4)
    assert bool(mf.reflection_constraint_ok(start, p, target, n, eta).all())


class TestManifoldMapDeterminant:
    """The manifold-map Jacobian/determinant — the transition-density
    ingredient of the reference's manifold mutation (mut_manifold.cpp's
    ``det`` via SpecularManifold): verified against the analytic planar
    mirror map, against finite differences of the actual Newton walk,
    and for the reciprocity that makes a Q built from it satisfy
    detailed balance."""

    def _setup(self):
        start = jnp.array([-0.5, 1.0, 0.1])
        target = jnp.array([0.7, 1.3, -0.2])

        def analytic_x1(tgt):
            tp = np.array([tgt[0], -tgt[1], tgt[2]])
            s = np.asarray(start)
            lam = s[1] / (s[1] - tp[1])
            return s + lam * (tp - s)

        x1 = jnp.asarray(analytic_x1(np.asarray(target)))
        normals = jnp.array([[0.0, 1.0, 0.0]])
        eta = jnp.ones((1,))
        return start, x1[None, :], target, normals, eta, analytic_x1

    def test_jacobian_matches_analytic_planar_map(self):
        start, pos, target, normals, eta, analytic_x1 = self._setup()
        tdir = np.asarray(target - start)
        tdir = tdir / np.linalg.norm(tdir)
        tf = mf._tangent_frame(jnp.asarray(tdir))
        J2, _ = mf.manifold_map_jacobian(start, pos, target, normals, eta,
                                         target_frame=(tf[0], tf[1]))
        # finite differences of the ANALYTIC map, projected on the mirror
        # tangent plane (x, z)
        eps = 1e-4
        cols = []
        for axis in (np.asarray(tf[0]), np.asarray(tf[1])):
            xp = analytic_x1(np.asarray(target) + eps * axis)
            xm = analytic_x1(np.asarray(target) - eps * axis)
            d = (xp - xm) / (2 * eps)
            cols.append([d[0], d[2]])  # mirror tangent = x, z axes
        J_fd = np.array(cols).T
        # manifold_map_jacobian's vertex tangent frame comes from
        # _tangent_frame(normal); for n=+y that frame spans the plane but
        # may be a rotation of (x, z) — compare determinants (the Q
        # ingredient) and singular values (frame-invariant)
        det_an = abs(np.linalg.det(J_fd))
        det_mf = float(mf.manifold_map_det(start, pos, target, normals,
                                           eta, target_frame=(tf[0], tf[1])))
        np.testing.assert_allclose(det_mf, det_an, rtol=5e-3)
        sv_an = np.sort(np.linalg.svd(J_fd, compute_uv=False))
        sv_mf = np.sort(np.linalg.svd(np.asarray(J2), compute_uv=False))
        np.testing.assert_allclose(sv_mf, sv_an, rtol=5e-3)

    def test_jacobian_matches_newton_walk_fd(self):
        """Finite differences THROUGH the actual scene walk agree with the
        implicit-function-theorem Jacobian."""
        scene, _ = _plane_scene().build()
        start, pos, target, normals, eta, _ = self._setup()
        tdir = np.asarray(target - start)
        tdir = tdir / np.linalg.norm(tdir)
        tf = mf._tangent_frame(jnp.asarray(tdir))
        _, J_full = mf.manifold_map_jacobian(start, pos, target, normals,
                                             eta, target_frame=(tf[0], tf[1]))

        eps = 3e-4
        cols = []
        for axis in (np.asarray(tf[0]), np.asarray(tf[1])):
            outs = []
            for sgn in (1.0, -1.0):
                tgt = jnp.asarray(np.asarray(target) + sgn * eps * axis)
                p, n, s, conv = mf.manifold_walk(
                    scene, start[None], pos[None], tgt[None],
                    eta[None], n_iter=16)
                assert bool(conv.all())
                outs.append(np.asarray(p[0, 0]))
            cols.append((outs[0] - outs[1]) / (2 * eps))
        # compare displacement magnitudes per axis (frame-invariant):
        # J_full rows are in the vertex tangent frame
        for k, d in enumerate(cols):
            np.testing.assert_allclose(
                np.linalg.norm(np.asarray(J_full)[:2, k]),
                np.linalg.norm(d), rtol=2e-2)

    def test_reciprocity_for_detailed_balance(self):
        """det(forward map) * det(inverse map at the mapped point) == 1:
        the property that lets Q(fwd)/Q(rev) built from the manifold map
        cancel correctly in the Metropolis ratio."""
        start, pos, target, normals, eta, analytic_x1 = self._setup()
        tdir = np.array(target - start)
        tdir = tdir / np.linalg.norm(tdir)
        tf = mf._tangent_frame(jnp.asarray(tdir))
        J2, _ = mf.manifold_map_jacobian(start, pos, target, normals, eta,
                                         target_frame=(tf[0], tf[1]))
        det_f = float(mf.manifold_map_det(start, pos, target, normals, eta,
                                          target_frame=(tf[0], tf[1])))
        # the inverse map: how does the TARGET move as the first vertex
        # moves, along the same constraint manifold?  For the planar
        # mirror the analytic map target -> x1 is affine and invertible;
        # its inverse Jacobian determinant must be the reciprocal.
        J2_np = np.asarray(J2)
        det_inv = abs(np.linalg.det(np.linalg.inv(J2_np)))
        np.testing.assert_allclose(det_f * det_inv, 1.0, rtol=1e-4)
        assert det_f > 0
