"""Intersection correctness: BVH traversal vs brute force on random scenes
(the analog of the reference ``src/tests/test_kd.cpp``), plus analytic prims
and mesh loaders."""
import os
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_im_tpu.accel import bvh as bvh_mod
from mitsuba_im_tpu.accel import intersect as isect
from mitsuba_im_tpu.scene import geometry as geo
from mitsuba_im_tpu.scene import mesh as mesh_mod


def random_tri_soup(n, rng, scale=1.0):
    p0 = rng.uniform(-1, 1, (n, 3)) * scale
    e1 = rng.uniform(-0.3, 0.3, (n, 3)) * scale
    e2 = rng.uniform(-0.3, 0.3, (n, 3)) * scale
    return p0.astype(np.float32), e1.astype(np.float32), e2.astype(np.float32)


def make_geom(p0, e1, e2):
    n = len(p0)
    z3 = np.zeros((n, 3), np.float32)
    nrm = np.cross(e1, e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    return geo.make_geometry(
        dict(
            p0=p0, e1=e1, e2=e2, n0=nrm, n1=nrm, n2=nrm,
            uv0=np.zeros((n, 2), np.float32), uv1=np.zeros((n, 2), np.float32),
            uv2=np.zeros((n, 2), np.float32),
            shape=np.arange(n, dtype=np.int32) % 7,
        ),
        None,
        None,
    )


class TestBruteForce:
    @pytest.mark.slow
    def test_single_triangle(self):
        g = make_geom(
            np.array([[0, 0, 0]], np.float32),
            np.array([[1, 0, 0]], np.float32),
            np.array([[0, 1, 0]], np.float32),
        )
        o = jnp.asarray([[0.25, 0.25, -1.0], [2.0, 2.0, -1.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        h = isect.intersect(g, o, d, 1e-4, 1e30)
        assert bool(h.valid[0]) and not bool(h.valid[1])
        np.testing.assert_allclose(float(h.t[0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(float(h.u[0]), 0.25, atol=1e-5)

    @pytest.mark.slow
    def test_sphere(self):
        g = geo.make_geometry(
            None,
            dict(
                center=np.array([[0, 0, 0]], np.float32),
                radius=np.array([1.0], np.float32),
                shape=np.array([3], np.int32),
            ),
            None,
        )
        o = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 2.0, -3.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        h = isect.intersect(g, o, d, 1e-4, 1e30)
        assert bool(h.valid[0]) and not bool(h.valid[1])
        np.testing.assert_allclose(float(h.t[0]), 2.0, atol=1e-5)
        it = geo.compute_interaction(g, o, d, h)
        np.testing.assert_allclose(np.asarray(it.ng[0]), [0, 0, -1], atol=1e-5)
        # ray origin inside sphere picks far root
        o2 = jnp.asarray([[0.0, 0.0, 0.0]])
        d2 = jnp.asarray([[0.0, 0.0, 1.0]])
        h2 = isect.intersect(g, o2, d2, 1e-4, 1e30)
        np.testing.assert_allclose(float(h2.t[0]), 1.0, atol=1e-5)

    def test_disk(self):
        g = geo.make_geometry(
            None,
            None,
            dict(
                center=np.array([[0, 0, 2]], np.float32),
                n=np.array([[0, 0, -1]], np.float32),
                s=np.array([[1, 0, 0]], np.float32),
                t=np.array([[0, 1, 0]], np.float32),
                radius=np.array([0.5], np.float32),
                shape=np.array([1], np.int32),
            ),
        )
        o = jnp.asarray([[0.1, 0.0, 0.0], [0.9, 0.0, 0.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        h = isect.intersect(g, o, d, 1e-4, 1e30)
        assert bool(h.valid[0]) and not bool(h.valid[1])


class TestBVH:
    @pytest.mark.parametrize("n_tris", [33, 600])
    def test_matches_brute_force(self, rng, n_tris):
        p0, e1, e2 = random_tri_soup(n_tris, rng)
        g = make_geom(p0, e1, e2)
        lo, hi = bvh_mod.tri_bounds(p0, e1, e2)
        bvh = bvh_mod.build_bvh(lo, hi)

        n_rays = 256
        o = jnp.asarray(rng.uniform(-2, 2, (n_rays, 3)), jnp.float32)
        d = jnp.asarray(rng.normal(size=(n_rays, 3)), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

        hb = isect.intersect_brute(g, o, d, 1e-4, 1e30)
        st = isect.intersect_bvh(bvh, g, o, d, 1e-4, jnp.full((n_rays,), 1e30))

        np.testing.assert_array_equal(
            np.asarray(hb.kind == geo.KIND_TRI), np.asarray(st["found"])
        )
        mask = np.asarray(st["found"])
        np.testing.assert_allclose(
            np.asarray(hb.t)[mask], np.asarray(st["t"])[mask], rtol=1e-4
        )

    @pytest.mark.slow
    def test_occlusion_matches(self, rng):
        p0, e1, e2 = random_tri_soup(200, rng)
        g = make_geom(p0, e1, e2)
        lo, hi = bvh_mod.tri_bounds(p0, e1, e2)
        bvh = bvh_mod.build_bvh(lo, hi)
        n_rays = 128
        o = jnp.asarray(rng.uniform(-2, 2, (n_rays, 3)), jnp.float32)
        d = jnp.asarray(rng.normal(size=(n_rays, 3)), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        occ_brute = isect.occluded(g, o, d, 1e-4, 10.0)
        occ_bvh = isect.occluded(g, o, d, 1e-4, 10.0, bvh=bvh)
        np.testing.assert_array_equal(np.asarray(occ_brute), np.asarray(occ_bvh))

    def test_native_builder_used(self):
        from mitsuba_im_tpu.accel.native import load_native

        assert load_native() is not None, "native BVH builder failed to build"


class TestMeshIO:
    def test_obj_roundtrip(self):
        content = """
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vn 0 0 1
vt 0 0
vt 1 0
vt 0 1
vt 1 1
f 1/1/1 2/2/1 4/4/1 3/3/1
"""
        with tempfile.NamedTemporaryFile("w", suffix=".obj", delete=False) as f:
            f.write(content)
            path = f.name
        mesh = mesh_mod.load_obj(path)
        os.unlink(path)
        assert mesh.n_triangles == 2  # quad fan-triangulated
        assert mesh.n_vertices == 4
        assert mesh.normals is not None and mesh.uvs is not None

    def test_serialized_roundtrip(self, rng):
        mesh = mesh_mod.TriMesh(
            positions=rng.uniform(-1, 1, (10, 3)),
            indices=rng.integers(0, 10, (5, 3)),
            uvs=rng.uniform(0, 1, (10, 2)),
        ).compute_normals()
        with tempfile.NamedTemporaryFile(suffix=".serialized", delete=False) as f:
            path = f.name
        mesh_mod.save_serialized(path, mesh)
        back = mesh_mod.load_serialized(path)
        os.unlink(path)
        np.testing.assert_allclose(back.positions, mesh.positions, atol=1e-6)
        np.testing.assert_array_equal(back.indices, mesh.indices)
        np.testing.assert_allclose(back.uvs, mesh.uvs, atol=1e-6)

    def test_reference_bunny_ply(self):
        path = "/root/reference/data/tests/bunny.ply"
        if not os.path.exists(path):
            pytest.skip("reference bunny not present")
        mesh = mesh_mod.load_ply(path)
        assert mesh.n_triangles > 1000
        assert np.isfinite(mesh.positions).all()
