"""Two-level cluster hierarchy: cross-validation against brute force / BVH
on random soups and the reference bunny (instanced geometry is covered in
test_instancing.py; the 1.1M-triangle regime in test_large_scene.py)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_im_tpu.accel import hierarchy as hy
from mitsuba_im_tpu.accel import intersect as isect
from mitsuba_im_tpu.scene import geometry as geo

from test_intersect import random_tri_soup, make_geom


def _rand_rays(rng, n, lo=-2, hi=2):
    o = jnp.asarray(rng.uniform(lo, hi, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    return o, d / jnp.linalg.norm(d, axis=1, keepdims=True)


@pytest.mark.quick
class TestHierarchy:
    @pytest.mark.parametrize("n_tris", [
        pytest.param(70, marks=pytest.mark.slow), 700, 9000,
    ])
    def test_matches_brute_force(self, rng, n_tris):
        p0, e1, e2 = random_tri_soup(n_tris, rng)
        g = make_geom(p0, e1, e2)
        h = hy.build_hierarchy(p0, e1, e2)
        assert h.n_supers >= 1

        o, d = _rand_rays(rng, 512)
        hb = isect.intersect_brute(g, o, d, 1e-4, 1e30)
        st = hy.intersect_hierarchy(h, o, d, 1e-4, 1e30)

        hitb = np.asarray(hb.kind == geo.KIND_TRI)
        np.testing.assert_array_equal(hitb, np.asarray(st["found"]))
        m = hitb
        np.testing.assert_allclose(
            np.asarray(st["t"])[m], np.asarray(hb.t)[m], rtol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(st["prim"])[m], np.asarray(hb.prim)[m])

    @pytest.mark.slow
    def test_tail_refill_driver(self, rng):
        """Force the large-N compaction driver (front < N) and compare with
        the lockstep path and brute force."""
        p0, e1, e2 = random_tri_soup(5000, rng)
        g = make_geom(p0, e1, e2)
        h = hy.build_hierarchy(p0, e1, e2)
        o, d = _rand_rays(rng, 1024)
        hb = isect.intersect_brute(g, o, d, 1e-4, 1e30)
        st = hy.intersect_hierarchy(h, o, d, 1e-4, 1e30,
                                    front=128, k_inner=3)
        hitb = np.asarray(hb.kind == geo.KIND_TRI)
        np.testing.assert_array_equal(hitb, np.asarray(st["found"]))
        m = hitb
        np.testing.assert_allclose(
            np.asarray(st["t"])[m], np.asarray(hb.t)[m], rtol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(st["prim"])[m], np.asarray(hb.prim)[m])
        # any-hit through the same driver
        occ_b = np.asarray(isect.intersect_brute(g, o, d, 1e-4, 5.0).kind
                           != geo.KIND_NONE)
        sta = hy.intersect_hierarchy(h, o, d, 1e-4, 5.0, any_hit=True,
                                     front=128, k_inner=3)
        np.testing.assert_array_equal(occ_b, np.asarray(sta["found"]))

    @pytest.mark.slow
    def test_active_mask(self, rng):
        """Masked-off lanes retire with no-hit results at zero cost."""
        p0, e1, e2 = random_tri_soup(3000, rng)
        h = hy.build_hierarchy(p0, e1, e2)
        o, d = _rand_rays(rng, 512)
        act = jnp.asarray(rng.uniform(size=512) < 0.5)
        st_all = hy.intersect_hierarchy(h, o, d, 1e-4, 1e30)
        st_m = hy.intersect_hierarchy(h, o, d, 1e-4, 1e30, active=act)
        am = np.asarray(act)
        np.testing.assert_array_equal(
            np.asarray(st_m["found"])[am], np.asarray(st_all["found"])[am])
        assert not np.asarray(st_m["found"])[~am].any()
        # and through the refill driver
        st_m2 = hy.intersect_hierarchy(h, o, d, 1e-4, 1e30, active=act,
                                       front=128, k_inner=2)
        np.testing.assert_array_equal(
            np.asarray(st_m2["found"])[am], np.asarray(st_all["found"])[am])
        np.testing.assert_allclose(
            np.asarray(st_m2["t"])[am & np.asarray(st_all["found"])],
            np.asarray(st_all["t"])[am & np.asarray(st_all["found"])],
            rtol=1e-5)

    @pytest.mark.slow
    def test_anyhit(self, rng):
        p0, e1, e2 = random_tri_soup(3000, rng)
        g = make_geom(p0, e1, e2)
        h = hy.build_hierarchy(p0, e1, e2)
        o, d = _rand_rays(rng, 256)
        occ_b = np.asarray(isect.intersect_brute(g, o, d, 1e-4, 10.0).kind
                           != geo.KIND_NONE)
        st = hy.intersect_hierarchy(h, o, d, 1e-4, 10.0, any_hit=True)
        np.testing.assert_array_equal(occ_b, np.asarray(st["found"]))

    @pytest.mark.slow
    def test_bunny(self, rng):
        path = "/root/reference/data/tests/bunny.ply"
        if not os.path.exists(path):
            pytest.skip("no bunny")
        from mitsuba_im_tpu.scene.mesh import load_ply

        mesh = load_ply(path)
        p = mesh.positions
        i = mesh.indices
        p0 = p[i[:, 0]].astype(np.float32)
        e1 = (p[i[:, 1]] - p[i[:, 0]]).astype(np.float32)
        e2 = (p[i[:, 2]] - p[i[:, 0]]).astype(np.float32)
        h = hy.build_hierarchy(p0, e1, e2)
        g = make_geom(p0, e1, e2)

        n_rays = 128
        c = p.mean(0)
        o = jnp.asarray(c + rng.uniform(-0.2, 0.2, (n_rays, 3)), jnp.float32)
        d = jnp.asarray(rng.normal(size=(n_rays, 3)), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

        from mitsuba_im_tpu.accel import bvh as bvh_mod

        lo, hi = bvh_mod.tri_bounds(p0, e1, e2)
        bvh = bvh_mod.build_bvh(lo, hi)
        st_bvh = isect.intersect_bvh(bvh, g, o, d, 1e-5,
                                     jnp.full((n_rays,), 1e30))
        st_h = hy.intersect_hierarchy(h, o, d, 1e-5, 1e30)
        np.testing.assert_array_equal(
            np.asarray(st_bvh["found"]), np.asarray(st_h["found"]))
        m = np.asarray(st_bvh["found"])
        np.testing.assert_allclose(
            np.asarray(st_h["t"])[m], np.asarray(st_bvh["t"])[m], rtol=1e-4)


@pytest.mark.quick
class TestMotionHierarchy:
    """Deformable two-keyframe hierarchy (sahkdtree4.h:113 regime): union
    AABBs over the shutter + per-pass lerped block tables."""

    def _soup_pair(self, rng, n):
        p0, e1, e2 = random_tri_soup(n, rng)
        # frame 1: swirl + translate the soup
        q0 = p0 + 0.3 * np.sin(p0[:, ::-1] * 3.0) + np.array([0.2, -0.1, 0.15])
        f1 = e1 * 1.1
        f2 = e2 * 0.9
        return (p0, e1, e2), (q0.astype(np.float32), f1, f2)

    @pytest.mark.parametrize("t", [
        pytest.param(0.0, marks=pytest.mark.slow),
        0.37, 1.0,
    ])
    def test_matches_lerped_brute(self, rng, t):
        (p0, e1, e2), (q0, f1, f2) = self._soup_pair(rng, 4000)
        h = hy.build_hierarchy_motion(p0, e1, e2, q0, f1, f2)
        assert h.has_motion
        h = h.replace(time=jnp.asarray(t, jnp.float32))
        # lerped soup ground truth
        L = lambda a, b: a + (b - a) * np.float32(t)
        g = make_geom(L(p0, q0), L(e1, f1), L(e2, f2))
        o, d = _rand_rays(rng, 768)
        hb = isect.intersect_brute(g, o, d, 1e-4, 1e30)
        st = hy.intersect_hierarchy(h, o, d, 1e-4, 1e30)
        hitb = np.asarray(hb.kind == geo.KIND_TRI)
        np.testing.assert_array_equal(hitb, np.asarray(st["found"]))
        m = hitb
        np.testing.assert_allclose(
            np.asarray(st["t"])[m], np.asarray(hb.t)[m], rtol=2e-4,
            atol=1e-5)
        occ_b = np.asarray(isect.intersect_brute(g, o, d, 1e-4, 6.0).kind
                           != geo.KIND_NONE)
        sta = hy.intersect_hierarchy(h, o, d, 1e-4, 6.0, any_hit=True)
        np.testing.assert_array_equal(occ_b, np.asarray(sta["found"]))
