"""Core numerics: brent/spline/quadrature/vMF/SH/track (the reference's
test_quad.cpp, test_sh.cpp, test_la.cpp analogs, SURVEY.md §4)."""
import numpy as np
import jax.numpy as jnp
import pytest

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class TestBrent:
    def test_root(self):
        from mitsuba_im_tpu.core.numerics import brent

        x, ok = brent(lambda x: x ** 3 - 2.0, 0.0, 2.0)
        assert ok and abs(x - 2 ** (1 / 3)) < 1e-8

    def test_bisect_vec(self):
        from mitsuba_im_tpu.core.numerics import bisect_vec

        target = jnp.asarray([0.3, 1.7, 2.9])
        x = bisect_vec(lambda m: m - target, jnp.zeros(3), jnp.full(3, 4.0))
        np.testing.assert_allclose(np.asarray(x), np.asarray(target),
                                   atol=1e-5)


class TestSpline:
    def test_interpolates_nodes(self):
        from mitsuba_im_tpu.core.numerics import eval_spline_1d

        nx = np.linspace(0, 1, 9)
        vals = np.sin(nx * 4)
        y = eval_spline_1d(nx, vals, jnp.asarray(nx, jnp.float32))
        np.testing.assert_allclose(np.asarray(y), vals, atol=1e-5)

    def test_sample_matches_pdf(self):
        from mitsuba_im_tpu.core.numerics import sample_spline_cdf

        nx = np.linspace(0, 2, 17)
        pdf = nx  # linear ramp
        u = jnp.linspace(0.01, 0.99, 4096)
        x, p = sample_spline_cdf(nx, pdf, u)
        # ramp pdf on [0,2]: E[x] = 4/3
        assert abs(float(jnp.mean(x)) - 4.0 / 3.0) < 0.02


class TestQuadrature:
    def test_gauss_legendre_exact(self):
        from mitsuba_im_tpu.core.numerics import gauss_legendre

        x, w = gauss_legendre(8)
        # exact for x^14
        val = np.sum(w * x ** 14)
        assert abs(val - 2.0 / 15.0) < 1e-12

    def test_gauss_lobatto_endpoints(self):
        from mitsuba_im_tpu.core.numerics import gauss_lobatto

        x, w = gauss_lobatto(7)
        assert x[0] == -1.0 and x[-1] == 1.0
        assert abs(np.sum(w) - 2.0) < 1e-12
        assert abs(np.sum(w * x ** 10) - 2.0 / 11.0) < 1e-12

    def test_adaptive(self):
        from mitsuba_im_tpu.core.numerics import integrate_adaptive

        val = integrate_adaptive(np.sin, 0.0, np.pi)
        assert abs(val - 2.0) < 1e-7


class TestVMF:
    def test_pdf_normalized(self):
        from mitsuba_im_tpu.core.numerics import vmf_pdf

        for kappa in (0.5, 5.0, 50.0):
            ct = np.linspace(-1, 1, 20001)
            p = np.asarray(vmf_pdf(jnp.asarray(ct), kappa))
            integral = 2 * np.pi * np.trapezoid(p, ct)
            assert abs(integral - 1.0) < 1e-3

    def test_sample_mean_cosine(self):
        from mitsuba_im_tpu.core.numerics import vmf_pdf, vmf_sample

        rng = np.random.default_rng(0)
        kappa = 8.0
        d = vmf_sample(jnp.asarray(rng.uniform(size=20000), jnp.float32),
                       jnp.asarray(rng.uniform(size=20000), jnp.float32),
                       kappa)
        mean_c = float(jnp.mean(d[..., 2]))
        expect = 1.0 / np.tanh(kappa) - 1.0 / kappa
        assert abs(mean_c - expect) < 0.01


class TestSH:
    @pytest.mark.slow
    def test_project_reconstruct(self):
        from mitsuba_im_tpu.core.sh import project_function, eval_sh

        fn = lambda d: 1.0 + d[..., 2] + 0.5 * (3 * d[..., 2] ** 2 - 1)
        c = project_function(fn, n_bands=3, res=64)
        rng = np.random.default_rng(1)
        v = rng.normal(size=(64, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        got = np.asarray(eval_sh(c, jnp.asarray(v, jnp.float32)))
        want = np.asarray(fn(jnp.asarray(v, jnp.float32)))
        np.testing.assert_allclose(got, want, atol=5e-3)

    def test_rotate_z_invariance(self):
        from mitsuba_im_tpu.core.sh import project_function, eval_sh, rotate_z

        fn = lambda d: jnp.maximum(d[..., 0], 0.0) ** 2
        c = project_function(fn, n_bands=4, res=64)
        ang = 0.7
        c_rot = rotate_z(np.asarray(c), ang)
        d = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.3]])
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        # rotating the coefficients == evaluating at inverse-rotated dirs
        ca, sa = np.cos(ang), np.sin(ang)
        R = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1.0]])
        got = np.asarray(eval_sh(jnp.asarray(c_rot), jnp.asarray(d, jnp.float32)))
        want = np.asarray(eval_sh(c, jnp.asarray(d @ R, jnp.float32)))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestTrack:
    def test_animated_transform_lerp_slerp(self):
        from mitsuba_im_tpu.core.track import AnimatedTransform
        from mitsuba_im_tpu.core.transform import Transform

        t0 = Transform.translate([0, 0, 0]) @ Transform.rotate([0, 0, 1], 0)
        t1 = Transform.translate([2, 0, 0]) @ Transform.rotate([0, 0, 1], 90)
        anim = AnimatedTransform([0.0, 1.0], [t0, t1])
        mid = anim.eval(0.5)
        np.testing.assert_allclose(mid.m[:3, 3], [1, 0, 0], atol=1e-12)
        # slerp of a 90-degree z-rotation at t=0.5 is 45 degrees
        p = mid.apply_point([1, 0, 0])
        np.testing.assert_allclose(p, [1 + np.sqrt(0.5), np.sqrt(0.5), 0],
                                   atol=1e-6)

    def test_endpoint_clamp(self):
        from mitsuba_im_tpu.core.track import AnimationTrack

        tr = AnimationTrack([0.0, 1.0], [[0.0], [4.0]])
        assert tr.eval(-1)[0] == 0.0
        assert tr.eval(2)[0] == 4.0
        assert abs(tr.eval(0.25)[0] - 1.0) < 1e-12


class TestConfigurator:
    def test_extract_parameters(self):
        from mitsuba_im_tpu.interactive.configurator import extract_parameters

        params = extract_parameters("integrator", "path")
        assert "maxDepth" in params and params["maxDepth"]["default"] == -1
        assert "rrDepth" in params

    def test_dropdowns_and_diff(self):
        from mitsuba_im_tpu.interactive.configurator import SceneConfigurator
        from mitsuba_im_tpu.scene.build import RenderSettings

        cfg = SceneConfigurator(RenderSettings())
        assert "pssmlt" in cfg.available("integrator")
        assert "sobol" in cfg.available("sampler")
        cfg.stage_integrator("path", maxDepth=4, rrDepth=5)
        d = cfg.diff()
        # rrDepth=5 equals the default -> dropped from the minimal set
        assert d["integrator"] == {"name": "path", "maxDepth": 4}

    def test_apply_to_settings(self):
        from mitsuba_im_tpu.interactive.configurator import SceneConfigurator
        from mitsuba_im_tpu.scene.build import RenderSettings

        cfg = SceneConfigurator(RenderSettings())
        cfg.stage_integrator("direct", emitterSamples=2)
        cfg.stage_spp(8)
        s = cfg.apply()
        assert s.integrator == "direct"
        assert s.integrator_props["emitter_samples"] == 2
        assert s.spp == 8


class TestMotionAOV:
    def test_zero_motion_static(self):
        from __graft_entry__ import _tiny_cornell
        from mitsuba_im_tpu.render.job import render

        scene, settings = _tiny_cornell()
        settings.width = settings.height = 16
        settings.integrator = "motion"
        settings.integrator_props = {}
        img = render(scene, settings, spp=1)
        # static sensor: dx=dy=0 everywhere, depth > 0 where hit
        assert np.allclose(img[..., 0], 0) and np.allclose(img[..., 1], 0)
        assert img[..., 2].max() > 0

    def test_translated_camera_motion(self):
        from __graft_entry__ import _tiny_cornell
        from mitsuba_im_tpu.render.job import render

        scene, settings = _tiny_cornell()
        settings.width = settings.height = 16
        settings.integrator = "motion"
        prev = np.asarray(scene.sensor.to_world)
        prev = prev.copy()
        prev[0, 3] += 0.1  # camera was 0.1 to the +x
        settings.integrator_props = {"prev_to_world": prev}
        img = render(scene, settings, spp=1)
        assert np.abs(img[..., 0]).max() > 0.1  # horizontal motion present
