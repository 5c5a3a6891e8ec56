"""Subsurface dipole: profile properties + end-to-end render
(src/subsurface/dipole.cpp capability, SURVEY.md §2.5)."""
import textwrap

import numpy as np
import jax.numpy as jnp
import pytest

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class TestDipoleProfile:
    def test_rd_integral_matches_closed_form(self):
        """Integral of Rd over the plane equals the analytic diffuse albedo
        (validates zr/zv/sigma_tr bookkeeping end to end)."""
        from mitsuba_im_tpu.subsurface import (dipole_coeffs, rd_profile,
                                               total_diffuse_reflectance)

        sigma_s, sigma_a, g, eta = np.array([1.0]), np.array([0.05]), 0.0, 1.3
        c = dipole_coeffs(sigma_s, sigma_a, g, eta)
        r = np.linspace(1e-4, 80.0, 400001)
        rd = np.asarray(rd_profile(
            jnp.asarray(r * r, jnp.float32),
            jnp.asarray(c["sigma_tr"], jnp.float32),
            jnp.asarray(c["zr"], jnp.float32),
            jnp.asarray(c["zv"], jnp.float32),
            jnp.asarray(c["alpha_p"], jnp.float32)))[:, 0]
        integral = 2 * np.pi * np.trapezoid(rd * r, r)
        fdr = c["fdr"]
        A = (1 + fdr) / (1 - fdr)
        want = total_diffuse_reflectance(c["alpha_p"], A)[0]
        assert abs(integral - want) / want < 0.01

    def test_decay_monotone(self):
        from mitsuba_im_tpu.subsurface import dipole_coeffs, rd_profile

        c = dipole_coeffs(np.ones(3) * 2.0, np.ones(3) * 0.02, 0.0, 1.5)
        r2 = jnp.asarray([0.01, 0.1, 1.0, 4.0], jnp.float32)
        rd = np.asarray(rd_profile(
            r2, jnp.asarray(c["sigma_tr"], jnp.float32),
            jnp.asarray(c["zr"], jnp.float32),
            jnp.asarray(c["zv"], jnp.float32),
            jnp.asarray(c["alpha_p"], jnp.float32)))
        assert np.all(np.diff(rd[:, 0]) < 0)


class TestDipoleRender:
    def test_translucent_sphere(self):
        from mitsuba_im_tpu.render.job import render
        from mitsuba_im_tpu.scene.xml import load_scene
        import tempfile

        xml = textwrap.dedent("""\
        <scene version="0.6.0">
            <integrator type="path"><integer name="maxDepth" value="4"/></integrator>
            <sensor type="perspective">
                <float name="fov" value="40"/>
                <transform name="toWorld">
                    <lookat origin="0, 0.6, 3" target="0, 0.4, 0" up="0, 1, 0"/>
                </transform>
                <film type="hdrfilm">
                    <integer name="width" value="24"/>
                    <integer name="height" value="24"/>
                </film>
            </sensor>
            <shape type="rectangle">
                <transform name="toWorld"><rotate x="1" angle="-90"/><scale value="4"/></transform>
                <bsdf type="diffuse"/>
            </shape>
            <shape type="cube">
                <transform name="toWorld"><scale value="0.4"/><translate y="0.4"/></transform>
                <bsdf type="null"/>
                <subsurface type="dipole">
                    <rgb name="sigmaS" value="6.0 6.0 6.0"/>
                    <rgb name="sigmaA" value="0.05 0.2 0.4"/>
                </subsurface>
            </shape>
            <shape type="rectangle">
                <transform name="toWorld"><rotate x="1" angle="90"/><scale value="0.5"/><translate y="3"/></transform>
                <emitter type="area"><rgb name="radiance" value="12 12 12"/></emitter>
            </shape>
        </scene>
        """)
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "s.xml")
            open(p, "w").write(xml)
            scene, settings = load_scene(p)
        assert scene.subsurface is not None
        assert scene.subsurface.n_points > 0
        img = render(scene, settings, spp=16)
        assert not np.isnan(img).any()
        # the cube region must glow (subsurface response > 0) and be
        # color-shifted toward red (sigmaA absorbs blue hardest)
        center = img[8:16, 8:16]
        assert center.mean() > 1e-3
        assert center[..., 0].mean() > center[..., 2].mean()


@pytest.mark.quick
class TestSingleScatter:
    @pytest.mark.slow
    def test_translucent_sphere_single(self):
        """Real refracted-ray single scattering: glows, is unbiased-ish
        (no NaN), and differs from the dipole answer."""
        from mitsuba_im_tpu.render.job import render
        from mitsuba_im_tpu.scene.xml import load_scene
        import tempfile, textwrap

        xml = textwrap.dedent("""\
        <scene version="0.6.0">
            <integrator type="path"><integer name="maxDepth" value="4"/></integrator>
            <sensor type="perspective">
                <float name="fov" value="40"/>
                <transform name="toWorld">
                    <lookat origin="0, 0.6, 3" target="0, 0.4, 0" up="0, 1, 0"/>
                </transform>
                <film type="hdrfilm">
                    <integer name="width" value="24"/>
                    <integer name="height" value="24"/>
                </film>
            </sensor>
            <shape type="sphere">
                <float name="radius" value="0.4"/>
                <point name="center" x="0" y="0.4" z="0"/>
                <bsdf type="null"/>
                <subsurface type="singlescatter">
                    <rgb name="sigmaS" value="2.0 2.0 2.0"/>
                    <rgb name="sigmaA" value="0.05 0.2 0.4"/>
                </subsurface>
            </shape>
            <shape type="rectangle">
                <transform name="toWorld"><rotate x="1" angle="90"/><scale value="0.5"/><translate y="3"/></transform>
                <emitter type="area"><rgb name="radiance" value="12 12 12"/></emitter>
            </shape>
        </scene>
        """)
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "s.xml")
            open(p, "w").write(xml)
            scene, settings = load_scene(p)
        assert scene.subsurface is not None
        assert scene.subsurface.has_single
        img = render(scene, settings, spp=32)
        assert not np.isnan(img).any()
        center = img[8:16, 8:16]
        assert center.mean() > 1e-4
        # blue is absorbed hardest -> red-shifted response
        assert center[..., 0].mean() > center[..., 2].mean()


@pytest.mark.quick
class TestBinnedGather:
    @pytest.mark.slow
    def test_grid_matches_dense(self):
        """Hash-grid culled gather (irrtree octree analog) agrees with the
        exact dense sum when the 27-cell neighborhood covers the kernel."""
        import jax.numpy as jnp
        from mitsuba_im_tpu.subsurface import (SubsurfaceTable,
                                               dipole_coeffs, eval_lo)
        from mitsuba_im_tpu.integrators.sppm import build_grid
        from mitsuba_im_tpu.core.types import Float, Int

        rng = np.random.default_rng(2)
        P = 2048
        pts = np.zeros((P, 3), np.float32)
        pts[:, 0] = rng.uniform(0, 10, P)
        pts[:, 2] = rng.uniform(0, 10, P)
        irr = rng.uniform(0.2, 1.0, (P, 3)).astype(np.float32)
        area = np.full(P, 100.0 / P, np.float32)
        recs = np.zeros(P, np.int32)

        co = dipole_coeffs(np.full(3, 20.0), np.full(3, 1.0), 0.0, 1.3)
        sigma_tr = np.asarray(co["sigma_tr"], np.float32)
        cell = 4.0 / float(sigma_tr.min())
        order, bucket = build_grid(jnp.asarray(pts), jnp.ones(P, bool),
                                   jnp.asarray(cell, jnp.float32))
        f3 = lambda a: jnp.asarray(np.asarray(a, np.float32)[None], Float)
        table = SubsurfaceTable(
            sigma_tr=f3(co["sigma_tr"]), zr=f3(co["zr"]), zv=f3(co["zv"]),
            alpha_p=f3(co["alpha_p"]),
            eta=jnp.asarray([co["eta"]], Float),
            sigma_s=f3([20.0] * 3), sigma_t=f3([21.0] * 3),
            g=jnp.asarray([0.0], Float), single=jnp.zeros(1, Int),
            pts=jnp.asarray(pts), irr=jnp.asarray(irr),
            area=jnp.asarray(area), pt_rec=jnp.asarray(recs),
            pt_order=order, pt_bucket=bucket,
            cell=jnp.asarray(cell, Float),
            n_points=P, has_single=False)

        n = 64
        x = np.zeros((n, 3), np.float32)
        x[:, 0] = rng.uniform(1, 9, n)
        x[:, 2] = rng.uniform(1, 9, n)
        rec_id = jnp.zeros(n, Int)
        wo = jnp.full(n, 0.8, Float)

        got = np.asarray(eval_lo(table, jnp.asarray(x), wo, rec_id))

        # dense reference in numpy
        from mitsuba_im_tpu.subsurface import rd_profile, _fresnel_t
        import jax.numpy as j2
        d = x[:, None, :] - pts[None, :, :]
        r2 = (d * d).sum(-1)
        rd = np.asarray(rd_profile(
            j2.asarray(r2.reshape(-1)), j2.asarray(sigma_tr),
            j2.asarray(co["zr"], j2.float32), j2.asarray(co["zv"], j2.float32),
            j2.asarray(co["alpha_p"], j2.float32))).reshape(n, P, 3)
        mo = (rd * area[None, :, None] * irr[None]).sum(1)
        ft = np.asarray(_fresnel_t(j2.asarray(co["eta"], j2.float32),
                                   j2.asarray(0.8)))
        want = mo * ft / np.pi
        # boundary-of-kernel truncation + hash-collision inclusions leave
        # a small per-lane tail; the estimate must stay tight on average
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-4)
        assert np.mean(rel) < 0.01
        assert np.max(rel) < 0.10
