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
