"""Volumetric path tracer tests (BASELINE config 5 class).

- media-free equivalence with the surface path tracer,
- volumetric white furnace (albedo-1 medium in a unit environment),
- analytic Beer-Lambert absorption,
- phase-function chi-square GOF (HG / Rayleigh),
- XML loading of media-bearing scenes.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mitsuba_im_tpu.core import rng as mrng
from mitsuba_im_tpu.core.types import INVALID
from mitsuba_im_tpu.integrators.path import PathConfig, path_li
from mitsuba_im_tpu.integrators.volpath import volpath_li
from mitsuba_im_tpu.media import medium as med
from mitsuba_im_tpu.media.medium import PH_HG, PH_RAYLEIGH, PH_ISOTROPIC
from mitsuba_im_tpu.scene.build import SceneBuilder
from mitsuba_im_tpu.bsdf import common as bc
from mitsuba_im_tpu.emitter import table as et


def render_mean(scene, li_fn, n=4096, spp=8, origin=(0, 0, -3), direction=(0, 0, 1)):
    o = jnp.tile(jnp.asarray([origin], jnp.float32), (n, 1))
    d = jnp.tile(jnp.asarray([direction], jnp.float32), (n, 1))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    acc = 0.0
    f = jax.jit(lambda s, o, d: li_fn(scene, s, o, d)[0])
    for s in range(spp):
        smp = mrng.make_sampler(jnp.arange(n), s, 0)
        acc = acc + np.asarray(f(smp, o, d))
    return acc / spp


class TestMediaFree:
    def test_volpath_equals_path_without_media(self):
        from __graft_entry__ import _tiny_cornell

        scene, _ = _tiny_cornell()
        cfg = PathConfig(max_depth=3)
        a = render_mean(scene, lambda sc, s, o, d: path_li(sc, s, o, d, cfg),
                        n=2048, spp=6, origin=(0, 1, 3.5), direction=(0, 0, -1))
        b = render_mean(scene, lambda sc, s, o, d: volpath_li(sc, s, o, d, cfg),
                        n=2048, spp=6, origin=(0, 1, 3.5), direction=(0, 0, -1))
        np.testing.assert_allclose(a.mean(0), b.mean(0), rtol=0.05, atol=2e-3)


def medium_sphere_scene(sigma_s, sigma_a, g=0.0, env=1.0):
    b = SceneBuilder()
    mrec = dict(kind="homogeneous", sigma_s=np.full(3, sigma_s),
                sigma_a=np.full(3, sigma_a), scale=1.0,
                phase=dict(type=PH_HG if g != 0 else PH_ISOTROPIC, g=g))
    b.media_records.append(mrec)
    null = bc.default_record()
    null["type"] = bc.NULL_BSDF
    sid = b.new_shape(b.add_bsdf(null), interior=0, exterior=INVALID)
    b.add_sphere([0, 0, 0], 1.0, sid)
    b.add_emitter(dict(type=et.EM_CONSTANT, radiance=np.full(3, env)))
    scene, _ = b.build()
    return scene


class TestFurnace:
    def test_volumetric_white_furnace(self):
        """Albedo-1 medium in a unit environment integrates to exactly 1."""
        scene = medium_sphere_scene(sigma_s=1.5, sigma_a=0.0, g=0.3)
        cfg = PathConfig(max_depth=-1, rr_depth=64, depth_budget=40)
        img = render_mean(
            scene, lambda sc, s, o, d: volpath_li(sc, s, o, d, cfg),
            n=8192, spp=4,
        )
        mean = img.mean()
        np.testing.assert_allclose(mean, 1.0, atol=0.02)

    def test_absorption_beer_lambert(self):
        """Pure absorber: L = exp(-sigma_a * path_len_in_medium) * env."""
        sa = 0.7
        scene = medium_sphere_scene(sigma_s=0.0, sigma_a=sa)
        cfg = PathConfig(max_depth=-1, depth_budget=8)
        img = render_mean(
            scene, lambda sc, s, o, d: volpath_li(sc, s, o, d, cfg),
            n=4096, spp=8,
        )
        # central ray crosses the unit sphere along a diameter: length 2
        expect = np.exp(-sa * 2.0)
        np.testing.assert_allclose(img.mean(0), expect, rtol=0.03)


class TestPhase:
    @pytest.mark.parametrize("ptype,g", [(PH_ISOTROPIC, 0.0), (PH_HG, 0.6),
                                          (PH_HG, -0.4), (PH_RAYLEIGH, 0.0)])
    def test_chi2(self, ptype, g):
        from mitsuba_im_tpu.core.chisquare import chi2_test

        wi = jnp.asarray([0.3, -0.2, 0.93])
        wi = wi / jnp.linalg.norm(wi)

        def sample_fn(n):
            s = mrng.make_sampler(jnp.arange(n), 0, 9)
            _, u2 = mrng.next_2d(s)
            wo, _ = med.phase_sample(
                jnp.full(n, ptype, jnp.int32), jnp.full(n, g, jnp.float32),
                jnp.tile(wi[None], (n, 1)), u2,
            )
            return np.asarray(wo)

        def pdf_fn(dirs):
            n = len(dirs)
            return np.asarray(med.phase_eval(
                jnp.full(n, ptype, jnp.int32), jnp.full(n, g, jnp.float32),
                jnp.tile(wi[None], (n, 1)), jnp.asarray(dirs, jnp.float32),
            ))

        ok, pval, info = chi2_test(sample_fn, pdf_fn, n_samples=1 << 16)
        assert ok, f"phase {ptype} g={g}: {info}"


class TestMediaXML:
    def test_load_homogeneous_scene(self, tmp_path):
        xml = """
<scene version="0.6.0">
    <integrator type="volpath"><integer name="maxDepth" value="8"/></integrator>
    <sensor type="perspective">
        <transform name="toWorld"><lookat origin="0,0,-3" target="0,0,0" up="0,1,0"/></transform>
        <sampler type="independent"><integer name="sampleCount" value="2"/></sampler>
        <film type="hdrfilm"><integer name="width" value="8"/><integer name="height" value="8"/>
            <rfilter type="box"/></film>
    </sensor>
    <shape type="sphere">
        <float name="radius" value="1"/>
        <bsdf type="null"/>
        <medium name="interior" type="homogeneous">
            <rgb name="sigmaS" value="0.5"/>
            <rgb name="sigmaA" value="0.1"/>
            <phase type="hg"><float name="g" value="0.7"/></phase>
        </medium>
    </shape>
    <emitter type="constant"><rgb name="radiance" value="0.8"/></emitter>
</scene>
"""
        p = tmp_path / "media.xml"
        p.write_text(xml)
        from mitsuba_im_tpu.scene.xml import load_scene
        from mitsuba_im_tpu.render.job import render

        scene, settings = load_scene(str(p))
        assert scene.media.n_media == 1
        assert float(scene.media.g[0]) == pytest.approx(0.7)
        assert int(scene.shape_interior[0]) == 0
        assert settings.integrator == "volpath"
        img = render(scene, settings)
        assert np.isfinite(img).all() and (img >= 0).all()
        assert img.mean() > 0.05


# ---------------------------------------------------------------------------
# Heterogeneous (grid) media — delta/ratio tracking
# ---------------------------------------------------------------------------

def hetero_sphere_scene(density_rec, albedo, g=0.0, env=1.0, scale=1.0):
    from mitsuba_im_tpu.media.volume import const_grid

    b = SceneBuilder()
    mrec = dict(kind="heterogeneous", scale=scale, density=density_rec,
                albedo=const_grid(np.full(3, albedo)),
                phase=dict(type=PH_HG if g != 0 else PH_ISOTROPIC, g=g))
    b.media_records.append(mrec)
    null = bc.default_record()
    null["type"] = bc.NULL_BSDF
    sid = b.new_shape(b.add_bsdf(null), interior=0, exterior=INVALID)
    b.add_sphere([0, 0, 0], 1.0, sid)
    b.add_emitter(dict(type=et.EM_CONSTANT, radiance=np.full(3, env)))
    scene, _ = b.build()
    return scene


class TestHeterogeneous:
    def test_vol_roundtrip(self, tmp_path):
        from mitsuba_im_tpu.media.volume import read_vol, write_vol

        rng = np.random.default_rng(7)
        data = rng.random((5, 4, 3, 1)).astype(np.float32)
        p = str(tmp_path / "t.vol")
        write_vol(p, data, [-1, -2, -3], [1, 2, 3])
        r = read_vol(p)
        np.testing.assert_array_equal(r["data"], data)
        np.testing.assert_allclose(r["bmin"], [-1, -2, -3])
        np.testing.assert_allclose(r["bmax"], [1, 2, 3])

    def test_ratio_tracking_matches_beer_lambert(self):
        """Constant-density grid: ratio tracking is unbiased vs exp(-sigma d)."""
        from mitsuba_im_tpu.media.volume import const_grid

        sigma = 1.3
        scene = hetero_sphere_scene(const_grid([sigma]), albedo=1.0)
        n = 16384
        o = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        dist = jnp.full((n,), 2.0, jnp.float32)
        mid = jnp.zeros((n,), jnp.int32)
        rows = med.hetero_rows(scene.media, mid)
        s = mrng.make_sampler(jnp.arange(n), 0, 0)
        _, T = jax.jit(lambda s: med.track_transmittance(
            scene.media, rows, o, d, dist, s, jnp.ones((n,), bool)))(s)
        np.testing.assert_allclose(np.mean(np.asarray(T)),
                                   np.exp(-sigma * 2.0), rtol=0.03)

    def test_hetero_const_matches_homogeneous(self):
        """A constant-density grid medium must render like the equivalent
        homogeneous medium (cross-validates tracking vs closed form)."""
        from mitsuba_im_tpu.media.volume import const_grid

        cfg = PathConfig(max_depth=-1, rr_depth=64, depth_budget=40)
        het = hetero_sphere_scene(const_grid([1.5]), albedo=0.7, g=0.3, env=1.0)
        hom = medium_sphere_scene(sigma_s=1.5 * 0.7, sigma_a=1.5 * 0.3,
                                  g=0.3, env=1.0)
        a = render_mean(het, lambda sc, s, o, d: volpath_li(sc, s, o, d, cfg),
                        n=8192, spp=4)
        b = render_mean(hom, lambda sc, s, o, d: volpath_li(sc, s, o, d, cfg),
                        n=8192, spp=4)
        np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.03)

    def test_hetero_furnace(self):
        """Albedo-1 grid medium in a unit furnace integrates to 1."""
        from mitsuba_im_tpu.media.volume import const_grid

        rng = np.random.default_rng(3)
        # random density grid spanning the sphere
        data = (0.2 + 1.8 * rng.random((6, 6, 6, 1))).astype(np.float32)
        grid = dict(data=data, bmin=np.full(3, -1.0), bmax=np.full(3, 1.0))
        scene = hetero_sphere_scene(grid, albedo=1.0, g=0.0, env=1.0)
        cfg = PathConfig(max_depth=-1, rr_depth=64, depth_budget=48)
        img = render_mean(
            scene, lambda sc, s, o, d: volpath_li(sc, s, o, d, cfg),
            n=8192, spp=4)
        np.testing.assert_allclose(img.mean(), 1.0, atol=0.02)

    def test_gradient_absorption_analytic(self):
        """Linear density gradient, pure absorption: L = exp(-(a+b)) for a
        central ray (trilinear interpolation makes the integral exact)."""
        a_d, b_d = 0.3, 0.9
        data = np.asarray([a_d, b_d], np.float32).reshape(2, 1, 1, 1)
        grid = dict(data=data, bmin=np.full(3, -1.0), bmax=np.full(3, 1.0))
        scene = hetero_sphere_scene(grid, albedo=0.0, env=1.0)
        cfg = PathConfig(max_depth=-1, rr_depth=64, depth_budget=16)
        img = render_mean(
            scene, lambda sc, s, o, d: volpath_li(sc, s, o, d, cfg),
            n=16384, spp=4)
        np.testing.assert_allclose(img.mean(), np.exp(-(a_d + b_d)), rtol=0.04)

    def test_load_heterogeneous_xml(self, tmp_path):
        from mitsuba_im_tpu.media.volume import write_vol

        rng = np.random.default_rng(11)
        write_vol(str(tmp_path / "smoke.vol"),
                  rng.random((4, 4, 4, 1)).astype(np.float32) * 2.0,
                  [-1, -1, -1], [1, 1, 1])
        xml = """
<scene version="0.6.0">
    <integrator type="volpath"><integer name="maxDepth" value="6"/></integrator>
    <sensor type="perspective">
        <transform name="toWorld"><lookat origin="0,0,-3" target="0,0,0" up="0,1,0"/></transform>
        <sampler type="independent"><integer name="sampleCount" value="2"/></sampler>
        <film type="hdrfilm"><integer name="width" value="8"/><integer name="height" value="8"/>
            <rfilter type="box"/></film>
    </sensor>
    <shape type="sphere">
        <float name="radius" value="1"/>
        <bsdf type="null"/>
        <medium name="interior" type="heterogeneous">
            <string name="method" value="woodcock"/>
            <volume name="density" type="gridvolume">
                <string name="filename" value="smoke.vol"/>
            </volume>
            <volume name="albedo" type="constvolume">
                <spectrum name="value" value="0.9"/>
            </volume>
            <float name="scale" value="3"/>
        </medium>
    </shape>
    <emitter type="constant"><rgb name="radiance" value="0.8"/></emitter>
</scene>
"""
        p = tmp_path / "hetero.xml"
        p.write_text(xml)
        from mitsuba_im_tpu.scene.xml import load_scene
        from mitsuba_im_tpu.render.job import render

        scene, settings = load_scene(str(p))
        assert scene.media.n_media == 1
        assert scene.media.has_hetero
        assert float(scene.media.majorant[0]) > 0
        img = render(scene, settings)
        assert np.isfinite(img).all() and (img >= 0).all()
        assert img.mean() > 0.01
