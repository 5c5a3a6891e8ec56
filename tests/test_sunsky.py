"""Preetham sun/sky emitter: model sanity + scene integration
(reference src/emitters/{sky,sun,sunsky}.cpp capability)."""
import numpy as np
import pytest
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mitsuba_im_tpu.emitter.sunsky import (
    sun_direction_from_time, preetham_sky_pixels, sun_radiance_rgb,
    sun_solid_angle,
)


class TestSunPosition:
    def test_noon_sun_high(self):
        # solar noon in Tokyo midsummer: sun elevation should be high
        d = sun_direction_from_time(2010, 6, 21, 12.0, 0, 0,
                                    latitude=35.69, longitude=139.69,
                                    timezone=9.0)
        assert d[1] > 0.85  # > ~58 deg elevation

    def test_midnight_sun_below_horizon(self):
        d = sun_direction_from_time(2010, 6, 21, 0.0, 0, 0,
                                    latitude=35.69, longitude=139.69,
                                    timezone=9.0)
        assert d[1] < 0.0

    def test_unit_vector(self):
        d = sun_direction_from_time(2010, 3, 20, 9.5, 30, 0, 48.0, 11.0, 1.0)
        assert abs(np.linalg.norm(d) - 1.0) < 1e-6


class TestPreethamSky:
    def test_shape_and_positive(self):
        sun = np.array([0.3, 0.8, 0.2]); sun /= np.linalg.norm(sun)
        px = preetham_sky_pixels(128, sun, turbidity=3.0)
        assert px.shape == (64, 128, 3)
        assert np.all(np.isfinite(px)) and px.min() >= 0.0
        assert px.max() > 0.0

    def test_circumsolar_brightening(self):
        """Radiance near the sun must exceed the sky average (Perez C,D
        terms) and the clear sky must be blue away from the sun."""
        sun = np.array([0.0, 0.7071, -0.7071])
        px = preetham_sky_pixels(256, sun, turbidity=2.5)
        H, W = px.shape[:2]
        v = np.arccos(sun[1]) / np.pi
        u = (np.arctan2(sun[0], -sun[2]) / (2 * np.pi)) % 1.0
        yi, xi = int(v * H), int(u * W)
        lum = px @ np.array([0.2126, 0.7152, 0.0722])
        upper = lum[: H // 2]
        around = lum[max(yi - 2, 0): yi + 3, max(xi - 2, 0): xi + 3]
        assert around.max() > 2.5 * upper.mean()
        # the circumsolar region is the brightest spot in the sky dome
        assert around.max() >= upper.max() * (1.0 - 1e-6)
        # opposite azimuth, mid elevation: blue dominant
        xo = (xi + W // 2) % W
        texel = px[H // 4, xo]
        assert texel[2] > texel[0]

    def test_turbidity_whitens_horizon(self):
        """Higher turbidity -> whiter (less blue-dominant) horizon; in the
        Perez gradation the clear sky has the strongest horizon/zenith
        luminance contrast, so the haze signature is chromatic."""
        sun = np.array([0.0, 0.9, -0.436])
        lo = preetham_sky_pixels(128, sun, turbidity=2.0)
        hi = preetham_sky_pixels(128, sun, turbidity=8.0)
        horizon_blue = lambda px: (px[30, :, 2] / np.maximum(px[30, :, 0],
                                                             1e-9)).mean()
        assert horizon_blue(hi) < horizon_blue(lo)

    def test_horizon_extension_fades(self):
        sun = np.array([0.0, 0.8, -0.6])
        px = preetham_sky_pixels(128, sun, turbidity=3.0, extend=True)
        lum = px @ np.array([0.2126, 0.7152, 0.0722])
        assert lum[-1].mean() < 0.1 * lum[px.shape[0] // 2 - 1].mean()


class TestSunRadiance:
    def test_extinction_monotone_in_turbidity(self):
        d = np.array([0.0, 0.8, -0.6])
        clear = sun_radiance_rgb(d, 2.0)
        hazy = sun_radiance_rgb(d, 9.0)
        assert np.all(clear > hazy)

    def test_low_sun_redder(self):
        high = sun_radiance_rgb(np.array([0.0, 0.95, -0.31]), 3.0)
        low = sun_radiance_rgb(np.array([0.0, 0.08, -0.997]), 3.0)
        assert low[0] / max(low[2], 1e-9) > high[0] / max(high[2], 1e-9)

    def test_below_horizon_dark(self):
        assert np.all(sun_radiance_rgb(np.array([0.0, -0.5, -0.87]), 3.0) == 0)

    def test_irradiance_magnitude(self):
        """Zenith-ish sun irradiance should land near the direct-normal
        ballpark (hundreds of W/m^2 visible band)."""
        d = np.array([0.0, 0.98, -0.2])
        E = sun_radiance_rgb(d, 2.5) * sun_solid_angle()
        assert 100.0 < E.sum() < 2000.0


class TestSceneIntegration:
    @pytest.mark.slow
    def test_sunsky_scene_renders(self, tmp_path):
        xml = """<scene version="0.6.0">
  <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
  <sensor type="perspective">
    <float name="fov" value="60"/>
    <transform name="toWorld">
      <lookat origin="0, 1, 4" target="0, 1, 0" up="0, 1, 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="24"/><integer name="height" value="24"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <emitter type="sunsky">
    <float name="turbidity" value="3"/>
    <vector name="sunDirection" x="0.2" y="0.8" z="0.3"/>
    <integer name="resolution" value="64"/>
  </emitter>
  <shape type="rectangle">
    <transform name="toWorld"><rotate x="1" angle="-90"/><scale value="4"/></transform>
    <bsdf type="diffuse"><rgb name="reflectance" value="0.5 0.5 0.5"/></bsdf>
  </shape>
</scene>"""
        p = tmp_path / "sunsky.xml"
        p.write_text(xml)
        from mitsuba_im_tpu.scene.xml import load_scene
        from mitsuba_im_tpu.render.job import render

        scene, settings = load_scene(str(p))
        img = np.asarray(render(scene, settings))
        assert img.shape == (24, 24, 3)
        assert np.isfinite(img).all()
        # upper half sees the sky directly: bright and blue-ish
        sky = img[:8]
        assert sky.mean() > 0.05
        assert sky[..., 2].mean() > sky[..., 0].mean()
        # ground is lit (sun + sky NEE)
        assert img[16:].mean() > 0.01


@pytest.mark.quick
class TestHosekWilkie:
    """Hosek-Wilkie 2012 model (src/emitters/sunsky/skymodel.cpp parity)."""

    def test_turbidity_sweep(self):
        from mitsuba_im_tpu.emitter.hosek import hosek_sky_pixels

        sun = np.array([0.3, 0.6, 0.4])
        sun /= np.linalg.norm(sun)
        imgs = {t: hosek_sky_pixels(64, sun, turbidity=t, extend=False)
                for t in (1.5, 3.0, 6.0, 9.0)}
        for t, img in imgs.items():
            assert np.isfinite(img).all() and (img >= 0).all(), t
        # zenith blueness ratio (B/R) falls as turbidity rises (hazier sky)
        zen = {t: img[1, :, :].mean(0) for t, img in imgs.items()}
        br = {t: zen[t][2] / max(zen[t][0], 1e-6) for t in imgs}
        assert br[1.5] > br[6.0] > br[9.0]
        # circumsolar brightening: pixels near the sun outshine the
        # opposite sky at all turbidities
        H, W = imgs[3.0].shape[:2]
        theta = np.arccos(sun[1])
        phi = np.arctan2(sun[0], -sun[2]) % (2 * np.pi)
        sy, sx = int(theta / np.pi * H), int(phi / (2 * np.pi) * W)
        ay, ax = sy, (sx + W // 2) % W
        for t, img in imgs.items():
            assert img[sy, sx].mean() > img[ay, ax].mean(), t

    def test_elevation_bezier_continuity(self):
        """Coefficients vary smoothly with solar elevation (no knot jumps)."""
        from mitsuba_im_tpu.emitter.hosek import hosek_coeffs

        prev = None
        for el in np.linspace(0.2, 1.4, 25):
            c, r = hosek_coeffs(3.0, 0.2, float(el))
            assert np.isfinite(c).all() and np.isfinite(r).all()
            if prev is not None:
                # smooth: no >2x jumps between adjacent elevations
                assert np.abs(r - prev).max() / (np.abs(prev).max() + 1e-6) < 1.0
            prev = r

    def test_sky_plugin_uses_hosek_by_default(self):
        from mitsuba_im_tpu.core.registry import create
        from mitsuba_im_tpu.core.properties import Properties

        p = Properties("sky")
        p.set("resolution", 64)
        rec = create("emitter", p)
        assert rec["pixels"].shape == (32, 64, 3)
        p2 = Properties("sky")
        p2.set("resolution", 64)
        p2.set("skyModel", "preetham")
        rec2 = create("emitter", p2)
        # the two models agree on broad photometric scale (same units)
        m1, m2 = rec["pixels"].mean(), rec2["pixels"].mean()
        assert 0.1 < m1 / m2 < 10.0
