"""tiledhdrfilm: out-of-core band rendering equals the full-frame render
(films/tiledhdrfilm.cpp capability) + Resampler (rfilter.h:474)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.quick
class TestTiledFilm:
    @pytest.mark.slow
    def test_matches_full_frame(self, tmp_path):
        from __graft_entry__ import _tiny_cornell
        from mitsuba_im_tpu.render.job import render_film
        from mitsuba_im_tpu.film.film import develop
        from mitsuba_im_tpu.film.tiled import render_tiled
        from mitsuba_im_tpu.io.exr import read_exr

        scene, settings = _tiny_cornell()
        settings.width = settings.height = 32
        settings.spp = 4

        full = np.asarray(develop(render_film(scene, settings, spp=4)))
        out = str(tmp_path / "tiled.exr")
        render_tiled(scene, settings, out, spp=4, band_rows=8, half=False)
        tiled, _meta = read_exr(out)
        # same stateless sample streams per pixel -> images agree to float
        # accumulation tolerance across band boundaries
        np.testing.assert_allclose(tiled, full, atol=2e-5)

    def test_peak_memory_is_band_sized(self, tmp_path):
        # structural check: the band buffer is (band+2*margin, W, 4)
        from mitsuba_im_tpu.film.film import DEFAULT_RADIUS

        assert DEFAULT_RADIUS[0] == 0.5  # box margin = 1 row


@pytest.mark.quick
class TestResampler:
    @pytest.mark.slow
    def test_constant_preserved(self):
        from mitsuba_im_tpu.film.resample import resample

        img = np.full((17, 23, 3), 0.7, np.float32)
        for size in ((64, 64), (5, 9)):
            out = resample(img, size)
            assert out.shape == (size[1], size[0], 3)
            np.testing.assert_allclose(out, 0.7, atol=1e-4)

    def test_downscale_averages(self):
        from mitsuba_im_tpu.film.resample import resample
        from mitsuba_im_tpu.film.film import F_BOX

        img = np.zeros((8, 8), np.float32)
        img[:, 4:] = 1.0
        out = resample(img, (2, 2), ftype=F_BOX)
        np.testing.assert_allclose(out[:, 0], 0.0, atol=1e-5)
        np.testing.assert_allclose(out[:, 1], 1.0, atol=1e-5)

    def test_mean_preserved_on_upscale(self):
        from mitsuba_im_tpu.film.resample import resample

        rng = np.random.default_rng(5)
        img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        out = resample(img, (48, 48))
        assert abs(out.mean() - img.mean()) < 0.02
