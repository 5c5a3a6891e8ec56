"""Particle tracer (light tracing) cross-validation: its image must agree
with the camera-sampled path tracer in expectation — the de-facto
integration test strategy of the reference (different transport algorithms
converge to the same image, SURVEY.md §4)."""
import numpy as np
import jax.numpy as jnp
import pytest

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class TestPtracerMatchesPath:
    def test_cornell_means(self):
        from __graft_entry__ import _tiny_cornell
        from mitsuba_im_tpu.render.job import render

        scene, settings = _tiny_cornell()
        settings.width = settings.height = 16
        settings.integrator_props = dict(max_depth=3)
        from mitsuba_im_tpu.film.film import F_BOX

        settings.rfilter = F_BOX

        settings.integrator = "path"
        settings.spp = 24
        img_path = render(scene, settings)

        settings.integrator = "ptracer"
        settings.spp = 96  # light tracing needs more particles per pixel
        img_pt = render(scene, settings)

        assert np.isfinite(img_pt).all() and (img_pt >= 0).all()
        # global energy agreement (light tracing is noisy per pixel)
        np.testing.assert_allclose(
            img_pt.mean(axis=(0, 1)), img_path.mean(axis=(0, 1)), rtol=0.15
        )
        # spatial correlation: bright/dark structure should match
        a = img_path.mean(-1).reshape(-1)
        b = img_pt.mean(-1).reshape(-1)
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.8, corr
