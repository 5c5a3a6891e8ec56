"""Photon-map (sppm) and VPL integrators converge to the path tracer
(the reference's cross-algorithm integration-test strategy, SURVEY.md §4)."""
import numpy as np
import jax.numpy as jnp
import pytest

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def cornell_ref():
    from __graft_entry__ import _tiny_cornell
    from mitsuba_im_tpu.render.job import render

    scene, settings = _tiny_cornell()
    settings.width = settings.height = 24
    settings.integrator = "path"
    settings.integrator_props = {"max_depth": 6}
    ref = render(scene, settings, spp=256)
    return scene, settings, ref


class TestSPPM:
    def test_matches_path_tracer(self, cornell_ref):
        from mitsuba_im_tpu.render.job import render

        scene, settings, ref = cornell_ref
        settings.integrator = "sppm"
        settings.integrator_props = {
            "max_depth": 6, "photon_count": 32768,
            "lookup_radius_rel": 0.08, "cell_cap": 32,
        }
        img = render(scene, settings, spp=8)
        assert not np.isnan(img).any()
        assert abs(img.mean() - ref.mean()) / ref.mean() < 0.12

    def test_grid_gather_finds_neighbors(self):
        """Hash-grid gather returns exactly the photons within radius."""
        from mitsuba_im_tpu.integrators.sppm import build_grid, _cell_hash

        rng = np.random.default_rng(3)
        p = jnp.asarray(rng.uniform(-1, 1, (512, 3)), jnp.float32)
        valid = jnp.ones((512,), bool)
        cell = jnp.float32(0.25)
        order, bsorted = build_grid(p, valid, cell)
        # every photon must be locatable through its own cell's bucket run
        c = jnp.floor(p / cell).astype(jnp.int32)
        b = _cell_hash(c)
        starts = jnp.searchsorted(bsorted, b, side="left")
        ends = jnp.searchsorted(bsorted, b, side="right")
        o = np.asarray(order)
        for i in range(0, 512, 37):
            run = o[int(starts[i]):int(ends[i])]
            assert i in run


class TestVPL:
    def test_matches_path_tracer(self, cornell_ref):
        from mitsuba_im_tpu.render.job import render

        scene, settings, ref = cornell_ref
        settings.integrator = "path"
        settings.integrator_props = {"max_depth": 3}
        ref3 = render(scene, settings, spp=256)
        settings.integrator = "vpl"
        settings.integrator_props = {"max_depth": 3, "vpl_count": 128,
                                     "clamping": 0.02}
        img = render(scene, settings, spp=4)
        assert not np.isnan(img).any()
        assert abs(img.mean() - ref3.mean()) / ref3.mean() < 0.10
