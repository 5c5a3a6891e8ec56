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


class TestVolumetricPhotons:
    def test_beam_radiance_estimate_matches_volpath(self):
        """photonmapper/bre.cpp capability: volume photons stored at
        medium scattering events + a beam radiance estimate over the
        camera segments reproduce the in-scattered glow of a homogeneous
        HG medium — sppm agrees with volpath on a fog-lit scene."""
        from mitsuba_im_tpu.render.job import render
        from test_bdpt import TestMediaAwareBDPT

        scene, settings = TestMediaAwareBDPT()._global_medium_scene(
            sigma_a=0.08, sigma_s=0.35, g=0.3)
        settings.width = settings.height = 20
        settings.integrator = "volpath"
        settings.integrator_props = {"max_depth": 4}
        ref = render(scene, settings, spp=256)

        settings.integrator = "sppm"
        settings.integrator_props = {"max_depth": 4,
                                     "photon_count": 60000,
                                     "lookup_radius_rel": 0.08}
        img = render(scene, settings, spp=24)
        assert not np.isnan(img).any()
        assert ref.mean() > 1e-4
        rel = abs(img.mean() - ref.mean()) / ref.mean()
        assert rel < 0.15, (img.mean(), ref.mean())

    def test_volume_photons_carry_the_glow(self):
        """Disabling the medium (sigma=0) must lose the in-scattered
        energy the beam estimate adds (guards against the volume photons
        being silently dropped)."""
        from mitsuba_im_tpu.render.job import render
        from test_bdpt import TestMediaAwareBDPT

        t = TestMediaAwareBDPT()
        s1, set1 = t._global_medium_scene(sigma_a=0.0, sigma_s=0.4, g=0.0)
        set1.width = set1.height = 16
        set1.integrator = "sppm"
        set1.integrator_props = {"max_depth": 4, "photon_count": 40000,
                                 "lookup_radius_rel": 0.08}
        foggy = render(s1, set1, spp=12)
        s0, set0 = t._global_medium_scene(sigma_a=0.0, sigma_s=0.0)
        set0.width = set0.height = 16
        set0.integrator = "sppm"
        set0.integrator_props = {"max_depth": 4, "photon_count": 40000,
                                 "lookup_radius_rel": 0.08}
        clear = render(s0, set0, spp=12)
        # scattering redistributes light into the air: off-surface pixels
        # (top half, above the light-to-floor geometry) must brighten
        assert foggy[:6].mean() > 1.5 * max(clear[:6].mean(), 1e-5)
