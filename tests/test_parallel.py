"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 multi-host-testing strategy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def cornell():
    from __graft_entry__ import _tiny_cornell

    scene, settings = _tiny_cornell()
    settings.width = settings.height = 16
    settings.spp = 4
    return scene, settings


class TestShardedRender:
    def test_matches_single_device(self, cornell):
        scene, settings = cornell
        assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
        from mitsuba_im_tpu.parallel.mesh import make_mesh, render_sharded
        from mitsuba_im_tpu.render.job import render

        img1 = render(scene, settings)
        mesh = make_mesh()
        img8 = render_sharded(mesh, scene, settings)
        # same stateless sampler stream -> identical output regardless of
        # device partitioning (the determinism guarantee SURVEY.md §5 asks
        # for in place of race detection)
        np.testing.assert_allclose(img8, img1, atol=1e-5)

    def test_mesh_subsets(self, cornell):
        scene, settings = cornell
        from mitsuba_im_tpu.parallel.mesh import make_mesh, render_sharded

        img2 = render_sharded(make_mesh(jax.devices()[:2]), scene, settings, spp=2)
        img4 = render_sharded(make_mesh(jax.devices()[:4]), scene, settings, spp=2)
        np.testing.assert_allclose(img2, img4, atol=1e-5)


class TestMultichipTrainStep:
    def test_dryrun(self):
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)  # full sharded train step; raises on failure


class TestGraftEntry:
    def test_entry_compiles(self):
        from __graft_entry__ import entry

        fn, args = entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()
