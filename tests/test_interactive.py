"""Responsive/progressive rendering layer tests (the fork's signature
capability, SURVEY.md §2.6 im-mts)."""
import time

import numpy as np
import jax.numpy as jnp
import pytest

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture()
def cornell():
    from __graft_entry__ import _tiny_cornell

    scene, settings = _tiny_cornell()
    settings.width = settings.height = 16
    settings.spp = 4
    return scene, settings


class TestRenderActor:
    def test_progressive_refinement(self, cornell):
        from mitsuba_im_tpu.interactive.actor import RenderActor

        scene, settings = cornell
        actor = RenderActor(scene, settings, preview_scale=2, max_spp=3).start()
        deadline = time.time() + 120
        while time.time() < deadline:
            rev = actor.latest()
            if rev is not None and rev.spp >= 3:
                break
            time.sleep(0.2)
        actor.stop()
        rev = actor.latest()
        assert rev is not None and rev.spp >= 3
        assert rev.image.shape == (16, 16, 3)
        assert np.isfinite(rev.image).all()
        assert rev.generation >= 2  # preview + at least one refinement

    def test_pause_and_camera_update(self, cornell):
        from mitsuba_im_tpu.interactive.actor import RenderActor
        from mitsuba_im_tpu.sensor.table import make_sensor, S_PERSPECTIVE
        from mitsuba_im_tpu.core.transform import Transform

        scene, settings = cornell
        actor = RenderActor(scene, settings, preview_scale=2).start()
        deadline = time.time() + 120
        while actor.latest() is None and time.time() < deadline:
            time.sleep(0.1)
        actor.pause(True)
        g1 = actor.latest().generation
        time.sleep(1.0)
        assert actor.latest().generation == g1  # no work while paused

        # camera move: queue a new scene (restart protocol)
        new_sensor = make_sensor(
            S_PERSPECTIVE, Transform.look_at([0.3, 1, 3.5], [0, 1, 0], [0, 1, 0]),
            fov_deg=39.3,
        )
        actor.update_scene(scene.replace(sensor=new_sensor))
        actor.pause(False)
        deadline = time.time() + 120
        while time.time() < deadline:
            rev = actor.latest()
            if rev is not None and rev.generation > g1 and rev.resolution_scale > 1:
                break
            time.sleep(0.1)
        rev = actor.latest()
        actor.stop()
        assert rev.generation > g1  # restart produced a fresh preview


class TestCheckpoint:
    def test_exact_resume(self, cornell, tmp_path):
        from mitsuba_im_tpu.render.job import render_film, develop
        from mitsuba_im_tpu.interactive.checkpoint import (
            save_checkpoint, load_checkpoint,
        )

        scene, settings = cornell
        full = render_film(scene, settings, spp=4)
        part = render_film(scene, settings, spp=2)
        ck = str(tmp_path / "ck")
        save_checkpoint(ck, part, 2, settings)
        film2, spp_done, _s = load_checkpoint(ck)
        assert spp_done == 2
        resumed = render_film(scene, settings, spp=2, film=film2, sample_offset=2)
        np.testing.assert_allclose(
            np.asarray(develop(resumed)), np.asarray(develop(full)), atol=1e-6
        )
