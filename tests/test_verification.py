"""Path verification harness (verification.cpp:24-60 analog): cached
subpath densities/throughputs re-derived from the stored vertices must
agree to f32 tolerance, over both transport modes, plus the replayable
sampler invariant used by the MCMC integrators."""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def cornell():
    from __graft_entry__ import _tiny_cornell

    scene, settings = _tiny_cornell()
    return scene, settings


@pytest.mark.quick
@pytest.mark.slow
def test_eye_walk_invariants(cornell):
    from mitsuba_im_tpu.core import rng as mrng
    from mitsuba_im_tpu.core.types import Float
    from mitsuba_im_tpu.integrators.bdpt import random_walk, camera_pdf_dir
    from mitsuba_im_tpu.sensor.table import sample_ray
    from mitsuba_im_tpu.bidir.verification import verify_walk

    scene, _ = cornell
    n = 512
    s = mrng.make_sampler(jnp.arange(n, dtype=jnp.uint32), 0, 5)
    s, blk = mrng.next_block4(s)
    uv = blk[..., :2]
    o, d, _ = sample_ray(scene.sensor, uv, blk[..., 2:4])
    verts, s, esc, _ = random_walk(
        scene, s, o, d, jnp.ones((n, 3), Float), camera_pdf_dir(scene, d),
        4, o, d)
    rep = verify_walk(verts, o, adjoint=False)
    assert rep["checked"] > 200
    assert rep["pdf_err"] < 1e-3, rep
    assert rep["beta_err"] < 1e-3, rep


@pytest.mark.quick
@pytest.mark.slow
def test_light_walk_invariants(cornell):
    from mitsuba_im_tpu.core import rng as mrng
    from mitsuba_im_tpu.core.types import Float
    from mitsuba_im_tpu.integrators.bdpt import (
        random_walk, sample_light_origin)
    from mitsuba_im_tpu.bidir.verification import verify_walk
    import jax.numpy as jnp

    scene, _ = cornell
    n = 512
    s = mrng.make_sampler(jnp.arange(n, dtype=jnp.uint32), 0, 9)
    s, blk = mrng.next_block4(s)
    s, blk2 = mrng.next_block4(s)
    lv0 = sample_light_origin(scene, blk[..., 0], blk[..., 1:3],
                              blk2[..., 0:2])
    cos0 = jnp.where(lv0["delta"], 1.0, jnp.abs(
        jnp.sum(lv0["ns"] * lv0["d"], -1)))
    beta = lv0["le"] * (cos0 / jnp.maximum(
        lv0["pdf_fwd"] * lv0["pdf_dir"], 1e-20))[..., None]
    verts, s, _esc, _ = random_walk(
        scene, s, lv0["p"], lv0["d"], beta, lv0["pdf_dir"], 4,
        lv0["p"], lv0["ns"], adjoint=True, infinite0=lv0["infinite"])
    rep = verify_walk(verts, lv0["p"], adjoint=True)
    assert rep["checked"] > 200
    assert rep["pdf_err"] < 1e-3, rep
    assert rep["beta_err"] < 1e-3, rep


@pytest.mark.quick
@pytest.mark.slow
def test_mcmc_replay_bitwise(cornell):
    """The MLT/PSSMLT proposal machinery replays paths through a stateless
    counter sampler: identical inputs must reproduce identical radiance."""
    from mitsuba_im_tpu.bidir.verification import verify_replay
    from mitsuba_im_tpu.integrators import pssmlt as ps

    scene, settings = cornell
    cfg = ps.PSSMLTConfig(max_depth=4)
    nb = ps._n_blocks(cfg)

    def run():
        u = jnp.linspace(0.01, 0.99, 16 * nb * 4).reshape(16, nb, 4)
        pos, li, I = ps._eval(scene, u, cfg, 24, 24)
        return np.concatenate([np.asarray(pos[:, 0]), np.asarray(li[:, 0]),
                               np.asarray(I)[:, None]], axis=1)

    assert verify_replay(scene, run)


@pytest.mark.quick
@pytest.mark.slow
def test_medium_walk_invariants():
    """verification.cpp analog over MEDIUM vertices: cached volume-measure
    densities (distance pdf, no cosine) and free-flight throughput weights
    re-derive from the stored vertices in a scattering HG medium."""
    from mitsuba_im_tpu.core import rng as mrng
    from mitsuba_im_tpu.core.types import Float, Int
    from mitsuba_im_tpu.integrators.bdpt import random_walk, camera_pdf_dir
    from mitsuba_im_tpu.sensor.table import sample_ray
    from mitsuba_im_tpu.bidir.verification import verify_walk
    from test_bdpt import TestMediaAwareBDPT

    scene, _ = TestMediaAwareBDPT()._global_medium_scene(
        sigma_a=0.08, sigma_s=0.4, g=0.35)
    n = 512
    s = mrng.make_sampler(jnp.arange(n, dtype=jnp.uint32), 0, 7)
    s, blk = mrng.next_block4(s)
    uv = blk[..., :2]
    o, d, _ = sample_ray(scene.sensor, uv, blk[..., 2:4])
    mid0 = jnp.full((n,), scene.camera_medium, Int)
    verts, s, esc, _ = random_walk(
        scene, s, o, d, jnp.ones((n, 3), Float), camera_pdf_dir(scene, d),
        4, o, d, medium0=mid0)
    n_med = sum(int(np.asarray(v["is_med"] & v["valid"]).sum())
                for v in verts)
    assert n_med > 100, n_med  # medium vertices actually occur
    rep = verify_walk(verts, o, adjoint=False, scene=scene)
    assert rep["checked"] > 200
    assert rep["pdf_err"] < 1e-3, rep
    assert rep["beta_err"] < 1e-3, rep
