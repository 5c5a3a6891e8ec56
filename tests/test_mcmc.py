"""MCMC integrators (pssmlt / mlt / erpt) converge to the path tracer.

The reference's de-facto integration test is the cross-algorithm image
check: different unbiased integrators must agree on the same scene
(SURVEY.md §4 tier 4, ``data/tests/test_bidir_*.xml``).
"""
import numpy as np
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
    settings.integrator_props = {"max_depth": 4}
    ref = render(scene, settings, spp=256)
    return scene, settings, ref


class TestPSSMLT:
    def test_matches_path_tracer(self, cornell_ref):
        from mitsuba_im_tpu.render.job import render

        scene, settings, ref = cornell_ref
        settings.integrator = "pssmlt"
        settings.integrator_props = {"max_depth": 4, "n_chains": 4096,
                                     "burn_in": 16}
        img = render(scene, settings, spp=512)
        assert img.shape == ref.shape
        # MCMC estimate of the overall image mean within 10%
        assert abs(img.mean() - ref.mean()) / ref.mean() < 0.10
        # per-channel means agree (color balance is preserved)
        rel = np.abs(img.mean(axis=(0, 1)) - ref.mean(axis=(0, 1)))
        assert np.all(rel / ref.mean(axis=(0, 1)) < 0.20)

    def test_mlt_alias_dispatches(self):
        from mitsuba_im_tpu.core.registry import create
        from mitsuba_im_tpu.core.properties import Properties

        out = create("integrator", Properties("mlt"))
        assert out["name"] == "pssmlt"
        assert out["p_large"] == pytest.approx(0.1)


class TestERPT:
    def test_matches_path_tracer(self, cornell_ref):
        from mitsuba_im_tpu.render.job import render

        scene, settings, ref = cornell_ref
        settings.integrator = "erpt"
        settings.integrator_props = {"max_depth": 4, "chain_length": 16}
        img = render(scene, settings, spp=16)
        assert abs(img.mean() - ref.mean()) / ref.mean() < 0.10


class TestTableSampler:
    def test_table_mode_is_deterministic(self):
        import jax.numpy as jnp
        from mitsuba_im_tpu.core import rng as mrng

        tab = jnp.linspace(0, 1, 4 * 3 * 4).reshape(4, 3, 4).astype(jnp.float32)
        s = mrng.make_sampler(jnp.arange(4, dtype=jnp.uint32),
                              jnp.uint32(0), jnp.uint32(0))
        s = s.replace(table=tab)
        s1, u1 = mrng.next_block4(s)
        _, u2 = mrng.next_block4(s1)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(tab[:, 0, :]))
        np.testing.assert_allclose(np.asarray(u2), np.asarray(tab[:, 1, :]))
        # past the table end: falls back to the hash, still in [0,1)
        s3 = s1.replace(dim=jnp.full((4,), 12, jnp.uint32))
        _, u4 = mrng.next_block4(s3)
        assert np.all((np.asarray(u4) >= 0) & (np.asarray(u4) < 1))

    def test_mutation_wraps(self):
        import jax.numpy as jnp
        from mitsuba_im_tpu.integrators.pssmlt import _mutate_small

        u = jnp.asarray([0.01, 0.99, 0.5])
        xi = jnp.asarray([0.0, 0.0, 0.5])
        sign = jnp.asarray([0.9, 0.1, 0.3])  # -, +, +
        out = np.asarray(_mutate_small(u, xi, sign, 1 / 1024.0, 1 / 64.0))
        assert np.all((out >= 0) & (out < 1))
