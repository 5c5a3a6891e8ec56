"""MCMC integrators (pssmlt / mlt / erpt) converge to the path tracer.

The reference's de-facto integration test is the cross-algorithm image
check: different unbiased integrators must agree on the same scene
(SURVEY.md §4 tier 4, ``data/tests/test_bidir_*.xml``).
"""
import numpy as np
import pytest

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import textwrap

CAUSTIC_XML = textwrap.dedent("""\
        <scene version="0.6.0">
            <integrator type="path"><integer name="maxDepth" value="6"/></integrator>
            <sensor type="perspective">
                <float name="fov" value="45"/>
                <transform name="toWorld">
                    <lookat origin="0, 1.2, 2.5" target="0, 0.2, 0" up="0, 1, 0"/>
                </transform>
                <film type="hdrfilm">
                    <integer name="width" value="32"/>
                    <integer name="height" value="32"/>
                </film>
            </sensor>
            <shape type="rectangle">
                <transform name="toWorld"><rotate x="1" angle="-90"/><scale value="4"/></transform>
                <bsdf type="diffuse"><rgb name="reflectance" value="0.7 0.7 0.7"/></bsdf>
            </shape>
            <shape type="sphere">
                <float name="radius" value="0.35"/>
                <point name="center" x="0" y="0.5" z="0"/>
                <bsdf type="dielectric"/>
            </shape>
            <shape type="sphere">
                <float name="radius" value="0.03"/>
                <point name="center" x="0" y="1.8" z="0"/>
                <emitter type="area"><rgb name="radiance" value="2000 2000 2000"/></emitter>
            </shape>
        </scene>
""")


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

    def test_bidirectional_matches_path_tracer(self, cornell_ref):
        """Kelemen over the unified splat sampler (pathsampler.h:121
        sampleSplats analog): all BDPT strategies in the chain's strategy
        space, still converging to the path tracer."""
        from mitsuba_im_tpu.render.job import render

        scene, settings, ref = cornell_ref
        settings.integrator = "pssmlt"
        settings.integrator_props = {"max_depth": 4, "n_chains": 4096,
                                     "burn_in": 16, "bidirectional": True}
        img = render(scene, settings, spp=256)
        assert abs(img.mean() - ref.mean()) / ref.mean() < 0.10
        rel = np.abs(img.mean(axis=(0, 1)) - ref.mean(axis=(0, 1)))
        assert np.all(rel / ref.mean(axis=(0, 1)) < 0.20)

    def test_mlt_registers_own_engine(self):
        from mitsuba_im_tpu.core.registry import create
        from mitsuba_im_tpu.core.properties import Properties

        out = create("integrator", Properties("mlt"))
        assert out["name"] == "mlt"
        assert out["p_large"] == pytest.approx(0.1)
        assert out["p_lens"] == pytest.approx(0.35)


class TestMLT:
    def test_matches_path_tracer(self, cornell_ref):
        from mitsuba_im_tpu.render.job import render

        scene, settings, ref = cornell_ref
        settings.integrator = "mlt"
        settings.integrator_props = {"max_depth": 4, "n_chains": 4096,
                                     "burn_in": 16}
        img = render(scene, settings, spp=512)
        assert abs(img.mean() - ref.mean()) / ref.mean() < 0.10
        rel = np.abs(img.mean(axis=(0, 1)) - ref.mean(axis=(0, 1)))
        assert np.all(rel / ref.mean(axis=(0, 1)) < 0.20)

    def test_structured_mutations_cover_all_branches(self):
        """Every mutator in the mixture produces a valid, in-range table
        and leaves the pinned blocks untouched."""
        import jax.numpy as jnp
        from mitsuba_im_tpu.integrators.mlt import MLTConfig, mlt_step_tables

        # pin the eye-replay table layout (bidirectional is the default
        # now; this test checks the unidirectional block structure)
        cfg = MLTConfig(max_depth=4, n_chains=64, bidirectional=False)
        n_blocks = 1 + 3 * 3
        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.uniform(size=(64, n_blocks, 4)), jnp.float32)
        chain = jnp.arange(64, dtype=jnp.uint32)
        # force each mutation type via the selection uniform
        for sel, checker in [
            (0.05, None),                      # large: anything goes
            (0.2, "lens"), (0.55, "caustic"), (0.72, "mchain"),
            (0.95, "small"),
        ]:
            u_aux = jnp.asarray(
                np.column_stack([np.full(64, sel), rng.uniform(size=(64, 3))]),
                jnp.float32)
            prop, is_large, _corr = mlt_step_tables(
                table, u_aux, cfg, chain, jnp.uint32(3), jnp.uint32(9))
            p = np.asarray(prop)
            assert np.all((p >= 0) & (p < 1))
            t = np.asarray(table)
            if checker == "lens":
                # image block moved, every bounce block pinned
                assert not np.allclose(p[:, 0, 0:2], t[:, 0, 0:2])
                np.testing.assert_allclose(p[:, 1:], t[:, 1:])
            elif checker == "caustic":
                # prefix pinned, last bounce perturbed
                np.testing.assert_allclose(p[:, :7], t[:, :7])
                assert not np.allclose(p[:, 7:], t[:, 7:])
            elif checker == "small":
                assert not np.allclose(p, t)

    def test_caustic_scene_converges(self):
        """mut_caustic capability check on a glass-sphere caustic scene:
        the MCMC estimate stays globally calibrated and deposits energy in
        the NEE-occluded caustic region (reachable only through the
        refracting chain, which the block-structured replay preserves).

        Documented deviation (integrators/mlt.py): at equal *low* sample
        budgets the path tracer's stratified NEE outperforms chain-based
        MCMC on compact caustics; the reference's explicit-geometry
        caustic/manifold perturbations (mut_caustic.cpp) are what closes
        that island-mixing gap and remain future work here."""
        import textwrap, tempfile
        from mitsuba_im_tpu.render.job import render
        from mitsuba_im_tpu.scene.xml import load_scene

        xml = CAUSTIC_XML
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "caustic.xml")
            open(path, "w").write(xml)
            scene, settings = load_scene(path)

        settings.integrator = "path"
        ref = render(scene, settings, spp=512)

        settings.integrator = "mlt"
        settings.integrator_props = {"max_depth": 6, "n_chains": 4096,
                                     "burn_in": 16}
        mlt = render(scene, settings, spp=256)

        # globally calibrated (luminance pre-pass + separateDirect)
        assert abs(mlt.mean() - ref.mean()) / ref.mean() < 0.15
        # the NEE-occluded caustic region receives energy through the
        # preserved refracting chains (pure NEE would leave it black)
        lum = ref.mean(-1)
        floor = lum[16:, :]
        thresh = np.quantile(floor, 0.92)
        mask = np.zeros_like(lum, bool)
        mask[16:, :] = floor >= thresh
        assert mlt.mean(-1)[mask].mean() > 0.1 * lum[mask].mean()

    def test_caustic_bidirectional_beats_path(self):
        """The round-4 capability close: MLT over the unified splat
        sampler (bidir/pathsampler.py = pathsampler.h:121) carries the
        caustic through the s>=2,t=1 light-tracing strategies, which
        eye-replay MLT provably cannot reach (the caustic island is
        separated from its sample space by a zero-contribution moat).
        Measured on chip: caustic-region relative error 0.135 (bidir MLT)
        vs 0.366 (path) vs 0.64 (eye MLT) at equal mutation budget."""
        from mitsuba_im_tpu.render.job import render
        from mitsuba_im_tpu.scene.xml import load_scene
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "caustic.xml")
            open(path, "w").write(CAUSTIC_XML)
            scene, settings = load_scene(path)

        settings.integrator = "bdpt"
        settings.integrator_props = {"max_depth": 6}
        gt = render(scene, settings, spp=768)

        settings.integrator = "path"
        settings.integrator_props = {"max_depth": 6}
        path_img = render(scene, settings, spp=192)

        settings.integrator = "mlt"
        settings.integrator_props = {"max_depth": 6, "n_chains": 4096,
                                     "burn_in": 16, "bidirectional": True}
        mlt_bd = render(scene, settings, spp=192)

        lum = gt.mean(-1)
        floor = np.zeros_like(lum, bool)
        floor[16:, :] = True
        cau = floor & (lum >= np.quantile(lum[floor], 0.92))

        def err(img):
            return float(np.abs(img.mean(-1)[cau] - lum[cau]).mean()
                         / lum[cau].mean())

        assert abs(mlt_bd.mean() - gt.mean()) / gt.mean() < 0.15
        assert err(mlt_bd) < 0.85 * err(path_img)

class TestERPT:
    def test_matches_path_tracer(self, cornell_ref):
        """Seed-exact energy redistribution converges to the path tracer
        (erpt_proc.cpp capability; also pins the (N, S, 2) splat-state
        accept broadcast, which once scrambled chains via an (N, N, 2)
        outer product)."""
        from mitsuba_im_tpu.render.job import render

        scene, settings, ref = cornell_ref
        settings.integrator = "erpt"
        settings.integrator_props = {"max_depth": 4, "chain_length": 32}
        img = render(scene, settings, spp=8)
        assert img.shape == ref.shape
        assert abs(img.mean() - ref.mean()) / ref.mean() < 0.10
        rel = np.abs(img.mean(axis=(0, 1)) - ref.mean(axis=(0, 1)))
        assert np.all(rel / ref.mean(axis=(0, 1)) < 0.20)

    def test_bidirectional_matches_path_tracer(self, cornell_ref):
        """ERPT chains over the unified splat sampler (the reference runs
        ERPT over PathSampler::sampleSplats, erpt_proc.cpp:529): every
        BDPT strategy in the redistribution chain's strategy space."""
        from mitsuba_im_tpu.render.job import render

        scene, settings, ref = cornell_ref
        settings.integrator = "erpt"
        settings.integrator_props = {"max_depth": 4, "chain_length": 24,
                                     "bidirectional": True}
        img = render(scene, settings, spp=6)
        assert abs(img.mean() - ref.mean()) / ref.mean() < 0.10

    def test_caustic_bidirectional_beats_path(self):
        """ERPT over the splat space deposits caustic energy through the
        t=1 light-tracing strategies (eye-replay ERPT cannot reach the
        NEE-occluded island), beating the path tracer's caustic-region
        error at equal budget — the same capability bar bidir MLT passes."""
        from mitsuba_im_tpu.render.job import render
        from mitsuba_im_tpu.scene.xml import load_scene
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "caustic.xml")
            open(path, "w").write(CAUSTIC_XML)
            scene, settings = load_scene(path)

        settings.integrator = "bdpt"
        settings.integrator_props = {"max_depth": 6}
        gt = render(scene, settings, spp=768)

        settings.integrator = "path"
        settings.integrator_props = {"max_depth": 6}
        path_img = render(scene, settings, spp=96)

        settings.integrator = "erpt"
        settings.integrator_props = {"max_depth": 6, "chain_length": 48,
                                     "bidirectional": True}
        erpt_img = render(scene, settings, spp=2)

        lum = gt.mean(-1)
        floor = np.zeros_like(lum, bool)
        floor[16:, :] = True
        cau = floor & (lum >= np.quantile(lum[floor], 0.92))

        def err(img):
            return float(np.abs(img.mean(-1)[cau] - lum[cau]).mean()
                         / lum[cau].mean())

        assert abs(erpt_img.mean() - gt.mean()) / gt.mean() < 0.25
        assert err(erpt_img) < 0.85 * err(path_img)


class TestManifoldMutation:
    def test_manifold_mlt_calibrated_on_caustic(self):
        """The manifold perturbation (mut_manifold.cpp analog) as a
        production mixture component: Newton-re-solved chain moves with
        the D(x')/D(x) acceptance factor keep the chain's stationary
        distribution calibrated on the glass-caustic scene (global mean
        matches ground truth; no NaN), and the component actually fires
        (proposals differ from identity on chain-bearing states)."""
        import tempfile
        import jax.numpy as jnp
        from mitsuba_im_tpu.render.job import render
        from mitsuba_im_tpu.scene.xml import load_scene
        from mitsuba_im_tpu.integrators.mlt import (MLTConfig,
                                                    _manifold_tables)
        from mitsuba_im_tpu.integrators.pssmlt import _draw_table, _n_blocks
        from mitsuba_im_tpu.integrators.mlt import _pss_cfg

        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "caustic.xml")
            open(path, "w").write(CAUSTIC_XML)
            scene, settings = load_scene(path)

        # unit: the proposal machinery edits chain-bearing tables
        # (floor->glass->glass->X chains are a few-percent event over
        # random tables, so use a wide ensemble)
        cfg = MLTConfig(max_depth=6, n_chains=4096)
        nb = _n_blocks(_pss_cfg(cfg))
        chain = jnp.arange(4096, dtype=jnp.uint32)
        table = _draw_table(chain, jnp.uint32(5), jnp.uint32(11), nb,
                            stream=0)
        ug = _draw_table(chain, jnp.uint32(6), jnp.uint32(11), 1,
                         stream=1)[:, 0, :2]
        prop, corr, moved = _manifold_tables(scene, table, cfg, ug)
        n_moved = int(np.asarray(moved).sum())
        assert n_moved >= 2, n_moved  # glass-sphere chains exist and move
        assert np.isfinite(np.asarray(corr)).all()
        p, t = np.asarray(prop), np.asarray(table)
        changed = np.abs(p - t).max(axis=(1, 2)) > 0
        assert (changed == np.asarray(moved)).all()

        # integration: MLT with the component stays globally calibrated
        settings.integrator = "bdpt"
        settings.integrator_props = {"max_depth": 6}
        gt = render(scene, settings, spp=384)
        settings.integrator = "mlt"
        settings.integrator_props = {"max_depth": 6, "n_chains": 4096,
                                     "burn_in": 16, "p_manifold": 0.15}
        img = render(scene, settings, spp=128)
        assert not np.isnan(img).any()
        assert abs(img.mean() - gt.mean()) / gt.mean() < 0.15
