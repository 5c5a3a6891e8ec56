"""Adaptive sampling + multichannel integrators
(reference src/integrators/misc/{adaptive,multichannel}.cpp capability)."""
import numpy as np

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mitsuba_im_tpu.integrators.adaptive import (
    _student_t_quantile, _norm_quantile, render_adaptive,
)


def cornell(tmp_path, integrator_xml, res=16, spp=4):
    from tests.test_render import CORNELL_XML, write_scene
    from mitsuba_im_tpu.scene.xml import load_scene

    xml = CORNELL_XML.format(max_depth=3, spp=spp, res=res)
    import re
    xml = re.sub(
        r'<integrator type="path">.*?</integrator>', integrator_xml, xml,
        flags=re.S)
    p = os.path.join(tmp_path, "scene.xml")
    with open(p, "w") as f:
        f.write(xml)
    return load_scene(p)


class TestStudentT:
    def test_normal_quantile(self):
        assert abs(_norm_quantile(0.975) - 1.959964) < 1e-4
        assert abs(_norm_quantile(0.5)) < 1e-9
        assert abs(_norm_quantile(0.025) + 1.959964) < 1e-4

    def test_t_quantile_matches_tables(self):
        # two-sided p=0.05: t(0.975; dof) from standard tables
        for dof, expect in [(7, 2.3646), (15, 2.1314), (31, 2.0395),
                            (63, 1.9983), (127, 1.9787)]:
            got = _student_t_quantile(0.05, dof)
            assert abs(got - expect) < 0.02, (dof, got, expect)

    def test_t_quantile_approaches_normal(self):
        assert abs(_student_t_quantile(0.05, 1e6) - 1.95996) < 1e-3


class TestAdaptive:
    def test_renders_and_converges(self, tmp_path):
        scene, settings = cornell(
            tmp_path,
            '<integrator type="adaptive">'
            '<float name="maxError" value="0.25"/>'
            '<integer name="maxSampleFactor" value="4"/>'
            '<integrator type="path"><integer name="maxDepth" value="3"/>'
            '</integrator></integrator>',
            res=12, spp=4,
        )
        assert settings.integrator == "adaptive"
        img = render_adaptive(scene, settings)
        assert img.shape == (12, 12, 3)
        assert np.isfinite(img).all() and img.mean() > 0.02

    def test_adaptive_matches_uniform_mean(self, tmp_path):
        """Adaptive stopping must not shift the image systematically."""
        from mitsuba_im_tpu.render.job import render

        scene, settings = cornell(
            tmp_path,
            '<integrator type="adaptive">'
            '<float name="maxError" value="0.05"/>'
            '<integer name="maxSampleFactor" value="8"/>'
            '<integrator type="path"><integer name="maxDepth" value="2"/>'
            '</integrator></integrator>',
            res=12, spp=8,
        )
        ad = render(scene, settings)

        from mitsuba_im_tpu.scene.build import RenderSettings
        uni = RenderSettings(width=12, height=12, spp=64, integrator="path",
                             integrator_props=dict(max_depth=2),
                             rfilter=settings.rfilter)
        from mitsuba_im_tpu.film.film import F_BOX
        uni.rfilter = F_BOX
        ref = render(scene, uni)
        assert abs(ad.mean() - ref.mean()) < 0.15 * max(ref.mean(), 1e-6)


class TestIrrCache:
    def test_matches_path_reference(self, tmp_path):
        """Irradiance-cached Cornell box agrees with a converged path
        render up to the documented interpolation bias."""
        from mitsuba_im_tpu.render.job import render
        from mitsuba_im_tpu.scene.build import RenderSettings

        scene, settings = cornell(
            tmp_path,
            '<integrator type="irrcache">'
            '<float name="quality" value="1.5"/>'
            '<integer name="stride" value="2"/>'
            '<integrator type="path"><integer name="maxDepth" value="3"/>'
            '</integrator></integrator>',
            res=16, spp=4,
        )
        assert settings.integrator == "irrcache"
        img = render(scene, settings)
        assert img.shape == (16, 16, 3)
        assert np.isfinite(img).all() and img.min() >= 0.0

        ref = render(scene, RenderSettings(
            width=16, height=16, spp=128, integrator="path",
            integrator_props=dict(max_depth=6)))
        rel = abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-9)
        assert rel < 0.2, rel
        # red/green wall color bleeding must survive the cache
        left = img[6:10, :4]
        right = img[6:10, -4:]
        assert left[..., 0].mean() > left[..., 1].mean()
        assert right[..., 1].mean() > right[..., 0].mean()


class TestMultichannel:
    def test_channels_written(self, tmp_path):
        scene, settings = cornell(
            tmp_path,
            '<integrator type="multichannel">'
            '<integrator type="path"><integer name="maxDepth" value="2"/></integrator>'
            '<integrator type="field"><string name="field" value="shapeIndex"/></integrator>'
            '</integrator>',
            res=10, spp=2,
        )
        assert settings.integrator == "multichannel"
        from mitsuba_im_tpu.render.job import render, save_render

        img = render(scene, settings)
        assert img.shape == (10, 10, 3)
        names, stack = settings.aux_channels
        assert stack.shape == (10, 10, 6)
        assert "field.R" in names

        out = os.path.join(tmp_path, "multi.exr")
        save_render(out, img, settings)
        from mitsuba_im_tpu.io.exr import read_exr

        data, meta = read_exr(out, all_channels=True)
        assert data.shape[-1] == 6  # all channels round-trip
        assert "field.R" in meta["channels"]


class TestIrrcacheGridCull:
    """Hybrid hash-grid cull of the irradiance-cache gather must agree
    with the exact dense evaluation (the octree-culling analog,
    /root/reference/src/librender/irrcache.cpp)."""

    def test_grid_matches_dense(self):
        import jax.numpy as jnp
        from mitsuba_im_tpu.core.types import Float
        from mitsuba_im_tpu.integrators import irrcache as ic
        from mitsuba_im_tpu.integrators.sppm import build_grid

        rng = np.random.default_rng(11)
        M, N = 3000, 4096
        rec_p = jnp.asarray(rng.uniform(-2, 2, (M, 3)).astype(np.float32))
        nrm = rng.normal(size=(M, 3)).astype(np.float32)
        rec_n = jnp.asarray(nrm / np.linalg.norm(nrm, axis=1, keepdims=True))
        rec_E = jnp.asarray(rng.uniform(0, 1, (M, 3)).astype(np.float32))
        R_h = (rng.uniform(0.05, 0.3, M) ** 2).astype(np.float32)
        R_h[:40] = rng.uniform(3.0, 10.0, 40)  # long-reach records
        rec_R = jnp.asarray(R_h)
        valid_h = rng.uniform(size=M) > 0.05
        rec_valid = jnp.asarray(valid_h)
        quality = 1.2

        p = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
        qn = rng.normal(size=(N, 3)).astype(np.float32)
        ns = jnp.asarray(qn / np.linalg.norm(qn, axis=1, keepdims=True))

        dense = ic._gather_cache(p, ns, rec_p, rec_n, rec_E, rec_R,
                                 rec_valid, quality)

        order_R = np.argsort(np.where(valid_h, -R_h, np.inf))
        dense_ids = np.sort(order_R[:ic.K_DENSE]).astype(np.int32)
        in_dense = np.zeros(M, bool)
        in_dense[dense_ids] = True
        gmask = valid_h & ~in_dense
        cell = max(quality * float(R_h[gmask].max()), 1e-4)
        g_order, g_bucket = build_grid(rec_p, jnp.asarray(gmask),
                                       jnp.asarray(cell, Float))
        grid = (jnp.asarray(dense_ids), g_order, g_bucket,
                jnp.asarray(cell, Float))
        culled = ic._gather_cache(p, ns, rec_p, rec_n, rec_E, rec_R,
                                  rec_valid, quality, grid=grid)

        dn, cu = np.asarray(dense), np.asarray(culled)
        # Ward-qualified pixels must agree to fp tolerance; nearest-record
        # fallback pixels may legitimately differ (global vs 27-cell
        # nearest), so compare where the weighted sum was nonzero
        rel = np.abs(dn - cu) / (np.abs(dn) + 1e-3)
        frac_equal = (rel.max(-1) < 1e-3).mean()
        assert frac_equal > 0.97, frac_equal
