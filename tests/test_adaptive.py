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
