"""BDPT cross-checks against the path tracer — the reference's de-facto
integration test (``data/tests/test_bidir_*.xml``: different unbiased
algorithms must converge to the same image, SURVEY.md §4 tier 4)."""
import numpy as np
import jax.numpy as jnp
import pytest

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def cornell():
    from __graft_entry__ import _tiny_cornell

    scene, settings = _tiny_cornell()
    settings.width = settings.height = 24
    return scene, settings


class TestBDPT:
    @pytest.mark.parametrize("max_depth", [2, 4])
    def test_matches_path_tracer(self, cornell, max_depth):
        from mitsuba_im_tpu.render.job import render

        scene, settings = cornell
        settings.integrator = "path"
        settings.integrator_props = {"max_depth": max_depth}
        ref = render(scene, settings, spp=512)
        settings.integrator = "bdpt"
        settings.integrator_props = {"max_depth": max_depth}
        img = render(scene, settings, spp=96)
        assert not np.isnan(img).any()
        assert abs(img.mean() - ref.mean()) / ref.mean() < 0.05
        rel = np.abs(img.mean(axis=(0, 1)) - ref.mean(axis=(0, 1)))
        assert np.all(rel / ref.mean(axis=(0, 1)) < 0.08)

    def test_env_lit_matches_path(self, tmp_path):
        """Env-lit scene: light subpaths now start from the environment
        (vertex.h:272 sampleNext analog), so s>=2 strategies contribute and
        bdpt must stay in agreement with the path tracer."""
        from mitsuba_im_tpu.render.job import render
        import textwrap

        env = "/root/reference/data/tests/envmap.exr"
        if not os.path.exists(env):
            pytest.skip("no envmap fixture")
        xml = textwrap.dedent(f"""\
        <scene version="0.6.0">
            <integrator type="path"><integer name="maxDepth" value="4"/></integrator>
            <sensor type="perspective">
                <float name="fov" value="50"/>
                <transform name="toWorld">
                    <lookat origin="0, 1.2, 3.2" target="0, 0.8, 0" up="0, 1, 0"/>
                </transform>
                <film type="hdrfilm">
                    <integer name="width" value="20"/>
                    <integer name="height" value="20"/>
                </film>
            </sensor>
            <emitter type="envmap"><string name="filename" value="{env}"/></emitter>
            <shape type="rectangle">
                <transform name="toWorld"><rotate x="1" angle="-90"/><scale value="2"/></transform>
                <bsdf type="diffuse"><rgb name="reflectance" value="0.65 0.5 0.4"/></bsdf>
            </shape>
            <shape type="sphere">
                <point name="center" x="0" y="0.8" z="0"/>
                <float name="radius" value="0.7"/>
                <bsdf type="diffuse"><rgb name="reflectance" value="0.3 0.5 0.7"/></bsdf>
            </shape>
        </scene>
        """)
        p = tmp_path / "envscene.xml"
        p.write_text(xml)
        from mitsuba_im_tpu.scene.xml import load_scene

        scene, settings = load_scene(str(p))
        settings.integrator = "path"
        settings.integrator_props = {"max_depth": 4}
        ref = render(scene, settings, spp=512)
        settings.integrator = "bdpt"
        img = render(scene, settings, spp=128)
        assert not np.isnan(img).any()
        assert abs(img.mean() - ref.mean()) / ref.mean() < 0.05
        rel = np.abs(img.mean(axis=(0, 1)) - ref.mean(axis=(0, 1)))
        assert np.all(rel / ref.mean(axis=(0, 1)) < 0.08)

    def test_specular_scene(self):
        """Delta-BSDF vertices: MIS remapping must stay finite & unbiased."""
        from mitsuba_im_tpu.render.job import render
        import textwrap

        xml = textwrap.dedent("""\
        <scene version="0.6.0">
            <integrator type="path"><integer name="maxDepth" value="5"/></integrator>
            <sensor type="perspective">
                <float name="fov" value="45"/>
                <transform name="toWorld">
                    <lookat origin="0, 1, 3.5" target="0, 1, 0" up="0, 1, 0"/>
                </transform>
                <film type="hdrfilm">
                    <integer name="width" value="24"/>
                    <integer name="height" value="24"/>
                </film>
            </sensor>
            <shape type="rectangle">
                <transform name="toWorld"><rotate x="1" angle="-90"/><scale value="2"/></transform>
                <bsdf type="diffuse"><rgb name="reflectance" value="0.7 0.7 0.7"/></bsdf>
            </shape>
            <shape type="sphere">
                <float name="radius" value="0.5"/>
                <transform name="toWorld"><translate y="0.5"/></transform>
                <bsdf type="conductor"/>
            </shape>
            <shape type="rectangle">
                <transform name="toWorld"><rotate x="1" angle="90"/><scale value="0.4"/><translate y="3"/></transform>
                <emitter type="area"><rgb name="radiance" value="10 10 10"/></emitter>
            </shape>
        </scene>
        """)
        scene, settings = _load(xml)
        settings.integrator = "path"
        settings.integrator_props = {"max_depth": 5}
        ref = render(scene, settings, spp=512)
        settings.integrator = "bdpt"
        settings.integrator_props = {"max_depth": 5}
        img = render(scene, settings, spp=96)
        assert not np.isnan(img).any()
        assert abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-6) < 0.08


def _load(xml):
    import tempfile, os as _os
    from mitsuba_im_tpu.scene.xml import load_scene

    with tempfile.TemporaryDirectory() as td:
        p = _os.path.join(td, "s.xml")
        with open(p, "w") as f:
            f.write(xml)
        return load_scene(p)


class TestMediaAwareBDPT:
    """Medium-aware bidirectional transport (vertex.h:48 + edge.h:32-76
    analog): subpath walks place medium vertices in scattering media via
    free-flight sampling and all connection strategies carry full edge
    transmittance with per-lane medium tracking.  Both absorption-only
    and scattering (sigma_s > 0, HG phase) volumetric scenes must agree
    between bdpt and volpath (the round-4/round-5 VERDICT acceptance
    tests)."""

    def _global_medium_scene(self, sigma_a=0.35, sigma_s=0.0, g=0.0):
        import numpy as np
        from mitsuba_im_tpu.scene.build import SceneBuilder
        from mitsuba_im_tpu.scene.mesh import TriMesh
        from mitsuba_im_tpu.sensor.table import make_sensor, S_PERSPECTIVE
        from mitsuba_im_tpu.emitter import table as et
        from mitsuba_im_tpu.media.medium import PH_ISOTROPIC

        from mitsuba_im_tpu.media.medium import PH_HG

        b = SceneBuilder()
        b.media_records.append(dict(
            kind="homogeneous", sigma_s=np.full(3, sigma_s),
            sigma_a=np.full(3, sigma_a), scale=1.0,
            phase=(dict(type=PH_HG, g=g) if abs(g) > 0
                   else dict(type=PH_ISOTROPIC, g=0.0))))
        b.camera_medium = 0

        # diffuse floor, light above (the layout of the irawan scene,
        # which renders correctly end to end)
        sid = b.new_shape(b.default_bsdf())
        pts = np.array([[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]],
                       float)
        m = TriMesh(pts, np.array([[0, 1, 2], [2, 3, 0]]))
        m.normals = np.tile([[0.0, 1.0, 0.0]], (4, 1))
        m.uvs = np.zeros((4, 2))
        b.add_trimesh(m, sid)

        lsh = b.new_shape(b.default_bsdf())
        lm = TriMesh(np.array([[-0.3, 1.5, -0.3], [0.3, 1.5, -0.3],
                               [0.3, 1.5, 0.3], [-0.3, 1.5, 0.3]], float),
                     np.array([[0, 1, 2], [2, 3, 0]]))
        lm.normals = np.tile([[0.0, -1.0, 0.0]], (4, 1))
        lm.uvs = np.zeros((4, 2))
        b.add_trimesh(lm, lsh)
        eid = b.add_emitter(dict(type=et.EM_AREA,
                                 radiance=np.full(3, 12.0), shape=lsh))
        b.shape_emitter[lsh] = eid

        from mitsuba_im_tpu.core.transform import Transform
        b.sensor = make_sensor(
            S_PERSPECTIVE,
            Transform.look_at([0, 1.0, 2.5], [0, 0.2, 0], [0, 1, 0]),
            fov_deg=50.0)
        scene, settings = b.build()
        settings.width = settings.height = 20
        return scene, settings

    def test_absorbing_medium_bdpt_matches_volpath(self):
        from mitsuba_im_tpu.render.job import render

        scene, settings = self._global_medium_scene()
        settings.integrator = "volpath"
        settings.integrator_props = {"max_depth": 4}
        ref = render(scene, settings, spp=256)
        settings.integrator = "bdpt"
        img = render(scene, settings, spp=96)
        assert ref.mean() > 1e-4
        rel = abs(img.mean() - ref.mean()) / ref.mean()
        assert rel < 0.08, (img.mean(), ref.mean())

    def test_transmittance_actually_attenuates(self):
        """The same scene with and without absorption differ by a
        noticeable factor through bdpt (guards against the medium being
        silently ignored)."""
        from mitsuba_im_tpu.render.job import render

        s0, set0 = self._global_medium_scene(sigma_a=0.0)
        s1, set1 = self._global_medium_scene(sigma_a=0.5)
        for st in (set0, set1):
            st.integrator = "bdpt"
            st.integrator_props = {"max_depth": 4}
        clear = render(s0, set0, spp=64)
        hazy = render(s1, set1, spp=64)
        assert hazy.mean() < 0.45 * clear.mean()

    def test_scattering_medium_bdpt_matches_volpath(self):
        """Round-5 acceptance: with sigma_s > 0 and an HG phase, bdpt's
        medium vertices (free-flight-sampled volume interactions with
        phase-function connections and volume-measure MIS densities,
        vertex.h:48 analog) carry the in-scattered light — the image must
        agree with volpath's unidirectional estimate."""
        from mitsuba_im_tpu.render.job import render

        scene, settings = self._global_medium_scene(
            sigma_a=0.08, sigma_s=0.35, g=0.3)
        settings.integrator = "volpath"
        settings.integrator_props = {"max_depth": 4}
        ref = render(scene, settings, spp=384)
        settings.integrator = "bdpt"
        img = render(scene, settings, spp=128)
        assert ref.mean() > 1e-4
        rel = abs(img.mean() - ref.mean()) / ref.mean()
        assert rel < 0.10, (img.mean(), ref.mean())
        # in-scattering is a real part of the signal: an absorption-only
        # render of the same geometry must be visibly dimmer
        s2, set2 = self._global_medium_scene(sigma_a=0.43, sigma_s=0.0)
        set2.integrator = "bdpt"
        set2.integrator_props = {"max_depth": 4}
        dark = render(s2, set2, spp=96)
        assert img.mean() > 1.1 * dark.mean()
