"""Large-mesh + envmap scene (BASELINE config 4 class): the reference bunny
(69k triangles, BVH path) lit by the PIZ-decoded reference envmap."""
import os
import textwrap

import numpy as np
import pytest

ENVMAP = "/root/reference/data/tests/envmap.exr"
BUNNY = "/root/reference/data/tests/bunny.ply"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(ENVMAP) and os.path.exists(BUNNY)),
    reason="reference fixtures not present",
)


def bunny_scene(tmp_path, spp=2, res=24, integrator="path"):
    xml = textwrap.dedent(f"""\
    <scene version="0.6.0">
        <integrator type="{integrator}"><integer name="maxDepth" value="3"/></integrator>
        <sensor type="perspective">
            <float name="fov" value="40"/>
            <transform name="toWorld">
                <lookat origin="-0.05, 0.12, 0.25" target="-0.02, 0.1, 0" up="0, 1, 0"/>
            </transform>
            <sampler type="independent"><integer name="sampleCount" value="{spp}"/></sampler>
            <film type="hdrfilm">
                <integer name="width" value="{res}"/><integer name="height" value="{res}"/>
                <rfilter type="box"/>
            </film>
        </sensor>
        <shape type="ply">
            <string name="filename" value="{BUNNY}"/>
            <bsdf type="roughconductor">
                <string name="distribution" value="ggx"/>
                <float name="alpha" value="0.2"/>
            </bsdf>
        </shape>
        <emitter type="envmap">
            <string name="filename" value="{ENVMAP}"/>
        </emitter>
    </scene>
    """)
    p = tmp_path / "bunny.xml"
    p.write_text(xml)
    from mitsuba_im_tpu.scene.xml import load_scene

    return load_scene(str(p))


class TestBunnyEnvmap:
    def test_loads_with_bvh(self, tmp_path):
        scene, settings = bunny_scene(tmp_path)
        assert scene.geom.n_tris > 60000
        assert scene.use_bvh
        assert scene.emitters.env_index >= 0

    def test_renders(self, tmp_path):
        from mitsuba_im_tpu.render.job import render

        scene, settings = bunny_scene(tmp_path, spp=2, res=24)
        img = render(scene, settings)
        assert np.isfinite(img).all() and (img >= 0).all()
        # background pixels see the envmap directly (gallery ~0.1-1.5)
        assert img.mean() > 0.05
        # the metallic bunny must be visibly distinct from the background
        center = img[8:16, 8:16].mean()
        assert center != pytest.approx(img[0, 0].mean(), rel=0.5)
