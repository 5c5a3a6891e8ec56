"""Hair shape + hierarchical grid volume (round-2 de-stubbed plugins)."""
import textwrap

import os
import numpy as np
import pytest


class TestHair:
    def make_hair_file(self, tmp_path, binary=False):
        strands = [
            np.array([[0.0, 0.0, 0.0], [0.0, 0.2, 0.0], [0.05, 0.4, 0.0]]),
            np.array([[0.2, 0.0, 0.1], [0.2, 0.3, 0.1]]),
        ]
        p = tmp_path / ("h.hair" if binary else "h.txt")
        if binary:
            total = sum(len(s) for s in strands)
            buf = b"BINARY_HAIR" + np.uint32(total).tobytes()
            chunks = []
            for i, s in enumerate(strands):
                if i:
                    chunks.append(np.float32(np.inf).tobytes())
                chunks.append(np.asarray(s, "<f4").tobytes())
            p.write_bytes(buf + b"".join(chunks))
        else:
            lines = []
            for i, s in enumerate(strands):
                if i:
                    lines.append("")
                lines += [" ".join(str(x) for x in row) for row in s]
            p.write_text("\n".join(lines))
        return p, strands

    @pytest.mark.parametrize("binary", [False, True])
    def test_load_formats(self, tmp_path, binary):
        from mitsuba_im_tpu.scene.shapes import load_hair

        p, strands = self.make_hair_file(tmp_path, binary)
        got = load_hair(str(p))
        assert len(got) == 2
        np.testing.assert_allclose(got[0], strands[0], atol=1e-6)
        np.testing.assert_allclose(got[1], strands[1], atol=1e-6)

    def test_tessellation_geometry(self, tmp_path):
        from mitsuba_im_tpu.scene.shapes import load_hair, tessellate_hair

        p, strands = self.make_hair_file(tmp_path)
        mesh = tessellate_hair(load_hair(str(p)), radius=0.01, sides=4)
        # 3+2 vertices -> 5 rings of 4; 3 segments -> 3*4*2 tris
        assert mesh.positions.shape == (20, 3)
        assert mesh.indices.shape == (24, 3)
        # every ring vertex is exactly radius away from its control point
        d0 = np.linalg.norm(mesh.positions[:4] - strands[0][0], axis=-1)
        np.testing.assert_allclose(d0, 0.01, rtol=1e-5)
        # normals are unit and radial
        n = np.linalg.norm(mesh.normals, axis=-1)
        np.testing.assert_allclose(n, 1.0, rtol=1e-5)

    def test_hair_scene_renders(self, tmp_path):
        p, _ = self.make_hair_file(tmp_path)
        xml = textwrap.dedent(f"""\
        <scene version="0.6.0">
            <integrator type="direct"/>
            <sensor type="perspective">
                <transform name="toWorld">
                    <lookat origin="0,0.2,1.2" target="0,0.2,0" up="0,1,0"/>
                </transform>
                <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
                <film type="hdrfilm"><integer name="width" value="16"/>
                    <integer name="height" value="16"/><rfilter type="box"/></film>
            </sensor>
            <shape type="hair">
                <string name="filename" value="{p}"/>
                <float name="radius" value="0.02"/>
                <bsdf type="diffuse"><rgb name="reflectance" value="0.8,0.4,0.2"/></bsdf>
            </shape>
            <emitter type="constant"><rgb name="radiance" value="1.0"/></emitter>
        </scene>
        """)
        sp = tmp_path / "hair.xml"
        sp.write_text(xml)
        from mitsuba_im_tpu.scene.xml import load_scene
        from mitsuba_im_tpu.render.job import render

        scene, settings = load_scene(str(sp))
        assert scene.geom.n_tris >= 24
        img = render(scene, settings)
        assert np.isfinite(img).all()
        # hair occludes part of the constant background
        assert img.min() < 0.9


class TestHGridVolume:
    def test_dictionary_roundtrip(self, tmp_path):
        from mitsuba_im_tpu.media.volume import write_vol, read_hgrid
        import struct

        # 2x1x1 cell dictionary; only cell (0,0,0) and (1,0,0) present
        blocks = {(0, 0, 0): np.full((4, 4, 4), 2.0, np.float32),
                  (1, 0, 0): np.full((4, 4, 4), 5.0, np.float32)}
        for (bx, by, bz), d in blocks.items():
            write_vol(str(tmp_path / f"vol_{bx:03d}_{by:03d}_{bz:03d}.vol"),
                      d, [0, 0, 0], [1, 1, 1])
        dict_path = tmp_path / "hgrid.dict"
        with open(dict_path, "wb") as f:
            f.write(struct.pack("<6f", 0, 0, 0, 2, 1, 1))
            f.write(struct.pack("<3i", 2, 1, 1))
            for b in blocks:
                f.write(struct.pack("<3i", *b))
        rec = read_hgrid(str(dict_path), str(tmp_path / "vol_"), ".vol")
        assert rec["data"].shape == (4, 4, 8, 1)
        assert rec["data"][0, 0, 0, 0] == 2.0
        assert rec["data"][0, 0, 7, 0] == 5.0
        np.testing.assert_allclose(rec["bmax"], [2, 1, 1])

    def test_registered_factory(self, tmp_path):
        from mitsuba_im_tpu.media.volume import write_vol
        from mitsuba_im_tpu.core.registry import create
        from mitsuba_im_tpu.core.properties import Properties
        import struct

        write_vol(str(tmp_path / "g_000_000_000.vol"),
                  np.ones((2, 2, 2), np.float32), [0, 0, 0], [1, 1, 1])
        dp = tmp_path / "h.dict"
        with open(dp, "wb") as f:
            f.write(struct.pack("<6f", 0, 0, 0, 1, 1, 1))
            f.write(struct.pack("<3i", 1, 1, 1))
            f.write(struct.pack("<3i", 0, 0, 0))
        props = Properties("hgridvolume")
        props.set("filename", str(dp))
        props.set("prefix", str(tmp_path / "g_"))
        props.set("postfix", ".vol")
        rec = create("volume", props, None)
        assert rec["data"].max() == 1.0
        assert rec["data"].shape == (2, 2, 2, 1)


@pytest.mark.quick
class TestDeformable:
    """Keyframed motion blur (src/shapes/deformable.cpp / sahkdtree4.h)."""

    def _write_frames(self, td):
        import numpy as np
        from mitsuba_im_tpu.scene.mesh import TriMesh, save_serialized

        quad = lambda dx: TriMesh(
            np.array([[-0.3 + dx, 0, 0], [0.3 + dx, 0, 0],
                      [0.3 + dx, 0.6, 0], [-0.3 + dx, 0.6, 0]], np.float64),
            np.array([[0, 1, 2], [0, 2, 3]], np.int64))
        path = os.path.join(td, "frames.serialized")
        save_serialized(path, [quad(-0.6), quad(0.6)])  # slides right
        return path

    def _scene(self, td, shutter):
        import textwrap
        from mitsuba_im_tpu.scene.xml import load_scene

        xml = textwrap.dedent(f"""\
        <scene version="0.6.0">
            <integrator type="path"><integer name="maxDepth" value="2"/></integrator>
            <sensor type="perspective">
                <float name="fov" value="45"/>
                <float name="shutterOpen" value="0"/>
                <float name="shutterClose" value="{shutter}"/>
                <transform name="toWorld">
                    <lookat origin="0, 0.3, 2.5" target="0, 0.3, 0" up="0, 1, 0"/>
                </transform>
                <film type="hdrfilm">
                    <integer name="width" value="48"/>
                    <integer name="height" value="32"/>
                </film>
            </sensor>
            <shape type="deformable">
                <string name="filename" value="{td}/frames.serialized"/>
                <bsdf type="diffuse"/>
            </shape>
            <emitter type="constant"><rgb name="radiance" value="1 1 1"/></emitter>
        </scene>
        """)
        p = os.path.join(td, "s.xml")
        open(p, "w").write(xml)
        return load_scene(p)

    @pytest.mark.slow
    def test_motion_blur_sweeps(self, tmp_path):
        from mitsuba_im_tpu.render.job import render

        td = str(tmp_path)
        self._write_frames(td)
        scene, settings = self._scene(td, shutter=1.0)
        assert scene.motion is not None
        img_blur = render(scene, settings, spp=16)

        scene0, settings0 = self._scene(td, shutter=0.0)  # frozen at t=0
        img_t0 = render(scene0, settings0, spp=4)

        lum_b = img_blur.mean(-1)
        lum_0 = img_t0.mean(-1)
        # t=0: quad occupies image-left only; right third must differ
        # once the shutter sweeps the quad across
        left = np.s_[8:24, 4:16]
        right = np.s_[8:24, 32:44]
        assert abs(lum_0[left].mean() - lum_b[left].mean()) > 0.02
        assert abs(lum_0[right].mean() - lum_b[right].mean()) > 0.02
        # blurred image has partial coverage (values strictly between the
        # frozen frame's occupied / empty extremes) in the swept band
        band = lum_b[8:24, 16:32]
        assert band.std() > 0.0

    def test_time_lerp_midpoint(self, tmp_path):
        import jax.numpy as jnp

        td = str(tmp_path)
        self._write_frames(td)
        scene, _ = self._scene(td, shutter=1.0)
        mid = scene.with_time(jnp.float32(0.5))
        p0 = np.asarray(mid.geom.tri_p0)
        p0_a = np.asarray(scene.geom.tri_p0)
        p0_b = np.asarray(scene.motion["p0"])
        np.testing.assert_allclose(p0, 0.5 * (p0_a + p0_b), atol=1e-6)


class TestLargeDeformable:
    @pytest.mark.slow
    def test_large_deformable_uses_motion_hierarchy(self, tmp_path):
        """Above BRUTE_FORCE_MAX a deformable scene now builds the
        union-AABB motion hierarchy instead of warning + brute fallback."""
        import numpy as np
        from mitsuba_im_tpu.scene.build import SceneBuilder
        from mitsuba_im_tpu.scene.mesh import TriMesh
        from mitsuba_im_tpu.core.registry import create as reg_create
        from mitsuba_im_tpu.core.properties import Properties
        from mitsuba_im_tpu.core.transform import Transform
        from mitsuba_im_tpu.sensor.table import make_sensor, S_PERSPECTIVE
        from bench_scenes import _displaced_sphere

        pos, idx = _displaced_sphere(1500)
        pos2 = pos + np.array([0.05, 0.0, 0.0]) + 0.01 * np.sin(pos * 9)
        b = SceneBuilder()
        bid = b.add_bsdf(reg_create("bsdf", Properties("diffuse"), b))
        sid = b.new_shape(bid)
        b.add_trimesh_motion(TriMesh(pos, idx).compute_normals(),
                             TriMesh(pos2, idx).compute_normals(), sid)
        b.add_emitter(reg_create("emitter", Properties("constant"), b))
        b.sensor = make_sensor(
            S_PERSPECTIVE,
            Transform.look_at([0, 0.05, 0.4], [0, 0, 0], [0, 1, 0]),
            fov_deg=40.0)
        scene, settings = b.build()
        assert scene.clusters is not None and scene.clusters.has_motion
        # shutter snapshot wires the time into the hierarchy
        s_half = scene.with_time(0.5)
        assert float(s_half.clusters.time) == 0.5
        # smoke render
        from mitsuba_im_tpu.render.job import render

        settings.width = settings.height = 12
        settings.spp = 2
        img = np.asarray(render(scene, settings))
        assert np.isfinite(img).all() and img.mean() > 0.01
