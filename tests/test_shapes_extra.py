"""Hair shape + hierarchical grid volume (round-2 de-stubbed plugins)."""
import textwrap

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
