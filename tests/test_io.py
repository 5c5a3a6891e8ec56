"""Image I/O codec tests: EXR (ZIP write/read + PIZ read of the reference
fixture), PNG/RGBE/PFM round trips, and envmap importance sampling built on
the decoded reference map."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_im_tpu.io import bitmap as bmp
from mitsuba_im_tpu.io.exr import read_exr, write_exr
from mitsuba_im_tpu.io.png import read_png, write_png

ENVMAP = "/root/reference/data/tests/envmap.exr"


class TestEXR:
    def test_zip_roundtrip(self, tmp_path, rng):
        img = rng.uniform(0, 4, (37, 61, 3)).astype(np.float32)
        p = str(tmp_path / "t.exr")
        write_exr(p, img, half=False)
        back, meta = read_exr(p)
        np.testing.assert_allclose(back, img, atol=1e-6)

    def test_half_roundtrip(self, tmp_path, rng):
        img = rng.uniform(0, 4, (16, 16, 3)).astype(np.float32)
        p = str(tmp_path / "t16.exr")
        write_exr(p, img, half=True)
        back, _ = read_exr(p)
        np.testing.assert_allclose(back, img, rtol=1e-3)

    def test_metadata(self, tmp_path):
        p = str(tmp_path / "m.exr")
        write_exr(p, np.zeros((4, 4, 3), np.float32), metadata={"spp": "64"})
        _, meta = read_exr(p)
        assert meta.get("spp") == "64"

    @pytest.mark.skipif(not os.path.exists(ENVMAP), reason="no reference data")
    def test_piz_reference_envmap(self):
        img, _ = read_exr(ENVMAP)
        assert img.shape == (256, 512, 3)
        assert np.isfinite(img).all() and (img >= 0).all()
        # the gallery HDR: indoor scene, known gross statistics
        assert 0.2 < img.mean() < 0.5
        assert img.max() > 5.0  # bright windows/lights
        # decode determinism
        img2, _ = read_exr(ENVMAP)
        np.testing.assert_array_equal(img, img2)


class TestOtherCodecs:
    def test_png_roundtrip(self, tmp_path, rng):
        img = rng.uniform(0, 1, (23, 31, 3)).astype(np.float32)
        p = str(tmp_path / "t.png")
        write_png(p, img)
        back = read_png(p)
        np.testing.assert_allclose(back, img, atol=1 / 255.0 + 1e-6)

    def test_png16_roundtrip(self, tmp_path, rng):
        img = rng.uniform(0, 1, (9, 11, 3)).astype(np.float32)
        p = str(tmp_path / "t16.png")
        write_png(p, img, depth=16)
        back = read_png(p)
        np.testing.assert_allclose(back, img, atol=1 / 65535.0 + 1e-6)

    def test_rgbe_roundtrip(self, tmp_path, rng):
        img = rng.uniform(0, 10, (8, 12, 3)).astype(np.float32)
        p = str(tmp_path / "t.hdr")
        bmp.save(p, img)
        back = bmp.load(p)
        # shared-exponent format: small channels quantize relative to the
        # per-pixel max (1/256 of it), so tolerance is per-pixel absolute
        tol = img.max(axis=-1, keepdims=True) / 256.0 + 1e-6
        assert (np.abs(back - img) <= tol).all()

    def test_pfm_roundtrip(self, tmp_path, rng):
        img = rng.uniform(0, 10, (8, 12, 3)).astype(np.float32)
        p = str(tmp_path / "t.pfm")
        bmp.save(p, img)
        back = bmp.load(p)
        np.testing.assert_allclose(back, img, atol=1e-6)

    @pytest.mark.parametrize("ext", ["tga", "bmp"])
    def test_ldr_roundtrip(self, tmp_path, rng, ext):
        # LDR containers hold sRGB u8; round-trip through the linear<->sRGB
        # transfer quantizes, so tolerance is the u8 step in linear space
        img = rng.uniform(0, 1, (13, 17, 3)).astype(np.float32)
        p = str(tmp_path / f"t.{ext}")
        bmp.save(p, img)
        back = bmp.load(p)
        assert back.shape == img.shape
        np.testing.assert_allclose(back, img, atol=0.02)

    def test_tga_rle_read(self, tmp_path):
        # hand-build an RLE (type 10) TGA: 4x1 all-red via one run packet
        import struct as st
        hdr = st.pack("<BBBHHBHHHHBB", 0, 0, 10, 0, 0, 0, 0, 0, 4, 1, 24, 0x20)
        data = bytes([0x83, 0, 0, 255])  # run of 4, BGR = red
        p = tmp_path / "rle.tga"
        p.write_bytes(hdr + data)
        back = bmp.load(str(p), gamma_correct=False)
        assert back.shape == (1, 4, 3)
        np.testing.assert_allclose(back, [[[1, 0, 0]] * 4], atol=1e-6)

    def test_jpeg_roundtrip(self, tmp_path, rng):
        pytest.importorskip("PIL")
        img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
        p = str(tmp_path / "t.jpg")
        bmp.save(p, img)
        back = bmp.load(p)
        assert back.shape == img.shape  # lossy: only shape/range sanity
        assert (back >= 0).all() and (back <= 1.0001).all()


@pytest.mark.skipif(not os.path.exists(ENVMAP), reason="no reference data")
@pytest.mark.slow
class TestEnvmapSampling:
    def test_importance_sampling_integral(self):
        """E[L/pdf] over envmap NEE samples equals the direct integral of
        the map over the sphere (validates the 2D CDF + pdf conversion)."""
        from mitsuba_im_tpu.scene.build import SceneBuilder
        from mitsuba_im_tpu.emitter import table as et
        from mitsuba_im_tpu.core import rng as mrng

        img, _ = read_exr(ENVMAP)
        b = SceneBuilder()
        sid = b.new_shape(b.default_bsdf())
        b.add_sphere([0, 0, 0], 0.1, sid)
        b.add_emitter(dict(type=et.EM_ENVMAP, radiance=np.ones(3),
                           pixels=img[..., :3]))
        scene, _s = b.build()

        n = 1 << 15
        s = mrng.make_sampler(jnp.arange(n), 0, 3)
        s, u1 = mrng.next_1d(s)
        s, u2 = mrng.next_2d(s)
        p = jnp.zeros((n, 3))
        ds = et.sample_direct(scene.emitters, scene.geom, p, u1, u2)
        est = np.asarray(ds.value / ds.pdf[:, None]).mean(0)

        # direct integral: sum L(u,v) * sin(theta) * dtheta * dphi
        H, W = img.shape[:2]
        theta = (np.arange(H) + 0.5) / H * np.pi
        w = np.sin(theta)[:, None, None] * (np.pi / H) * (2 * np.pi / W)
        ref = (img[..., :3] * w).sum(axis=(0, 1))
        np.testing.assert_allclose(est, ref, rtol=0.02)

    def test_env_eval_pdf_consistency(self):
        """pdf_direct_env at sampled directions matches the sampling pdf."""
        from mitsuba_im_tpu.scene.build import SceneBuilder
        from mitsuba_im_tpu.emitter import table as et
        from mitsuba_im_tpu.core import rng as mrng

        img, _ = read_exr(ENVMAP)
        b = SceneBuilder()
        sid = b.new_shape(b.default_bsdf())
        b.add_sphere([0, 0, 0], 0.1, sid)
        b.add_emitter(dict(type=et.EM_ENVMAP, radiance=np.ones(3),
                           pixels=img[..., :3]))
        scene, _s = b.build()
        n = 4096
        s = mrng.make_sampler(jnp.arange(n), 0, 5)
        s, u1 = mrng.next_1d(s)
        s, u2 = mrng.next_2d(s)
        ds = et.sample_direct(scene.emitters, scene.geom, jnp.zeros((n, 3)), u1, u2)
        pdf2 = et.pdf_direct_env(scene.emitters, ds.d)
        np.testing.assert_allclose(
            np.asarray(ds.pdf), np.asarray(pdf2), rtol=2e-2, atol=1e-5
        )
        # eval_environment at sampled dirs returns the map radiance
        le = et.eval_environment(scene.emitters, ds.d)
        assert float(jnp.mean(jnp.abs(le - ds.value))) / float(jnp.mean(le)) < 0.05
