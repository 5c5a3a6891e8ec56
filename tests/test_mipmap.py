"""MIP pyramid + anisotropic filtering + ray differentials
(reference: include/mitsuba/render/mipmap.h, integrator2.h PixelDifferential)."""
import os
import sys
import textwrap
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _checker_pixels(n=64, c=8):
    y, x = np.mgrid[0:n, 0:n]
    a = (((x // c) + (y // c)) % 2).astype(np.float32)
    return np.repeat(a[:, :, None], 3, axis=2)


@pytest.mark.quick
class TestMipPyramid:
    def test_pyramid_levels_average(self):
        from mitsuba_im_tpu.texture.texture import TextureBuilder

        tb = TextureBuilder()
        tb.add_bitmap(_checker_pixels(64))
        t = tb.build()
        assert t.has_mip
        nl = int(np.asarray(t.n_levels)[0])
        assert nl == 7  # 64 -> 1
        offs = np.asarray(t.mip_offset)[0]
        atlas = np.asarray(t.atlas)
        # every level preserves the mean (box filter is energy conserving)
        w = 64
        for l in range(nl):
            lw = max(w >> l, 1)
            lvl = atlas[offs[l]: offs[l] + lw * lw]
            np.testing.assert_allclose(lvl.mean(), 0.5, atol=1e-5)
        # coarsest level is the global average
        np.testing.assert_allclose(atlas[offs[nl - 1]], 0.5, atol=1e-5)

    @pytest.mark.slow
    def test_filtered_lookup_converges_to_mean(self):
        """A footprint covering the whole texture returns its average."""
        from mitsuba_im_tpu.texture.texture import (TextureBuilder,
                                                    eval_texture_v)

        tb = TextureBuilder()
        tid = tb.add_bitmap(_checker_pixels(64))
        t = tb.build()
        n = 8
        ids = jnp.full((n,), tid, jnp.int32)
        u = jnp.linspace(0.1, 0.9, n)
        v = jnp.linspace(0.1, 0.9, n)
        big = jnp.full((n,), 1.0)
        z = jnp.zeros((n,))
        c = eval_texture_v(t, ids, u, v, None, duv=(big, z, z, big))
        np.testing.assert_allclose(np.asarray(c.to_array()), 0.5, atol=0.02)

    def test_zero_footprint_matches_bilinear(self):
        from mitsuba_im_tpu.texture.texture import (TextureBuilder,
                                                    eval_texture_v)

        tb = TextureBuilder()
        tid = tb.add_bitmap(_checker_pixels(64))
        t = tb.build()
        n = 16
        rng = np.random.default_rng(3)
        ids = jnp.full((n,), tid, jnp.int32)
        u = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        v = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        z = jnp.zeros((n,))
        c_f = eval_texture_v(t, ids, u, v, None, duv=(z, z, z, z))
        c_b = eval_texture_v(t, ids, u, v, None)
        np.testing.assert_allclose(np.asarray(c_f.to_array()),
                                   np.asarray(c_b.to_array()), atol=1e-5)


@pytest.mark.quick
class TestGrazingCheckerboard:
    @pytest.mark.slow
    def test_mip_reduces_grazing_aliasing(self):
        """BASELINE 'textured' config regime: a grazing checkered floor.
        With ray differentials the far field converges to the 0.5 mean;
        bilinear-only sampling aliases (high pixel-to-pixel variance)."""
        from mitsuba_im_tpu.scene.build import SceneBuilder
        from mitsuba_im_tpu.scene.mesh import TriMesh
        from mitsuba_im_tpu.core.transform import Transform
        from mitsuba_im_tpu.core.registry import create as reg_create
        from mitsuba_im_tpu.core.properties import Properties
        from mitsuba_im_tpu.sensor.table import make_sensor, S_PERSPECTIVE
        from mitsuba_im_tpu.film.film import F_BOX
        from mitsuba_im_tpu.render.job import render

        def build(with_mip):
            b = SceneBuilder()
            tex_id = b.textures.add_bitmap(_checker_pixels(128, 8),
                                           uvscale=(40, 40))
            if not with_mip:
                # strip the pyramid: pretend only the base level exists
                recs = b.textures.records
                recs[tex_id]["n_levels"] = 1
            bp = Properties("diffuse")
            bid = b.add_bsdf(reg_create("bsdf", bp, b))
            b.bsdf_records[bid]["refl_tex"] = tex_id
            sid = b.new_shape(bid)
            # big floor quad
            pos = np.array([[-50, 0, -50], [50, 0, -50], [50, 0, 50],
                            [-50, 0, 50]], np.float32)
            idx = np.array([[0, 2, 1], [0, 3, 2]], np.int64)
            uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
            b.add_trimesh(TriMesh(pos, idx, uvs=uv), sid)
            ep = Properties("constant")
            b.add_emitter(reg_create("emitter", ep, b))
            b.sensor = make_sensor(
                S_PERSPECTIVE,
                Transform.look_at([0, 1.0, 0], [0, 0.7, -8], [0, 1, 0]),
                fov_deg=45.0)
            b.settings.width = b.settings.height = 64
            b.settings.spp = 1
            b.settings.rfilter = F_BOX
            b.settings.integrator = "path"
            b.settings.integrator_props = {"max_depth": 2}
            scene, settings = b.build()
            return scene, settings

        scene_m, settings = build(True)
        img_mip = render(scene_m, settings, spp=4)
        scene_b, settings_b = build(False)
        img_bil = render(scene_b, settings_b, spp=4)

        # far-field rows (top of the floor region): MIP converges to the
        # checker mean; bilinear point-samples the pattern and aliases
        def roughness(img):
            band = img[28:36, :, 0]
            return float(np.abs(np.diff(band, axis=1)).mean())

        assert roughness(img_mip) < 0.5 * roughness(img_bil)
        # both must agree on overall brightness (filter preserves energy)
        assert abs(float(img_mip.mean()) - float(img_bil.mean())) < 0.08
