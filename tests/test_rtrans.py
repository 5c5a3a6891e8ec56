"""Rough dielectric transmittance tables (bsdf/rtrans.py — the analog of
the reference's rtrans.h + rdielprec utility; consumed by roughplastic)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_im_tpu.bsdf import rtrans
from mitsuba_im_tpu.bsdf.microfacet import DIST_BECKMANN, DIST_GGX


def smooth_fresnel_t(ct, eta):
    F, _ = rtrans._fresnel_np(np.asarray(ct, np.float64), eta)
    return 1.0 - F


class TestTables:
    def test_smooth_limit_matches_fresnel(self):
        # alpha knot 0 is ~specular: T must equal 1 - F exactly
        trans, _ = rtrans.load_tables()
        cts = rtrans.ct_knots()
        etas = rtrans.eta_knots()
        for d in range(2):
            for blk in range(2):
                e = etas[7] if blk == 0 else 1.0 / etas[7]
                ref = smooth_fresnel_t(cts, e)
                np.testing.assert_allclose(
                    trans[d, blk, 7, 0], ref, atol=2e-3)

    def test_range_and_shape(self):
        trans, diff = rtrans.load_tables()
        assert trans.shape == (2, 2, rtrans.NE, rtrans.NA, rtrans.NT)
        assert diff.shape == (2, 2, rtrans.NE, rtrans.NA)
        assert (trans >= 0).all() and (trans <= 1).all()
        assert (diff >= 0).all() and (diff <= 1).all()

    def test_internal_less_than_external(self):
        # leaving a denser medium (TIR cone) transmits less on average
        _, diff = rtrans.load_tables()
        assert (diff[:, 1, 4:] <= diff[:, 0, 4:] + 1e-3).all()

    def test_interp_matches_table_at_knots(self):
        trans, _ = rtrans.load_tables()
        etas, alphas, cts = (rtrans.eta_knots(), rtrans.alpha_knots(),
                             rtrans.ct_knots())
        ie, ia, it = 5, 9, 20
        for d_code, d_idx in ((DIST_BECKMANN, 0), (DIST_GGX, 1)):
            got = rtrans.rtrans_eval_v(
                jnp.full((1,), d_code, jnp.int32),
                jnp.full((1,), cts[it], jnp.float32),
                jnp.full((1,), alphas[ia], jnp.float32),
                jnp.full((1,), etas[ie], jnp.float32))
            np.testing.assert_allclose(
                float(got[0]), trans[d_idx, 0, ie, ia, it], atol=3e-3)

    def test_diffuse_interp_sane(self):
        # Fdr from the internal diffuse table ~ classic smooth Fdr at
        # alpha->0 (Egan & Hilgeman fit gives ~0.668 for eta=1.5)
        fdr = 1.0 - float(rtrans.rtrans_diffuse_v(
            jnp.full((1,), DIST_GGX, jnp.int32),
            jnp.full((1,), 1e-5, jnp.float32),
            jnp.full((1,), 1.0 / 1.5, jnp.float32))[0])
        assert 0.55 < fdr < 0.72


class TestRoughPlastic:
    @pytest.mark.slow
    def test_eval_energy_bounded(self):
        # hemispherical reflectance of roughplastic stays <= 1 (the whole
        # point of the transmittance tables; roughplastic.cpp:373-382)
        from mitsuba_im_tpu.bsdf import common as bc
        from mitsuba_im_tpu.bsdf.eval import bsdf_sample
        from mitsuba_im_tpu.core import rng as mrng

        rec = bc.default_record()
        rec.update(type=bc.ROUGHPLASTIC, dist=DIST_GGX,
                   alpha_u=0.4, alpha_v=0.4, refl=np.full(3, 1.0))
        from mitsuba_im_tpu.texture.texture import TextureBuilder
        table = bc.build_table([rec])
        tex = TextureBuilder().build()
        n = 1 << 15
        p = bc.resolve(table, tex, jnp.zeros(n, jnp.int32),
                       jnp.zeros((n, 2), jnp.float32))
        s = mrng.make_sampler(jnp.arange(n), 0, 3)
        s, u1 = mrng.next_1d(s)
        s, u2 = mrng.next_2d(s)
        wi = jnp.broadcast_to(jnp.asarray([0.3, 0.1, 0.949], jnp.float32)
                              / np.linalg.norm([0.3, 0.1, 0.949]), (n, 3))
        out = bsdf_sample(p, wi, u1, u2)
        albedo = np.asarray(out.weight).mean(0)
        assert (albedo <= 1.02).all(), albedo
        assert (albedo > 0.3).all()  # and it isn't absurdly dark
