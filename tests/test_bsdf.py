"""BSDF validation: chi-square GOF of sample() vs pdf(), sample-weight
consistency (weight == eval/pdf), reciprocity-style sanity, and energy
conservation.  Mirrors the reference's ``test_chisquare.cpp`` strategy
(SURVEY.md §4) over the fixture set of ``data/tests/test_bsdf.xml``.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_im_tpu.bsdf import common as bc
from mitsuba_im_tpu.bsdf.eval import bsdf_eval, bsdf_pdf, bsdf_sample
from mitsuba_im_tpu.bsdf.microfacet import DIST_BECKMANN, DIST_GGX
from mitsuba_im_tpu.core import rng as mrng
from mitsuba_im_tpu.core.chisquare import chi2_test
from mitsuba_im_tpu.core import math as m
from mitsuba_im_tpu.texture.texture import TextureBuilder


def make_params(n, **overrides):
    rec = bc.default_record()
    rec.update(overrides)
    table = bc.build_table([rec])
    tex = TextureBuilder().build()
    ids = jnp.zeros(n, jnp.int32)
    uv = jnp.zeros((n, 2), jnp.float32)
    return bc.resolve(table, tex, ids, uv)


def unit(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


def run_chi2(record, wi, seed=7, n=1 << 17):
    wi_np = unit(wi)

    def sample_fn(nn):
        p = make_params(nn, **record)
        s = mrng.make_sampler(jnp.arange(nn), 0, seed)
        s, u1 = mrng.next_1d(s)
        s, u2 = mrng.next_2d(s)
        wi_b = jnp.broadcast_to(jnp.asarray(wi_np, jnp.float32), (nn, 3))
        out = bsdf_sample(p, wi_b, u1, u2)
        keep = (
            np.asarray(~out.delta)
            & (np.asarray(out.pdf) > 1e-9)
            & (np.linalg.norm(np.asarray(out.weight), axis=-1) > 0)
        )
        return np.asarray(out.wo)[keep]

    def pdf_fn(dirs):
        nn = len(dirs)
        p = make_params(nn, **record)
        wi_b = jnp.broadcast_to(jnp.asarray(wi_np, jnp.float32), (nn, 3))
        return np.asarray(bsdf_pdf(p, wi_b, jnp.asarray(dirs, jnp.float32)))

    ok, pval, info = chi2_test(sample_fn, pdf_fn, n_samples=n)
    assert ok, f"{record.get('type')}: {info}"


WI_GRAZING = [0.8, 0.2, 0.35]
WI_STEEP = [0.1, -0.05, 0.99]

CHI2_CASES = [
    ("diffuse", dict(type=bc.DIFFUSE, refl=np.full(3, 0.8)), WI_GRAZING),
    ("roughdiffuse", dict(type=bc.ROUGHDIFFUSE, alpha_u=0.4, alpha_v=0.4), WI_GRAZING),
    (
        "roughconductor_ggx",
        dict(type=bc.ROUGHCONDUCTOR, dist=DIST_GGX, alpha_u=0.3, alpha_v=0.3,
             eta=np.array([0.2, 0.9, 1.4]), k=np.array([3.9, 2.5, 2.1])),
        WI_GRAZING,
    ),
    (
        "roughconductor_beckmann",
        dict(type=bc.ROUGHCONDUCTOR, dist=DIST_BECKMANN, alpha_u=0.3, alpha_v=0.3,
             eta=np.array([0.2, 0.9, 1.4]), k=np.array([3.9, 2.5, 2.1])),
        WI_GRAZING,
    ),
    (
        "roughconductor_aniso",
        dict(type=bc.ROUGHCONDUCTOR, dist=DIST_GGX, alpha_u=0.1, alpha_v=0.4,
             eta=np.array([0.2, 0.9, 1.4]), k=np.array([3.9, 2.5, 2.1])),
        WI_GRAZING,
    ),
    (
        "roughdielectric",
        dict(type=bc.ROUGHDIELECTRIC, dist=DIST_GGX, alpha_u=0.3, alpha_v=0.3,
             eta_s=1.5),
        WI_GRAZING,
    ),
    (
        "roughdielectric_inside",
        dict(type=bc.ROUGHDIELECTRIC, dist=DIST_GGX, alpha_u=0.35, alpha_v=0.35,
             eta_s=1.5),
        [0.3, 0.1, -0.95],
    ),
    ("plastic", dict(type=bc.PLASTIC, refl=np.full(3, 0.5)), WI_GRAZING),
    (
        "roughplastic",
        dict(type=bc.ROUGHPLASTIC, dist=DIST_GGX, alpha_u=0.3, alpha_v=0.3,
             refl=np.full(3, 0.5)),
        WI_GRAZING,
    ),
    ("phong", dict(type=bc.PHONG, exponent=30.0, refl=np.full(3, 0.4),
                   spec=np.full(3, 0.3)), WI_GRAZING),
    ("ward", dict(type=bc.WARD, alpha_u=0.25, alpha_v=0.4, refl=np.full(3, 0.4),
                  spec=np.full(3, 0.3)), WI_GRAZING),
    ("difftrans", dict(type=bc.DIFFTRANS, trans=np.full(3, 0.7)), WI_STEEP),
]


@pytest.mark.parametrize("name,rec,wi", CHI2_CASES, ids=[c[0] for c in CHI2_CASES])
def test_chi2(name, rec, wi):
    run_chi2(rec, wi)


class TestWeightConsistency:
    """sample().weight must equal eval()/pdf() at the sampled direction for
    non-delta lobes (the invariant the reference's bidir verification layer
    checks along paths, verification.cpp:24)."""

    @pytest.mark.parametrize(
        "rec",
        [
            dict(type=bc.DIFFUSE),
            dict(type=bc.ROUGHCONDUCTOR, dist=DIST_GGX, alpha_u=0.2, alpha_v=0.2),
            dict(type=bc.ROUGHDIELECTRIC, dist=DIST_GGX, alpha_u=0.3, alpha_v=0.3),
            dict(type=bc.ROUGHPLASTIC, dist=DIST_GGX, alpha_u=0.25, alpha_v=0.25),
            dict(type=bc.PHONG),
            dict(type=bc.WARD, alpha_u=0.3, alpha_v=0.2),
        ],
        ids=lambda r: bc.TYPE_NAMES[r["type"]],
    )
    def test_weight_eq_eval_over_pdf(self, rec):
        n = 4096
        p = make_params(n, **rec)
        s = mrng.make_sampler(jnp.arange(n), 0, 11)
        s, u1 = mrng.next_1d(s)
        s, u2 = mrng.next_2d(s)
        wi = jnp.broadcast_to(jnp.asarray(unit([0.4, 0.1, 0.7]), jnp.float32), (n, 3))
        out = bsdf_sample(p, wi, u1, u2)
        ev = bsdf_eval(p, wi, out.wo)
        pdf = bsdf_pdf(p, wi, out.wo)
        keep = (
            np.asarray(~out.delta)
            & (np.asarray(pdf) > 1e-5)
            & (np.linalg.norm(np.asarray(out.weight), axis=-1) > 1e-6)
        )
        expected = np.asarray(ev)[keep] / np.asarray(pdf)[keep][:, None]
        got = np.asarray(out.weight)[keep]
        np.testing.assert_allclose(got, expected, rtol=2e-2, atol=1e-4)


class TestEnergy:
    def test_diffuse_white_furnace(self):
        """Integral of eval over the sphere = albedo (cosine importance)."""
        n = 1 << 16
        p = make_params(n, type=bc.DIFFUSE, refl=np.full(3, 0.75))
        s = mrng.make_sampler(jnp.arange(n), 0, 3)
        s, u1 = mrng.next_1d(s)
        s, u2 = mrng.next_2d(s)
        wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
        out = bsdf_sample(p, wi, u1, u2)
        mean_w = np.asarray(out.weight).mean(0)
        np.testing.assert_allclose(mean_w, 0.75, atol=0.01)

    def test_dielectric_energy_conservation(self):
        """Smooth dielectric: E[weight] = 1 (perfect specular, no loss)."""
        n = 1 << 14
        p = make_params(n, type=bc.DIELECTRIC, eta_s=1.5)
        s = mrng.make_sampler(jnp.arange(n), 0, 5)
        s, u1 = mrng.next_1d(s)
        s, u2 = mrng.next_2d(s)
        wi = jnp.broadcast_to(jnp.asarray(unit([0.3, 0.0, 0.8]), jnp.float32), (n, 3))
        out = bsdf_sample(p, wi, u1, u2)
        assert np.asarray(out.delta).all()
        # reflected + eta^2-scaled transmitted sum to 1 in radiance transport
        w = np.asarray(out.weight)[:, 0]
        eta = np.asarray(out.eta)
        undo_scale = np.where(eta != 1.0, eta**2, 1.0)
        np.testing.assert_allclose((w * undo_scale).mean(), 1.0, atol=0.01)

    def test_conductor_reflect(self):
        n = 128
        p = make_params(
            n, type=bc.CONDUCTOR,
            eta=np.array([0.2, 0.9, 1.4]), k=np.array([3.9, 2.5, 2.1]),
        )
        s = mrng.make_sampler(jnp.arange(n), 0, 5)
        s, u1 = mrng.next_1d(s)
        s, u2 = mrng.next_2d(s)
        wi = jnp.broadcast_to(jnp.asarray(unit([0.5, 0.2, 0.6]), jnp.float32), (n, 3))
        out = bsdf_sample(p, wi, u1, u2)
        wo = np.asarray(out.wo)
        np.testing.assert_allclose(wo[:, 2], np.asarray(wi)[:, 2], atol=1e-6)
        np.testing.assert_allclose(wo[:, :2], -np.asarray(wi)[:, :2], atol=1e-6)
        w = np.asarray(out.weight)
        assert (w > 0).all() and (w < 1).all()

    def test_twosided_flag(self):
        n = 64
        p = make_params(n, type=bc.DIFFUSE, refl=np.full(3, 0.6),
                        flags=bc.FLAG_TWOSIDED)
        wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], jnp.float32), (n, 3))
        wo = jnp.broadcast_to(
            jnp.asarray(unit([0.2, 0.1, -0.9]), jnp.float32), (n, 3)
        )
        ev = np.asarray(bsdf_eval(p, wi, wo))
        assert (ev > 0).all()  # back side responds under twosided
        p1 = make_params(n, type=bc.DIFFUSE, refl=np.full(3, 0.6))
        ev1 = np.asarray(bsdf_eval(p1, wi, wo))
        assert (ev1 == 0).all()  # one-sided diffuse is dark from behind
