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
    ("coating", dict(type=bc.COATING, refl=np.full(3, 0.6), eta_s=1.5,
                     trans=np.full(3, 0.1)), WI_GRAZING),
    ("coating_steep", dict(type=bc.COATING, refl=np.full(3, 0.6), eta_s=1.3,
                           trans=np.zeros(3)), WI_STEEP),
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
            dict(type=bc.COATING, refl=np.full(3, 0.6), eta_s=1.5,
                 trans=np.full(3, 0.08)),
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


# ---------------------------------------------------------------------------
# Hanrahan-Krueger slab
# ---------------------------------------------------------------------------

class TestHK:
    def test_chi2(self):
        run_chi2(dict(type=bc.HK, refl=np.full(3, 0.9),
                      trans=np.full(3, 0.8), alpha_u=0.3, alpha_v=0.3),
                 WI_GRAZING)

    def test_weight_eq_eval_over_pdf(self):
        n = 4096
        p = make_params(n, type=bc.HK, refl=np.full(3, 0.7),
                        trans=np.full(3, 1.2), alpha_u=0.2, alpha_v=0.2)
        s = mrng.make_sampler(jnp.arange(n), 0, 3)
        s, u1 = mrng.next_1d(s)
        s, u2 = mrng.next_2d(s)
        wi = jnp.broadcast_to(jnp.asarray(unit([0.3, 0.1, 0.9]), jnp.float32), (n, 3))
        out = bsdf_sample(p, wi, u1, u2)
        smooth = ~np.asarray(out.delta)
        ev = np.asarray(bsdf_eval(p, wi, out.wo))[smooth]
        pdf = np.asarray(bsdf_pdf(p, wi, out.wo))[smooth]
        w = np.asarray(out.weight)[smooth]
        np.testing.assert_allclose(w, ev / pdf[..., None], rtol=1e-3, atol=1e-5)

    def test_energy_below_one(self):
        """Single scattering + delta transmission never exceeds unit energy."""
        n = 1 << 16
        p = make_params(n, type=bc.HK, refl=np.ones(3),
                        trans=np.full(3, 1.0), alpha_u=0.0, alpha_v=0.0)
        s = mrng.make_sampler(jnp.arange(n), 0, 11)
        s, u1 = mrng.next_1d(s)
        s, u2 = mrng.next_2d(s)
        wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
        out = bsdf_sample(p, wi, u1, u2)
        total = np.asarray(out.weight).mean(0)
        assert (total <= 1.0 + 1e-3).all()
        assert (total > 0.5).all()  # thin slab passes most energy


# ---------------------------------------------------------------------------
# blend / mixture stochastic selection
# ---------------------------------------------------------------------------

def _blend_table(w, refl_a, refl_b):
    rec_a = bc.default_record(); rec_a["refl"] = np.asarray(refl_a, np.float64)
    rec_b = bc.default_record(); rec_b["refl"] = np.asarray(refl_b, np.float64)
    top = bc.default_record()
    top.update(type=bc.BLEND, weight=w, nested=1, nested2=2)
    return bc.build_table([top, rec_a, rec_b])


class TestBlend:
    def test_selection_fraction(self):
        n = 1 << 16
        table = _blend_table(0.3, [1, 0, 0], [0, 1, 0])
        tex = TextureBuilder().build()
        s = mrng.make_sampler(jnp.arange(n), 0, 5)
        s, u = mrng.next_1d(s)
        p = bc.resolve(table, tex, jnp.zeros(n, jnp.int32),
                       jnp.zeros((n, 2), jnp.float32), u_sel=u)
        frac_b = float(np.asarray(p.refl[:, 1]).mean())
        np.testing.assert_allclose(frac_b, 0.3, atol=0.01)

    def test_expected_eval_is_mixture(self):
        """E[f_selected] = (1-w) f_a + w f_b over the selection RNG."""
        n = 1 << 16
        w = 0.65
        table = _blend_table(w, [0.8, 0.1, 0.1], [0.1, 0.1, 0.9])
        tex = TextureBuilder().build()
        s = mrng.make_sampler(jnp.arange(n), 0, 9)
        s, u = mrng.next_1d(s)
        p = bc.resolve(table, tex, jnp.zeros(n, jnp.int32),
                       jnp.zeros((n, 2), jnp.float32), u_sel=u)
        wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
        wo = jnp.broadcast_to(jnp.asarray(unit([0.3, 0.2, 0.93]), jnp.float32), (n, 3))
        ev = np.asarray(bsdf_eval(p, wi, wo)).mean(0)
        pa = make_params(1, refl=np.asarray([0.8, 0.1, 0.1]))
        pb = make_params(1, refl=np.asarray([0.1, 0.1, 0.9]))
        fa = np.asarray(bsdf_eval(pa, wi[:1], wo[:1]))[0]
        fb = np.asarray(bsdf_eval(pb, wi[:1], wo[:1]))[0]
        np.testing.assert_allclose(ev, (1 - w) * fa + w * fb, rtol=0.02)

    def test_mixture_factory_tree(self):
        from mitsuba_im_tpu.core.properties import Properties
        from mitsuba_im_tpu.core.registry import create
        from mitsuba_im_tpu.scene.build import SceneBuilder

        b = SceneBuilder()
        props = Properties("mixturebsdf")
        props.set("weights", "0.2, 0.3, 0.5")
        r1 = bc.default_record(); r1["refl"] = np.array([1.0, 0, 0])
        r2 = bc.default_record(); r2["refl"] = np.array([0, 1.0, 0])
        r3 = bc.default_record(); r3["refl"] = np.array([0, 0, 1.0])
        props.children["bsdf_list"] = [r1, r2, r3]
        top = create("bsdf", props, b)
        top_id = b.add_bsdf(top)
        table = bc.build_table(b.bsdf_records)
        tex = TextureBuilder().build()
        n = 1 << 16
        s = mrng.make_sampler(jnp.arange(n), 0, 13)
        s, u = mrng.next_1d(s)
        p = bc.resolve(table, tex, jnp.full(n, top_id, jnp.int32),
                       jnp.zeros((n, 2), jnp.float32), u_sel=u)
        refl = np.asarray(p.refl)
        fracs = refl.mean(0)
        np.testing.assert_allclose(fracs, [0.2, 0.3, 0.5], atol=0.015)


# ---------------------------------------------------------------------------
# bump / normal mapping
# ---------------------------------------------------------------------------

def _plane_scene(bump_kind, tex_pixels, bump_scale=1.0):
    from mitsuba_im_tpu.scene.build import SceneBuilder
    from mitsuba_im_tpu.scene.mesh import TriMesh
    from mitsuba_im_tpu.core.types import INVALID

    b = SceneBuilder()
    tex_id = b.textures.add_bitmap(np.asarray(tex_pixels, np.float32))
    rec = bc.default_record()
    rec["bump_kind"] = bump_kind
    rec["bump_tex"] = tex_id
    rec["bump_scale"] = bump_scale
    sid = b.new_shape(b.add_bsdf(rec))
    # unit quad in the xy plane, z=0, uv spanning [0,1]^2
    v = np.asarray([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float64)
    uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64)
    f = np.asarray([[0, 1, 2], [0, 2, 3]], np.int64)
    n = np.tile([[0.0, 0.0, 1.0]], (4, 1))
    mesh = TriMesh(positions=v, indices=f, normals=n, uvs=uv)
    b.add_trimesh(mesh, sid)
    from mitsuba_im_tpu.emitter import table as et
    b.add_emitter(dict(type=et.EM_CONSTANT, radiance=np.ones(3)))
    scene, _ = b.build()
    return scene


class TestBumpMapping:
    def _hit(self, scene):
        o = jnp.asarray([[0.2, 0.1, 2.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        hit = scene.ray_intersect(o, d)
        assert bool(hit.valid[0])
        return scene.interaction(o, d, hit)

    def test_normalmap_constant(self):
        """Constant normal map encoding a 45-degree x-tilt."""
        nt = unit([1.0, 0.0, 1.0])
        rgb = (np.asarray(nt) + 1.0) / 2.0
        px = np.tile(rgb, (4, 4, 1))
        scene = _plane_scene(bc.BUMP_NORMAL, px)
        it = self._hit(scene)
        ns = np.asarray(it.ns)[0]
        # tangent frame of the quad: ss ~ +-x, ts ~ +-y; expect 45deg tilt
        assert abs(abs(ns[2]) - nt[2]) < 0.02
        assert abs(np.linalg.norm(ns) - 1) < 1e-4
        assert abs(ns[2] - 1.0) > 0.2  # actually tilted

    def test_bumpmap_ramp_tilts_normal(self):
        """Height ramp along u: shading normal gains a tangential component;
        geometric normal is untouched."""
        u = np.linspace(0, 1, 64)
        px = np.tile((0.5 * u)[None, :, None], (64, 1, 3))
        scene = _plane_scene(bc.BUMP_HEIGHT, px, bump_scale=0.4)
        it = self._hit(scene)
        ns = np.asarray(it.ns)[0]
        ng = np.asarray(it.ng)[0]
        np.testing.assert_allclose(abs(ng[2]), 1.0, atol=1e-5)
        assert abs(ns[2]) < 0.9999  # tilted away from the face normal
        assert np.linalg.norm(ns[:2]) > 0.01

    def test_no_bump_is_noop(self):
        px = np.full((4, 4, 3), 0.5)
        scene = _plane_scene(bc.BUMP_NONE, px)
        it = self._hit(scene)
        ns = np.asarray(it.ns)[0]
        np.testing.assert_allclose(abs(ns[2]), 1.0, atol=1e-5)
