"""Irawan & Marschner woven cloth tests (src/bsdfs/irawan.{h,cpp}).

Checks: DSL parsing (units, $var substitution), TEA/Perlin helper sanity,
normalization pre-pass boundedness, eval positivity/energy, sample-weight
== eval/pdf consistency, and an end-to-end registry render.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_im_tpu.bsdf import common as bc
from mitsuba_im_tpu.bsdf import irawan as ir
from mitsuba_im_tpu.bsdf.eval import bsdf_eval, bsdf_pdf, bsdf_sample
from mitsuba_im_tpu.core import rng as mrng
from mitsuba_im_tpu.core.properties import Properties
from mitsuba_im_tpu.core.registry import create
from mitsuba_im_tpu.core.v3 import V3
from mitsuba_im_tpu.texture.texture import TextureBuilder


TWILL = """
/* 2/2 twill, angles in degrees */
weave {
  name = "test twill",
  alpha = $alpha_var, beta = 4.0, ss = 0.5, hWidth = 0.5,
  warpArea = 3.0, weftArea = 1.0,
  tileWidth = 4, tileHeight = 4,
  fineness = 0.0, period = 0.0,
  pattern {
    1, 2, 2, 2,
    2, 1, 2, 2,
    2, 2, 1, 2,
    2, 2, 2, 1
  },
  yarn { type = warp, psi = 30, umax = 25, kappa = 1.0,
         width = 2.0, length = 4.0, centerU = 0.5, centerV = 0.5,
         kd = {0.2, 0.1, 0.05}, ks = {0.3, 0.3, 0.3} },
  yarn { type = weft, psi = 0, umax = 30, kappa = -0.5,
         width = 2.0, length = 4.0, centerU = 0.5, centerV = 0.5,
         kd = {0.1, 0.15, 0.2}, ks = {0.25, 0.3, 0.35} }
}
"""


def test_parse_weave():
    props = Properties()
    props["alpha_var"] = 0.25
    pat = ir.parse_weave(TWILL, props, repeatU=3.0, repeatV=2.0)
    assert pat.name == "test twill"
    assert pat.tileWidth == 4 and pat.tileHeight == 4
    assert len(pat.pattern) == 16 and len(pat.yarns) == 2
    assert pat.alpha == 0.25  # via $alpha_var
    assert pat.repeatU == 3.0 and pat.repeatV == 2.0
    # degrees -> radians
    np.testing.assert_allclose(pat.yarns[0].psi, np.deg2rad(30), rtol=1e-6)
    np.testing.assert_allclose(pat.yarns[1].umax, np.deg2rad(30), rtol=1e-6)
    assert pat.yarns[0].type == ir.WARP and pat.yarns[1].type == ir.WEFT
    np.testing.assert_allclose(pat.yarns[0].kd, (0.2, 0.1, 0.05))
    # hashable / usable as static aux data
    hash(pat)


def test_parse_plain_weave_preset():
    pat = ir.parse_weave(ir.PLAIN_WEAVE)
    assert pat.tileWidth == 2 and len(pat.pattern) == 4
    assert {y.type for y in pat.yarns} == {ir.WARP, ir.WEFT}


def test_tea_and_perlin():
    v0 = jnp.arange(1024, dtype=jnp.uint32)
    x = ir.sample_tea_float(v0, v0 * 7 + 3)
    xn = np.asarray(x)
    assert xn.min() >= 0.0 and xn.max() < 1.0
    # roughly uniform
    assert 0.4 < xn.mean() < 0.6
    # determinism
    np.testing.assert_array_equal(xn, np.asarray(
        ir.sample_tea_float(v0, v0 * 7 + 3)))

    t = jnp.linspace(-8.0, 8.0, 4097)
    n = np.asarray(ir.perlin_noise_1d(t))
    assert np.abs(n).max() <= 1.0 + 1e-5
    assert np.abs(n).max() > 0.05  # not identically zero
    # zero at lattice points
    lat = np.asarray(ir.perlin_noise_1d(jnp.arange(-4.0, 5.0)))
    np.testing.assert_allclose(lat, 0.0, atol=1e-6)


def _pattern(**over):
    pat = ir.parse_weave(ir.PLAIN_WEAVE)
    if over:
        import dataclasses
        pat = dataclasses.replace(pat, **over)
    return ir.compute_normalization(pat)


def test_normalization_bounds_specular():
    """After the configure() pre-pass, the cosine-weighted average of the
    normalized specular term is <= 1/pi per unit ks (energy sanity)."""
    pat = _pattern()
    assert pat.normalization > 0.0

    rng = np.random.default_rng(1)
    n = 20000
    us = rng.random((6, n)).astype(np.float32)

    def cos_hemi(u1, u2):
        r = np.sqrt(u1)
        phi = 2 * np.pi * u2
        return V3(jnp.asarray(r * np.cos(phi)), jnp.asarray(r * np.sin(phi)),
                  jnp.asarray(np.sqrt(np.maximum(1 - u1, 0))))

    wi = cos_hemi(us[0], us[1])
    wo = cos_hemi(us[2], us[3])
    raw = ir.eval_pattern(pat, jnp.asarray(us[4]), jnp.asarray(us[5]),
                          wi, wo, initialization=True)
    mean_spec = float(jnp.mean(raw)) * pat.normalization
    # equals 1/pi on the normalization sample set; allow MC noise between
    # the two independent estimates
    np.testing.assert_allclose(mean_spec, 1.0 / np.pi, rtol=0.08)


def _lane_params(n, pat, uv=None):
    rec = bc.default_record()
    rec["type"] = bc.IRAWAN
    rec["weave"] = pat
    table = bc.build_table([rec])
    tex = TextureBuilder().build()
    ids = jnp.zeros(n, jnp.int32)
    if uv is None:
        rng = np.random.default_rng(3)
        uv = jnp.asarray(rng.random((n, 2)), jnp.float32)
    return bc.resolve(table, tex, ids, uv)


def test_eval_finite_nonneg_and_pdf():
    pat = _pattern()
    n = 4096
    p = _lane_params(n, pat)
    rng = np.random.default_rng(5)

    def hemi(seed):
        u = rng.random((n, 2))
        r = np.sqrt(u[:, 0])
        phi = 2 * np.pi * u[:, 1]
        d = np.stack([r * np.cos(phi), r * np.sin(phi),
                      np.sqrt(np.maximum(1 - u[:, 0], 0))], -1)
        return jnp.asarray(d, jnp.float32)

    wi, wo = hemi(0), hemi(1)
    f = np.asarray(bsdf_eval(p, wi, wo))
    assert np.isfinite(f).all() and (f >= 0.0).all()
    assert f.max() > 0.0  # the diffuse floor alone guarantees this
    pdf = np.asarray(bsdf_pdf(p, wi, wo))
    np.testing.assert_allclose(
        pdf, np.asarray(wo)[:, 2] / np.pi, atol=1e-6)


def test_sample_weight_consistency():
    """sample().weight must equal eval(wo)/pdf(wo) for the sampled wo."""
    pat = _pattern()
    n = 8192
    p = _lane_params(n, pat)
    s = mrng.make_sampler(jnp.arange(n), 0, 11)
    s, u1 = mrng.next_1d(s)
    s, u2 = mrng.next_2d(s)
    wi = jnp.broadcast_to(
        jnp.asarray([0.3, -0.2, np.sqrt(1 - 0.09 - 0.04)], jnp.float32),
        (n, 3))
    smp = bsdf_sample(p, wi, u1, u2)
    f = np.asarray(bsdf_eval(p, wi, smp.wo))
    pdf = np.asarray(bsdf_pdf(p, wi, smp.wo))
    w = np.asarray(smp.weight.to_array() if hasattr(smp.weight, "to_array")
                   else smp.weight)
    mask = pdf > 1e-6
    np.testing.assert_allclose(w[mask], (f / pdf[:, None])[mask],
                               rtol=2e-3, atol=2e-4)


def test_registry_and_render():
    """irawan factory through the registry + a tiny end-to-end render."""
    from mitsuba_im_tpu.scene.build import SceneBuilder
    from mitsuba_im_tpu.scene.mesh import TriMesh
    from mitsuba_im_tpu.emitter import table as et
    from mitsuba_im_tpu.core.transform import Transform
    from mitsuba_im_tpu.sensor.table import make_sensor, S_PERSPECTIVE
    from mitsuba_im_tpu.integrators.path import PathConfig, path_li
    from mitsuba_im_tpu.sensor.table import sample_ray
    from mitsuba_im_tpu.core.types import Float

    props = Properties("irawan")
    rec = create("bsdf", props)
    assert rec["type"] == bc.IRAWAN
    assert rec["weave"].normalization > 0.0

    b = SceneBuilder()
    sid = b.new_shape(b.add_bsdf(rec))
    pts = np.array([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], float)
    m = TriMesh(pts, np.array([[0, 1, 2], [2, 3, 0]]))
    m.normals = np.tile([[0.0, 1.0, 0.0]], (4, 1))
    m.uvs = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
    b.add_trimesh(m, sid)
    lsid = b.new_shape(b.default_bsdf())
    lm = TriMesh(np.array([[-0.3, 1.5, -0.3], [0.3, 1.5, -0.3],
                           [0.3, 1.5, 0.3], [-0.3, 1.5, 0.3]], float),
                 np.array([[0, 1, 2], [2, 3, 0]]))
    lm.normals = np.tile([[0.0, -1.0, 0.0]], (4, 1))
    lm.uvs = np.zeros((4, 2))
    b.add_trimesh(lm, lsid)
    b.add_emitter(dict(type=et.EM_AREA, radiance=np.array([8.0, 8.0, 8.0]),
                       shape=lsid))
    b.shape_emitter[lsid] = 0
    b.sensor = make_sensor(
        S_PERSPECTIVE, Transform.look_at([0, 1.0, 2.5], [0, 0, 0],
                                         [0, 1, 0]), fov_deg=45.0)
    scene, _ = b.build()

    W = H = 16
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    smp = mrng.make_sampler(pix, 0, 0)
    smp, blk = mrng.next_block4(smp)
    uv = (jnp.stack([(pix % W).astype(Float), (pix // W).astype(Float)], -1)
          + blk[..., :2]) / jnp.asarray([W, H], Float)
    o, d, _w = sample_ray(scene.sensor, uv, blk[..., 2:4])
    li, _ = path_li(scene, smp, o, d, PathConfig(max_depth=3))
    img = np.asarray(li.to_array() if hasattr(li, "to_array") else li)
    assert np.isfinite(img).all() and (img >= 0.0).all()
    assert img.mean() > 1e-4  # scene is lit
