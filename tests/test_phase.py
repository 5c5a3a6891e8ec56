"""Structured phase functions: kkay / microflake / mixturephase.

Validates (per the reference test strategy, SURVEY.md §4):
- sphere-integral normalization of eval (quadrature),
- chi2 GOF of the sampling routines against their claimed pdfs,
- orientation-volume consumption by an anisotropic heterogeneous medium
  (white-furnace equality: a normalized phase in an albedo-1 medium under
  a constant emitter must return exactly the emitter radiance).

Reference parity: /root/reference/src/phase/{kkay,microflake,mixturephase}.cpp.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_im_tpu.media import medium as med
from mitsuba_im_tpu.core import v3 as v
from mitsuba_im_tpu.core import rng as mrng


def make_media(phase, orientation=None):
    """Single-medium table; optional constant orientation grid."""
    if orientation is not None:
        big = 1e3
        dens = dict(data=np.ones((2, 2, 2, 1), np.float32),
                    bmin=np.full(3, -big), bmax=np.full(3, big))
        ori = dict(
            data=np.tile(np.asarray(orientation, np.float32), (2, 2, 2, 1)),
            bmin=np.full(3, -big), bmax=np.full(3, big))
        rec = dict(kind="heterogeneous", scale=1.0, phase=phase,
                   density=dens, albedo=None, orientation=ori)
    else:
        rec = dict(sigma_s=np.ones(3), sigma_a=np.zeros(3), scale=1.0,
                   phase=phase)
    return med.build_media([rec])


def sphere_quadrature(n_theta=256, n_phi=128):
    t, wt = np.polynomial.legendre.leggauss(n_theta)
    phi = (np.arange(n_phi) + 0.5) * (2 * np.pi / n_phi)
    st = np.sqrt(np.maximum(1 - t * t, 0))
    dirs = np.stack([
        np.repeat(st, n_phi) * np.cos(np.tile(phi, n_theta)),
        np.repeat(st, n_phi) * np.sin(np.tile(phi, n_theta)),
        np.repeat(t, n_phi),
    ], -1)
    w = np.repeat(wt, n_phi) * (2 * np.pi / n_phi)
    return dirs, w


def ctx_at_origin(media, n):
    mid = jnp.zeros((n,), jnp.int32)
    z = jnp.zeros((n,))
    return med.phase_ctx_v(media, mid, v.V3(z, z, z)), mid


PHASES = [
    ("kkay", dict(type=med.PH_KKAY, g=0.0, kd=0.2, ks=0.4, exponent=4.0)),
    ("microflake03", dict(type=med.PH_MICROFLAKE, g=0.0, stddev=0.3)),
    ("microflake01", dict(type=med.PH_MICROFLAKE, g=0.0, stddev=0.1)),
    ("mixture", dict(type=med.PH_MIX, g=0.0,
                     components=[(0.4, dict(type=med.PH_HG, g=0.6)),
                                 (0.6, dict(type=med.PH_ISOTROPIC, g=0.0))])),
]

AXES = [np.array([0.0, 0.0, 1.0]),
        np.array([0.6, -0.3, 0.74]) / np.linalg.norm([0.6, -0.3, 0.74])]


class TestNormalization:
    @pytest.mark.parametrize("name,phase", PHASES)
    @pytest.mark.parametrize("ax", [0, 1])
    def test_eval_integrates_to_one(self, name, phase, ax):
        axis = AXES[ax]
        media = make_media(phase, orientation=axis)
        dirs, w = sphere_quadrature()
        n = len(dirs)
        ctx, _ = ctx_at_origin(media, n)
        # check the orientation volume actually delivered the axis
        got_axis = np.stack([np.asarray(ctx["axis"].x)[0],
                             np.asarray(ctx["axis"].y)[0],
                             np.asarray(ctx["axis"].z)[0]])
        np.testing.assert_allclose(got_axis, axis, atol=1e-5)

        wi_np = np.array([0.3, -0.2, 0.93])
        wi_np /= np.linalg.norm(wi_np)
        wi = v.V3(jnp.full(n, wi_np[0]), jnp.full(n, wi_np[1]),
                  jnp.full(n, wi_np[2]))
        wo = v.V3(jnp.asarray(dirs[:, 0]), jnp.asarray(dirs[:, 1]),
                  jnp.asarray(dirs[:, 2]))
        val = np.asarray(med.phase_eval_ctx_v(media, ctx, wi, wo))
        total = float((val * w).sum())
        assert total == pytest.approx(1.0, abs=0.01), f"{name}: {total}"

    def test_flake_distribution_normalized(self):
        # int D(m) dm = 1 and sigma table positive
        tab = med._flake_sigma_table(0.25)
        assert (tab > 0).all()
        c = med._flake_norm_const(0.25)
        dirs, w = sphere_quadrature()
        D = c * np.exp(-dirs[:, 2] ** 2 / (2 * 0.25 ** 2))
        assert float((D * w).sum()) == pytest.approx(1.0, abs=1e-3)


class TestChi2:
    @pytest.mark.parametrize("name,phase", PHASES)
    def test_sample_matches_pdf(self, name, phase):
        from mitsuba_im_tpu.core.chisquare import chi2_test

        axis = AXES[1]
        media = make_media(phase, orientation=axis)
        wi_np = np.array([0.1, 0.4, -0.91])
        wi_np /= np.linalg.norm(wi_np)

        def sample_fn(n):
            ctx, _ = ctx_at_origin(media, n)
            s = mrng.make_sampler_v(jnp.arange(n, dtype=jnp.uint32), 0, 31)
            _, blk = mrng.next_block4_v(s)
            wi = v.V3(jnp.full(n, wi_np[0]), jnp.full(n, wi_np[1]),
                      jnp.full(n, wi_np[2]))
            wo, pdf, _w = med.phase_sample_ctx_v(media, ctx, wi,
                                                 blk[0], blk[1], blk[2])
            return np.stack([np.asarray(wo.x), np.asarray(wo.y),
                             np.asarray(wo.z)], -1)

        def pdf_fn(dirs):
            n = len(dirs)
            ctx, _ = ctx_at_origin(media, n)
            wi = v.V3(jnp.full(n, wi_np[0]), jnp.full(n, wi_np[1]),
                      jnp.full(n, wi_np[2]))
            wo = v.V3(jnp.asarray(dirs[:, 0], jnp.float32),
                      jnp.asarray(dirs[:, 1], jnp.float32),
                      jnp.asarray(dirs[:, 2], jnp.float32))
            return np.asarray(med.phase_pdf_ctx_v(media, ctx, wi, wo))

        # sharp ridge pdfs (small-stddev microflake) need a finer midpoint
        # subgrid for the per-bin pdf integral to converge
        sub = 32 if "microflake" in name else 4
        ok, pval, info = chi2_test(sample_fn, pdf_fn, n_samples=1 << 16,
                                   sub=sub)
        assert ok, f"{name}: {info}"

    @pytest.mark.parametrize("name,phase", PHASES)
    def test_weight_unbiased(self, name, phase):
        """E[weight] over samples = integral of eval = 1 (mixture: total)."""
        axis = AXES[1]
        media = make_media(phase, orientation=axis)
        n = 1 << 16
        ctx, _ = ctx_at_origin(media, n)
        s = mrng.make_sampler_v(jnp.arange(n, dtype=jnp.uint32), 0, 77)
        _, blk = mrng.next_block4_v(s)
        wi_np = np.array([0.5, 0.1, 0.86])
        wi_np /= np.linalg.norm(wi_np)
        wi = v.V3(jnp.full(n, wi_np[0]), jnp.full(n, wi_np[1]),
                  jnp.full(n, wi_np[2]))
        _wo, _pdf, w = med.phase_sample_ctx_v(media, ctx, wi,
                                              blk[0], blk[1], blk[2])
        assert float(jnp.mean(w)) == pytest.approx(1.0, abs=0.02)


class TestAnisotropicMedium:
    def test_white_furnace_with_orientation(self, tmp_path):
        """Albedo-1 microflake medium in a constant-radiance furnace: the
        normalized phase conserves energy, so every pixel sees exactly the
        emitter radiance (exercises the orientation volume end to end)."""
        from mitsuba_im_tpu.media.volume import write_vol
        import textwrap

        ori = np.tile(np.asarray([0.0, 0.0, 1.0], np.float32), (4, 4, 4, 1))
        dens = np.ones((4, 4, 4), np.float32)
        write_vol(str(tmp_path / "d.vol"), dens, [-1, -1, -1], [1, 1, 1])
        write_vol(str(tmp_path / "o.vol"), ori, [-1, -1, -1], [1, 1, 1])
        xml = textwrap.dedent(f"""\
        <scene version="0.6.0">
            <integrator type="volpath"><integer name="maxDepth" value="64"/></integrator>
            <sensor type="perspective">
                <transform name="toWorld"><lookat origin="0,0,-4" target="0,0,0" up="0,1,0"/></transform>
                <sampler type="independent"><integer name="sampleCount" value="16"/></sampler>
                <film type="hdrfilm"><integer name="width" value="6"/><integer name="height" value="6"/>
                    <rfilter type="box"/></film>
            </sensor>
            <shape type="cube">
                <bsdf type="null"/>
                <medium name="interior" type="heterogeneous">
                    <float name="scale" value="0.6"/>
                    <volume name="density" type="gridvolume">
                        <string name="filename" value="{tmp_path}/d.vol"/>
                    </volume>
                    <volume name="albedo" type="constvolume">
                        <float name="value" value="1.0"/>
                    </volume>
                    <volume name="orientation" type="gridvolume">
                        <string name="filename" value="{tmp_path}/o.vol"/>
                    </volume>
                    <phase type="microflake"><float name="stddev" value="0.2"/></phase>
                </medium>
            </shape>
            <emitter type="constant"><rgb name="radiance" value="0.7"/></emitter>
        </scene>
        """)
        p = tmp_path / "furnace.xml"
        p.write_text(xml)
        from mitsuba_im_tpu.scene.xml import load_scene
        from mitsuba_im_tpu.render.job import render

        scene, settings = load_scene(str(p))
        assert scene.media.has_fancy_phase
        assert int(np.asarray(scene.media.ori_offset)[0]) >= 0
        img = render(scene, settings)
        assert np.isfinite(img).all()
        np.testing.assert_allclose(img.mean(axis=(0, 1)), 0.7, rtol=0.05)

    def test_kkay_differs_from_isotropic(self):
        axis = AXES[1]
        media = make_media(dict(type=med.PH_KKAY, g=0.0, kd=0.0, ks=1.0,
                                exponent=16.0), orientation=axis)
        n = 8
        ctx, _ = ctx_at_origin(media, n)
        wi = v.V3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n))
        wo_fwd = v.V3(jnp.zeros(n), jnp.zeros(n), -jnp.ones(n))
        wo_side = v.V3(jnp.ones(n), jnp.zeros(n), jnp.zeros(n))
        v1 = np.asarray(med.phase_eval_ctx_v(media, ctx, wi, wo_fwd))[0]
        v2 = np.asarray(med.phase_eval_ctx_v(media, ctx, wi, wo_side))[0]
        assert v1 != pytest.approx(v2, rel=0.05)
