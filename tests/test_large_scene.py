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


def test_hierarchy_1m_tris_matches_brute(rng=None):
    """Correctness at the bench regime: the 1.1M-triangle subdivided bunny
    through the two-level hierarchy vs chunked numpy brute force."""
    import jax.numpy as jnp
    from bench_scenes import subdivide_midpoint
    from mitsuba_im_tpu.scene.mesh import load_ply
    from mitsuba_im_tpu.accel import hierarchy as hy

    base = load_ply(BUNNY)
    pos, idx = subdivide_midpoint(np.asarray(base.positions),
                                  np.asarray(base.indices), rounds=2)
    p0 = pos[idx[:, 0]].astype(np.float32)
    e1 = (pos[idx[:, 1]] - pos[idx[:, 0]]).astype(np.float32)
    e2 = (pos[idx[:, 2]] - pos[idx[:, 0]]).astype(np.float32)
    assert len(p0) > 1_000_000
    h = hy.build_hierarchy(p0, e1, e2)

    rng = np.random.default_rng(7)
    n = 96
    c = pos.mean(0)
    ext = (pos.max(0) - pos.min(0)).max()
    o = (c + rng.uniform(-0.8, 0.8, (n, 3)) * ext).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    st = hy.intersect_hierarchy(h, jnp.asarray(o), jnp.asarray(d), 1e-5, 1e30)

    # chunked numpy brute force ground truth
    t_ref = np.full(n, np.inf, np.float64)
    CH = 200_000
    for a in range(0, len(p0), CH):
        P, E1, E2 = p0[a:a+CH], e1[a:a+CH], e2[a:a+CH]
        for r in range(n):
            pv = np.cross(d[r][None], E2)
            det = (E1 * pv).sum(1)
            ok = np.abs(det) > 1e-12
            dets = np.where(ok, det, 1.0)
            tv = o[r][None] - P
            uu = (tv * pv).sum(1) / dets
            qv = np.cross(tv, E1)
            vv = (d[r][None] * qv).sum(1) / dets
            th = (E2 * qv).sum(1) / dets
            good = ok & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (th > 1e-5)
            if good.any():
                t_ref[r] = min(t_ref[r], th[good].min())

    found_ref = np.isfinite(t_ref)
    found_h = np.asarray(st["found"])
    np.testing.assert_array_equal(found_h, found_ref)
    np.testing.assert_allclose(np.asarray(st["t"])[found_h],
                               t_ref[found_ref], rtol=1e-4, atol=1e-6)


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
