"""Shared-BLAS instancing: the hierarchy tests instanced supers with
t-preserving local-space rays and shading rotates BLAS-local normals
(``/root/reference/src/shapes/instance.cpp:115-129`` analog).  Instanced
renders must match copy-expanded renders while sharing triangle storage."""
import os
import textwrap

import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_im_tpu.accel import hierarchy as hy

from test_intersect import random_tri_soup

BUNNY = "/root/reference/data/tests/bunny.ply"


def _rot_y(deg):
    a = np.deg2rad(deg)
    return np.array([[np.cos(a), 0, np.sin(a)],
                     [0, 1, 0],
                     [-np.sin(a), 0, np.cos(a)]], np.float32)


@pytest.mark.quick
@pytest.mark.slow
def test_hierarchy_instanced_matches_expanded(rng):
    p0, e1, e2 = random_tri_soup(20000, rng)
    mats = [
        np.concatenate([np.eye(3, dtype=np.float32),
                        np.zeros((3, 1), np.float32)], 1),
        np.concatenate([_rot_y(35.0) * 1.3,
                        np.array([[2.5], [0.2], [-0.4]], np.float32)], 1),
        np.concatenate([_rot_y(-70.0),
                        np.array([[-2.0], [1.0], [1.5]], np.float32)], 1),
    ]
    # instanced build: one BLAS, three transforms
    ids = np.arange(len(p0), dtype=np.int64)
    h_inst = hy.build_hierarchy_instanced([(p0, e1, e2, ids)],
                                          [(0, M) for M in mats])
    assert h_inst.indirect
    assert h_inst.inst_inv.shape[0] == 3  # identity + two transforms

    # expanded reference: transform the soup per instance (prim ids repeat)
    p0x = np.concatenate([p0 @ M[:, :3].T + M[:, 3] for M in mats])
    e1x = np.concatenate([e1 @ M[:, :3].T for M in mats])
    e2x = np.concatenate([e2 @ M[:, :3].T for M in mats])
    h_exp = hy.build_hierarchy(p0x, e1x, e2x)

    # shared storage: expanded tables hold ~3x the cluster rows
    assert h_exp.blocks.shape[0] > 2.4 * h_inst.blocks.shape[0]

    n = 1024
    o = jnp.asarray(rng.uniform(-4, 4, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    st_i = hy.intersect_hierarchy(h_inst, o, d, 1e-4, 1e30)
    st_e = hy.intersect_hierarchy(h_exp, o, d, 1e-4, 1e30)
    fi = np.asarray(st_i["found"])
    fe = np.asarray(st_e["found"])
    np.testing.assert_array_equal(fi, fe)
    # world-space t agrees although instanced rays traverse local space
    np.testing.assert_allclose(np.asarray(st_i["t"])[fi],
                               np.asarray(st_e["t"])[fi], rtol=2e-4,
                               atol=1e-5)
    # prim ids: expanded ids are (instance * T + prim)
    pe = np.asarray(st_e["prim"])[fi] % len(p0)
    # prim ids may legitimately differ where two near-equal t hits tie in
    # f32; require agreement on the overwhelming majority
    assert (np.asarray(st_i["prim"])[fi] == pe).mean() > 0.99
    # some hits land on non-identity instances
    assert (np.asarray(st_i["inst"])[fi] > 0).any()
    # any-hit through the instanced tables
    occ_i = hy.intersect_hierarchy(h_inst, o, d, 1e-4, 8.0, any_hit=True)
    occ_e = hy.intersect_hierarchy(h_exp, o, d, 1e-4, 8.0, any_hit=True)
    np.testing.assert_array_equal(np.asarray(occ_i["found"]),
                                  np.asarray(occ_e["found"]))


@pytest.mark.skipif(not os.path.exists(BUNNY), reason="no bunny fixture")
def test_instanced_render_matches_expanded(tmp_path):
    """Three bunny instances (one rotated) through the full scene pipeline:
    XML shapegroup/instance vs explicitly transformed copies."""
    from mitsuba_im_tpu.scene.xml import load_scene
    from mitsuba_im_tpu.render.job import render

    common = """\
    <scene version="0.6.0">
        <integrator type="path"><integer name="maxDepth" value="2"/></integrator>
        <sensor type="perspective">
            <float name="fov" value="45"/>
            <transform name="toWorld">
                <lookat origin="0.0, 0.15, 0.45" target="0.05, 0.1, 0" up="0, 1, 0"/>
            </transform>
            <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
            <film type="hdrfilm">
                <integer name="width" value="24"/><integer name="height" value="24"/>
                <rfilter type="box"/>
            </film>
        </sensor>
        <emitter type="constant"><rgb name="radiance" value="0.8 0.9 1.0"/></emitter>
    {body}
    </scene>
    """
    inst_body = f"""\
        <shape type="shapegroup" id="grp">
            <shape type="ply">
                <string name="filename" value="{BUNNY}"/>
                <bsdf type="diffuse"><rgb name="reflectance" value="0.7 0.4 0.3"/></bsdf>
            </shape>
        </shape>
        <shape type="instance">
            <ref id="grp"/>
        </shape>
        <shape type="instance">
            <ref id="grp"/>
            <transform name="toWorld"><rotate y="1" angle="40"/><translate x="0.12"/></transform>
        </shape>
        <shape type="instance">
            <ref id="grp"/>
            <transform name="toWorld"><rotate y="1" angle="-25"/><translate x="-0.12" z="0.03"/></transform>
        </shape>
    """
    mesh = f"""\
            <shape type="ply">
                <string name="filename" value="{BUNNY}"/>
                <bsdf type="diffuse"><rgb name="reflectance" value="0.7 0.4 0.3"/></bsdf>
    """
    exp_body = (
        mesh + "</shape>"
        + mesh + '<transform name="toWorld"><rotate y="1" angle="40"/>'
                 '<translate x="0.12"/></transform></shape>'
        + mesh + '<transform name="toWorld"><rotate y="1" angle="-25"/>'
                 '<translate x="-0.12" z="0.03"/></transform></shape>'
    )
    pa = tmp_path / "inst.xml"
    pa.write_text(textwrap.dedent(common).format(body=inst_body))
    pb = tmp_path / "exp.xml"
    pb.write_text(textwrap.dedent(common).format(body=exp_body))

    scene_i, settings = load_scene(str(pa))
    scene_e, _ = load_scene(str(pb))
    # shared storage: one bunny's triangles, not three
    assert scene_i.geom.n_tris < 1.5 * scene_e.geom.n_tris / 3 + 10
    assert scene_i.clusters is not None and scene_i.clusters.indirect

    img_i = np.asarray(render(scene_i, settings))
    img_e = np.asarray(render(scene_e, settings))
    assert np.isfinite(img_i).all()
    # same sampler seeds + same geometry -> images agree except at a few
    # silhouette pixels where fp differences flip a hit
    diff = np.abs(img_i - img_e).max(axis=-1)
    scale = img_e.mean() + 1e-3
    assert (diff < 0.25 * scale).mean() > 0.95
    assert abs(img_i.mean() - img_e.mean()) < 0.05 * scale
