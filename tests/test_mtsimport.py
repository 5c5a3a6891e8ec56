"""mtsimport converter tests (reference src/converter/ parity): OBJ+MTL ->
multi-shape .serialized + scene XML, loadable and renderable."""
import pytest
import os

import numpy as np
import jax.numpy as jnp

from mitsuba_im_tpu.cli.mtsimport import convert, load_obj_grouped
from mitsuba_im_tpu.scene.mesh import load_serialized


OBJ = """
mtllib box.mtl
v -1 0 -1
v  1 0 -1
v  1 0  1
v -1 0  1
v  0 1  0
vn 0 1 0
usemtl red
f 1//1 2//1 3//1 4//1
usemtl shiny
f 1//1 2//1 5//1
f 2//1 3//1 5//1
usemtl glow
f 3//1 4//1 5//1
"""

MTL = """
newmtl red
Kd 0.8 0.1 0.1
newmtl shiny
Kd 0.2 0.2 0.2
Ks 0.7 0.7 0.7
Ns 80
newmtl glow
Kd 0 0 0
Ke 5 4 3
"""


def _write_fixture(tmp_path):
    obj = os.path.join(str(tmp_path), "box.obj")
    with open(obj, "w") as f:
        f.write(OBJ)
    with open(os.path.join(str(tmp_path), "box.mtl"), "w") as f:
        f.write(MTL)
    return obj


def test_grouped_parse(tmp_path):
    obj = _write_fixture(tmp_path)
    groups, mats = load_obj_grouped(obj)
    names = [n for n, _ in groups]
    assert names == ["red", "shiny", "glow"]
    # quad fan-triangulated
    assert groups[0][1].n_triangles == 2
    assert groups[1][1].n_triangles == 2
    assert mats["shiny"]["Ns"] == 80
    assert mats["glow"]["Ke"] == [5, 4, 3]


@pytest.mark.slow
def test_convert_and_render(tmp_path):
    obj = _write_fixture(tmp_path)
    xml = os.path.join(str(tmp_path), "scene.xml")
    convert(obj, xml, resolution=(32, 32))

    # multi-shape serialized round-trip
    ser = os.path.join(str(tmp_path), "scene.serialized")
    assert os.path.exists(ser)
    m0 = load_serialized(ser, 0)
    m2 = load_serialized(ser, 2)
    assert m0.n_triangles == 2 and m2.n_triangles == 1

    with open(xml) as f:
        text = f.read()
    assert 'type="phong"' in text and 'type="area"' in text

    from mitsuba_im_tpu.scene.xml import load_scene
    from mitsuba_im_tpu.render.job import render

    scene, settings = load_scene(xml)
    settings.spp = 2
    settings.width = settings.height = 24
    img = np.asarray(render(scene, settings))
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3  # constant emitter + glow light the scene


DAE_CUBE = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><up_axis>Z_UP</up_axis></asset>
  <library_effects>
    <effect id="red-fx"><profile_COMMON><technique sid="common">
      <lambert>
        <diffuse><color>0.8 0.1 0.1 1</color></diffuse>
      </lambert>
    </technique></profile_COMMON></effect>
  </library_effects>
  <library_materials>
    <material id="redMat"><instance_effect url="#red-fx"/></material>
  </library_materials>
  <library_geometries>
    <geometry id="quad"><mesh>
      <source id="quad-pos">
        <float_array id="quad-pos-arr" count="12">
          -1 -1 0  1 -1 0  1 1 0  -1 1 0</float_array>
        <technique_common>
          <accessor source="#quad-pos-arr" count="4" stride="3">
            <param name="X" type="float"/><param name="Y" type="float"/>
            <param name="Z" type="float"/></accessor>
        </technique_common>
      </source>
      <source id="quad-nrm">
        <float_array id="quad-nrm-arr" count="3">0 0 1</float_array>
        <technique_common>
          <accessor source="#quad-nrm-arr" count="1" stride="3"/>
        </technique_common>
      </source>
      <vertices id="quad-vtx">
        <input semantic="POSITION" source="#quad-pos"/>
      </vertices>
      <polylist material="symMat" count="1">
        <input semantic="VERTEX" source="#quad-vtx" offset="0"/>
        <input semantic="NORMAL" source="#quad-nrm" offset="1"/>
        <vcount>4</vcount>
        <p>0 0 1 0 2 0 3 0</p>
      </polylist>
    </mesh></geometry>
  </library_geometries>
  <library_visual_scenes>
    <visual_scene id="scene">
      <node id="n1">
        <translate>0 0 1</translate>
        <rotate>0 0 1 90</rotate>
        <instance_geometry url="#quad">
          <bind_material><technique_common>
            <instance_material symbol="symMat" target="#redMat"/>
          </technique_common></bind_material>
        </instance_geometry>
      </node>
    </visual_scene>
  </library_visual_scenes>
</COLLADA>
"""


def test_collada_import(tmp_path):
    """COLLADA parity (reference src/converter/collada.cpp): polylist
    fan-triangulation, Z_UP conversion, baked node TRS, effect->material
    mapping, end-to-end through the shared serialized/XML backend."""
    from mitsuba_im_tpu.cli.mtsimport import load_dae_grouped

    dae = os.path.join(tmp_path, "cube.dae")
    open(dae, "w").write(DAE_CUBE)
    groups, materials = load_dae_grouped(dae)
    assert len(groups) == 1
    name, mesh = groups[0]
    assert name == "redMat"
    assert materials["redMat"]["Kd"] == [0.8, 0.1, 0.1]
    assert mesh.indices.shape == (2, 3)  # quad fan-triangulated
    p = np.asarray(mesh.positions)
    # Z_UP: the local +Z offset (translate 0 0 1) becomes +Y after the
    # axis swap; the quad lies in the y=1 plane
    np.testing.assert_allclose(p[:, 1], 1.0, atol=1e-6)
    # rotate 90 about local z maps (+-1, +-1, 0) onto itself as a set
    assert np.allclose(sorted(np.round(p[:, 0], 4)), [-1, -1, 1, 1])

    xml = os.path.join(tmp_path, "cube.xml")
    convert(dae, xml, resolution=(16, 16))
    from mitsuba_im_tpu.scene.xml import load_scene

    scene, settings = load_scene(xml)
    assert scene.geom.n_tris == 2
