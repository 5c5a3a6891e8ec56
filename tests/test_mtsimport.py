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
