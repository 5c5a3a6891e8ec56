"""Per-vertex color fetch (vertexcolors.cpp:43 analog, baked 2x2 atlas
blocks) and spectral->RGB conversion in the XML loader."""
import textwrap

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.mark.quick
def test_spectrum_pairs_keep_color():
    from mitsuba_im_tpu.scene.xml import _parse_spectrum

    green = _parse_spectrum("450:0.02 530:0.9 560:0.7 650:0.02")
    assert green[1] > 2.0 * green[0] and green[1] > 2.0 * green[2]
    red = _parse_spectrum("450:0.02 550:0.05 620:0.9 700:0.8")
    assert red[0] > 2.0 * red[1]
    # flat SPD is near-achromatic (equal-energy E, not D65 — mildly warm
    # in Rec.709, as in the reference conversion) with Y ~= value
    flat = _parse_spectrum("400:0.5 700:0.5")
    assert flat.max() < 1.35 * flat.min()
    assert abs(flat[1] - 0.5) < 0.1


def _colored_ply(path):
    """Two-triangle square with distinct corner colors (ascii ply)."""
    verts = [
        (0, 0, 0, 255, 0, 0),
        (1, 0, 0, 0, 255, 0),
        (1, 1, 0, 0, 0, 255),
        (0, 1, 0, 255, 255, 0),
    ]
    lines = [
        "ply", "format ascii 1.0",
        "element vertex 4",
        "property float x", "property float y", "property float z",
        "property uchar red", "property uchar green", "property uchar blue",
        "element face 2",
        "property list uchar int vertex_indices",
        "end_header",
    ] + [" ".join(str(v) for v in vv) for vv in verts] + [
        "3 0 1 2", "3 0 2 3",
    ]
    path.write_text("\n".join(lines) + "\n")


@pytest.mark.quick
@pytest.mark.slow
def test_vertexcolors_interpolation(tmp_path):
    """The baked bitmap + per-corner UVs reproduce barycentric interpolation
    of the vertex colors exactly."""
    ply = tmp_path / "colored.ply"
    _colored_ply(ply)
    xml = textwrap.dedent(f"""\
    <scene version="0.6.0">
        <shape type="ply">
            <string name="filename" value="{ply}"/>
            <bsdf type="diffuse">
                <texture type="vertexcolors" name="reflectance"/>
            </bsdf>
        </shape>
    </scene>
    """)
    p = tmp_path / "s.xml"
    p.write_text(xml)
    from mitsuba_im_tpu.scene.xml import load_scene
    from mitsuba_im_tpu.texture.texture import eval_texture

    scene, _ = load_scene(str(p))
    g = scene.geom
    assert g.n_tris == 2
    uv0 = np.asarray(g.tri_uv0)[:2]
    uv1 = np.asarray(g.tri_uv1)[:2]
    uv2 = np.asarray(g.tri_uv2)[:2]
    # texture id 0 is the baked vertexcolors texture
    tex_id = jnp.zeros((6,), jnp.int32)
    # corner + centroid probes of triangle 0 (colors: red, green, blue)
    w_list = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1/3, 1/3, 1/3)]
    uv = jnp.asarray([
        w[0] * uv0[0] + w[1] * uv1[0] + w[2] * uv2[0] for w in w_list
    ] + [uv0[1], uv2[1]], jnp.float32)
    out = np.asarray(eval_texture(scene.textures, tex_id, uv))
    c0, c1, c2 = np.eye(3)
    np.testing.assert_allclose(out[0], c0, atol=1e-3)
    np.testing.assert_allclose(out[1], c1, atol=1e-3)
    np.testing.assert_allclose(out[2], c2, atol=1e-3)
    np.testing.assert_allclose(out[3], (c0 + c1 + c2) / 3, atol=1e-3)
    # triangle 1 corners: red and yellow
    np.testing.assert_allclose(out[4], c0, atol=1e-3)
    np.testing.assert_allclose(out[5], [1, 1, 0], atol=1e-3)
