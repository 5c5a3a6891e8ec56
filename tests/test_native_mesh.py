"""Native C++ OBJ parser vs the pure-Python tokenizer
(reference src/shapes/obj.cpp is C++; the native runtime path must be a
drop-in for the Python fallback)."""
import numpy as np

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mitsuba_im_tpu.scene import mesh as mm
from mitsuba_im_tpu.accel import native as natmod

TRICKY_OBJ = """# fixture: quads, negative indices, sparse attributes
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
vn 0 0 1
vn 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1/1 2/2/1 3/3/1 4/4/1
f -5/-4/-2 2/2/2 5//
f 1 2 3
"""


def _load_python(path):
    orig = natmod.parse_obj_native
    natmod.parse_obj_native = lambda p: None
    try:
        return mm.load_obj(path)
    finally:
        natmod.parse_obj_native = orig


class TestNativeObj:
    def test_matches_python_loader(self, tmp_path):
        p = str(tmp_path / "t.obj")
        open(p, "w").write(TRICKY_OBJ)
        if natmod.parse_obj_native(p) is None:
            import pytest

            pytest.skip("native toolchain unavailable")
        m_nat = mm.load_obj(p)
        m_py = _load_python(p)
        assert np.allclose(m_nat.positions, m_py.positions)
        assert np.array_equal(m_nat.indices, m_py.indices)
        assert (m_nat.normals is None) == (m_py.normals is None)
        assert (m_nat.uvs is None) == (m_py.uvs is None)
        assert m_nat.n_triangles == 4  # quad fan (2) + tri + tri

    def test_full_attributes(self, tmp_path):
        obj = "\n".join(
            ["v 0 0 0", "v 1 0 0", "v 0 1 0", "vn 0 0 1",
             "vt 0 0", "vt 1 0", "vt 0 1", "f 1/1/1 2/2/1 3/3/1"])
        p = str(tmp_path / "full.obj")
        open(p, "w").write(obj)
        if natmod.parse_obj_native(p) is None:
            import pytest

            pytest.skip("native toolchain unavailable")
        m_nat = mm.load_obj(p)
        m_py = _load_python(p)
        assert m_nat.normals is not None and m_nat.uvs is not None
        assert np.allclose(m_nat.normals, m_py.normals)
        # loader flips v: uvs already transformed identically in both paths
        assert np.allclose(m_nat.uvs, m_py.uvs)

    def test_random_soup_equal(self, tmp_path):
        rng = np.random.RandomState(7)
        N = 500
        lines = ["v %f %f %f" % tuple(v) for v in rng.rand(N, 3)]
        lines += ["f %d %d %d" % tuple(t)
                  for t in rng.randint(1, N + 1, (300, 3))]
        p = str(tmp_path / "soup.obj")
        open(p, "w").write("\n".join(lines))
        if natmod.parse_obj_native(p) is None:
            import pytest

            pytest.skip("native toolchain unavailable")
        m_nat = mm.load_obj(p)
        m_py = _load_python(p)
        assert np.array_equal(m_nat.indices, m_py.indices)
        assert np.allclose(m_nat.positions, m_py.positions, atol=1e-6)
