"""ctypes bindings for the native runtime library (C++ BVH builder).

Builds ``libmitpu_native.so`` on first use with the in-tree Makefile and
falls back to the pure-numpy builder in :mod:`bvh` if a toolchain is
unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmitpu_native.so"))
_lock = threading.Lock()
_lib = None
_tried = False


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def load_native():
    """Return the loaded native library, building it if needed (or None)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            # make is timestamp-driven: a no-op when the lib is current,
            # a rebuild when any native source changed
            subprocess.run(
                ["make", "-s"],
                cwd=os.path.abspath(_NATIVE_DIR),
                check=True,
                capture_output=True,
            )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.mitpu_build_bvh.restype = ctypes.c_int32
            lib.mitpu_parse_obj.restype = ctypes.c_int32
            lib.mitpu_obj_positions.restype = ctypes.POINTER(ctypes.c_float)
            lib.mitpu_obj_normals.restype = ctypes.POINTER(ctypes.c_float)
            lib.mitpu_obj_uvs.restype = ctypes.POINTER(ctypes.c_float)
            lib.mitpu_obj_indices.restype = ctypes.POINTER(ctypes.c_int32)
            lib.mitpu_obj_free.restype = None
            if hasattr(lib, "mitpu_build_alias_rows"):
                lib.mitpu_build_alias_rows.restype = None
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def parse_obj_native(path: str):
    """C++ OBJ parse -> dict of numpy arrays, or None (no lib / error)."""
    lib = load_native()
    if lib is None or not hasattr(lib, "mitpu_parse_obj"):
        return None
    handle = ctypes.c_void_p()
    n_verts = ctypes.c_int64()
    n_tris = ctypes.c_int64()
    has_n = ctypes.c_int32()
    has_uv = ctypes.c_int32()
    rc = lib.mitpu_parse_obj(
        path.encode(), ctypes.byref(handle), ctypes.byref(n_verts),
        ctypes.byref(n_tris), ctypes.byref(has_n), ctypes.byref(has_uv))
    if rc != 0 or not handle.value:
        return None
    try:
        V, T = n_verts.value, n_tris.value
        pos = np.ctypeslib.as_array(
            lib.mitpu_obj_positions(handle), shape=(V, 3)).copy()
        idx = np.ctypeslib.as_array(
            lib.mitpu_obj_indices(handle), shape=(T, 3)).copy()
        nrm = (np.ctypeslib.as_array(lib.mitpu_obj_normals(handle),
                                     shape=(V, 3)).copy()
               if has_n.value else None)
        uv = (np.ctypeslib.as_array(lib.mitpu_obj_uvs(handle),
                                    shape=(V, 2)).copy()
              if has_uv.value else None)
    finally:
        lib.mitpu_obj_free(handle)
    return dict(positions=pos, indices=idx, normals=nrm, uvs=uv)


def build_bvh_native(prim_lo, prim_hi, prim_cent, leaf_size=4):
    """C++ binned-SAH build. Returns dict of flat arrays or None."""
    lib = load_native()
    if lib is None:
        return None
    n = np.int32(len(prim_lo))
    if n == 0:
        return None
    max_nodes = 2 * int(n)
    node_lo = np.empty((max_nodes, 3), np.float32)
    node_hi = np.empty((max_nodes, 3), np.float32)
    node_start = np.empty(max_nodes, np.int32)
    node_count = np.empty(max_nodes, np.int32)
    node_skip = np.empty(max_nodes, np.int32)
    order = np.empty(int(n), np.int32)
    lo = np.ascontiguousarray(prim_lo, np.float32)
    hi = np.ascontiguousarray(prim_hi, np.float32)
    ce = np.ascontiguousarray(prim_cent, np.float32)
    n_nodes = lib.mitpu_build_bvh(
        ctypes.c_int32(n), _f32p(lo), _f32p(hi), _f32p(ce),
        ctypes.c_int32(leaf_size), _f32p(node_lo), _f32p(node_hi),
        _i32p(node_start), _i32p(node_count), _i32p(node_skip), _i32p(order),
    )
    return dict(
        node_lo=node_lo[:n_nodes].copy(),
        node_hi=node_hi[:n_nodes].copy(),
        node_start=node_start[:n_nodes].copy(),
        node_count=node_count[:n_nodes].copy(),
        node_skip=node_skip[:n_nodes].copy(),
        order=order,
    )


def build_alias_rows_native(w):
    """Batched Walker/Vose alias tables over rows of a (H, W) weight matrix.

    Returns (prob (H, W) f32, alias (H, W) i32) or None without the lib."""
    lib = load_native()
    if lib is None or not hasattr(lib, "mitpu_build_alias_rows"):
        return None
    w = np.ascontiguousarray(w, np.float32)
    H, W = w.shape
    prob = np.empty((H, W), np.float32)
    alias = np.empty((H, W), np.int32)
    lib.mitpu_build_alias_rows(
        ctypes.c_int64(H), ctypes.c_int64(W), _f32p(w), _f32p(prob),
        alias.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return prob, alias


def tri_bounds_native(p0, e1, e2):
    lib = load_native()
    if lib is None:
        return None
    n = len(p0)
    lo = np.empty((n, 3), np.float32)
    hi = np.empty((n, 3), np.float32)
    ce = np.empty((n, 3), np.float32)
    p0 = np.ascontiguousarray(p0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    lib.mitpu_tri_bounds(
        ctypes.c_int32(n), _f32p(p0), _f32p(e1), _f32p(e2),
        _f32p(lo), _f32p(hi), _f32p(ce),
    )
    return lo, hi, ce
