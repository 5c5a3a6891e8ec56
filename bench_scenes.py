"""Benchmark scene builders shared by bench.py and ad-hoc profiling.

``build_large_scene`` assembles the BASELINE config-4 regime: the reference
bunny (69k triangles) midpoint-subdivided twice to ~1.1M triangles, a rough
conductor material, and the reference lat-long environment emitter.  Falls
back to a procedurally displaced sphere mesh of the same triangle count when
the reference fixtures are absent.
"""
from __future__ import annotations

import os

import numpy as np

ENVMAP = "/root/reference/data/tests/envmap.exr"
BUNNY = "/root/reference/data/tests/bunny.ply"


def subdivide_midpoint(pos: np.ndarray, idx: np.ndarray, rounds: int = 1):
    """1:4 midpoint subdivision (no smoothing); vertices deduped per edge."""
    for _ in range(rounds):
        e = np.concatenate([idx[:, [0, 1]], idx[:, [1, 2]], idx[:, [2, 0]]])
        e_sorted = np.sort(e, axis=1)
        uniq, inv = np.unique(e_sorted, axis=0, return_inverse=True)
        mid = 0.5 * (pos[uniq[:, 0]] + pos[uniq[:, 1]])
        m01 = len(pos) + inv[: len(idx)]
        m12 = len(pos) + inv[len(idx) : 2 * len(idx)]
        m20 = len(pos) + inv[2 * len(idx) :]
        i0, i1, i2 = idx[:, 0], idx[:, 1], idx[:, 2]
        idx = np.concatenate([
            np.stack([i0, m01, m20], 1),
            np.stack([m01, i1, m12], 1),
            np.stack([m20, m12, i2], 1),
            np.stack([m01, m12, m20], 1),
        ])
        pos = np.concatenate([pos, mid])
    return pos, idx


def _displaced_sphere(n_tris_target: int) -> tuple[np.ndarray, np.ndarray]:
    """Procedural fallback: icosphere-ish UV sphere with radial noise."""
    n = int(np.sqrt(n_tris_target / 2)) + 1
    th = np.linspace(1e-3, np.pi - 1e-3, n)
    ph = np.linspace(0, 2 * np.pi, n, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    r = 1.0 + 0.05 * np.sin(7 * T) * np.cos(9 * P)
    pos = np.stack([r * np.sin(T) * np.cos(P), r * np.cos(T),
                    r * np.sin(T) * np.sin(P)], -1).reshape(-1, 3) * 0.08
    idx = []
    for i in range(n - 1):
        for j in range(n):
            j2 = (j + 1) % n
            a, b, c, d = i * n + j, i * n + j2, (i + 1) * n + j, (i + 1) * n + j2
            idx += [[a, b, d], [d, c, a]]
    return pos, np.asarray(idx, np.int64)


def build_large_scene(res: int = 512, subdiv: int = 2):
    """Scene with ~1M tris + envmap. Returns (scene, (W, H), n_tris).

    ``subdiv``: midpoint-subdivision rounds on the bunny (2 -> ~1.1M tris,
    the bench regime; 0 -> the raw 69k mesh, used by the parity gate where
    a CPU-backend render must stay cheap)."""
    from mitsuba_im_tpu.scene.build import SceneBuilder
    from mitsuba_im_tpu.scene.mesh import TriMesh, load_ply
    from mitsuba_im_tpu.core.transform import Transform
    from mitsuba_im_tpu.core.registry import create as reg_create
    from mitsuba_im_tpu.core.properties import Properties
    from mitsuba_im_tpu.sensor.table import make_sensor, S_PERSPECTIVE
    from mitsuba_im_tpu.film.film import F_BOX

    b = SceneBuilder()

    if os.path.exists(BUNNY):
        base = load_ply(BUNNY)
        pos, idx = subdivide_midpoint(
            np.asarray(base.positions), np.asarray(base.indices),
            rounds=subdiv)
        look = ([-0.05, 0.12, 0.25], [-0.02, 0.1, 0], [0, 1, 0])
    else:
        pos, idx = _displaced_sphere(70_000 * 4 ** subdiv)
        look = ([0.0, 0.05, 0.3], [0, 0, 0], [0, 1, 0])
    mesh = TriMesh(pos, idx).compute_normals()

    mat = Properties("roughconductor")
    mat.set("distribution", "ggx")
    mat.set("alpha", 0.2)
    bid = b.add_bsdf(reg_create("bsdf", mat, b))
    sid = b.new_shape(bid)
    b.add_trimesh(mesh, sid)

    if os.path.exists(ENVMAP):
        ep = Properties("envmap")
        ep.set("filename", ENVMAP)
        b.add_emitter(reg_create("emitter", ep, b))
    else:
        cp = Properties("constant")
        b.add_emitter(reg_create("emitter", cp, b))

    b.sensor = make_sensor(S_PERSPECTIVE, Transform.look_at(*look),
                           fov_deg=40.0)
    b.settings.width = b.settings.height = res
    b.settings.spp = 1
    b.settings.rfilter = F_BOX
    b.settings.integrator = "path"
    scene, _settings = b.build()
    return scene, (res, res), int(len(idx))
