"""Host-side scene assembly: accumulate plugin outputs, compile to a Scene.

The analog of ``Scene::initialize`` (``/root/reference/src/librender/
scene.cpp:330``): gather shapes into flat primitive tables, build the BVH,
build the emitter selection CDF (scene.cpp:365-388), pack BSDF/texture
tables, and produce the device-resident :class:`Scene` pytree plus the
render settings (film/sampler/integrator configuration).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from ..core.types import Float, Int, INVALID
from ..core.transform import Transform
from ..accel import bvh as bvh_mod
from ..accel.intersect import BRUTE_FORCE_MAX
from ..bsdf import common as bc
from ..emitter import table as em
from ..sensor.table import Sensor, make_sensor, S_PERSPECTIVE
from ..texture.texture import TextureBuilder
from ..film.film import F_GAUSSIAN, FILTER_NAMES, DEFAULT_RADIUS
from .geometry import make_geometry
from .mesh import TriMesh
from .scene import Scene


@dataclass
class RenderSettings:
    width: int = 256
    height: int = 256
    spp: int = 16
    sampler: str = "independent"
    seed: int = 0
    integrator: str = "path"
    integrator_props: dict = field(default_factory=dict)
    rfilter: int = F_GAUSSIAN
    rfilter_radius: float | None = None
    film_format: str = "exr"
    banner: bool = False
    gamma: float = -1.0  # ldrfilm
    tonemap: str = "gamma"
    exposure: float = 0.0
    key: float = 0.18
    tiled: bool = False  # tiledhdrfilm: out-of-core band rendering


class SceneBuilder:
    def __init__(self):
        self.textures = TextureBuilder()
        self.bsdf_records: list[dict] = []
        self.emitter_records: list[dict] = []
        self.media_records: list[dict] = []
        # triangle soup accumulators
        self.has_motion = False
        self._tri1: dict[str, list] = {k: [] for k in (
            "p0", "e1", "e2", "n0", "n1", "n2")}
        self._tri: dict[str, list] = {k: [] for k in (
            "p0", "e1", "e2", "n0", "n1", "n2", "uv0", "uv1", "uv2", "shape")}
        self._sph: dict[str, list] = {k: [] for k in ("center", "radius", "shape")}
        self._disk: dict[str, list] = {k: [] for k in ("center", "n", "s", "t", "radius", "shape")}
        self.shape_bsdf: list[int] = []
        self.shape_emitter: list[int] = []
        self.shape_interior: list[int] = []
        self.shape_exterior: list[int] = []
        self.subsurface_records: list[dict] = []
        self.shape_subsurface: list[int] = []
        self.sensor: Sensor | None = None
        self.camera_medium: int = INVALID
        self.settings = RenderSettings()
        self.ids: dict[str, object] = {}  # id -> bsdf index / texture index
        self.pending_vertexcolors: list[int] = []  # texture ids awaiting bake
        # shared-BLAS instancing (instance.cpp:115 analog): shapegroups are
        # captured once in local space; instances record transforms only
        self.blas_groups: dict = {}   # key -> dict(tri_range, shapes)
        self.instances: list = []     # (key, (3,4) to_world matrix)
        self._capture = None

    # -- shared-BLAS instancing --------------------------------------------
    def begin_group(self, key):
        if self._capture is not None:
            raise ValueError("nested shapegroups are not permitted")
        self._capture = dict(
            key=key,
            tri0=sum(len(a) for a in self._tri["p0"]),
            sph0=len(self._sph["center"]),
            disk0=len(self._disk["center"]),
            shape0=len(self.shape_bsdf),
        )

    def end_group(self, key):
        cap = self._capture
        self._capture = None
        tri1 = sum(len(a) for a in self._tri["p0"])
        shapes = list(range(cap["shape0"], len(self.shape_bsdf)))
        from ..core.registry import warn_substitution

        if any(self.shape_emitter[s] != INVALID for s in shapes):
            warn_substitution(
                "instance", "area emitters inside shapegroups are sampled "
                "in BLAS-local space (un-instanced); move emitters out of "
                "the group")
        # analytic prims added during capture are popped and re-added
        # transformed per instance (their tables are tiny)
        sph_chunks = [self._sph[k][cap["sph0"]:] for k in
                      ("center", "radius", "shape")]
        for k in ("center", "radius", "shape"):
            del self._sph[k][cap["sph0"]:]
        disk_chunks = [self._disk[k][cap["disk0"]:] for k in
                       ("center", "n", "s", "t", "radius", "shape")]
        for k in ("center", "n", "s", "t", "radius", "shape"):
            del self._disk[k][cap["disk0"]:]
        self.blas_groups[key] = dict(
            tri_range=(cap["tri0"], tri1), shapes=shapes,
            sph=sph_chunks, disk=disk_chunks)

    def add_instance(self, key, to_world: np.ndarray):
        g = self.blas_groups[key]
        M = np.asarray(to_world, np.float64).reshape(3, 4)
        self.instances.append((key, M.astype(np.float32)))
        R, tvec = M[:, :3], M[:, 3]
        # analytic prims: expand transformed copies (rigid + uniform scale)
        scales = np.linalg.norm(R, axis=0)
        uniform = np.allclose(scales, scales[0], rtol=1e-4)
        if (g["sph"][0] or g["disk"][0]) and not uniform:
            from ..core.registry import warn_substitution

            warn_substitution(
                "instance", "non-uniform scale on analytic primitives in a "
                "shapegroup (sphere stays spherical)")
        sc = float(scales.mean())
        Rn = R / np.maximum(scales[None, :], 1e-20)
        for c, r, sid in zip(*g["sph"]):
            self._sph["center"].append(c @ R.T + tvec)
            self._sph["radius"].append(r * sc)
            self._sph["shape"].append(sid)
        for c, n, s_, t_, r, sid in zip(*g["disk"]):
            self._disk["center"].append(c @ R.T + tvec)
            self._disk["n"].append(n @ Rn.T)
            self._disk["s"].append(s_ @ Rn.T)
            self._disk["t"].append(t_ @ Rn.T)
            self._disk["radius"].append(r * sc)
            self._disk["shape"].append(sid)

    # -- components --------------------------------------------------------
    def add_bsdf(self, record: dict) -> int:
        self.bsdf_records.append(record)
        return len(self.bsdf_records) - 1

    def default_bsdf(self) -> int:
        rec = bc.default_record()
        return self.add_bsdf(rec)

    def new_shape(self, bsdf_id: int, emitter_id: int = INVALID,
                  interior: int = INVALID, exterior: int = INVALID,
                  subsurface: int = INVALID) -> int:
        self.shape_bsdf.append(bsdf_id)
        self.shape_emitter.append(emitter_id)
        self.shape_interior.append(interior)
        self.shape_exterior.append(exterior)
        self.shape_subsurface.append(subsurface)
        return len(self.shape_bsdf) - 1

    def add_subsurface(self, record: dict) -> int:
        self.subsurface_records.append(record)
        return len(self.subsurface_records) - 1

    def add_trimesh(self, mesh: TriMesh, shape_id: int, face_normals=False,
                    corner_uvs=None):
        p = np.asarray(mesh.positions, np.float64)
        idx = np.asarray(mesh.indices, np.int64)
        if len(idx) == 0:
            return
        p0 = p[idx[:, 0]]
        e1 = p[idx[:, 1]] - p0
        e2 = p[idx[:, 2]] - p0
        gn = np.cross(e1, e2)
        l = np.linalg.norm(gn, axis=1, keepdims=True)
        gn = np.divide(gn, l, out=np.zeros_like(gn), where=l > 0)
        if mesh.normals is not None and not face_normals:
            n0, n1, n2 = (mesh.normals[idx[:, k]] for k in range(3))
        else:
            n0 = n1 = n2 = gn
        if corner_uvs is not None:
            # per-corner override (vertex-color bake): (T, 3, 2)
            uv0, uv1, uv2 = (corner_uvs[:, k] for k in range(3))
        elif mesh.uvs is not None:
            uv0, uv1, uv2 = (mesh.uvs[idx[:, k]] for k in range(3))
        else:
            uv0 = uv1 = uv2 = np.zeros((len(idx), 2))
        t = self._tri
        t["p0"].append(p0); t["e1"].append(e1); t["e2"].append(e2)
        t["n0"].append(n0); t["n1"].append(n1); t["n2"].append(n2)
        t["uv0"].append(uv0); t["uv1"].append(uv1); t["uv2"].append(uv2)
        t["shape"].append(np.full(len(idx), shape_id, np.int32))
        t1 = self._tri1
        t1["p0"].append(p0); t1["e1"].append(e1); t1["e2"].append(e2)
        t1["n0"].append(n0); t1["n1"].append(n1); t1["n2"].append(n2)

    def add_trimesh_motion(self, mesh0: TriMesh, mesh1: TriMesh,
                           shape_id: int):
        """Two-keyframe animated mesh: frame 0 enters the static tables,
        frame 1 the motion mirror (``Scene.with_time`` lerps on device)."""
        if len(mesh0.indices) != len(mesh1.indices):
            raise ValueError("deformable keyframes must share topology")
        n_before = len(self._tri1["p0"])
        self.add_trimesh(mesh0, shape_id)
        # overwrite the mirror entry just appended with frame-1 geometry
        p = np.asarray(mesh1.positions, np.float64)
        idx = np.asarray(mesh1.indices, np.int64)
        p0 = p[idx[:, 0]]
        e1 = p[idx[:, 1]] - p0
        e2 = p[idx[:, 2]] - p0
        if mesh1.normals is not None:
            n0, n1, n2 = (mesh1.normals[idx[:, k]] for k in range(3))
        else:
            gn = np.cross(e1, e2)
            l = np.linalg.norm(gn, axis=1, keepdims=True)
            gn = np.divide(gn, l, out=np.zeros_like(gn), where=l > 0)
            n0 = n1 = n2 = gn
        t1 = self._tri1
        t1["p0"][n_before] = p0; t1["e1"][n_before] = e1
        t1["e2"][n_before] = e2
        t1["n0"][n_before] = n0; t1["n1"][n_before] = n1
        t1["n2"][n_before] = n2
        self.has_motion = True

    def add_sphere(self, center, radius: float, shape_id: int) -> int:
        s = self._sph
        s["center"].append(np.asarray(center, np.float64).reshape(1, 3))
        s["radius"].append(np.asarray([radius], np.float64))
        s["shape"].append(np.asarray([shape_id], np.int32))
        return sum(len(a) for a in s["radius"]) - 1

    def add_disk(self, center, n, s_axis, t_axis, radius: float, shape_id: int) -> int:
        d = self._disk
        d["center"].append(np.asarray(center, np.float64).reshape(1, 3))
        d["n"].append(np.asarray(n, np.float64).reshape(1, 3))
        d["s"].append(np.asarray(s_axis, np.float64).reshape(1, 3))
        d["t"].append(np.asarray(t_axis, np.float64).reshape(1, 3))
        d["radius"].append(np.asarray([radius], np.float64))
        d["shape"].append(np.asarray([shape_id], np.int32))
        return sum(len(a) for a in d["radius"]) - 1

    def add_emitter(self, record: dict) -> int:
        self.emitter_records.append(record)
        return len(self.emitter_records) - 1

    # -- compile ------------------------------------------------------------
    def build(self) -> tuple[Scene, RenderSettings]:
        cat = lambda parts, shape: (
            np.concatenate(parts, axis=0).astype(np.float32)
            if parts else np.zeros(shape, np.float32)
        )
        tri = None
        if self._tri["p0"]:
            tri = {k: np.concatenate(v, axis=0) for k, v in self._tri.items()}
        sph = None
        if self._sph["center"]:
            sph = {k: np.concatenate(v, axis=0) for k, v in self._sph.items()}
        disk = None
        if self._disk["center"]:
            disk = {k: np.concatenate(v, axis=0) for k, v in self._disk.items()}

        # shared-BLAS instancing: build the instanced hierarchy over local
        # geometry (one BLAS per shapegroup + one for regular shapes) and
        # derive per-instance normal rotations for shading
        inst_clusters = None
        inst_rot = None
        inst_pts = []
        if self.instances and tri is not None:
            if self.has_motion:
                raise ValueError(
                    "instancing cannot combine with deformable motion yet")
            from ..accel.hierarchy import build_hierarchy_instanced

            p0a = tri["p0"].astype(np.float32)
            e1a = tri["e1"].astype(np.float32)
            e2a = tri["e2"].astype(np.float32)
            T = len(p0a)
            in_group = np.zeros(T, bool)
            for g in self.blas_groups.values():
                a, b = g["tri_range"]
                in_group[a:b] = True
            blas_list = []
            inst_list = []
            reg_idx = np.nonzero(~in_group)[0]
            ident = np.concatenate(
                [np.eye(3, dtype=np.float32), np.zeros((3, 1), np.float32)],
                axis=1)
            if len(reg_idx):
                blas_list.append((p0a[reg_idx], e1a[reg_idx], e2a[reg_idx],
                                  reg_idx))
                inst_list.append((0, ident))
            key_to_blas = {}
            for key, g in self.blas_groups.items():
                a, b = g["tri_range"]
                if b == a:
                    continue
                key_to_blas[key] = len(blas_list)
                blas_list.append((p0a[a:b], e1a[a:b], e2a[a:b],
                                  np.arange(a, b)))
            for key, M in self.instances:
                if key not in key_to_blas:
                    continue
                inst_list.append((key_to_blas[key], M))
                # world-space corners of the group's local bounds
                a, b = self.blas_groups[key]["tri_range"]
                v0 = p0a[a:b]
                pts_l = np.concatenate(
                    [v0, v0 + e1a[a:b], v0 + e2a[a:b]], axis=0)
                lo_l, hi_l = pts_l.min(0), pts_l.max(0)
                corners = np.array(
                    [[x, y, z] for x in (lo_l[0], hi_l[0])
                     for y in (lo_l[1], hi_l[1])
                     for z in (lo_l[2], hi_l[2])], np.float32)
                inst_pts.append(corners @ M[:, :3].T + M[:, 3])
            inst_clusters = build_hierarchy_instanced(blas_list, inst_list)
            fwd = np.asarray(inst_clusters.inst_fwd)
            inst_rot = np.linalg.inv(
                fwd[:, :, :3]).transpose(0, 2, 1).astype(np.float32)

        geom = make_geometry(tri, sph, disk, inst_rot=inst_rot)

        from ..core import statistics as stats

        stats.record("Geometry", "Triangles", geom.n_tris)
        stats.record("Geometry", "Analytic spheres", geom.n_spheres)
        stats.record("Geometry", "Analytic disks", geom.n_disks)
        stats.record("Scene", "Shapes", len(self.shape_bsdf))
        stats.record("Scene", "Emitters", len(self.emitter_records))
        stats.record("Scene", "BSDF instances", len(self.bsdf_records))

        motion = None
        if self.has_motion and tri is not None:
            # frame-1 mirror, row-aligned with the static tri tables
            m1 = {k: np.concatenate(v, axis=0).astype(np.float32)
                  for k, v in self._tri1.items()}
            motion = {k: jnp.asarray(np.concatenate(
                [m1[k], tri[k][len(m1[k]):].astype(np.float32)], axis=0),
                Float) for k in m1}

        # BVH + clusters (built only when the soup beats brute force)
        n_tris = geom.n_tris
        clusters = inst_clusters
        if (self.has_motion and n_tris > BRUTE_FORCE_MAX
                and motion is not None):
            # deformable large scene: union-AABB hierarchy over the shutter
            # with both keyframes' block tables (sahkdtree4.h:113 regime)
            from ..accel.hierarchy import build_hierarchy_motion

            clusters = build_hierarchy_motion(
                np.asarray(geom.tri_p0)[:n_tris],
                np.asarray(geom.tri_e1)[:n_tris],
                np.asarray(geom.tri_e2)[:n_tris],
                np.asarray(motion["p0"])[:n_tris],
                np.asarray(motion["e1"])[:n_tris],
                np.asarray(motion["e2"])[:n_tris],
            )
        if (n_tris > BRUTE_FORCE_MAX and not self.has_motion
                and clusters is None):
            from ..accel.hierarchy import build_hierarchy

            clusters = build_hierarchy(
                np.asarray(geom.tri_p0)[:n_tris], np.asarray(geom.tri_e1)[:n_tris],
                np.asarray(geom.tri_e2)[:n_tris],
            )
        if (n_tris > BRUTE_FORCE_MAX and not self.has_motion
                and inst_clusters is None):
            lo, hi = bvh_mod.tri_bounds(
                np.asarray(geom.tri_p0), np.asarray(geom.tri_e1), np.asarray(geom.tri_e2)
            )
            bvh = bvh_mod.build_bvh(lo[:n_tris] if n_tris else lo, hi[:n_tris] if n_tris else hi)
            use_bvh = True
        else:
            bvh = bvh_mod.FlatBVH(
                node_lo=jnp.zeros((1, 3), Float), node_hi=jnp.zeros((1, 3), Float),
                node_start=jnp.zeros(1, Int), node_count=jnp.zeros(1, Int),
                node_skip=jnp.full(1, -1, Int), order=jnp.zeros(1, Int),
            )
            use_bvh = False

        # scene bounding sphere (for env/directional emitters)
        pts = list(inst_pts)
        if tri is not None:
            pts += [tri["p0"], tri["p0"] + tri["e1"], tri["p0"] + tri["e2"]]
        if sph is not None:
            pts += [sph["center"] - sph["radius"][:, None],
                    sph["center"] + sph["radius"][:, None]]
        if disk is not None:
            pts += [disk["center"] - disk["radius"][:, None],
                    disk["center"] + disk["radius"][:, None]]
        if pts:
            allp = np.concatenate(pts, axis=0)
            c = 0.5 * (allp.min(0) + allp.max(0))
            r = float(np.linalg.norm(allp - c, axis=1).max()) + 1e-3
        else:
            c, r = np.zeros(3), 1.0

        emitters = em.build_emitters(
            self.emitter_records,
            tri if tri is not None else {},
            (c, r),
        )

        sensor = self.sensor or make_sensor(
            S_PERSPECTIVE, Transform.look_at([0, 0, -5], [0, 0, 0], [0, 1, 0]),
            aspect=self.settings.width / max(self.settings.height, 1),
        )

        from ..media.medium import build_media

        scene = Scene(
            geom=geom,
            bvh=bvh,
            bsdfs=bc.build_table(self.bsdf_records),
            textures=self.textures.build(),
            emitters=emitters,
            media=build_media(self.media_records),
            clusters=clusters,
            sensor=sensor,
            shape_bsdf=jnp.asarray(self.shape_bsdf or [0], Int),
            shape_emitter=jnp.asarray(self.shape_emitter or [INVALID], Int),
            shape_interior=jnp.asarray(self.shape_interior or [INVALID], Int),
            shape_exterior=jnp.asarray(self.shape_exterior or [INVALID], Int),
            shape_subsurface=jnp.asarray(self.shape_subsurface or [INVALID], Int),
            use_bvh=use_bvh,
            camera_medium=self.camera_medium,
            motion=motion,
        )
        if self.subsurface_records:
            from ..subsurface import build_subsurface

            sub = build_subsurface(self.subsurface_records, self, scene)
            scene = scene.replace(subsurface=sub)
        return scene, self.settings
