"""Shape plugin factories (``/root/reference/src/shapes/``).

Each factory tessellates/registers its geometry into the SceneBuilder and
wires per-shape BSDF/emitter links.  Analytic sphere/disk keep exact
intersections; rectangle/cube are exact triangle sets; cylinder is
tessellated (analytic quadric planned).
"""
from __future__ import annotations

import numpy as np

from ..core.registry import register
from ..core.properties import Properties
from ..core.transform import Transform
from ..core.types import INVALID
from ..emitter import table as et
from . import mesh as mesh_mod
from .mesh import TriMesh


def _shape_common(props: Properties, ctx):
    """Resolve bsdf/emitter/medium/subsurface children."""
    b = props.children.get("bsdf")
    if isinstance(b, dict):
        bsdf_id = ctx.add_bsdf(b)
    elif isinstance(b, (int, np.integer)):
        bsdf_id = int(b)
    else:
        bsdf_id = ctx.default_bsdf()
    em_rec = props.children.get("emitter")

    def medium_id(key):
        rec = props.children.get(key)
        if isinstance(rec, dict) and "id" in rec:
            return rec["id"]
        return INVALID

    ss = props.children.get("subsurface")
    if isinstance(ss, dict):
        ss_id = ctx.add_subsurface(ss)
    elif isinstance(ss, (int, np.integer)):
        ss_id = int(ss)
    else:
        ss_id = INVALID

    return bsdf_id, em_rec, medium_id("interior"), medium_id("exterior"), ss_id


def _attach_area_emitter(ctx, em_rec, shape_id, kind, prim=0, surface_area=1.0):
    em_rec = dict(em_rec)
    em_rec["shape"] = shape_id
    em_rec["area_kind"] = kind
    em_rec["prim"] = prim
    em_rec["surface_area"] = surface_area
    eid = ctx.add_emitter(em_rec)
    ctx.shape_emitter[shape_id] = eid


def _finish_mesh(props, ctx, mesh: TriMesh):
    to_world = props.get_transform("toWorld", Transform())
    flip = props.get_bool("flipNormals", False)
    face_normals = props.get_bool("faceNormals", False)
    mesh = mesh.transformed(to_world)
    if to_world.det3() < 0:
        flip = not flip
    if flip:
        mesh.indices = mesh.indices[:, [0, 2, 1]]
        if mesh.normals is not None:
            mesh.normals = -mesh.normals
    bsdf_id, em_rec, mi, me, ss_id = _shape_common(props, ctx)
    sid = ctx.new_shape(bsdf_id, interior=mi, exterior=me, subsurface=ss_id)
    ctx.add_trimesh(mesh, sid, face_normals=face_normals)
    if em_rec is not None:
        area = float(mesh.surface_areas().sum())
        _attach_area_emitter(ctx, em_rec, sid, et.AK_TRIMESH, surface_area=area)
    return sid


@register("shape", "obj")
def _obj(props: Properties, ctx=None):
    path = ctx.resolve_path(props.get_string("filename"))
    mesh = mesh_mod.load_obj(path, flip_tex_coords=props.get_bool("flipTexCoords", True))
    if mesh.normals is None and not props.get_bool("faceNormals", False):
        mesh.compute_normals()
    return _finish_mesh(props, ctx, mesh)


@register("shape", "ply")
def _ply(props: Properties, ctx=None):
    path = ctx.resolve_path(props.get_string("filename"))
    mesh = mesh_mod.load_ply(path)
    if mesh.normals is None and not props.get_bool("faceNormals", False):
        mesh.compute_normals()
    props.get_bool("srgb", True)
    return _finish_mesh(props, ctx, mesh)


@register("shape", "serialized")
def _serialized(props: Properties, ctx=None):
    path = ctx.resolve_path(props.get_string("filename"))
    mesh = mesh_mod.load_serialized(path, shape_index=props.get_int("shapeIndex", 0))
    if mesh.normals is None and not props.get_bool("faceNormals", False):
        mesh.compute_normals()
    return _finish_mesh(props, ctx, mesh)


@register("shape", "sphere")
def _sphere(props: Properties, ctx=None):
    to_world = props.get_transform("toWorld", Transform())
    center = props.get_point("center", np.zeros(3))
    radius = props.get_float("radius", 1.0)
    center = to_world.apply_point(center)
    # uniform scale support: take the average axis scale
    scale = np.linalg.norm(to_world.m[:3, :3], axis=0).mean()
    radius = float(radius * scale)
    bsdf_id, em_rec, mi, me, ss_id = _shape_common(props, ctx)
    sid = ctx.new_shape(bsdf_id, interior=mi, exterior=me, subsurface=ss_id)
    prim = ctx.add_sphere(center, radius, sid)
    if em_rec is not None:
        _attach_area_emitter(
            ctx, em_rec, sid, et.AK_SPHERE, prim=prim,
            surface_area=4.0 * np.pi * radius * radius,
        )
    return sid


@register("shape", "disk")
def _disk(props: Properties, ctx=None):
    to_world = props.get_transform("toWorld", Transform())
    c = to_world.apply_point([0, 0, 0])
    s_axis = to_world.apply_vector([1, 0, 0])
    t_axis = to_world.apply_vector([0, 1, 0])
    radius = float(np.linalg.norm(s_axis))
    n = np.cross(s_axis, t_axis)
    n /= max(np.linalg.norm(n), 1e-12)
    if props.get_bool("flipNormals", False):
        n = -n
    s_u = s_axis / max(np.linalg.norm(s_axis), 1e-12)
    t_u = np.cross(n, s_u)
    bsdf_id, em_rec, mi, me, ss_id = _shape_common(props, ctx)
    sid = ctx.new_shape(bsdf_id, interior=mi, exterior=me, subsurface=ss_id)
    prim = ctx.add_disk(c, n, s_u, t_u, radius, sid)
    if em_rec is not None:
        _attach_area_emitter(
            ctx, em_rec, sid, et.AK_DISK, prim=prim,
            surface_area=np.pi * radius * radius,
        )
    return sid


def _quad_mesh():
    p = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float64)
    idx = np.array([[0, 1, 2], [2, 3, 0]], np.int64)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64)
    n = np.tile([[0.0, 0.0, 1.0]], (4, 1))
    return TriMesh(p, idx, n, uv)


@register("shape", "rectangle")
def _rectangle(props: Properties, ctx=None):
    return _finish_mesh(props, ctx, _quad_mesh())


@register("shape", "cube")
def _cube(props: Properties, ctx=None):
    faces = []
    base = _quad_mesh()
    xf = [
        Transform.translate([0, 0, 1]),
        Transform.rotate([0, 1, 0], 180) @ Transform.translate([0, 0, 1]),
        Transform.rotate([0, 1, 0], 90) @ Transform.translate([0, 0, 1]),
        Transform.rotate([0, 1, 0], -90) @ Transform.translate([0, 0, 1]),
        Transform.rotate([1, 0, 0], -90) @ Transform.translate([0, 0, 1]),
        Transform.rotate([1, 0, 0], 90) @ Transform.translate([0, 0, 1]),
    ]
    pos, idx, nrm, uv = [], [], [], []
    off = 0
    for t in xf:
        m = base.transformed(t)
        pos.append(m.positions)
        nrm.append(m.normals)
        uv.append(m.uvs)
        idx.append(m.indices + off)
        off += 4
    mesh = TriMesh(
        np.concatenate(pos), np.concatenate(idx),
        np.concatenate(nrm), np.concatenate(uv),
    )
    return _finish_mesh(props, ctx, mesh)


@register("shape", "cylinder")
def _cylinder(props: Properties, ctx=None):
    """Tessellated cylinder (analytic quadric variant planned)."""
    p0 = props.get_point("p0", np.array([0, 0, 0.0]))
    p1 = props.get_point("p1", np.array([0, 0, 1.0]))
    radius = props.get_float("radius", 1.0)
    n_seg = 64
    axis = np.asarray(p1) - np.asarray(p0)
    h = np.linalg.norm(axis)
    az = axis / max(h, 1e-12)
    ax = np.cross(az, [0, 0, 1.0])
    if np.linalg.norm(ax) < 1e-6:
        ax = np.cross(az, [0, 1.0, 0])
    ax /= np.linalg.norm(ax)
    ay = np.cross(az, ax)
    ang = np.linspace(0, 2 * np.pi, n_seg, endpoint=False)
    ring = np.outer(np.cos(ang), ax) + np.outer(np.sin(ang), ay)
    bot = p0 + radius * ring
    top = bot + axis
    pos = np.concatenate([bot, top])
    nrm = np.concatenate([ring, ring])
    idx = []
    for i in range(n_seg):
        j = (i + 1) % n_seg
        idx += [[i, j, n_seg + i], [j, n_seg + j, n_seg + i]]
    uv = np.concatenate([
        np.stack([ang / (2 * np.pi), np.zeros(n_seg)], 1),
        np.stack([ang / (2 * np.pi), np.ones(n_seg)], 1),
    ])
    mesh = TriMesh(pos, np.asarray(idx, np.int64), nrm, uv)
    return _finish_mesh(props, ctx, mesh)


@register("shape", "heightfield")
def _heightfield(props: Properties, ctx=None):
    from ..io import bitmap as bmp

    path = ctx.resolve_path(props.get_string("filename"))
    img = bmp.load(path, gamma_correct=False)
    hmap = img[..., :3].mean(-1) * props.get_float("scale", 1.0)
    H, W = hmap.shape
    ys, xs = np.meshgrid(
        np.linspace(-1, 1, H), np.linspace(-1, 1, W), indexing="ij"
    )
    pos = np.stack([xs, ys, hmap], axis=-1).reshape(-1, 3)
    uv = np.stack([(xs + 1) / 2, (ys + 1) / 2], axis=-1).reshape(-1, 2)
    idx = []
    for y in range(H - 1):
        r0 = y * W
        r1 = (y + 1) * W
        for x in range(W - 1):
            idx += [[r0 + x, r0 + x + 1, r1 + x + 1], [r1 + x + 1, r1 + x, r0 + x]]
    mesh = TriMesh(pos, np.asarray(idx, np.int64), None, uv).compute_normals()
    return _finish_mesh(props, ctx, mesh)


# shapegroup/instance: the loader stores shapegroup definitions and expands
# instances into copies (kd-tree instancing becomes table replication —
# acceptable for moderate instance counts; true instancing planned).
_SHAPEGROUPS: dict[str, list] = {}


@register("shape", "shapegroup")
def _shapegroup(props: Properties, ctx=None):
    _SHAPEGROUPS[props.id or "default"] = props.children.get("shape_list", [])
    return None


@register("shape", "instance")
def _instance(props: Properties, ctx=None):
    ref = props.children.get("shapegroup")
    to_world = props.get_transform("toWorld", Transform())
    if not isinstance(ref, list):
        return None
    for child_props in ref:
        cp = child_props.copy()
        base = cp.get_transform("toWorld", Transform())
        cp.set("toWorld", to_world @ base)
        from ..core import registry

        registry.create("shape", cp, ctx)
    return None


@register("shape", "deformable")
def _deformable(props: Properties, ctx=None):
    """Keyframed mesh: loads the t=0 snapshot (4D motion kd-tree analog —
    time-sampled BVH rebuild — planned)."""
    inner = props.children.get("shape_props")
    if inner is not None:
        from ..core import registry

        return registry.create("shape", inner, ctx)
    return None


@register("shape", "hair")
def _hair(props: Properties, ctx=None):
    raise NotImplementedError("hair shape not yet supported")
