"""``mtsimport`` — OBJ(+MTL) / COLLADA(.dae) to scene-XML converter.

Parity target: ``/root/reference/src/converter/`` (the ``mtsimport``
tool, ``collada.cpp`` + ``obj.cpp``): convert an external model into a
renderable scene — geometry re-written as a multi-shape ``.serialized``
file, one shape + BSDF per material, plus a default camera/film/
integrator when the input has none.  The COLLADA path is a clean-room
minimal importer (stdlib ElementTree; no Xerces/OpenCOLLADA): triangles
+ polylist primitives, per-corner NORMAL/TEXCOORD streams, baked
visual-scene node transforms (matrix / translate / rotate / scale),
Z_UP/X_UP axis conversion, and lambert/phong/blinn effect mapping onto
the same diffuse/phong/dielectric taxonomy as the MTL path.

Material mapping (Wavefront MTL -> plugin, mirroring the reference
converter's lambert/phong/dielectric taxonomy):

  Ke > 0                      -> area emitter on the shape
  d < 1 or Tr > 0             -> ``mask`` over the base BSDF
  illum 4/6/7/9 or Ni != 1    -> ``dielectric`` (intIOR = Ni)
  Ks > 0                      -> ``phong`` (exponent = Ns)
  otherwise                   -> ``diffuse`` (map_Kd -> bitmap texture)

Usage: python -m mitsuba_im_tpu.cli.mtsimport [-r WxH] model.{obj,dae} out.xml
"""
from __future__ import annotations

import os
import sys

import numpy as np

from ..scene.mesh import TriMesh, save_serialized


# ---------------------------------------------------------------------------
# OBJ + MTL parsing with material splitting
# ---------------------------------------------------------------------------

def parse_mtl(path: str) -> dict[str, dict]:
    mats: dict[str, dict] = {}
    cur = None
    if not os.path.exists(path):
        return mats
    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            tag = parts[0]
            if tag == "newmtl":
                cur = mats.setdefault(parts[1], {})
            elif cur is None:
                continue
            elif tag in ("Kd", "Ks", "Ke"):
                cur[tag] = [float(x) for x in parts[1:4]]
            elif tag in ("Ns", "Ni", "d"):
                cur[tag] = float(parts[1])
            elif tag == "Tr":
                cur["d"] = 1.0 - float(parts[1])
            elif tag == "illum":
                cur["illum"] = int(float(parts[1]))
            elif tag == "map_Kd":
                cur["map_Kd"] = parts[-1]
    return mats


def load_obj_grouped(path: str):
    """Parse an OBJ into per-material TriMesh groups.

    Returns (groups, materials): groups is a list of (mtl_name, TriMesh);
    materials maps name -> MTL dict."""
    vs, vns, vts = [], [], []
    groups: dict[str, list] = {}
    order: list[str] = []
    cur = ""
    materials: dict[str, dict] = {}
    base = os.path.dirname(os.path.abspath(path))

    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            tag = parts[0]
            if tag == "v":
                vs.append([float(parts[1]), float(parts[2]),
                           float(parts[3])])
            elif tag == "vn":
                vns.append([float(parts[1]), float(parts[2]),
                            float(parts[3])])
            elif tag == "vt":
                vts.append([float(parts[1]), float(parts[2])])
            elif tag == "mtllib":
                materials.update(parse_mtl(os.path.join(base, parts[1])))
            elif tag == "usemtl":
                cur = parts[1]
            elif tag == "f":
                corners = []
                for tok in parts[1:]:
                    sub = tok.split("/")
                    vi = int(sub[0])
                    ti = int(sub[1]) if len(sub) > 1 and sub[1] else 0
                    ni = int(sub[2]) if len(sub) > 2 and sub[2] else 0
                    corners.append((vi, ti, ni))
                if cur not in groups:
                    groups[cur] = []
                    order.append(cur)
                lst = groups[cur]
                for k in range(1, len(corners) - 1):  # fan triangulation
                    lst.append((corners[0], corners[k], corners[k + 1]))

    vs_np = np.asarray(vs, np.float64)
    vns_np = np.asarray(vns, np.float64) if vns else None
    vts_np = np.asarray(vts, np.float64) if vts else None

    def fix(i, n):
        return i - 1 if i > 0 else n + i

    out = []
    for name in order:
        tris = groups[name]
        remap: dict[tuple, int] = {}
        pos, nrm, uv, idx = [], [], [], []
        for tri in tris:
            face = []
            for (vi, ti, ni) in tri:
                key = (vi, ti, ni)
                j = remap.get(key)
                if j is None:
                    j = len(pos)
                    remap[key] = j
                    pos.append(vs_np[fix(vi, len(vs_np))])
                    if vns_np is not None and ni:
                        nrm.append(vns_np[fix(ni, len(vns_np))])
                    if vts_np is not None and ti:
                        uv.append(vts_np[fix(ti, len(vts_np))])
                face.append(j)
            idx.append(face)
        mesh = TriMesh(
            np.asarray(pos), np.asarray(idx, np.int64),
            np.asarray(nrm) if nrm and len(nrm) == len(pos) else None,
            np.asarray(uv) if uv and len(uv) == len(pos) else None,
            name=name or "default",
        )
        if mesh.uvs is not None:
            mesh.uvs = mesh.uvs.copy()
            mesh.uvs[:, 1] = 1.0 - mesh.uvs[:, 1]
        out.append((name, mesh))
    return out, materials


# ---------------------------------------------------------------------------
# COLLADA (.dae) parsing — clean-room minimal importer
# ---------------------------------------------------------------------------

_DAE_NS = "{http://www.collada.org/2005/11/COLLADASchema}"


def _dae_tag(e):
    return e.tag.split("}", 1)[-1]


def _dae_sources(mesh_el):
    """source id -> (H, stride) float array."""
    out = {}
    for src in mesh_el:
        if _dae_tag(src) != "source":
            continue
        arr = None
        stride = 3
        for ch in src.iter():
            t = _dae_tag(ch)
            if t == "float_array":
                arr = np.asarray(
                    (ch.text or "").split(), np.float64)
            elif t == "accessor":
                stride = int(ch.get("stride", 3))
        if arr is not None:
            out["#" + src.get("id", "")] = arr.reshape(-1, stride)
    return out


def _dae_node_transform(node):
    """Compose matrix/translate/rotate/scale children into one 4x4."""
    M = np.eye(4)
    for ch in node:
        t = _dae_tag(ch)
        vals = np.asarray((ch.text or "").split(), np.float64) \
            if ch.text else np.zeros(0)
        if t == "matrix" and vals.size == 16:
            M = M @ vals.reshape(4, 4)
        elif t == "translate" and vals.size == 3:
            T = np.eye(4)
            T[:3, 3] = vals
            M = M @ T
        elif t == "rotate" and vals.size == 4:
            axis = vals[:3]
            n = np.linalg.norm(axis)
            if n > 0:
                axis = axis / n
                a = np.deg2rad(vals[3])
                c, s = np.cos(a), np.sin(a)
                x, y, z = axis
                K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
                R3 = np.eye(3) * c + s * K + (1 - c) * np.outer(axis, axis)
                R = np.eye(4)
                R[:3, :3] = R3
                M = M @ R
        elif t == "scale" and vals.size == 3:
            S = np.diag(np.append(vals, 1.0))
            M = M @ S
    return M


def load_dae_grouped(path: str):
    """Parse a COLLADA file into per-material TriMesh groups.

    Returns (groups, materials) shaped exactly like load_obj_grouped so
    the converter backend is shared (``collada.cpp`` parity: geometry +
    effect import; cameras/lights fall back to the framing defaults)."""
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()

    def findall(el, *tags):
        cur = [el]
        for t in tags:
            nxt = []
            for e in cur:
                nxt.extend(e.findall(_DAE_NS + t))
            cur = nxt
        return cur

    # up-axis conversion to Y-up
    axis_el = findall(root, "asset", "up_axis")
    up = (axis_el[0].text or "Y_UP").strip() if axis_el else "Y_UP"
    if up == "Z_UP":
        A = np.array([[1.0, 0, 0, 0], [0, 0, 1.0, 0],
                      [0, -1.0, 0, 0], [0, 0, 0, 1.0]])
    elif up == "X_UP":
        A = np.array([[0, -1.0, 0, 0], [1.0, 0, 0, 0],
                      [0, 0, 1.0, 0], [0, 0, 0, 1.0]])
    else:
        A = np.eye(4)

    # effects -> MTL-style material dicts
    def _color(effect_el, name):
        for el in effect_el.iter():
            if _dae_tag(el) == name:
                for ch in el:
                    if _dae_tag(ch) == "color":
                        v = np.asarray((ch.text or "").split(),
                                       np.float64)[:3]
                        return v.tolist()
        return None

    def _float(effect_el, name):
        for el in effect_el.iter():
            if _dae_tag(el) == name:
                for ch in el:
                    if _dae_tag(ch) == "float":
                        return float(ch.text)
        return None

    effects = {}
    for eff in findall(root, "library_effects", "effect"):
        rec = {}
        kd = _color(eff, "diffuse")
        ks = _color(eff, "specular")
        ke = _color(eff, "emission")
        ns = _float(eff, "shininess")
        ior = _float(eff, "index_of_refraction")
        tr = _float(eff, "transparency")
        if kd:
            rec["Kd"] = kd
        if ks:
            rec["Ks"] = ks
        if ke and max(ke) > 0:
            rec["Ke"] = ke
        if ns is not None:
            rec["Ns"] = ns
        if ior is not None and abs(ior - 1.0) > 1e-3:
            rec["Ni"] = ior
            rec["illum"] = 7
        if tr is not None and tr < 1.0:
            rec["d"] = tr
        effects["#" + eff.get("id", "")] = rec

    materials = {}
    for mat in findall(root, "library_materials", "material"):
        inst = mat.find(_DAE_NS + "instance_effect")
        url = inst.get("url", "") if inst is not None else ""
        materials[mat.get("id", "")] = effects.get(url, {})

    # geometries: id -> list of (material_symbol, TriMesh builder inputs)
    geoms = {}
    for geo in findall(root, "library_geometries", "geometry"):
        mesh_el = geo.find(_DAE_NS + "mesh")
        if mesh_el is None:
            continue
        sources = _dae_sources(mesh_el)
        # vertices indirection: VERTEX input points at <vertices>
        vert_map = {}
        for v_el in mesh_el.findall(_DAE_NS + "vertices"):
            for inp in v_el.findall(_DAE_NS + "input"):
                if inp.get("semantic") == "POSITION":
                    vert_map["#" + v_el.get("id", "")] = \
                        sources.get(inp.get("source", ""))
        prims = []
        for prim in mesh_el:
            kind = _dae_tag(prim)
            if kind not in ("triangles", "polylist"):
                continue
            inputs = {}
            max_off = 0
            for inp in prim.findall(_DAE_NS + "input"):
                sem = inp.get("semantic")
                off = int(inp.get("offset", 0))
                max_off = max(max_off, off)
                srcu = inp.get("source", "")
                data = (vert_map.get(srcu) if sem == "VERTEX"
                        else sources.get(srcu))
                inputs[sem] = (off, data)
            p_el = prim.find(_DAE_NS + "p")
            if p_el is None or "VERTEX" not in inputs:
                continue
            p = np.asarray((p_el.text or "").split(), np.int64)
            stride = max_off + 1
            corners = p.reshape(-1, stride)
            if kind == "polylist":
                vc_el = prim.find(_DAE_NS + "vcount")
                vcount = np.asarray((vc_el.text or "").split(), np.int64) \
                    if vc_el is not None else None
            else:
                vcount = None
            prims.append((prim.get("material", ""), inputs, corners,
                          vcount))
        geoms["#" + geo.get("id", "")] = prims

    # visual scene: instance geometries with baked node transforms
    groups = []
    for node in findall(root, "library_visual_scenes", "visual_scene",
                        "node"):
        stack = [(node, np.eye(4))]
        while stack:
            nd, Mp = stack.pop()
            M = Mp @ _dae_node_transform(nd)
            for ch in nd.findall(_DAE_NS + "node"):
                stack.append((ch, M))
            for ig in nd.findall(_DAE_NS + "instance_geometry"):
                sym2mat = {}
                for im in ig.iter():
                    if _dae_tag(im) == "instance_material":
                        sym2mat[im.get("symbol", "")] = \
                            im.get("target", "").lstrip("#")
                for (msym, inputs, corners, vcount) in \
                        geoms.get(ig.get("url", ""), []):
                    groups.append((sym2mat.get(msym, msym), inputs,
                                   corners, vcount, A @ M))
    if not groups:  # no visual scene: import raw geometry untransformed
        for prims in geoms.values():
            for (msym, inputs, corners, vcount) in prims:
                groups.append((msym, inputs, corners, vcount, A))

    out = []
    for (mat_name, inputs, corners, vcount, M) in groups:
        pos_off, pos_src = inputs["VERTEX"]
        n_in = inputs.get("NORMAL")
        t_in = inputs.get("TEXCOORD")
        # fan-triangulate polylists
        if vcount is not None:
            tri_rows = []
            c = 0
            for k in vcount:
                for j in range(1, int(k) - 1):
                    tri_rows.extend([c, c + j, c + j + 1])
                c += int(k)
            corners = corners[np.asarray(tri_rows, np.int64)]
        corners = corners.reshape(-1, 3, corners.shape[-1])
        remap, pos, nrm, uv, idx = {}, [], [], [], []
        R = M[:3, :3]
        detR = np.linalg.det(R)
        Rn = np.linalg.inv(R).T if abs(detR) > 1e-12 else R
        # mirroring transforms (det < 0) flip the winding sense: reverse
        # each face's corner order so geometric normals e1xe2 still point
        # outward for mirrored instances
        if detR < 0:
            corners = corners[:, ::-1, :]
        for tri in corners:
            face = []
            for crn in tri:
                key = tuple(int(x) for x in crn)
                j = remap.get(key)
                if j is None:
                    j = len(pos)
                    remap[key] = j
                    pp = pos_src[crn[pos_off]]
                    pos.append(R @ pp[:3] + M[:3, 3])
                    if n_in is not None and n_in[1] is not None:
                        nn = Rn @ n_in[1][crn[n_in[0]]][:3]
                        ln = np.linalg.norm(nn)
                        nrm.append(nn / ln if ln > 0 else nn)
                    if t_in is not None and t_in[1] is not None:
                        uv.append(t_in[1][crn[t_in[0]]][:2])
                face.append(j)
            idx.append(face)
        mesh = TriMesh(
            np.asarray(pos), np.asarray(idx, np.int64),
            np.asarray(nrm) if nrm and len(nrm) == len(pos) else None,
            np.asarray(uv) if uv and len(uv) == len(pos) else None,
            name=mat_name or "default",
        )
        out.append((mat_name, mesh))
    return out, materials


# ---------------------------------------------------------------------------
# XML emission
# ---------------------------------------------------------------------------

def _rgb(name, val):
    return f'<rgb name="{name}" value="{val[0]} {val[1]} {val[2]}"/>'


def _bsdf_xml(mid: str, mat: dict) -> list[str]:
    kd = mat.get("Kd", [0.5, 0.5, 0.5])
    ks = mat.get("Ks", [0.0, 0.0, 0.0])
    ni = mat.get("Ni", 1.0)
    illum = mat.get("illum", 2)
    opac = mat.get("d", 1.0)

    lines = []
    ind = "    "
    transparent = opac < 1.0
    if transparent:
        lines.append(f'<bsdf type="mask" id="{mid}">')
        lines.append(f'{ind}<rgb name="opacity" '
                     f'value="{opac} {opac} {opac}"/>')
        inner_id = ""
        ind2 = ind
    else:
        inner_id = f' id="{mid}"'
        ind2 = ""

    if illum in (4, 6, 7, 9) or (ni != 1.0 and max(ks) > 0 and illum >= 4):
        lines.append(f'{ind2}<bsdf type="dielectric"{inner_id}>')
        lines.append(f'{ind2}{ind}<float name="intIOR" value="{ni}"/>')
        lines.append(f'{ind2}</bsdf>')
    elif max(ks) > 0.0:
        ns = mat.get("Ns", 30.0)
        lines.append(f'{ind2}<bsdf type="phong"{inner_id}>')
        lines.append(f'{ind2}{ind}<float name="exponent" value="{ns}"/>')
        lines.append(f'{ind2}{ind}' + _rgb("specularReflectance", ks))
        lines.append(f'{ind2}{ind}' + _rgb("diffuseReflectance", kd))
        lines.append(f'{ind2}</bsdf>')
    else:
        lines.append(f'{ind2}<bsdf type="diffuse"{inner_id}>')
        if "map_Kd" in mat:
            lines.append(f'{ind2}{ind}<texture name="reflectance" '
                         f'type="bitmap">')
            lines.append(f'{ind2}{ind}{ind}<string name="filename" '
                         f'value="{mat["map_Kd"]}"/>')
            lines.append(f'{ind2}{ind}</texture>')
        else:
            lines.append(f'{ind2}{ind}' + _rgb("reflectance", kd))
        lines.append(f'{ind2}</bsdf>')

    if transparent:
        lines.append('</bsdf>')
    return lines


def convert(obj_path: str, xml_path: str, resolution=(768, 576)) -> None:
    if obj_path.lower().endswith(".dae"):
        groups, materials = load_dae_grouped(obj_path)
    else:
        groups, materials = load_obj_grouped(obj_path)
    if not groups:
        raise ValueError(f"{obj_path}: no geometry found")

    stem = os.path.splitext(os.path.basename(xml_path))[0]
    ser_name = stem + ".serialized"
    ser_path = os.path.join(os.path.dirname(os.path.abspath(xml_path)),
                            ser_name)
    save_serialized(ser_path, [m for _, m in groups])

    # frame the scene with a default camera on the bounding sphere
    allp = np.concatenate([m.positions for _, m in groups])
    lo, hi = allp.min(0), allp.max(0)
    center = 0.5 * (lo + hi)
    radius = float(np.linalg.norm(hi - lo)) * 0.5 + 1e-6
    eye = center + np.asarray([0.0, 0.5, 2.4]) * radius

    L = ['<scene version="0.6.0">',
         '    <integrator type="path"/>',
         '    <sensor type="perspective">',
         '        <float name="fov" value="45"/>',
         '        <transform name="toWorld">',
         f'            <lookat origin="{eye[0]} {eye[1]} {eye[2]}" '
         f'target="{center[0]} {center[1]} {center[2]}" up="0 1 0"/>',
         '        </transform>',
         '        <sampler type="independent">'
         '<integer name="sampleCount" value="16"/></sampler>',
         '        <film type="hdrfilm">',
         f'            <integer name="width" value="{resolution[0]}"/>',
         f'            <integer name="height" value="{resolution[1]}"/>',
         '        </film>',
         '    </sensor>',
         '    <emitter type="constant">'
         '<rgb name="radiance" value="1 1 1"/></emitter>']

    used = set()
    for name, _ in groups:
        mid = f"mat_{name or 'default'}"
        if mid in used:
            continue
        used.add(mid)
        mat = materials.get(name, {})
        L += ["    " + ln for ln in _bsdf_xml(mid, mat)]

    for i, (name, _) in enumerate(groups):
        mid = f"mat_{name or 'default'}"
        mat = materials.get(name, {})
        L.append('    <shape type="serialized">')
        L.append(f'        <string name="filename" value="{ser_name}"/>')
        L.append(f'        <integer name="shapeIndex" value="{i}"/>')
        L.append(f'        <ref id="{mid}"/>')
        ke = mat.get("Ke", [0, 0, 0])
        if max(ke) > 0.0:
            L.append('        <emitter type="area">' + _rgb("radiance", ke)
                     + '</emitter>')
        L.append('    </shape>')
    L.append('</scene>')

    with open(xml_path, "w") as f:
        f.write("\n".join(L) + "\n")


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    resolution = (768, 576)
    while argv and argv[0].startswith("-"):
        flag = argv.pop(0)
        if flag == "-r":
            w, _, h = argv.pop(0).partition("x")
            resolution = (int(w), int(h or w))
        elif flag in ("-h", "--help"):
            print(__doc__)
            return 0
        else:
            print(f"unknown flag {flag}", file=sys.stderr)
            return 2
    if len(argv) != 2:
        print("usage: mtsimport [-r WxH] model.{obj,dae} out.xml",
              file=sys.stderr)
        return 2
    convert(argv[0], argv[1], resolution)
    print(f"[mtsimport] wrote {argv[1]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
