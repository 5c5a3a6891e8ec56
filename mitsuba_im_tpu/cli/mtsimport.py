"""``mtsimport`` — OBJ(+MTL) to scene-XML converter.

Parity target: ``/root/reference/src/converter/`` (the ``mtsimport``
tool): convert an external model into a renderable scene — geometry
re-written as a multi-shape ``.serialized`` file, one shape + BSDF per
material, plus a default camera/film/integrator when the input has none
(COLLADA input, which the reference gates behind an optional Xerces
dependency, is out of scope; OBJ/MTL is the widely-used path).

Material mapping (Wavefront MTL -> plugin, mirroring the reference
converter's lambert/phong/dielectric taxonomy):

  Ke > 0                      -> area emitter on the shape
  d < 1 or Tr > 0             -> ``mask`` over the base BSDF
  illum 4/6/7/9 or Ni != 1    -> ``dielectric`` (intIOR = Ni)
  Ks > 0                      -> ``phong`` (exponent = Ns)
  otherwise                   -> ``diffuse`` (map_Kd -> bitmap texture)

Usage: python -m mitsuba_im_tpu.cli.mtsimport [-r WxH] model.obj out.xml
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
        print("usage: mtsimport [-r WxH] model.obj out.xml",
              file=sys.stderr)
        return 2
    convert(argv[0], argv[1], resolution)
    print(f"[mtsimport] wrote {argv[1]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
