"""Mitsuba scene-XML loader.

Parity target: ``/root/reference/src/librender/scenehandler.cpp`` (pugixml
SAX -> nested Properties -> PluginManager instantiation) including ``$var``
parameter substitution (``-D key=value``), ``<default>``, ``<ref>``/``id``
resolution, ``<include>``, ``<transform>`` op sequences, ``<alias>``, and
spectrum/rgb/srgb/blackbody property syntax.  Versions 0.4-0.6 accepted.
"""
from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np

from ..core.properties import Properties
from ..core.transform import Transform
from ..core import registry
from ..core.spectrum import blackbody_rgb
from .build import SceneBuilder

_PROP_TAGS = {
    "float", "integer", "boolean", "string", "point", "vector", "rgb",
    "srgb", "spectrum", "blackbody", "transform", "animation", "default",
}
_PLUGIN_TAGS = {
    "bsdf", "shape", "emitter", "sensor", "sampler", "film", "rfilter",
    "texture", "integrator", "medium", "phase", "volume", "subsurface",
}


class VersionError(ValueError):
    pass


class SceneLoader:
    def __init__(self, params: dict[str, str] | None = None):
        self.params = dict(params or {})
        self.defaults: dict[str, str] = {}
        self.ids: dict[str, tuple[str, object]] = {}  # id -> (category, value)
        self.builder = SceneBuilder()
        self.search_paths: list[str] = []

    # -- public -------------------------------------------------------------
    def load(self, path: str):
        self.search_paths.append(os.path.dirname(os.path.abspath(path)))
        self.builder.resolve_path = self._resolve_path
        root = ET.parse(path).getroot()
        if root.tag != "scene":
            raise ValueError(f"{path}: root element must be <scene>")
        version = root.get("version", "0.6.0")
        major = tuple(int(x) for x in version.split("."))[:2]
        if major > (0, 6):
            raise VersionError(f"unsupported scene version {version}")
        self._load_scene_children(root)
        scene, settings = self.builder.build()
        return scene, settings

    def _resolve_path(self, p: str) -> str:
        if os.path.isabs(p) and os.path.exists(p):
            return p
        for sp in self.search_paths + [os.getcwd()]:
            cand = os.path.join(sp, p)
            if os.path.exists(cand):
                return cand
        return p

    # -- traversal ----------------------------------------------------------
    def _load_scene_children(self, root):
        for el in root:
            tag = el.tag
            if tag == "default":
                self.defaults[el.get("name")] = el.get("value", "")
            elif tag == "alias":
                src = el.get("id")
                if src in self.ids:
                    self.ids[el.get("as")] = self.ids[src]
            elif tag == "include":
                sub = ET.parse(self._resolve_path(self._subst(el.get("filename")))).getroot()
                self._load_scene_children(sub)
            elif tag in _PLUGIN_TAGS:
                result = self._instantiate(el)
                if tag == "emitter" and isinstance(result, (dict, list)):
                    # standalone emitters (constant/envmap/point/...) register
                    # directly; area emitters are attached by their shape;
                    # compound emitters (sunsky) return a record list
                    from ..emitter.table import EM_AREA

                    recs = result if isinstance(result, list) else [result]
                    for rec in recs:
                        if rec.get("type") != EM_AREA:
                            self.builder.add_emitter(rec)
            elif tag == "null":
                continue

    def _subst(self, s: str | None) -> str:
        if s is None:
            return ""

        def rep(mo):
            key = mo.group(1)
            if key in self.params:
                return str(self.params[key])
            if key in self.defaults:
                return str(self.defaults[key])
            raise KeyError(f"undefined scene parameter ${key}")

        return re.sub(r"\$(\w+)", rep, s)

    def _instantiate(self, el):
        """Parse one plugin element depth-first and run its factory."""
        category = el.tag
        ptype = self._subst(el.get("type"))
        props = Properties(ptype)
        props.id = el.get("id", "")

        # shapegroup: capture child shapes into a shared BLAS group on the
        # builder (instance.cpp:115 analog) instead of world geometry; the
        # <ref> then resolves to the group key consumed by <shape
        # type="instance">
        if (category == "shape" and ptype == "shapegroup"
                and hasattr(self.builder, "begin_group")):
            key = ("shapegroup", id(el))
            self.builder.begin_group(key)
            for child in el:
                if child.tag == "shape":
                    self._instantiate(child)
            self.builder.end_group(key)
            self.ids[props.id or "default"] = ("shapegroup", key)
            return None

        for child in el:
            tag = child.tag
            if tag in _PROP_TAGS:
                self._parse_prop(child, props)
            elif tag == "ref":
                rid = self._subst(child.get("id"))
                if rid not in self.ids:
                    raise KeyError(f"unresolved reference id '{rid}'")
                rcat, rval = self.ids[rid]
                name = child.get("name") or rcat
                self._attach_child(props, rcat, name, rval)
            elif tag in _PLUGIN_TAGS:
                val = self._instantiate(child)
                name = child.get("name") or tag
                self._attach_child(props, tag, name, val)

        result = registry.create(category, props, self.builder)

        # top-level id registration for later <ref>
        if props.id:
            if category == "bsdf" and isinstance(result, dict):
                # shared BSDF: one table row, referenced by index
                idx = self.builder.add_bsdf(result)
                self.ids[props.id] = ("bsdf", idx)
            else:
                self.ids[props.id] = (category, result)
        if category == "sensor":
            self.builder.sensor = result
            for key in ("exterior", "medium"):
                med = props.children.get(key)
                if isinstance(med, dict) and "id" in med:
                    self.builder.camera_medium = med["id"]
        if category == "shape" and el.tag == "shape" and ptype == "shapegroup":
            self.ids[props.id or "default"] = ("shapegroup", result)
        return result

    def _attach_child(self, props: Properties, category: str, name: str, val):
        if category in ("bsdf", "texture", "emitter", "sampler", "film",
                        "rfilter", "phase", "medium", "subsurface"):
            key = name if name != category else category
            if category == "bsdf" and key == "bsdf" and "bsdf" in props.children:
                props.children.setdefault("bsdf_list", [props.children["bsdf"]])
                props.children["bsdf_list"].append(val)
            if category == "phase" and key == "phase":
                props.children.setdefault("phase_list", []).append(val)
            props.children[key] = val
            if category == "bsdf" and "bsdf_list" in props.children and key == "bsdf":
                pass
        elif category == "integrator":
            props.children.setdefault("integrator_list", []).append(val)
            props.children["integrator"] = val
        elif category == "volume":
            props.children.setdefault("volume_list", []).append(val)
            props.children[name] = val
        elif category == "shape":
            props.children.setdefault("shape_list", []).append(val)
        else:
            props.children[name] = val

    # -- property parsing ----------------------------------------------------
    def _parse_prop(self, el, props: Properties):
        tag = el.tag
        name = el.get("name", "")
        if tag == "default":
            self.defaults[name] = el.get("value", "")
            return
        if tag == "transform":
            props.set(name or "toWorld", self._parse_transform(el))
            return
        if tag == "animation":
            # animated transforms: take the first keyframe (static snapshot)
            for sub in el:
                if sub.tag == "transform":
                    props.set(name or "toWorld", self._parse_transform(sub))
                    break
            return
        value = self._subst(el.get("value"))
        if tag == "float":
            props.set(name, float(value))
        elif tag == "integer":
            props.set(name, int(float(value)))
        elif tag == "boolean":
            props.set(name, value.strip().lower() == "true")
        elif tag == "string":
            props.set(name, value)
        elif tag in ("point", "vector"):
            if el.get("value") is not None:
                vec = np.asarray([float(x) for x in re.split(r"[ ,]+", value.strip())])
                if vec.size == 1:
                    vec = np.full(3, vec[0])
            else:
                vec = np.asarray([
                    float(self._subst(el.get("x", "0"))),
                    float(self._subst(el.get("y", "0"))),
                    float(self._subst(el.get("z", "0"))),
                ])
            props.set(name, vec)
        elif tag == "rgb":
            props.set(name, _parse_rgb(value))
        elif tag == "srgb":
            rgb = _parse_rgb(value)
            props.set(name, np.where(rgb <= 0.04045, rgb / 12.92,
                                     ((rgb + 0.055) / 1.055) ** 2.4))
        elif tag == "spectrum":
            props.set(name, _parse_spectrum(value))
        elif tag == "blackbody":
            t = float(self._subst(el.get("temperature", "5000")))
            scale = float(self._subst(el.get("scale", "1")))
            props.set(name, blackbody_rgb(t) * scale)

    def _parse_transform(self, el) -> Transform:
        cur = Transform()
        for op in el:
            t = op.tag
            if t == "translate":
                v = self._vec_attrs(op, 0.0)
                cur = Transform.translate(v) @ cur
            elif t == "scale":
                if op.get("value") is not None:
                    s = float(self._subst(op.get("value")))
                    v = np.full(3, s)
                else:
                    v = self._vec_attrs(op, 1.0)
                cur = Transform.scale(v) @ cur
            elif t == "rotate":
                axis = self._vec_attrs(op, 0.0)
                if np.linalg.norm(axis) == 0:
                    axis = np.array([0, 0, 1.0])
                ang = float(self._subst(op.get("angle", "0")))
                cur = Transform.rotate(axis, ang) @ cur
            elif t in ("lookat", "lookAt"):
                origin = _parse_triple(self._subst(op.get("origin", "0,0,0")))
                target = _parse_triple(self._subst(op.get("target", "0,0,1")))
                up = _parse_triple(self._subst(op.get("up", "0,1,0")))
                cur = Transform.look_at(origin, target, up) @ cur
            elif t == "matrix":
                vals = [float(x) for x in re.split(r"[ ,]+", self._subst(op.get("value")).strip())]
                if len(vals) == 16:
                    m = np.asarray(vals).reshape(4, 4)
                elif len(vals) == 9:
                    m = np.eye(4)
                    m[:3, :3] = np.asarray(vals).reshape(3, 3)
                else:
                    raise ValueError("matrix must have 9 or 16 entries")
                cur = Transform(m) @ cur
        return cur

    def _vec_attrs(self, el, default):
        return np.asarray([
            float(self._subst(el.get("x", str(default)))),
            float(self._subst(el.get("y", str(default)))),
            float(self._subst(el.get("z", str(default)))),
        ])


def _parse_triple(value: str) -> np.ndarray:
    parts = [float(x) for x in re.split(r"[ ,]+", value.strip()) if x]
    return np.asarray(parts[:3])


def _parse_rgb(value: str) -> np.ndarray:
    value = value.strip()
    if value.startswith("#"):
        h = value[1:]
        return np.asarray([int(h[i : i + 2], 16) / 255.0 for i in (0, 2, 4)])
    parts = [float(x) for x in re.split(r"[ ,]+", value) if x]
    if len(parts) == 1:
        return np.full(3, parts[0])
    return np.asarray(parts[:3])


def _parse_spectrum(value: str) -> np.ndarray:
    """Uniform value, rgb triple, or wavelength:value SPD pairs.

    SPDs are integrated against the CIE 1931 observer and converted to
    linear RGB (``Spectrum::toXYZ``/``fromContinuousSpectrum`` analog,
    ``/root/reference/src/libcore/spectrum.cpp``), so measured spectra
    (metal IORs, test scenes) keep their color."""
    value = value.strip()
    if ":" in value:
        pairs = [p for p in re.split(r"[ ,]+", value) if ":" in p]
        wl = [float(p.split(":")[0]) for p in pairs]
        vals = [float(p.split(":")[1]) for p in pairs]
        if len(vals) == 1:
            return np.full(3, vals[0])
        from ..core.spectrum import interpolated_rgb

        return np.maximum(interpolated_rgb(wl, vals), 0.0)
    parts = [float(x) for x in re.split(r"[ ,]+", value) if x]
    if len(parts) == 1:
        return np.full(3, parts[0])
    return np.asarray(parts[:3])


def load_scene(path: str, params: dict | None = None):
    """Top-level entry (``SceneLoader::load`` analog, sceneloader.h:64)."""
    return SceneLoader(params).load(path)
