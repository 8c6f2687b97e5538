"""Mitsuba XML (v3.0.0) scene parser.

Produces plain-Python scene descriptions that ``scene.compile_scene`` turns
into frozen device arrays. Supports the constructs used by the bundled
corpus (reference: mi.load_file at main.py:34): ``<default>`` + ``$var``
substitution with caller overrides, transforms (matrix / lookat / scale /
rotate / translate), named bsdf definitions + ``<ref>``, nested
``twosided``, textures (bitmap / checkerboard), shapes (rectangle, cube,
sphere, obj, serialized), area/directional/envmap emitters, perspective
sensor with hdrfilm and rfilter.
"""
from __future__ import annotations

import re
import warnings
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from . import transforms

# Named IORs (subset of Mitsuba's table used by the corpus).
NAMED_IOR = {
    "air": 1.000277,
    "vacuum": 1.0,
    "water": 1.3330,
    "acrylic glass": 1.49,
    "glass": 1.5046,
    "bk7": 1.5046,
    "diamond": 2.419,
    "polypropylene": 1.49,
}

# RGB-averaged conductor eta/k (values as used explicitly in the corpus XMLs:
# Al from veach-ajar roughconductor entries, Au from veach-mis).
CONDUCTOR_IOR = {
    "Al": ((1.65746, 0.880369, 0.521229), (9.22387, 6.26952, 4.837)),
    "Au": ((0.143119, 0.374957, 1.44248), (3.98316, 2.38572, 1.60322)),
    "Cu": ((0.20038, 0.923777, 1.10191), (3.91185, 2.45217, 2.14159)),
    "Ag": ((0.155184, 0.116677, 0.138372), (4.81810, 3.12297, 2.14157)),
    "none": ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)),
}


@dataclass
class TextureDesc:
    kind: str = "constant"  # constant | bitmap | checkerboard
    value: tuple = (0.5, 0.5, 0.5)
    filename: str = ""
    color0: tuple = (0.4, 0.4, 0.4)
    color1: tuple = (0.2, 0.2, 0.2)
    to_uv: np.ndarray = None  # 4x4 uv transform (x, y used)


@dataclass
class BSDFDesc:
    kind: str = "diffuse"
    twosided: bool = False
    reflectance: TextureDesc = field(default_factory=TextureDesc)
    specular_reflectance: TextureDesc = field(
        default_factory=lambda: TextureDesc(value=(1.0, 1.0, 1.0))
    )
    diffuse_reflectance: TextureDesc = field(
        default_factory=lambda: TextureDesc(value=(0.5, 0.5, 0.5))
    )
    alpha: float = 0.1
    distribution: str = "beckmann"
    eta: tuple = (0.0, 0.0, 0.0)
    k: tuple = (1.0, 1.0, 1.0)
    int_ior: float = 1.5046
    ext_ior: float = 1.000277
    nonlinear: bool = False


@dataclass
class ShapeDesc:
    kind: str
    to_world: np.ndarray
    bsdf: BSDFDesc
    emitter_radiance: tuple = None  # area emitter if set
    filename: str = ""
    shape_index: int = 0
    face_normals: bool = False
    center: tuple = (0.0, 0.0, 0.0)
    radius: float = 1.0
    id: str = ""


@dataclass
class EmitterDesc:
    kind: str  # directional | envmap
    to_world: np.ndarray
    radiance: tuple = (1.0, 1.0, 1.0)  # irradiance for directional
    filename: str = ""
    scale: float = 1.0


@dataclass
class SensorDesc:
    fov: float = 45.0
    fov_axis: str = "x"
    to_world: np.ndarray = field(default_factory=transforms.identity)
    width: int = 256
    height: int = 256
    rfilter: str = "tent"
    spp: int = 64
    near_clip: float = 1e-2
    far_clip: float = 1e4
    sampler: str = "independent"


@dataclass
class SceneDesc:
    path: Path
    integrator: str = "path"
    max_depth: int = 30
    rr_depth: int = 8
    sensor: SensorDesc = field(default_factory=SensorDesc)
    shapes: list = field(default_factory=list)
    emitters: list = field(default_factory=list)  # non-area emitters


def _rgb(s) -> tuple:
    vals = [float(v) for v in str(s).replace(",", " ").split()]
    if len(vals) == 1:
        return (vals[0],) * 3
    return tuple(vals[:3])


def _substitute(text: str, params: dict) -> str:
    def repl(m):
        name = m.group(1)
        if name not in params:
            raise KeyError(f"undefined scene parameter ${name}")
        return str(params[name])

    return re.sub(r"\$(\w+)", repl, text)


def _children_by_name(elem):
    return {c.get("name"): c for c in elem if c.get("name") is not None}


def _get(elem, name, default=None, cast=str):
    for c in elem:
        if c.get("name") == name:
            return cast(c.get("value"))
    return default


def _parse_texture(elem) -> TextureDesc:
    t = TextureDesc(kind=elem.get("type"))
    if t.kind == "bitmap":
        t.filename = _get(elem, "filename")
    elif t.kind == "checkerboard":
        t.color0 = _rgb(_get(elem, "color0", "0.4"))
        t.color1 = _rgb(_get(elem, "color1", "0.2"))
        for c in elem:
            if c.tag == "transform" and c.get("name") == "to_uv":
                t.to_uv = transforms.parse_transform(c)
    else:
        raise NotImplementedError(f"texture type {t.kind}")
    return t


def _reflectance_like(elem, name, default) -> TextureDesc:
    """Parse an rgb-or-texture parameter."""
    for c in elem:
        if c.get("name") == name:
            if c.tag == "rgb" or c.tag == "spectrum":
                return TextureDesc(kind="constant", value=_rgb(c.get("value")))
            if c.tag == "texture":
                return _parse_texture(c)
            if c.tag == "float":
                return TextureDesc(kind="constant", value=_rgb(c.get("value")))
    return TextureDesc(kind="constant", value=default)


def _ior_value(elem, name, default):
    for c in elem:
        if c.get("name") == name:
            v = c.get("value")
            if c.tag == "string":
                return NAMED_IOR[v.lower()]
            return float(v)
    return default


def _parse_bsdf(elem, named) -> BSDFDesc:
    kind = elem.get("type")
    if kind == "twosided":
        inner_elem = next(c for c in elem if c.tag == "bsdf")
        inner = _parse_bsdf(inner_elem, named)
        inner.twosided = True
        return inner
    b = BSDFDesc(kind=kind)
    if kind == "diffuse":
        b.reflectance = _reflectance_like(elem, "reflectance", (0.5, 0.5, 0.5))
    elif kind in ("conductor", "roughconductor"):
        mat = _get(elem, "material", None)
        if mat is not None:
            b.eta, b.k = CONDUCTOR_IOR[mat]
        else:
            eta = _get(elem, "eta", None)
            # eta/k may be rgb elements
            for c in elem:
                if c.get("name") == "eta":
                    b.eta = _rgb(c.get("value"))
                if c.get("name") == "k":
                    b.k = _rgb(c.get("value"))
            if eta is None and b.eta == (0.0, 0.0, 0.0) and mat is None:
                b.eta, b.k = CONDUCTOR_IOR["Al"]
        b.specular_reflectance = _reflectance_like(
            elem, "specular_reflectance", (1.0, 1.0, 1.0)
        )
        b.alpha = _get(elem, "alpha", 0.1, float)
        b.distribution = _get(elem, "distribution", "beckmann")
    elif kind in ("dielectric", "roughdielectric", "thindielectric"):
        b.int_ior = _ior_value(elem, "int_ior", 1.5046)
        b.ext_ior = _ior_value(elem, "ext_ior", 1.000277)
        b.alpha = _get(elem, "alpha", 0.1, float)
        b.distribution = _get(elem, "distribution", "beckmann")
    elif kind == "plastic" or kind == "roughplastic":
        b.int_ior = _ior_value(elem, "int_ior", 1.49)
        b.ext_ior = _ior_value(elem, "ext_ior", 1.000277)
        b.diffuse_reflectance = _reflectance_like(
            elem, "diffuse_reflectance", (0.5, 0.5, 0.5)
        )
        b.nonlinear = _get(elem, "nonlinear", "false") == "true"
        b.alpha = _get(elem, "alpha", 0.1, float)
    else:
        raise NotImplementedError(f"bsdf type {kind}")
    return b


def load_file(path, **overrides) -> SceneDesc:
    """Parse a Mitsuba XML scene file (mi.load_file equivalent).

    ``overrides`` substitute ``$var`` parameters (like mi.load_file kwargs).
    """
    path = Path(path)
    raw = path.read_text()
    # collect <default> params first (raw parse), then substitute and reparse
    pre = ET.fromstring(re.sub(r"\$(\w+)", r"__DOLLAR__\1", raw))
    params = {}
    for d in pre.iter("default"):
        params[d.get("name")] = d.get("value")
    params.update({k: str(v) for k, v in overrides.items()})
    root = ET.fromstring(_substitute(raw, params))

    desc = SceneDesc(path=path.parent)
    named_bsdfs = {}

    for elem in root:
        tag = elem.tag
        if tag == "default":
            continue
        if tag == "integrator":
            desc.integrator = elem.get("type")
            desc.max_depth = _get(elem, "max_depth", 30, int)
            desc.rr_depth = _get(elem, "rr_depth", 8, int)
        elif tag == "sensor":
            s = SensorDesc()
            s.fov = _get(elem, "fov", 45.0, float)
            s.fov_axis = _get(elem, "fov_axis", "x")
            s.near_clip = _get(elem, "near_clip", 1e-2, float)
            s.far_clip = _get(elem, "far_clip", 1e4, float)
            for c in elem:
                if c.tag == "transform":
                    s.to_world = transforms.parse_transform(c)
                elif c.tag == "sampler":
                    s.sampler = c.get("type")
                    s.spp = _get(c, "sample_count", 64, int)
                elif c.tag == "film":
                    s.width = _get(c, "width", 256, int)
                    s.height = _get(c, "height", 256, int)
                    for f in c:
                        if f.tag == "rfilter":
                            s.rfilter = f.get("type")
            desc.sensor = s
        elif tag == "bsdf":
            b = _parse_bsdf(elem, named_bsdfs)
            if elem.get("id"):
                named_bsdfs[elem.get("id")] = b
        elif tag == "shape":
            kind = elem.get("type")
            to_world = transforms.identity()
            bsdf = None
            emitter = None
            for c in elem:
                if c.tag == "transform" and c.get("name") == "to_world":
                    to_world = transforms.parse_transform(c)
                elif c.tag == "ref":
                    bsdf = named_bsdfs[c.get("id")]
                elif c.tag == "bsdf":
                    bsdf = _parse_bsdf(c, named_bsdfs)
                elif c.tag == "emitter":
                    if c.get("type") != "area":
                        raise NotImplementedError("non-area emitter on shape")
                    emitter = _rgb(_get(c, "radiance", "1"))
            if bsdf is None:
                bsdf = BSDFDesc(kind="diffuse", twosided=True)
            sh = ShapeDesc(
                kind=kind,
                to_world=to_world,
                bsdf=bsdf,
                emitter_radiance=emitter,
                id=elem.get("id", ""),
            )
            if kind in ("obj", "serialized"):
                sh.filename = _get(elem, "filename")
                sh.shape_index = _get(elem, "shape_index", 0, int)
                sh.face_normals = _get(elem, "face_normals", "false") == "true"
                if not (path.parent / sh.filename).exists():
                    warnings.warn(
                        f"shape file missing (unfetched blob): {sh.filename}; skipping"
                    )
                    continue
            elif kind == "sphere":
                sh.radius = _get(elem, "radius", 1.0, float)
                for c in elem:
                    if c.tag == "point" and c.get("name") == "center":
                        sh.center = (
                            float(c.get("x", 0)),
                            float(c.get("y", 0)),
                            float(c.get("z", 0)),
                        )
            desc.shapes.append(sh)
        elif tag == "emitter":
            kind = elem.get("type")
            to_world = transforms.identity()
            for c in elem:
                if c.tag == "transform":
                    to_world = transforms.parse_transform(c)
            e = EmitterDesc(kind=kind, to_world=to_world)
            if kind == "directional":
                e.radiance = _rgb(_get(elem, "irradiance", "1"))
            elif kind == "envmap":
                e.filename = _get(elem, "filename")
                e.scale = _get(elem, "scale", 1.0, float)
            elif kind == "constant":
                e.radiance = _rgb(_get(elem, "radiance", "1"))
            else:
                raise NotImplementedError(f"emitter type {kind}")
            desc.emitters.append(e)
    return desc
