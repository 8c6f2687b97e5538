"""Scene compilation: SceneDesc -> frozen device arrays (a jit-able pytree).

The compiled ``Scene`` is the TPU analog of Mitsuba's loaded scene object:
triangle soup (padded to fixed blocks for the streaming intersector),
analytic spheres, material/texture/emitter tables, and the camera.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from ..accel.traverse import TRI_BLOCK
from . import shapes as shapes_mod
from .camera import Camera, make_camera
from .emitters import EmitterTable, build_emitters
from .parser import SceneDesc, load_file
from .textures import TextureTable, build_textures

BSDF_DIFFUSE = 0
BSDF_CONDUCTOR = 1
BSDF_ROUGH_CONDUCTOR = 2
BSDF_DIELECTRIC = 3
BSDF_ROUGH_DIELECTRIC = 4
BSDF_PLASTIC = 5

_BSDF_KIND_IDS = {
    "diffuse": BSDF_DIFFUSE,
    "conductor": BSDF_CONDUCTOR,
    "roughconductor": BSDF_ROUGH_CONDUCTOR,
    "dielectric": BSDF_DIELECTRIC,
    "thindielectric": BSDF_DIELECTRIC,
    "roughdielectric": BSDF_ROUGH_DIELECTRIC,
    "plastic": BSDF_PLASTIC,
    "roughplastic": BSDF_PLASTIC,
}


@struct.dataclass
class MaterialTable:
    kind: jnp.ndarray       # (M,) int32
    refl_tex: jnp.ndarray   # (M,) int32 diffuse reflectance texture
    spec_tex: jnp.ndarray   # (M,) int32 specular reflectance texture
    diff_tex: jnp.ndarray   # (M,) int32 plastic diffuse reflectance texture
    alpha: jnp.ndarray      # (M,)
    dist_ggx: jnp.ndarray   # (M,) bool
    eta3: jnp.ndarray       # (M,3) conductor eta
    k3: jnp.ndarray         # (M,3) conductor k
    eta_ratio: jnp.ndarray  # (M,) int_ior / ext_ior
    nonlinear: jnp.ndarray  # (M,) bool
    twosided: jnp.ndarray   # (M,) bool
    # packed row for one-gather access: [kind, refl_tex, spec_tex,
    # diff_tex, alpha, ggx, eta3(3), k3(3), eta_ratio, nonlinear] (M,16)
    packed: jnp.ndarray = None
    # static: does any material route (refl, spec, diff) to a bitmap
    # texture? constant-only channels then compile ZERO texture gathers
    chan_bitmap: tuple = struct.field(
        pytree_node=False, default=(True, True, True)
    )


@struct.dataclass
class Scene:
    camera: Camera
    tris: dict
    spheres: dict
    materials: MaterialTable
    textures: TextureTable
    emitters: EmitterTable
    bbox_lo: jnp.ndarray
    bbox_hi: jnp.ndarray
    num_tris: int = struct.field(pytree_node=False, default=0)
    max_depth: int = struct.field(pytree_node=False, default=30)
    rr_depth: int = struct.field(pytree_node=False, default=8)
    integrator: str = struct.field(pytree_node=False, default="path")
    name: str = struct.field(pytree_node=False, default="scene")
    rfilter: str = struct.field(pytree_node=False, default="tent")
    # static set of BSDF families present — the vectorized dispatcher only
    # emits code for these (smaller programs, faster compiles & VPU time)
    used_kinds: tuple = struct.field(pytree_node=False, default=())
    # BVH table sizes (static; the Pallas traversal kernels need them
    # at trace time). 0 = tables absent.
    bvh_n_nodes: int = struct.field(pytree_node=False, default=0)
    bvh_n_leaves: int = struct.field(pytree_node=False, default=0)
    bvh_n_internal: int = struct.field(pytree_node=False, default=0)


def _build_materials(desc: SceneDesc):
    """Dedupe BSDFDesc objects (by identity) and collect their textures."""
    mats = []
    index = {}
    for sh in desc.shapes:
        key = id(sh.bsdf)
        if key not in index:
            index[key] = len(mats)
            mats.append(sh.bsdf)
        sh._mat_id = index[key]

    textures = []

    def tex_id(tdesc):
        for i, t in enumerate(textures):
            if t is tdesc:
                return i
            if (
                t.kind == "constant"
                and tdesc.kind == "constant"
                and t.value == tdesc.value
            ):
                return i
        textures.append(tdesc)
        return len(textures) - 1

    m = len(mats)
    kind = np.zeros(m, np.int32)
    refl_tex = np.zeros(m, np.int32)
    spec_tex = np.zeros(m, np.int32)
    diff_tex = np.zeros(m, np.int32)
    alpha = np.full(m, 0.1, np.float32)
    dist_ggx = np.zeros(m, bool)
    eta3 = np.zeros((m, 3), np.float32)
    k3 = np.ones((m, 3), np.float32)
    eta_ratio = np.ones(m, np.float32)
    nonlinear = np.zeros(m, bool)
    twosided = np.zeros(m, bool)
    for i, b in enumerate(mats):
        kind[i] = _BSDF_KIND_IDS[b.kind]
        refl_tex[i] = tex_id(b.reflectance)
        spec_tex[i] = tex_id(b.specular_reflectance)
        diff_tex[i] = tex_id(b.diffuse_reflectance)
        alpha[i] = b.alpha
        dist_ggx[i] = b.distribution == "ggx"
        eta3[i] = b.eta
        k3[i] = b.k
        eta_ratio[i] = b.int_ior / b.ext_ior
        nonlinear[i] = b.nonlinear
        twosided[i] = b.twosided

    packed = np.zeros((m, 16), np.float32)
    packed[:, 0] = kind
    packed[:, 1] = refl_tex
    packed[:, 2] = spec_tex
    packed[:, 3] = diff_tex
    packed[:, 4] = alpha
    packed[:, 5] = dist_ggx
    packed[:, 6:9] = eta3
    packed[:, 9:12] = k3
    packed[:, 12] = eta_ratio
    packed[:, 13] = nonlinear

    def _chan_has_bitmap(col):
        return bool(
            any(textures[t].kind == "bitmap" for t in np.unique(col))
        )

    table = MaterialTable(
        chan_bitmap=(
            _chan_has_bitmap(refl_tex),
            _chan_has_bitmap(spec_tex),
            _chan_has_bitmap(diff_tex),
        ),
        packed=jnp.asarray(packed),
        kind=jnp.asarray(kind),
        refl_tex=jnp.asarray(refl_tex),
        spec_tex=jnp.asarray(spec_tex),
        diff_tex=jnp.asarray(diff_tex),
        alpha=jnp.asarray(alpha),
        dist_ggx=jnp.asarray(dist_ggx),
        eta3=jnp.asarray(eta3),
        k3=jnp.asarray(k3),
        eta_ratio=jnp.asarray(eta_ratio),
        nonlinear=jnp.asarray(nonlinear),
        twosided=jnp.asarray(twosided),
    )
    return table, textures


def compile_scene(desc: SceneDesc) -> Scene:
    materials, tex_descs = _build_materials(desc)

    # emitter ids for shapes with area emitters (order = shape order)
    next_em = 0
    for sh in desc.shapes:
        if sh.emitter_radiance is not None:
            sh._emitter_id = next_em
            next_em += 1
        else:
            sh._emitter_id = -1

    tris_np, spheres_np = shapes_mod.build_geometry(desc)
    emitters = build_emitters(desc, tris_np)
    textures = build_textures(tex_descs, desc.path)

    # pad triangles to a multiple of TRI_BLOCK with degenerate tris
    t = len(tris_np["v0"])
    pad = (-t) % TRI_BLOCK if t > 0 else TRI_BLOCK
    def padded(a, fill=0):
        shape = (pad,) + a.shape[1:]
        return np.concatenate([a, np.full(shape, fill, a.dtype)], axis=0)

    tris = {k: padded(tris_np[k], -1 if k == "emitter" else 0) for k in tris_np}
    tris["e1"] = tris["v1"] - tris["v0"]
    tris["e2"] = tris["v2"] - tris["v0"]
    nb = len(tris["v0"]) // TRI_BLOCK
    tris["v0b"] = tris["v0"].reshape(nb, TRI_BLOCK, 3)
    tris["e1b"] = tris["e1"].reshape(nb, TRI_BLOCK, 3)
    tris["e2b"] = tris["e2"].reshape(nb, TRI_BLOCK, 3)
    # SoA layouts for the Pallas kernels (ops/pallas/intersect.py):
    # brute-force order + clustered order with AABB culling tables
    from ..ops.pallas.intersect import build_clustered_soa, build_tri_soa

    tris["soa"] = build_tri_soa(tris_np["v0"], tris_np["v1"], tris_np["v2"])
    soa_c, cbounds, cmap, n_clusters = build_clustered_soa(
        tris_np["v0"], tris_np["v1"], tris_np["v2"]
    )
    tris["soa_c"] = soa_c
    tris["cluster_bounds"] = cbounds
    tris["soa_map"] = cmap
    # skip-pointer BVH tables for the production Pallas traversal kernel
    from ..ops.pallas.bvh_traverse import build_bvh_tables

    (bvh_nodes, bvh_tris, bvh_map, bvh_n_nodes, bvh_n_leaves,
     bvh_pair, bvh_n_internal) = build_bvh_tables(
        tris_np["v0"], tris_np["v1"], tris_np["v2"]
    )
    tris["bvh_nodes"] = bvh_nodes
    tris["bvh_tris"] = bvh_tris
    tris["bvh_map"] = bvh_map
    tris["bvh_pair"] = bvh_pair  # flat SMEM pair-walk table

    # packed per-triangle shading attributes: ONE wide row gather per hit
    # instead of ~10 scalar/vec gathers (XLA TPU gathers cost ~7 ms per
    # instruction at 1M lanes regardless of row width <= 16/32)
    tpad_n = len(tris["v0"])
    attr = np.zeros((tpad_n, 32), np.float32)
    attr[:, 0:3] = tris["n0"]
    attr[:, 3:6] = tris["n1"]
    attr[:, 6:9] = tris["n2"]
    # geometric normal (unnormalized cross; normalized on device)
    attr[:, 9:12] = np.cross(tris["e1"], tris["e2"])
    attr[:, 12:14] = tris["uv0"]
    attr[:, 14:16] = tris["uv1"]
    attr[:, 16:18] = tris["uv2"]
    attr[:, 18] = tris["mat"].astype(np.float32)
    attr[:, 19] = tris["emitter"].astype(np.float32)
    tris["attr"] = attr

    # attr rows in BVH leaf-slot order for the fused closest-hit kernel
    # (resolves hit attributes in-kernel; zero XLA gathers per bounce)
    tris["bvh_attr"] = (
        attr[np.maximum(bvh_map, 0)] * (bvh_map >= 0)[:, None]
    ).astype(np.float32)

    # scene bbox over real geometry
    pts = [tris_np["v0"], tris_np["v1"], tris_np["v2"]]
    if spheres_np["center"].shape[0] > 0:
        pts.append(spheres_np["center"] - spheres_np["radius"][:, None])
        pts.append(spheres_np["center"] + spheres_np["radius"][:, None])
    allp = np.concatenate([p for p in pts if len(p)], axis=0)
    bbox_lo = allp.min(axis=0) if len(allp) else np.zeros(3)
    bbox_hi = allp.max(axis=0) if len(allp) else np.ones(3)

    tris_dev = {k: jnp.asarray(v) for k, v in tris.items()}
    spheres_dev = {k: jnp.asarray(v) for k, v in spheres_np.items()}

    return Scene(
        camera=make_camera(desc.sensor),
        tris=tris_dev,
        spheres=spheres_dev,
        materials=materials,
        textures=textures,
        emitters=emitters,
        bbox_lo=jnp.asarray(bbox_lo, jnp.float32),
        bbox_hi=jnp.asarray(bbox_hi, jnp.float32),
        num_tris=t,
        max_depth=desc.max_depth,
        rr_depth=desc.rr_depth,
        integrator=desc.integrator,
        name=desc.path.name,
        rfilter=desc.sensor.rfilter,
        used_kinds=tuple(sorted(set(int(k) for k in np.asarray(materials.kind)))),
        bvh_n_nodes=bvh_n_nodes,
        bvh_n_leaves=bvh_n_leaves,
        bvh_n_internal=bvh_n_internal,
    )


def load_scene(path, **overrides) -> Scene:
    return compile_scene(load_file(path, **overrides))
