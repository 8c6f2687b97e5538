"""Emitter table: area (mesh / analytic sphere), directional, envmap,
constant — with NEE sampling and direction pdfs for MIS.

Semantics follow Mitsuba 3 (the reference's substrate for
scene.sample_emitter_direction / pdf_emitter_direction,
path_guiding_integrator.py:191,213): an emitter is chosen uniformly
(weight 1/E); meshes sample area-uniform (pdf converted to solid angle),
spheres sample the visible cone, the envmap samples its luminance CDF,
directional lights are delta (never MIS'd against BSDF samples).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..core.math import (
    INV_PI, PI, TWO_PI, dot, normalize, safe_sqrt, small_table_gather,
)

KIND_AREA_MESH = 0
KIND_AREA_SPHERE = 1
KIND_DIRECTIONAL = 2
KIND_ENVMAP = 3
KIND_CONSTANT = 4


@struct.dataclass
class EmitterTable:
    kinds: jnp.ndarray      # (E,) int32
    radiance: jnp.ndarray   # (E,3) radiance (area/constant) or irradiance (directional)
    # area-mesh: per-emitter padded triangle list + area CDF
    tri_ids: jnp.ndarray    # (E, K) int32 global tri index (repeat-padded)
    tri_cdf: jnp.ndarray    # (E, K) float32 normalized inclusive CDF
    area: jnp.ndarray       # (E,) total surface area
    # sphere
    center: jnp.ndarray     # (E,3)
    radius: jnp.ndarray     # (E,)
    # directional: direction light TRAVELS (world)
    direction: jnp.ndarray  # (E,3)
    # envmap
    env_to_local: jnp.ndarray  # (3,3) world->emitter rotation
    env_image: jnp.ndarray     # (H,W,3)
    env_row_cdf: jnp.ndarray   # (H,)
    env_col_cdf: jnp.ndarray   # (H,W)
    env_pdf_norm: jnp.ndarray  # scalar: sum of weights
    env_scale: jnp.ndarray     # scalar
    # packed per-emitter scalars for one-row-gather access on device:
    # [kind, area, radius, center(3), direction(3), radiance(3), pad...] (E,16)
    packed: jnp.ndarray = None
    # emissive-tri geometry rows [v0 | e1 | e2 | pad], flat (E*K, 16):
    # NEE position sampling reads the sampled triangle from THIS table by
    # local id ei*K+k so the row rides the one-hot MXU gather (the global
    # tris["soa"] table is too tall for it; XLA's native gather costs
    # ~7 ms per instruction at 1M lanes)
    tri_soa: jnp.ndarray = None  # (E*K, 16) float32
    env_index: int = struct.field(pytree_node=False, default=-1)
    num: int = struct.field(pytree_node=False, default=0)

    @property
    def has_envmap(self):
        return self.env_index >= 0


def build_emitters(desc, tris) -> EmitterTable:
    """Collect area emitters (from shapes, in _emitter_id order) plus global
    emitters (directional/envmap/constant)."""
    entries = []  # list of dicts
    for sh in desc.shapes:
        if sh.emitter_radiance is None:
            continue
        entries.append({"shape": sh})
    n_area = len(entries)
    for e in desc.emitters:
        entries.append({"global": e})

    E = max(len(entries), 1)
    kinds = np.zeros(E, np.int32)
    radiance = np.zeros((E, 3), np.float32)
    area = np.ones(E, np.float32)
    center = np.zeros((E, 3), np.float32)
    radius = np.ones(E, np.float32)
    direction = np.tile(np.array([0, 0, 1], np.float32), (E, 1))

    # per-emitter triangle lists
    tri_lists = [[] for _ in range(E)]
    v0, v1, v2 = tris["v0"], tris["v1"], tris["v2"]
    tri_area = 0.5 * np.linalg.norm(
        np.cross(v1 - v0, v2 - v0), axis=-1
    )
    for t, e in enumerate(tris["emitter"]):
        if e >= 0:
            tri_lists[e].append(t)

    env_img = np.zeros((1, 1, 3), np.float32)
    env_rot = np.eye(3, dtype=np.float32)
    env_scale = 1.0
    env_index = -1

    for ei, ent in enumerate(entries):
        if "shape" in ent:
            sh = ent["shape"]
            radiance[ei] = sh.emitter_radiance
            if sh.kind == "sphere":
                kinds[ei] = KIND_AREA_SPHERE
                m = sh.to_world
                c = np.asarray(sh.center) @ m[:3, :3].T + m[:3, 3]
                center[ei] = c
                s = np.cbrt(abs(np.linalg.det(m[:3, :3])))
                radius[ei] = sh.radius * s
                area[ei] = 4.0 * np.pi * radius[ei] ** 2
            else:
                kinds[ei] = KIND_AREA_MESH
                ids = tri_lists[ei]
                area[ei] = float(tri_area[ids].sum()) if ids else 1.0
        else:
            g = ent["global"]
            if g.kind == "directional":
                kinds[ei] = KIND_DIRECTIONAL
                radiance[ei] = g.radiance
                direction[ei] = (g.to_world[:3, :3] @ np.array([0, 0, 1.0]))
                direction[ei] /= np.linalg.norm(direction[ei])
            elif g.kind == "envmap":
                from ..io.image import read_texture

                kinds[ei] = KIND_ENVMAP
                env_img = read_texture(desc.path / g.filename) * g.scale
                env_rot = np.linalg.inv(g.to_world[:3, :3]).astype(np.float32)
                env_scale = g.scale
                env_index = ei
            elif g.kind == "constant":
                kinds[ei] = KIND_CONSTANT
                radiance[ei] = g.radiance
                env_index = -1 if env_index < 0 else env_index

    K = max(max((len(l) for l in tri_lists), default=1), 1)
    tri_ids = np.zeros((E, K), np.int32)
    tri_cdf = np.ones((E, K), np.float32)
    for ei, ids in enumerate(tri_lists):
        if not ids:
            continue
        a = tri_area[ids]
        cdf = np.cumsum(a) / max(a.sum(), 1e-20)
        tri_ids[ei, : len(ids)] = ids
        tri_cdf[ei, : len(ids)] = cdf
        tri_ids[ei, len(ids) :] = ids[-1]
        tri_cdf[ei, len(ids) :] = 1.0

    tri_soa = np.zeros((E * K, 16), np.float32)
    flat_ids = tri_ids.reshape(-1)
    tri_soa[:, 0:3] = v0[flat_ids]
    tri_soa[:, 3:6] = v1[flat_ids] - v0[flat_ids]
    tri_soa[:, 6:9] = v2[flat_ids] - v0[flat_ids]

    # envmap sampling CDFs: weight = luminance * sin(theta)
    h, w = env_img.shape[:2]
    lum = env_img @ np.array([0.212671, 0.715160, 0.072169], np.float32)
    sin_t = np.sin((np.arange(h) + 0.5) / h * np.pi).astype(np.float32)
    wgt = lum * sin_t[:, None] + 1e-12
    row_w = wgt.sum(axis=1)
    row_cdf = np.cumsum(row_w) / row_w.sum()
    col_cdf = np.cumsum(wgt, axis=1) / wgt.sum(axis=1, keepdims=True)

    packed = np.zeros((E, 16), np.float32)
    packed[:, 0] = kinds.astype(np.float32)
    packed[:, 1] = area
    packed[:, 2] = radius
    packed[:, 3:6] = center
    packed[:, 6:9] = direction
    packed[:, 9:12] = radiance

    return EmitterTable(
        kinds=jnp.asarray(kinds),
        radiance=jnp.asarray(radiance),
        packed=jnp.asarray(packed),
        tri_ids=jnp.asarray(tri_ids),
        tri_cdf=jnp.asarray(tri_cdf),
        tri_soa=jnp.asarray(tri_soa),
        area=jnp.asarray(area),
        center=jnp.asarray(center),
        radius=jnp.asarray(radius),
        direction=jnp.asarray(direction),
        env_to_local=jnp.asarray(env_rot),
        env_image=jnp.asarray(env_img),
        env_row_cdf=jnp.asarray(row_cdf.astype(np.float32)),
        env_col_cdf=jnp.asarray(col_cdf.astype(np.float32)),
        env_pdf_norm=jnp.float32(wgt.sum()),
        env_scale=jnp.float32(env_scale),
        env_index=env_index,
        num=len(entries),
    )


def env_eval(em: EmitterTable, d):
    """Envmap radiance for world directions ``d`` (..., 3)."""
    v = jnp.einsum("ij,...j->...i", em.env_to_local, d)
    u = jnp.arctan2(v[..., 0], -v[..., 2]) / TWO_PI
    u = u - jnp.floor(u)
    theta = jnp.arccos(jnp.clip(v[..., 1], -1.0, 1.0))
    vv = theta / PI
    h, w = em.env_image.shape[0], em.env_image.shape[1]
    xi = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((vv * h).astype(jnp.int32), 0, h - 1)
    return em.env_image[yi, xi]


def env_pdf(em: EmitterTable, d):
    """Solid-angle pdf of env sampling for world directions d."""
    v = jnp.einsum("ij,...j->...i", em.env_to_local, d)
    u = jnp.arctan2(v[..., 0], -v[..., 2]) / TWO_PI
    u = u - jnp.floor(u)
    theta = jnp.arccos(jnp.clip(v[..., 1], -1.0, 1.0))
    vv = theta / PI
    h, w = em.env_image.shape[0], em.env_image.shape[1]
    xi = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((vv * h).astype(jnp.int32), 0, h - 1)
    lum = dot(em.env_image[yi, xi], jnp.array([0.212671, 0.715160, 0.072169]))
    sin_t = jnp.sin((yi.astype(jnp.float32) + 0.5) / h * PI)
    wgt = lum * sin_t + 1e-12
    pdf_pix = wgt / em.env_pdf_norm  # probability of this pixel
    # pixel solid angle = (2pi/w)(pi/h) sin(theta)
    return pdf_pix * (w * h) / (2.0 * PI * PI * jnp.maximum(sin_t, 1e-8))


def env_sample(em: EmitterTable, u1, u2):
    """Sample env direction; returns (d_world, pdf_sa, radiance)."""
    h, w = em.env_image.shape[0], em.env_image.shape[1]
    yi = jnp.searchsorted(em.env_row_cdf, u1)
    yi = jnp.clip(yi, 0, h - 1)
    xi = jax_searchsorted_rows(em.env_col_cdf, yi, u2)
    xi = jnp.clip(xi, 0, w - 1)
    theta = (yi.astype(jnp.float32) + 0.5) / h * PI
    # exact inverse of env_eval's uv mapping: u = atan2(v.x, -v.z) / 2pi
    phi = (xi.astype(jnp.float32) + 0.5) / w * TWO_PI
    sin_t = jnp.sin(theta)
    v = jnp.stack(
        [sin_t * jnp.sin(phi), jnp.cos(theta), -sin_t * jnp.cos(phi)], axis=-1
    )
    d = jnp.einsum("ji,...j->...i", em.env_to_local, v)  # local->world (R^T)
    rad = em.env_image[yi, xi]
    lum = dot(rad, jnp.array([0.212671, 0.715160, 0.072169]))
    wgt = lum * sin_t + 1e-12
    pdf = wgt / em.env_pdf_norm * (w * h) / (2.0 * PI * PI * jnp.maximum(sin_t, 1e-8))
    return d, pdf, rad


def jax_searchsorted_rows(cdf2d, rows, u):
    """searchsorted along axis 1 of cdf2d at per-lane row indices."""
    row_cdf = cdf2d[rows]  # (..., W) gather
    return jnp.sum(row_cdf < u[..., None], axis=-1).astype(jnp.int32)


def sample_nee(em: EmitterTable, tris, p, u_sel, u1, u2):
    """Sample one emitter direction from points ``p`` (..., 3).

    Returns dict with wo, dist, radiance Li, pdf (solid angle, includes the
    1/E emitter-selection factor), is_delta, valid.
    """
    E = em.num
    n = p.shape[:-1]
    ei = jnp.clip((u_sel * E).astype(jnp.int32), 0, E - 1)
    # packed per-emitter scalars: one-hot MXU matmul (the emitter table is
    # tiny; a native gather costs ~7 ms per instruction at 1M lanes)
    row = small_table_gather(em.packed, ei)  # (..., 16)
    kind = row[..., 0].astype(jnp.int32)

    # --- area mesh: pick triangle by CDF, uniform barycentric ---
    tcdf = small_table_gather(em.tri_cdf, ei)  # (..., K) row
    K = tcdf.shape[-1]
    ti_local = jnp.sum(tcdf < u1[..., None], axis=-1)
    ti_local = jnp.clip(ti_local, 0, K - 1)
    # one-hot selects instead of minor-axis take_along_axis (slow on TPU)
    kio = jax.lax.broadcasted_iota(jnp.int32, tcdf.shape, len(tcdf.shape) - 1)
    sel = kio == ti_local[..., None]
    tid = jnp.sum(
        jnp.where(sel, small_table_gather(em.tri_ids, ei), 0), axis=-1
    )
    hi = jnp.sum(jnp.where(sel, tcdf, 0.0), axis=-1)
    lo = jnp.sum(
        jnp.where(kio == (ti_local - 1)[..., None], tcdf, 0.0), axis=-1
    )
    # re-draw u1 within the chosen triangle segment for stratification
    u1r = jnp.clip((u1 - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
    su = safe_sqrt(u1r)
    b1 = 1.0 - su
    b2 = u2 * su
    # packed tri row [v0 | e1 | e2]: from the emitter-local table via the
    # one-hot MXU gather when it fits, else the global soa gather
    if em.tri_soa is not None and em.tri_soa.shape[0] <= 128:
        trow = small_table_gather(em.tri_soa, ei * K + ti_local)
    else:
        trow = tris["soa"][tid]  # (..., 16)
    v0 = trow[..., 0:3]
    v1 = v0 + trow[..., 3:6]
    v2 = v0 + trow[..., 6:9]
    pos_mesh = v0 * (1 - b1 - b2)[..., None] + v1 * b1[..., None] + v2 * b2[..., None]
    ng = jnp.cross(v1 - v0, v2 - v0)
    ng = normalize(ng)
    to_light = pos_mesh - p
    dist_mesh = jnp.linalg.norm(to_light, axis=-1)
    wo_mesh = to_light / jnp.maximum(dist_mesh, 1e-12)[..., None]
    cos_l = dot(ng, -wo_mesh)
    # one-sided emission (toward normal side): Li = radiance if cos_l > 0
    pdf_mesh = (dist_mesh * dist_mesh) / jnp.maximum(
        row[..., 1] * jnp.abs(cos_l), 1e-12
    )
    ok_mesh = cos_l > 1e-6

    # --- sphere: uniform cone toward sphere ---
    c = row[..., 3:6]
    r = row[..., 2]
    dc = c - p
    dist_c = jnp.linalg.norm(dc, axis=-1)
    dir_c = dc / jnp.maximum(dist_c, 1e-12)[..., None]
    sin_max2 = jnp.clip((r / jnp.maximum(dist_c, 1e-12)) ** 2, 0.0, 1.0)
    cos_max = safe_sqrt(1.0 - sin_max2)
    cos_t = 1.0 - u1 * (1.0 - cos_max)
    phi = TWO_PI * u2
    sin_t = safe_sqrt(1.0 - cos_t * cos_t)
    # frame around dir_c
    from ..core.math import to_world as frame_to_world

    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    wo_sph = frame_to_world(local, dir_c)
    # distance to sphere along wo
    oc = p - c
    b = dot(wo_sph, oc)
    det = b * b - (dot(oc, oc) - r * r)
    det = jnp.maximum(det, 0.0)
    dist_sph = -b - safe_sqrt(det)
    pdf_sph = 1.0 / jnp.maximum(TWO_PI * (1.0 - cos_max), 1e-12)
    ok_sph = dist_c > r  # outside the sphere

    # --- directional ---
    wo_dir = -row[..., 6:9]
    ok_dir = jnp.ones(n, bool)

    # --- envmap ---
    if em.has_envmap:
        wo_env, pdf_env, rad_env = env_sample(em, u1, u2)
    else:
        wo_env = wo_dir
        pdf_env = jnp.ones(n, jnp.float32)
        rad_env = jnp.zeros(n + (3,), jnp.float32)

    is_mesh = kind == KIND_AREA_MESH
    is_sph = kind == KIND_AREA_SPHERE
    is_dir = kind == KIND_DIRECTIONAL
    is_env = kind == KIND_ENVMAP
    is_const = kind == KIND_CONSTANT

    wo = jnp.where(
        is_mesh[..., None],
        wo_mesh,
        jnp.where(
            is_sph[..., None],
            wo_sph,
            jnp.where(is_dir[..., None], jnp.broadcast_to(wo_dir, wo_mesh.shape), wo_env),
        ),
    )
    big = jnp.float32(1e8)
    dist = jnp.where(
        is_mesh, dist_mesh, jnp.where(is_sph, dist_sph, big)
    )
    pdf = jnp.where(
        is_mesh,
        pdf_mesh,
        jnp.where(is_sph, pdf_sph, jnp.where(is_env, pdf_env, 1.0)),
    )
    # constant env: uniform sphere sampling would be used; corpus doesn't
    # use constant emitters for NEE-critical scenes — sample like envmap dir.
    Li = jnp.where(
        is_env[..., None],
        rad_env,
        row[..., 9:12],
    )
    valid = jnp.where(
        is_mesh, ok_mesh, jnp.where(is_sph, ok_sph, jnp.ones(n, bool))
    )
    valid = valid & (pdf > 0)
    pdf = pdf / E  # uniform emitter selection
    is_delta = is_dir
    return {
        "wo": wo,
        "dist": dist,
        "Li": Li,
        "pdf": pdf,
        "is_delta": is_delta,
        "valid": valid,
        "emitter": ei,
    }


def pdf_hit_dir(em: EmitterTable, p, wo, hit_emitter, hit_t, hit_n):
    """Solid-angle pdf that NEE would have sampled direction ``wo`` from
    ``p`` given the BSDF ray hit emitter ``hit_emitter`` at distance
    ``hit_t`` with normal ``hit_n`` (for MIS weighting of emission hits)."""
    E = em.num
    ei = jnp.maximum(hit_emitter, 0)
    row = small_table_gather(em.packed, ei)  # per-emitter scalars, one-hot
    kind = row[..., 0].astype(jnp.int32)
    cos_l = jnp.abs(dot(hit_n, -wo))
    pdf_mesh = (hit_t * hit_t) / jnp.maximum(row[..., 1] * cos_l, 1e-12)
    c = row[..., 3:6]
    r = row[..., 2]
    dist_c = jnp.linalg.norm(c - p, axis=-1)
    sin_max2 = jnp.clip((r / jnp.maximum(dist_c, 1e-12)) ** 2, 0.0, 1.0)
    cos_max = safe_sqrt(1.0 - sin_max2)
    pdf_sph = 1.0 / jnp.maximum(TWO_PI * (1.0 - cos_max), 1e-12)
    pdf = jnp.where(
        kind == KIND_AREA_MESH,
        pdf_mesh,
        jnp.where(kind == KIND_AREA_SPHERE, pdf_sph, 0.0),
    )
    return jnp.where(hit_emitter >= 0, pdf / E, 0.0)


def pdf_env_dir(em: EmitterTable, wo):
    """NEE pdf for an escaped ray that 'hit' the envmap."""
    if not em.has_envmap:
        return jnp.zeros(wo.shape[:-1], jnp.float32)
    return env_pdf(em, wo) / em.num
