"""Wavefront ray-scene intersection (closest-hit and any-hit).

Replaces the reference's OptiX ``scene.ray_intersect``
(path_guiding_integrator.py:185). TPU-first design: the corpus scenes are
small (<= ~16k triangles), so the hot path is a *streaming* intersector —
``lax.scan`` over fixed triangle blocks with a running closest-hit carry.
Zero gathers in the inner loop (triangle blocks are broadcast to all lanes,
staying resident in VMEM), all lanes coherent, Moller-Trumbore on the VPU.
A Pallas megakernel with cluster skipping layers on top of the same data
layout (see ops/pallas)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import dot, normalize, safe_sqrt
from ..core.records import Intersection
from .. import knobs

TRI_BLOCK = 128
# the clustered kernel's Mosaic temporaries scale with cluster count and
# blow the 16 MB scoped-VMEM limit on big scenes (measured: torus, 512
# clusters, 16.19 MB); route those to the brute kernel
MAX_CLUSTERS_FOR_CLUSTERED = 256
# the BVH kernel keeps the whole node+triangle tables VMEM-resident and an
# SMEM leaf list; beyond this table footprint fall back to the brute
# kernel instead of failing Mosaic compilation (~16 MB VMEM/core minus the
# ray tiles and double-buffering headroom)
MAX_BVH_TABLE_BYTES = 8 << 20
# the pair-walk table lives in SMEM (1 MB/core on v5e); leave headroom for
# the leaf list + stack scratch
MAX_PAIR_TABLE_BYTES = 448 << 10

# the fused closest-hit+attrs kernel holds BOTH the (L*K,16) triangle and
# (L*K,32) attribute tables in VMEM, and XLA additionally parks several
# full-wavefront outputs in VMEM around the call: at torus's 31256 tri
# slots (6.5 MB of tables) the kernel's scoped VMEM reached 30.9 of the
# default 16 MB scoped budget and the compile failed (measured round 5).
# The kernels now declare a 100 MB vmem_limit (the v5e has 128 MB VMEM),
# which covers the corpus; this gate still bounds table residency so a
# future huge scene degrades to the plain kernel + XLA epilogue instead
# of failing to compile.
MAX_ATTR_KERNEL_TABLE_BYTES = 24 << 20


def _bvh_fits(scene) -> bool:
    if scene.bvh_n_nodes <= 0:
        return False
    nodes = scene.tris["bvh_nodes"]
    tris = scene.tris["bvh_tris"]
    attrs = scene.tris.get("bvh_attr")
    total = nodes.size + tris.size + (attrs.size if attrs is not None else 0)
    return total * 4 <= MAX_BVH_TABLE_BYTES


def _pair_fits(scene) -> bool:
    return (
        scene.bvh_n_internal > 0
        and "bvh_pair" in scene.tris
        and scene.tris["bvh_pair"].size * 4 <= MAX_PAIR_TABLE_BYTES
    )


def _attr_kernel_fits(scene) -> bool:
    attrs = scene.tris.get("bvh_attr")
    if attrs is None:
        return False
    total = scene.tris["bvh_tris"].size + attrs.size
    return total * 4 <= MAX_ATTR_KERNEL_TABLE_BYTES


def _use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _kernel_choice() -> str:
    """Production intersector selection: 'bvh' (default), or 'brute' /
    'cluster' via PPG_INTERSECT for A/B benchmarking."""
    import os

    return knobs.get("PPG_INTERSECT")


def _intersect_tri_block(o, d, v0, e1, e2):
    """Moller-Trumbore: rays (N,3) x tri block (B,3) -> t, u, v, valid (N,B)."""
    # pvec = d x e2 : (N, B, 3)
    pvec = jnp.cross(d[:, None, :], e2[None, :, :])
    det = jnp.sum(pvec * e1[None, :, :], axis=-1)  # (N,B)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o[:, None, :] - v0[None, :, :]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(qvec * d[:, None, :], axis=-1) * inv_det
    t = jnp.sum(qvec * e2[None, :, :], axis=-1) * inv_det
    valid = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
    )
    return t, u, v, valid


def _scan_triangles(o, d, tris, t_near, t_far, any_hit=False):
    """Closest (or any) hit over all triangles via block scan.

    Returns (t, prim, u, v) with prim = -1 on miss. Triangle arrays are
    padded to a multiple of TRI_BLOCK by compile_scene."""
    v0b = tris["v0b"]  # (NB, B, 3)
    e1b = tris["e1b"]
    e2b = tris["e2b"]
    n = o.shape[0]

    def body(carry, blk):
        best_t, best_i, best_u, best_v, done = carry
        v0, e1, e2, base = blk
        t, u, v, ok = _intersect_tri_block(o, d, v0, e1, e2)
        ok = ok & (t > t_near[:, None]) & (t < best_t[:, None])
        if any_hit:
            hit_any = jnp.any(ok, axis=-1)
            done = done | hit_any
            return (best_t, jnp.where(hit_any & (best_i < 0), 0, best_i), best_u, best_v, done), None
        t_mask = jnp.where(ok, t, jnp.inf)
        j = jnp.argmin(t_mask, axis=-1)  # (N,)
        tj = jnp.take_along_axis(t_mask, j[:, None], axis=-1)[:, 0]
        better = tj < best_t
        best_t = jnp.where(better, tj, best_t)
        best_i = jnp.where(better, base + j, best_i)
        best_u = jnp.where(better, jnp.take_along_axis(u, j[:, None], -1)[:, 0], best_u)
        best_v = jnp.where(better, jnp.take_along_axis(v, j[:, None], -1)[:, 0], best_v)
        return (best_t, best_i, best_u, best_v, done), None

    nb = v0b.shape[0]
    bases = jnp.arange(nb, dtype=jnp.int32) * TRI_BLOCK
    init = (
        t_far,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), bool),
    )
    (best_t, best_i, best_u, best_v, done), _ = jax.lax.scan(
        body, init, (v0b, e1b, e2b, bases)
    )
    if any_hit:
        return done
    return best_t, best_i, best_u, best_v


def _intersect_spheres(o, d, spheres, t_near, t_far):
    """Closest hit over analytic spheres: returns (t, idx)."""
    c = spheres["center"]  # (S,3)
    r = spheres["radius"]
    if c.shape[0] == 0:
        n = o.shape[0]
        return jnp.full((n,), jnp.inf), jnp.full((n,), -1, jnp.int32)
    oc = o[:, None, :] - c[None, :, :]  # (N,S,3)
    b = jnp.sum(oc * d[:, None, :], axis=-1)
    # ROBUST discriminant: r^2 - |oc - (oc.d)d|^2, NOT b^2 - (|oc|^2-r^2).
    # The textbook form subtracts two ~|oc|^2-sized numbers; for the tiny
    # veach-mis emitter (r=0.05 at |oc|~33, r^2/|oc|^2 ~ 2e-6 vs f32 eps
    # ~6e-8 per op) a different XLA fusion plan flips the sign across a
    # wide halo — measured on TPU as ~800 false "direct emitter hits" per
    # 320x180 wavefront painting wall pixels with the emitter radiance
    # (the CPU fusion happened to round the other way; the component
    # probe agreed because its standalone jit fused differently). The
    # perpendicular decomposition squares the ALREADY-SUBTRACTED small
    # vector, so the error scales with r*eps*|oc| instead of eps*|oc|^2.
    perp = oc - b[..., None] * d[:, None, :]
    disc = (r * r)[None, :] - jnp.sum(perp * perp, axis=-1)
    ok = disc > 0.0
    sq = safe_sqrt(disc)
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > t_near[:, None], t0, t1)
    ok = ok & (t > t_near[:, None]) & (t < t_far[:, None])
    t = jnp.where(ok, t, jnp.inf)
    j = jnp.argmin(t, axis=-1)
    tj = jnp.take_along_axis(t, j[:, None], -1)[:, 0]
    idx = jnp.where(jnp.isfinite(tj), j.astype(jnp.int32), -1)
    return tj, idx


def intersect(scene, o, d, t_near=None, t_far=None, n_live=None) -> Intersection:
    """Closest-hit for a wavefront of rays against the whole scene.
    ``n_live``: optional live-lane watermark for compacted wavefronts."""
    n = o.shape[0]
    if t_near is None:
        t_near = jnp.full((n,), 1e-4)
    if t_far is None:
        t_far = jnp.full((n,), jnp.inf)
    if (
        _use_pallas()
        and _kernel_choice() == "bvh"
        and _bvh_fits(scene)
        and _pair_fits(scene)
        and _attr_kernel_fits(scene)
    ):
        # fused kernel: SMEM pair walk + closest hit + shading attributes
        # resolved in-kernel — no per-bounce XLA gather epilogue
        from ..ops.pallas.bvh_traverse import bvh_closest_hit_attrs

        res = bvh_closest_hit_attrs(
            scene.tris["bvh_pair"], scene.tris["bvh_tris"],
            scene.tris["bvh_attr"], o, d, t_near,
            jnp.where(jnp.isfinite(t_far), t_far, 1e30),
            scene.bvh_n_leaves, n_live=n_live,
        )
        ti = res["id"]
        tt = jnp.where(ti >= 0, res["t"], jnp.inf)
        return _finish_intersection(
            scene, o, d, tt, ti,
            normalize(res["ns"]), normalize(res["ng"]), res["uv"],
            res["mat"], res["em"], t_near, t_far,
        )
    if (
        _use_pallas()
        and _kernel_choice() == "bvh"
        and _bvh_fits(scene)
    ):
        from ..ops.pallas.bvh_traverse import bvh_closest_hit

        tt, slot, tu, tv = bvh_closest_hit(
            scene.tris["bvh_nodes"], scene.tris["bvh_tris"], o, d, t_near,
            jnp.where(jnp.isfinite(t_far), t_far, 1e30),
            scene.bvh_n_nodes, scene.bvh_n_leaves, n_live=n_live,
        )
        ti = jnp.where(
            slot >= 0, scene.tris["bvh_map"][jnp.maximum(slot, 0)], -1
        )
        tt = jnp.where(ti >= 0, tt, jnp.inf)
    elif _use_pallas() and "soa_c" in scene.tris:
        from ..ops.pallas.intersect import (
            CLUSTER_SIZE,
            pallas_closest_hit,
            pallas_closest_hit_clustered,
        )

        n_clusters = int(scene.tris["soa_c"].shape[0]) // CLUSTER_SIZE
        if n_clusters > MAX_CLUSTERS_FOR_CLUSTERED:
            # big scenes: the clustered kernel's scoped-VMEM footprint
            # (cluster fori + cond temporaries) exceeds the 16 MB limit;
            # the brute kernel stays within it
            tt, ti, tu, tv = pallas_closest_hit(
                scene.tris["soa"], o, d, t_near,
                jnp.where(jnp.isfinite(t_far), t_far, 1e30),
                int(scene.tris["soa"].shape[0]), n_live=n_live,
            )
            tt = jnp.where(ti >= 0, tt, jnp.inf)
        else:
            tt, slot, tu, tv = pallas_closest_hit_clustered(
                scene.tris["soa_c"], scene.tris["cluster_bounds"], o, d,
                t_near, jnp.where(jnp.isfinite(t_far), t_far, 1e30),
                n_clusters, n_live=n_live,
            )
            ti = jnp.where(
                slot >= 0, scene.tris["soa_map"][jnp.maximum(slot, 0)], -1
            )
            tt = jnp.where(ti >= 0, tt, jnp.inf)
    else:
        tt, ti, tu, tv = _scan_triangles(o, d, scene.tris, t_near, t_far)

    # triangle attributes: ONE packed row gather (scene.py "attr" layout)
    tid = jnp.maximum(ti, 0)
    w = 1.0 - tu - tv
    row = scene.tris["attr"][tid]  # (N, 32)
    n0 = row[:, 0:3]
    n1 = row[:, 3:6]
    n2 = row[:, 6:9]
    ns_tri = normalize(
        n0 * w[:, None] + n1 * tu[:, None] + n2 * tv[:, None]
    )
    uv_tri = (
        row[:, 12:14] * w[:, None]
        + row[:, 14:16] * tu[:, None]
        + row[:, 16:18] * tv[:, None]
    )
    ng_tri = normalize(row[:, 9:12])
    mat_tri = row[:, 18].astype(jnp.int32)
    em_tri = row[:, 19].astype(jnp.int32)
    return _finish_intersection(
        scene, o, d, tt, ti, ns_tri, ng_tri, uv_tri, mat_tri, em_tri,
        t_near, t_far,
    )


def _finish_intersection(scene, o, d, tt, ti, ns_tri, ng_tri, uv_tri,
                         mat_tri, em_tri, t_near, t_far) -> Intersection:
    """Merge triangle hit + attributes with analytic spheres, face-forward
    the normals, and assemble the Intersection record. Scenes without
    spheres (the common case) statically skip all sphere work."""
    n = o.shape[0]
    has_spheres = scene.spheres["center"].shape[0] > 0
    if has_spheres:
        st, si = _intersect_spheres(o, d, scene.spheres, t_near, t_far)
        sphere_closer = st < tt
        t = jnp.where(sphere_closer, st, tt)
        valid = jnp.isfinite(t) & ((ti >= 0) | (si >= 0))
    else:
        t = tt
        valid = jnp.isfinite(t) & (ti >= 0)
    t = jnp.where(valid, t, jnp.inf)
    p_hit = o + d * jnp.where(jnp.isfinite(t), t, 0.0)[:, None]
    tid = jnp.maximum(ti, 0)

    if has_spheres:
        sid = jnp.maximum(si, 0)
        c = scene.spheres["center"][sid]
        n_sph = normalize(p_hit - c)
        mat_sph = scene.spheres["mat"][sid]
        em_sph = scene.spheres["emitter"][sid]
        use_sph = sphere_closer & (si >= 0)
        ng = jnp.where(use_sph[:, None], n_sph, ng_tri)
        ns = jnp.where(use_sph[:, None], n_sph, ns_tri)
        # sphere uv: spherical coords
        uv_sph = jnp.stack(
            [
                jnp.arctan2(n_sph[:, 1], n_sph[:, 0]) / (2 * jnp.pi) + 0.5,
                jnp.arccos(jnp.clip(n_sph[:, 2], -1, 1)) / jnp.pi,
            ],
            axis=-1,
        )
        uv = jnp.where(use_sph[:, None], uv_sph, uv_tri)
        mat = jnp.where(use_sph, mat_sph, mat_tri)
        em = jnp.where(use_sph, em_sph, em_tri)
        prim = jnp.where(use_sph, scene.tris["v0"].shape[0] + sid, tid)
    else:
        ng, ns, uv, mat, em, prim = ng_tri, ns_tri, uv_tri, mat_tri, em_tri, tid

    wi = -d
    # face-forward both normals toward the incident side
    flip = dot(ng, wi) < 0.0
    ng = jnp.where(flip[:, None], -ng, ng)
    ns = jnp.where(dot(ns, wi)[:, None] < 0.0, -ns, ns)

    return Intersection(
        entering=~flip,
        valid=valid,
        t=t,
        p=p_hit,
        n=ng,
        ns=ns,
        uv=uv,
        prim=prim.astype(jnp.int32),
        material=jnp.where(valid, mat, 0).astype(jnp.int32),
        emitter=jnp.where(valid, em, -1).astype(jnp.int32),
        wi_world=wi,
    )


def occluded(scene, o, d, t_max, n_live=None) -> jnp.ndarray:
    """Any-hit shadow query along (o, d) up to t_max (with end epsilons)."""
    n = o.shape[0]
    t_near = jnp.full((n,), 1e-4)
    t_far = t_max * (1.0 - 1e-3)
    if (
        _use_pallas()
        and _kernel_choice() == "bvh"
        and _bvh_fits(scene)
    ):
        if _pair_fits(scene):
            from ..ops.pallas.bvh_traverse import bvh_any_hit_pair

            hit_tri = bvh_any_hit_pair(
                scene.tris["bvh_pair"], scene.tris["bvh_tris"], o, d,
                t_near, jnp.where(jnp.isfinite(t_far), t_far, 1e30),
                scene.bvh_n_leaves, n_live=n_live,
            )
        else:
            from ..ops.pallas.bvh_traverse import bvh_any_hit

            hit_tri = bvh_any_hit(
                scene.tris["bvh_nodes"], scene.tris["bvh_tris"], o, d,
                t_near, jnp.where(jnp.isfinite(t_far), t_far, 1e30),
                scene.bvh_n_nodes, scene.bvh_n_leaves, n_live=n_live,
            )
        if scene.spheres["center"].shape[0] == 0:
            return hit_tri
        _, si = _intersect_spheres(o, d, scene.spheres, t_near, t_far)
        return hit_tri | (si >= 0)
    if _use_pallas() and "soa_c" in scene.tris:
        from ..ops.pallas.intersect import (
            CLUSTER_SIZE,
            pallas_any_hit,
            pallas_any_hit_clustered,
        )

        n_clusters = int(scene.tris["soa_c"].shape[0]) // CLUSTER_SIZE
        if n_clusters > MAX_CLUSTERS_FOR_CLUSTERED:
            hit_tri = pallas_any_hit(
                scene.tris["soa"], o, d, t_near,
                jnp.where(jnp.isfinite(t_far), t_far, 1e30),
                int(scene.tris["soa"].shape[0]), n_live=n_live,
            )
            st, si = _intersect_spheres(o, d, scene.spheres, t_near, t_far)
            return hit_tri | (si >= 0)
        hit_tri = pallas_any_hit_clustered(
            scene.tris["soa_c"], scene.tris["cluster_bounds"], o, d, t_near,
            jnp.where(jnp.isfinite(t_far), t_far, 1e30),
            n_clusters,
            n_live=n_live,
        )
    else:
        hit_tri = _scan_triangles(o, d, scene.tris, t_near, t_far, any_hit=True)
    _, si = _intersect_spheres(o, d, scene.spheres, t_near, t_far)
    return hit_tri | (si >= 0)
