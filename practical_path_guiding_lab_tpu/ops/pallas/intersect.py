"""Pallas TPU ray-triangle intersection kernels.

TPU-native replacement for the hot path of ``accel.traverse``: the whole
triangle soup stays resident in VMEM (corpus scenes are <= ~24k triangles
= < 1 MB), the kernel loops over triangles with per-triangle scalar
broadcasts while 1024 rays (one 8x128 VPU tile) are tested per instruction.
No HBM traffic inside the loop — the jnp scan version streams (N, B)
intermediates through HBM, which measures ~0.14 Mrays/s on veach-ajar;
this kernel exists to close that gap.

Layout: rays as six (R, 128) component planes (R rows of 128 lanes);
triangles as a (Tpad, 16) array [v0|e1|e2|pad] so a row read broadcasts.
Optionally a cluster table (built by accel.cluster) lets whole 128-triangle
blocks be skipped when the ray tile's bounding box misses the cluster AABB.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os
from ... import knobs

LANE_BLOCK = 1024     # lanes per ray row
# sublane rows per grid step (8 -> 8192 rays/step). Larger tiles amortize
# the scalar-latency-bound BVH walk over more rays (fewer grid steps, and
# the union of visited nodes grows sublinearly with tile size); tunable
# for benchmarking via PPG_RAY_ROWS.
RAY_ROWS = knobs.get_int("PPG_RAY_ROWS")


TRI_SUB = 8  # triangles per VMEM block read (unrolled inner loop)


def _mt_one(v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
            o_x, o_y, o_z, d_x, d_y, d_z):
    """Moller-Trumbore: one triangle (scalars) vs a ray tile -> t,u,v,ok."""
    px = d_y * e2z - d_z * e2y
    py = d_z * e2x - d_x * e2z
    pz = d_x * e2y - d_y * e2x
    det = px * e1x + py * e1y + pz * e1z
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = o_x - v0x
    ty = o_y - v0y
    tz = o_z - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (d_x * qx + d_y * qy + d_z * qz) * inv_det
    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (
        (jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    )
    return tt, u, v, ok


def _closest_hit_kernel(n_live_ref, tri_ref, ox, oy, oz, dx, dy, dz, tn, tf,
                        t_out, i_out, u_out, v_out, *, n_tris):
    # whole grid steps beyond the live-lane watermark are skipped — the
    # integrator compacts live rays to the front of the wavefront
    step_base = pl.program_id(0) * RAY_ROWS * LANE_BLOCK
    t_out[:] = tf[:]
    i_out[:] = jnp.full(ox.shape, -1, jnp.int32)
    u_out[:] = jnp.zeros(ox.shape, jnp.float32)
    v_out[:] = jnp.zeros(ox.shape, jnp.float32)

    @pl.when(step_base < n_live_ref[0])
    def _run():
        _closest_hit_body(tri_ref, ox, oy, oz, dx, dy, dz, tn, tf,
                          t_out, i_out, u_out, v_out, n_tris=n_tris)


def _closest_hit_body(tri_ref, ox, oy, oz, dx, dy, dz, tn, tf,
                      t_out, i_out, u_out, v_out, *, n_tris):
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    t_near = tn[:]
    best_t = tf[:]
    shape = o_x.shape
    best_i = jnp.full(shape, -1, jnp.int32)
    best_u = jnp.zeros(shape, jnp.float32)
    best_v = jnp.zeros(shape, jnp.float32)
    n_blocks = -(-n_tris // TRI_SUB)

    def body(b, carry):
        best_t, best_i, best_u, best_v = carry
        blk = tri_ref[pl.ds(b * TRI_SUB, TRI_SUB), :]  # (8,16) registers
        for j in range(TRI_SUB):  # unrolled; static extracts
            tt, u, v, ok = _mt_one(
                blk[j, 0], blk[j, 1], blk[j, 2],
                blk[j, 3], blk[j, 4], blk[j, 5],
                blk[j, 6], blk[j, 7], blk[j, 8],
                o_x, o_y, o_z, d_x, d_y, d_z,
            )
            ok = ok & (tt > t_near) & (tt < best_t)
            best_t = jnp.where(ok, tt, best_t)
            best_i = jnp.where(ok, b * TRI_SUB + j, best_i)
            best_u = jnp.where(ok, u, best_u)
            best_v = jnp.where(ok, v, best_v)
        return best_t, best_i, best_u, best_v

    best_t, best_i, best_u, best_v = jax.lax.fori_loop(
        0, n_blocks, body, (best_t, best_i, best_u, best_v)
    )
    t_out[:] = best_t
    i_out[:] = best_i
    u_out[:] = best_u
    v_out[:] = best_v


def _any_hit_kernel(n_live_ref, tri_ref, ox, oy, oz, dx, dy, dz, tn, tf,
                    hit_out, *, n_tris):
    step_base = pl.program_id(0) * RAY_ROWS * LANE_BLOCK
    hit_out[:] = jnp.zeros(ox.shape, jnp.bool_)

    @pl.when(step_base < n_live_ref[0])
    def _run():
        _any_hit_body(tri_ref, ox, oy, oz, dx, dy, dz, tn, tf, hit_out,
                      n_tris=n_tris)


def _any_hit_body(tri_ref, ox, oy, oz, dx, dy, dz, tn, tf, hit_out,
                  *, n_tris):
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    t_near = tn[:]
    t_far = tf[:]
    # carry as float32 — Mosaic mis-lowers i1 vector loop carries
    hit = jnp.zeros(o_x.shape, jnp.float32)
    n_blocks = -(-n_tris // TRI_SUB)

    def body(b, hit):
        blk = tri_ref[pl.ds(b * TRI_SUB, TRI_SUB), :]
        for j in range(TRI_SUB):
            tt, u, v, ok = _mt_one(
                blk[j, 0], blk[j, 1], blk[j, 2],
                blk[j, 3], blk[j, 4], blk[j, 5],
                blk[j, 6], blk[j, 7], blk[j, 8],
                o_x, o_y, o_z, d_x, d_y, d_z,
            )
            ok = ok & (tt > t_near) & (tt < t_far)
            hit = jnp.maximum(hit, ok.astype(jnp.float32))
        return hit

    hit = jax.lax.fori_loop(0, n_blocks, body, hit)
    hit_out[:] = hit > 0.0


def _plan(n):
    rows = -(-n // LANE_BLOCK)
    rows_pad = -(-rows // RAY_ROWS) * RAY_ROWS
    n_pad = rows_pad * LANE_BLOCK
    return rows_pad, n_pad


def _to_planes(a, n_pad, fill):
    a = jnp.concatenate([a, jnp.full((n_pad - a.shape[0],), fill, a.dtype)])
    return a.reshape(-1, LANE_BLOCK)


def _common_planes(o, d, t_near, t_far, n_pad):
    return [
        _to_planes(o[:, 0], n_pad, 0.0),
        _to_planes(o[:, 1], n_pad, 0.0),
        _to_planes(o[:, 2], n_pad, 0.0),
        _to_planes(d[:, 0], n_pad, 0.0),
        _to_planes(d[:, 1], n_pad, 0.0),
        _to_planes(d[:, 2], n_pad, 1.0),
        _to_planes(t_near, n_pad, 0.0),
        _to_planes(t_far, n_pad, -1.0),
    ]


@partial(jax.jit, static_argnames=("n_tris", "interpret"))
def pallas_closest_hit(tri_soa, o, d, t_near, t_far, n_tris: int, n_live=None,
                      interpret: bool = False):
    """tri_soa: (Tpad, 16) [v0 e1 e2 pad]; o, d: (N, 3). Returns
    (t, prim, u, v) with prim = -1 on miss. ``n_live`` (traced scalar):
    lanes >= n_live are skipped wholesale (compacted wavefronts)."""
    n = o.shape[0]
    rows_pad, n_pad = _plan(n)
    if n_live is None:
        n_live = jnp.int32(n)
    planes = _common_planes(o, d, t_near, t_far, n_pad)
    ray_spec = pl.BlockSpec(
        (RAY_ROWS, LANE_BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(_closest_hit_kernel, n_tris=n_tris),
        grid=(rows_pad // RAY_ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(n_live, jnp.int32).reshape(1), tri_soa, *planes)
    t, i, u, v = (x.reshape(-1)[:n] for x in out)
    return t, i, u, v


@partial(jax.jit, static_argnames=("n_tris", "interpret"))
def pallas_any_hit(tri_soa, o, d, t_near, t_far, n_tris: int, n_live=None,
                   interpret: bool = False):
    n = o.shape[0]
    rows_pad, n_pad = _plan(n)
    if n_live is None:
        n_live = jnp.int32(n)
    planes = _common_planes(o, d, t_near, t_far, n_pad)
    ray_spec = pl.BlockSpec(
        (RAY_ROWS, LANE_BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(_any_hit_kernel, n_tris=n_tris),
        grid=(rows_pad // RAY_ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [ray_spec] * 8,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK), jnp.bool_),
        interpret=interpret,
    )(jnp.asarray(n_live, jnp.int32).reshape(1), tri_soa, *planes)
    return out.reshape(-1)[:n]


def build_tri_soa(v0, v1, v2) -> np.ndarray:
    """Host: (T,3)x3 -> (Tpad, 16) float32 [v0 e1 e2 zero-pad]."""
    t = len(v0)
    tpad = max(-(-t // 8) * 8, 8)
    soa = np.zeros((tpad, 16), np.float32)
    soa[:t, 0:3] = v0
    soa[:t, 3:6] = v1 - v0
    soa[:t, 6:9] = v2 - v0
    return soa


# ===========================================================================
# Clustered kernels: tile-level AABB culling (accel/cluster.py layout)
# ===========================================================================

CLUSTER_SIZE = 64


def _slab_test(row, o_x, o_y, o_z, ix, iy, iz, t_near, best_t):
    """Ray-tile vs cluster-AABB slab test -> per-lane may-hit mask."""
    t0 = (row[0] - o_x) * ix
    t1 = (row[4] - o_x) * ix
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    t0 = (row[1] - o_y) * iy
    t1 = (row[5] - o_y) * iy
    tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
    tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
    t0 = (row[2] - o_z) * iz
    t1 = (row[6] - o_z) * iz
    tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
    tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
    return (tmax >= tmin) & (tmax > t_near) & (tmin < best_t)


def _safe_inv(d):
    return 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)


def _closest_hit_clustered_kernel(
    n_live_ref, cb_ref, tri_ref, ox, oy, oz, dx, dy, dz, tn, tf,
    t_out, i_out, u_out, v_out, *, n_clusters,
):
    step_base = pl.program_id(0) * RAY_ROWS * LANE_BLOCK
    t_out[:] = tf[:]
    i_out[:] = jnp.full(ox.shape, -1, jnp.int32)
    u_out[:] = jnp.zeros(ox.shape, jnp.float32)
    v_out[:] = jnp.zeros(ox.shape, jnp.float32)

    @pl.when(step_base < n_live_ref[0])
    def _run():
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        d_x, d_y, d_z = dx[:], dy[:], dz[:]
        ix, iy, iz = _safe_inv(d_x), _safe_inv(d_y), _safe_inv(d_z)
        t_near = tn[:]
        n_blk = CLUSTER_SIZE // TRI_SUB

        def cluster_body(c, carry):
            best_t = carry[0]
            row = cb_ref[c]
            may_hit = _slab_test(row, o_x, o_y, o_z, ix, iy, iz, t_near, best_t)

            def process(carry):
                def inner(jj, carry):
                    best_t, best_i, best_u, best_v = carry
                    base = c * CLUSTER_SIZE + jj * TRI_SUB
                    blk = tri_ref[pl.ds(base, TRI_SUB), :]
                    for j in range(TRI_SUB):
                        tt, u, v, ok = _mt_one(
                            blk[j, 0], blk[j, 1], blk[j, 2],
                            blk[j, 3], blk[j, 4], blk[j, 5],
                            blk[j, 6], blk[j, 7], blk[j, 8],
                            o_x, o_y, o_z, d_x, d_y, d_z,
                        )
                        ok = ok & (tt > t_near) & (tt < best_t)
                        best_t = jnp.where(ok, tt, best_t)
                        best_i = jnp.where(ok, base + j, best_i)
                        best_u = jnp.where(ok, u, best_u)
                        best_v = jnp.where(ok, v, best_v)
                    return best_t, best_i, best_u, best_v

                return jax.lax.fori_loop(0, n_blk, inner, carry)

            return jax.lax.cond(jnp.any(may_hit), process, lambda cr: cr, carry)

        init = (
            tf[:],
            jnp.full(ox.shape, -1, jnp.int32),
            jnp.zeros(ox.shape, jnp.float32),
            jnp.zeros(ox.shape, jnp.float32),
        )
        best_t, best_i, best_u, best_v = jax.lax.fori_loop(
            0, n_clusters, cluster_body, init
        )
        t_out[:] = best_t
        i_out[:] = best_i
        u_out[:] = best_u
        v_out[:] = best_v


def _any_hit_clustered_kernel(
    n_live_ref, cb_ref, tri_ref, ox, oy, oz, dx, dy, dz, tn, tf, hit_out,
    *, n_clusters,
):
    step_base = pl.program_id(0) * RAY_ROWS * LANE_BLOCK
    hit_out[:] = jnp.zeros(ox.shape, jnp.bool_)

    @pl.when(step_base < n_live_ref[0])
    def _run():
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        d_x, d_y, d_z = dx[:], dy[:], dz[:]
        ix, iy, iz = _safe_inv(d_x), _safe_inv(d_y), _safe_inv(d_z)
        t_near = tn[:]
        t_far = tf[:]
        n_blk = CLUSTER_SIZE // TRI_SUB

        def cluster_body(c, hit):
            row = cb_ref[c]
            may_hit = _slab_test(row, o_x, o_y, o_z, ix, iy, iz, t_near, t_far)

            def process(hit):
                def inner(jj, hit):
                    base = c * CLUSTER_SIZE + jj * TRI_SUB
                    blk = tri_ref[pl.ds(base, TRI_SUB), :]
                    for j in range(TRI_SUB):
                        tt, u, v, ok = _mt_one(
                            blk[j, 0], blk[j, 1], blk[j, 2],
                            blk[j, 3], blk[j, 4], blk[j, 5],
                            blk[j, 6], blk[j, 7], blk[j, 8],
                            o_x, o_y, o_z, d_x, d_y, d_z,
                        )
                        ok = ok & (tt > t_near) & (tt < t_far)
                        hit = jnp.maximum(hit, ok.astype(jnp.float32))
                    return hit

                return jax.lax.fori_loop(0, n_blk, inner, hit)

            return jax.lax.cond(jnp.any(may_hit), process, lambda h: h, hit)

        hit = jax.lax.fori_loop(
            0, n_clusters, cluster_body, jnp.zeros(ox.shape, jnp.float32)
        )
        hit_out[:] = hit > 0.0


@partial(jax.jit, static_argnames=("n_clusters", "interpret"))
def pallas_closest_hit_clustered(
    tri_soa_c, cluster_bounds, o, d, t_near, t_far, n_clusters: int,
    n_live=None, interpret: bool = False,
):
    """Clustered closest-hit: tri_soa_c (C*64, 16) reordered by
    accel.cluster; returns slot indices into the clustered layout."""
    n = o.shape[0]
    rows_pad, n_pad = _plan(n)
    if n_live is None:
        n_live = jnp.int32(n)
    planes = _common_planes(o, d, t_near, t_far, n_pad)
    ray_spec = pl.BlockSpec(
        (RAY_ROWS, LANE_BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(_closest_hit_clustered_kernel, n_clusters=n_clusters),
        grid=(rows_pad // RAY_ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(n_live, jnp.int32).reshape(1), cluster_bounds, tri_soa_c,
      *planes)
    t, i, u, v = (x.reshape(-1)[:n] for x in out)
    return t, i, u, v


@partial(jax.jit, static_argnames=("n_clusters", "interpret"))
def pallas_any_hit_clustered(
    tri_soa_c, cluster_bounds, o, d, t_near, t_far, n_clusters: int,
    n_live=None, interpret: bool = False,
):
    n = o.shape[0]
    rows_pad, n_pad = _plan(n)
    if n_live is None:
        n_live = jnp.int32(n)
    planes = _common_planes(o, d, t_near, t_far, n_pad)
    ray_spec = pl.BlockSpec(
        (RAY_ROWS, LANE_BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(_any_hit_clustered_kernel, n_clusters=n_clusters),
        grid=(rows_pad // RAY_ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [ray_spec] * 8,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK), jnp.bool_),
        interpret=interpret,
    )(jnp.asarray(n_live, jnp.int32).reshape(1), cluster_bounds, tri_soa_c,
      *planes)
    return out.reshape(-1)[:n]


def build_clustered_soa(v0, v1, v2):
    """Host: cluster + reorder -> (soa_c (C*64,16), bounds (C,8),
    slot->orig map (C*64,) int32 with -1 padding, n_clusters)."""
    from ...accel.cluster import build_clusters

    order, bounds, nc = build_clusters(v0, v1, v2)
    soa_c = np.zeros((max(nc, 1) * CLUSTER_SIZE, 16), np.float32)
    valid = order >= 0
    src = np.maximum(order, 0)
    soa_c[valid, 0:3] = v0[src[valid]]
    soa_c[valid, 3:6] = (v1 - v0)[src[valid]]
    soa_c[valid, 6:9] = (v2 - v0)[src[valid]]
    return soa_c, bounds, order.astype(np.int32), nc
