"""Pallas TPU BVH traversal kernels — the production intersector.

Replaces the brute/clustered kernels' O(total-tris)-per-ray cost with
per-tile BVH selectivity (the reference rides OptiX hardware traversal,
path_guiding_integrator.py:185 / path_tracing_integrator_py.py:102).

Design (measured on veach-ajar wavefronts before building): even the
union of a full 8x1024-ray grid step visits only ~60 (primary) / ~140
(bounce) of ~2800 BVH nodes, so a *tile-shared* traversal — one scalar
skip-pointer walk per grid step, slab-testing the whole ray tile against
each visited node — captures nearly all of the selectivity without any
per-lane divergence machinery, and best_t pruning adds ~nothing at tile
granularity. Two uniform phases per grid step:

  1. walk the DFS-ordered skip-pointer tree; each step is one dynamic
     node-row read + one (8,1024) slab test + a scalar any(); hit leaves
     push their triangle-block base onto an SMEM list;
  2. Moller-Trumbore the collected leaf blocks (4 triangles each,
     padded with degenerate zero triangles) against the whole tile.

Node table row (f32 x16): [lo.xyz, hi.xyz, skip, tri_base, ...pad]
(skip/tri_base stored as exact small-int floats; tri_base < 0 marks an
internal node). Triangle table: (n_leaves*4, 16) rows [v0|e1|e2|pad] in
leaf order; kernel returns *slot* ids mapped back outside.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import LANE_BLOCK, RAY_ROWS, _common_planes, _mt_one, _plan, _safe_inv

import os as _os
from ... import knobs

# Triangles per leaf block (builder enforces <= LEAF_K). Bigger leaves
# halve the vector-throughput-bound walk's step count and shift work to
# the cheap unrolled MT phase; PPG_BVH_LEAF makes the trade measurable.
LEAF_K = knobs.get_int("PPG_BVH_LEAF")  # measured: 8 beats 4
# by ~4.5% and 16 regresses on veach-ajar (walk steps traded against the
# cheap unrolled MT phase; docs/PERF_NOTES.md round-3)


# ===========================================================================
# Host-side table construction
# ===========================================================================


def build_bvh_tables(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray):
    """Build the skip-pointer BVH tables.

    Returns (nodes (Npad,16) f32, tris (L*LEAF_K lanes-padded,16) f32,
    slot_map (L*LEAF_K,) i32 slot->original-tri (-1 for padding),
    n_nodes, max_leaves)."""
    from ...accel.bvh import build_bvh

    bvh = build_bvh(v0, v1, v2, leaf_size=LEAF_K, strict_leaf=True)
    right = bvh["right"]
    n = len(right)
    skip = np.full(n, n, np.int32)
    stack = [(0, n)]
    while stack:
        i, sk = stack.pop()
        skip[i] = sk
        if right[i] >= 0:
            stack.append((i + 1, right[i]))
            stack.append((right[i], sk))

    is_leaf = right < 0
    leaf_ids = np.nonzero(is_leaf)[0]
    n_leaves = len(leaf_ids)

    # leaf-padded triangle table in leaf order
    tpad = max(n_leaves * LEAF_K, 8)
    tpad = -(-tpad // 8) * 8
    tris = np.zeros((tpad, 16), np.float32)
    slot_map = np.full(tpad, -1, np.int32)
    base_of = np.full(n, -1.0, np.float32)
    order = bvh["order"]
    for li, node in enumerate(leaf_ids):
        base = li * LEAF_K
        base_of[node] = base
        s, c = bvh["start"][node], bvh["count"][node]
        for k in range(c):
            orig = order[s + k]
            tris[base + k, 0:3] = v0[orig]
            tris[base + k, 3:6] = v1[orig] - v0[orig]
            tris[base + k, 6:9] = v2[orig] - v0[orig]
            # original triangle id as an exact small-int float: the fused
            # kernel returns it directly (no bvh_map gather in the epilogue)
            tris[base + k, 9] = float(orig)
            slot_map[base + k] = orig

    npad = -(-n // 8) * 8
    nodes = np.zeros((npad, 16), np.float32)
    nodes[:n, 0:3] = bvh["node_lo"]
    nodes[:n, 3:6] = bvh["node_hi"]
    nodes[:n, 6] = skip.astype(np.float32)
    nodes[:n, 7] = base_of
    # padding rows: park at END (skip = n, no AABB hit possible)
    nodes[n:, 0:3] = np.inf
    nodes[n:, 3:6] = -np.inf
    nodes[n:, 6] = n
    nodes[n:, 7] = -1.0

    # --- pair-walk table: one row per INTERNAL node holding BOTH
    # children's AABBs + links. Halves the scalar-latency-bound walk's
    # step count (each step retires two nodes); stored FLAT for SMEM
    # residency (scalar loads avoid vector->scalar extracts).
    # Row stride 16: [loL.xyz, hiL.xyz, loR.xyz, hiR.xyz, cL, cR, 0, 0];
    # child code c: >= 0 -> internal row index, < 0 -> leaf, tri_base
    # = -c - 1.
    internal = np.nonzero(right >= 0)[0]
    new_idx = np.full(n, -1, np.int64)
    new_idx[internal] = np.arange(len(internal))

    def child_code(c):
        if right[c] >= 0:
            return float(new_idx[c])
        return float(-int(base_of[c]) - 1)

    if len(internal) == 0:
        # degenerate single-leaf tree: one pseudo-internal, both children
        # the root leaf
        pair = np.zeros(16, np.float32)
        pair[0:3] = bvh["node_lo"][0]
        pair[3:6] = bvh["node_hi"][0]
        pair[6:9] = np.inf
        pair[9:12] = -np.inf
        pair[12] = float(-int(base_of[0]) - 1)
        pair[13] = float(-int(base_of[0]) - 1)
        pair = pair.reshape(1, 16)
        n_internal = 1
    else:
        n_internal = len(internal)
        pair = np.zeros((n_internal, 16), np.float32)
        for ni, i in enumerate(internal):
            cl, cr = i + 1, right[i]
            pair[ni, 0:3] = bvh["node_lo"][cl]
            pair[ni, 3:6] = bvh["node_hi"][cl]
            pair[ni, 6:9] = bvh["node_lo"][cr]
            pair[ni, 9:12] = bvh["node_hi"][cr]
            pair[ni, 12] = child_code(cl)
            pair[ni, 13] = child_code(cr)
        # pad AABBs a few ulp outward: the kernel's FMA-form slab test
        # (bound*inv - o*inv) rounds differently from (bound-o)*inv and
        # must stay conservative for boundary-grazing rays
        eps = 4e-7
        for base in (0, 6):
            w = np.abs(pair[:, base:base + 6]) + 1e-30
            pair[:, base:base + 3] -= eps * w[:, 0:3]
            pair[:, base + 3:base + 6] += eps * w[:, 3:6]
    # dummy padding row (LAST): the batched walk pads short stack pops
    # with it. Degenerate point AABBs at +3e38 fail every slab test
    # (tmin=+huge fails tmin<t_far; mixed signs fail tmax>=tmin), and
    # even a pathological pass only adds redundant leaf-0 MT tests.
    dummy = np.zeros((1, 16), np.float32)
    dummy[0, 0:12] = 3.0e38
    dummy[0, 12:14] = -1.0
    pair = np.concatenate([pair, dummy], axis=0)
    return (nodes, tris, slot_map, int(n), int(n_leaves),
            pair.reshape(-1), int(n_internal))


# ===========================================================================
# Kernels
# ===========================================================================


# The default scoped-VMEM budget is a 16 MB compiler knob, not the v5e's
# physical VMEM (128 MB). XLA parks full-wavefront outputs in scoped VMEM
# around these custom calls on larger scenes (torus: 19-31 MB requested),
# so the kernels declare a higher ceiling explicitly.
_KERNEL_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)



def _slab_tile(row, o_x, o_y, o_z, ix, iy, iz, t_near, t_far):
    t0 = (row[0] - o_x) * ix
    t1 = (row[3] - o_x) * ix
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    t0 = (row[1] - o_y) * iy
    t1 = (row[4] - o_y) * iy
    tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
    tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
    t0 = (row[2] - o_z) * iz
    t1 = (row[5] - o_z) * iz
    tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
    tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
    return (tmax >= tmin) & (tmax > t_near) & (tmin < t_far)


def _collect_leaves(node_ref, leaf_buf, o_x, o_y, o_z, ix, iy, iz,
                    t_near, t_far, n_nodes):
    """Phase 1: tile-shared skip-pointer walk; returns leaf count."""

    def cond(carry):
        idx, cnt = carry
        return idx < n_nodes

    def body(carry):
        idx, cnt = carry
        row = node_ref[idx]
        may = _slab_tile(row, o_x, o_y, o_z, ix, iy, iz, t_near, t_far)
        anyhit = jnp.any(may)
        skip = row[6].astype(jnp.int32)
        base = row[7].astype(jnp.int32)
        is_leaf = base >= 0
        take = anyhit & is_leaf
        leaf_buf[cnt] = base  # harmless overwrite unless counted
        cnt2 = jnp.where(take, cnt + 1, cnt)
        idx2 = jnp.where(anyhit & ~is_leaf, idx + 1, skip)
        return idx2, cnt2

    _, cnt = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
    return cnt


def _slab_scalar6(pair_ref, b, oix, oiy, oiz, ix, iy, iz, t_near, t_far):
    """Slab test with bounds loaded as 6 scalars from a flat SMEM table.

    FMA form: callers precompute oi* = o*inv once per tile walk, so each
    plane distance is one fused multiply-add (bound*inv - oi) instead of
    a subtract + multiply — the walk is vector-throughput-bound and this
    trims ~1/3 of its per-step vector ops."""
    t0 = pair_ref[b] * ix - oix
    t1 = pair_ref[b + 3] * ix - oix
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    t0 = pair_ref[b + 1] * iy - oiy
    t1 = pair_ref[b + 4] * iy - oiy
    tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
    tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
    t0 = pair_ref[b + 2] * iz - oiz
    t1 = pair_ref[b + 5] * iz - oiz
    tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
    tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
    return (tmax >= tmin) & (tmax > t_near) & (tmin < t_far)


POP_W = 4  # stack pops per walk step (batched so reductions pipeline)


def _collect_leaves_pair(pair_ref, stack_ref, leaf_buf, oix, oiy, oiz,
                         ix, iy, iz, t_near, t_far):
    """Tile-shared PAIR walk, BATCHED: each step pops up to POP_W internal
    nodes from the explicit SMEM stack and slab-tests all their children
    (2*POP_W independent tests -> the expensive vector->scalar any()
    reductions pipeline instead of serializing one-per-step), then runs
    the scalar push logic. Short pops are padded with the builder's dummy
    row (inverted AABBs -> never hits). Collects the same leaf SET as the
    one-pop walk (order differs). Walk data lives flat in SMEM (scalar
    loads, no vector->scalar extracts)."""
    dummy = pair_ref.shape[0] // 16 - 1  # builder-appended padding row
    stack_ref[0] = 0

    def cond(carry):
        sp, cnt = carry
        return sp > 0

    def body(carry):
        sp, cnt = carry
        # --- pop up to POP_W (dummy-padded), issue ALL vector work first
        idxs = []
        for j in range(POP_W):
            i = stack_ref[jnp.maximum(sp - 1 - j, 0)]
            idxs.append(jnp.where(sp > j, i, dummy) * 16)
        sp = jnp.maximum(sp - POP_W, 0)
        hits = []
        for b in idxs:
            mayL = _slab_scalar6(pair_ref, b, oix, oiy, oiz, ix, iy, iz,
                                 t_near, t_far)
            mayR = _slab_scalar6(pair_ref, b + 6, oix, oiy, oiz, ix, iy,
                                 iz, t_near, t_far)
            hits.append((jnp.any(mayL), jnp.any(mayR)))
        # --- scalar push phase
        for b, (hitL, hitR) in zip(idxs, hits):
            cl = pair_ref[b + 12].astype(jnp.int32)
            cr = pair_ref[b + 13].astype(jnp.int32)
            leafL = cl < 0
            leafR = cr < 0
            # left child: unconditional writes + conditional pointer bumps
            leaf_buf[cnt] = -cl - 1
            cnt = jnp.where(hitL & leafL, cnt + 1, cnt)
            stack_ref[sp] = cl
            sp = jnp.where(hitL & ~leafL, sp + 1, sp)
            # right child (uses the updated pointers)
            leaf_buf[cnt] = -cr - 1
            cnt = jnp.where(hitR & leafR, cnt + 1, cnt)
            stack_ref[sp] = cr
            sp = jnp.where(hitR & ~leafR, sp + 1, sp)
        return sp, cnt

    _, cnt = jax.lax.while_loop(cond, body, (jnp.int32(1), jnp.int32(0)))
    return cnt


def _bvh_closest_kernel(n_live_ref, node_ref, tri_ref, ox, oy, oz,
                        dx, dy, dz, tn, tf, t_out, i_out, u_out, v_out,
                        leaf_buf, *, n_nodes):
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
        t_far = tf[:]
        cnt = _collect_leaves(node_ref, leaf_buf, o_x, o_y, o_z, ix, iy, iz,
                              t_near, t_far, n_nodes)

        def tri_body(j, carry):
            best_t, best_i, best_u, best_v = carry
            base = leaf_buf[j]
            blk = tri_ref[pl.ds(base, LEAF_K), :]
            for k in range(LEAF_K):
                tt, u, v, ok = _mt_one(
                    blk[k, 0], blk[k, 1], blk[k, 2],
                    blk[k, 3], blk[k, 4], blk[k, 5],
                    blk[k, 6], blk[k, 7], blk[k, 8],
                    o_x, o_y, o_z, d_x, d_y, d_z,
                )
                ok = ok & (tt > t_near) & (tt < best_t)
                best_t = jnp.where(ok, tt, best_t)
                best_i = jnp.where(ok, base + k, best_i)
                best_u = jnp.where(ok, u, best_u)
                best_v = jnp.where(ok, v, best_v)
            return best_t, best_i, best_u, best_v

        init = (
            t_far,
            jnp.full(ox.shape, -1, jnp.int32),
            jnp.zeros(ox.shape, jnp.float32),
            jnp.zeros(ox.shape, jnp.float32),
        )
        best_t, best_i, best_u, best_v = jax.lax.fori_loop(
            0, cnt, tri_body, init
        )
        t_out[:] = best_t
        i_out[:] = best_i
        u_out[:] = best_u
        v_out[:] = best_v


def _bvh_closest_attr_kernel(n_live_ref, pair_ref, tri_ref, attr_ref,
                             ox, oy, oz, dx, dy, dz, tn, tf,
                             t_out, id_out, nsx_o, nsy_o, nsz_o,
                             ngx_o, ngy_o, ngz_o, uu_o, vv_o, mat_o, em_o,
                             leaf_buf, stack_ref):
    """Closest hit WITH in-kernel shading-attribute resolution: the MT
    loop already holds the winning triangle's barycentrics in registers,
    so the hit attributes (interpolated shading normal, geometric normal,
    interpolated uv, material/emitter ids, original tri id) are
    where-selected from a leaf-ordered attr table — eliminating the
    whole per-bounce XLA gather epilogue (round-2 closing profile: the
    epilogue cost ~29-45 ms per 921600-lane wavefront vs ~7 ms of
    in-kernel selects).

    attr table row (f32 x32), leaf-slot order:
      [n0.xyz, n1.xyz, n2.xyz, ng.xyz, uv0.xy, uv1.xy, uv2.xy, mat, em]
    id/mat/em are returned as exact small-int floats (cast outside)."""
    step_base = pl.program_id(0) * RAY_ROWS * LANE_BLOCK
    shape = ox.shape
    t_out[:] = tf[:]
    id_out[:] = jnp.full(shape, -1.0, jnp.float32)
    for ref in (nsx_o, nsy_o, nsz_o, ngx_o, ngy_o, ngz_o, uu_o, vv_o,
                mat_o, em_o):
        ref[:] = jnp.zeros(shape, jnp.float32)

    @pl.when(step_base < n_live_ref[0])
    def _run():
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        d_x, d_y, d_z = dx[:], dy[:], dz[:]
        ix, iy, iz = _safe_inv(d_x), _safe_inv(d_y), _safe_inv(d_z)
        t_near = tn[:]
        t_far = tf[:]
        cnt = _collect_leaves_pair(pair_ref, stack_ref, leaf_buf,
                                   o_x * ix, o_y * iy, o_z * iz,
                                   ix, iy, iz, t_near, t_far)

        # pass 2a: the proven 4-carry closest-hit loop (identical to
        # _bvh_closest_kernel, so winner selection matches it bit-exactly)
        def tri_body(j, carry):
            best_t, best_i, best_u, best_v = carry
            base = leaf_buf[j]
            blk = tri_ref[pl.ds(base, LEAF_K), :]
            for k in range(LEAF_K):
                tt, u, v, ok = _mt_one(
                    blk[k, 0], blk[k, 1], blk[k, 2],
                    blk[k, 3], blk[k, 4], blk[k, 5],
                    blk[k, 6], blk[k, 7], blk[k, 8],
                    o_x, o_y, o_z, d_x, d_y, d_z,
                )
                ok = ok & (tt > t_near) & (tt < best_t)
                best_t = jnp.where(ok, tt, best_t)
                best_i = jnp.where(ok, base + k, best_i)
                best_u = jnp.where(ok, u, best_u)
                best_v = jnp.where(ok, v, best_v)
            return best_t, best_i, best_u, best_v

        init = (
            t_far,
            jnp.full(shape, -1, jnp.int32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
        )
        best_t, best_i, best_u, best_v = jax.lax.fori_loop(
            0, cnt, tri_body, init
        )

        # pass 2b: attribute selection keyed on SLOT EQUALITY against the
        # final winner — immune to float-tie inconsistencies by
        # construction (the winner's row is selected, whatever won)
        bw = 1.0 - best_u - best_v

        def attr_body(j, carry):
            (idf, nsx, nsy, nsz, ngx, ngy, ngz, uu, vv, mat, em) = carry
            base = leaf_buf[j]
            blk = tri_ref[pl.ds(base, LEAF_K), :]
            ablk = attr_ref[pl.ds(base, LEAF_K), :]
            for k in range(LEAF_K):
                m = best_i == (base + k)
                ab = ablk[k]
                idf = jnp.where(m, blk[k, 9], idf)
                nsx = jnp.where(m, ab[0] * bw + ab[3] * best_u + ab[6] * best_v, nsx)
                nsy = jnp.where(m, ab[1] * bw + ab[4] * best_u + ab[7] * best_v, nsy)
                nsz = jnp.where(m, ab[2] * bw + ab[5] * best_u + ab[8] * best_v, nsz)
                ngx = jnp.where(m, ab[9], ngx)
                ngy = jnp.where(m, ab[10], ngy)
                ngz = jnp.where(m, ab[11], ngz)
                uu = jnp.where(m, ab[12] * bw + ab[14] * best_u + ab[16] * best_v, uu)
                vv = jnp.where(m, ab[13] * bw + ab[15] * best_u + ab[17] * best_v, vv)
                mat = jnp.where(m, ab[18], mat)
                em = jnp.where(m, ab[19], em)
            return (idf, nsx, nsy, nsz, ngx, ngy, ngz, uu, vv, mat, em)

        z = jnp.zeros(shape, jnp.float32)
        ainit = (jnp.full(shape, -1.0, jnp.float32),
                 z, z, z, z, z, z, z, z, z,
                 jnp.full(shape, -1.0, jnp.float32))
        (idf, nsx, nsy, nsz, ngx, ngy, ngz, uu, vv, mat, em) = (
            jax.lax.fori_loop(0, cnt, attr_body, ainit)
        )
        t_out[:] = best_t
        id_out[:] = idf
        nsx_o[:] = nsx
        nsy_o[:] = nsy
        nsz_o[:] = nsz
        ngx_o[:] = ngx
        ngy_o[:] = ngy
        ngz_o[:] = ngz
        uu_o[:] = uu
        vv_o[:] = vv
        mat_o[:] = mat
        em_o[:] = em


def _bvh_any_pair_kernel(n_live_ref, pair_ref, tri_ref, ox, oy, oz,
                         dx, dy, dz, tn, tf, hit_out, leaf_buf, stack_ref):
    step_base = pl.program_id(0) * RAY_ROWS * LANE_BLOCK
    hit_out[:] = jnp.zeros(ox.shape, jnp.bool_)

    @pl.when(step_base < n_live_ref[0])
    def _run():
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        d_x, d_y, d_z = dx[:], dy[:], dz[:]
        ix, iy, iz = _safe_inv(d_x), _safe_inv(d_y), _safe_inv(d_z)
        t_near = tn[:]
        t_far = tf[:]
        cnt = _collect_leaves_pair(pair_ref, stack_ref, leaf_buf,
                                   o_x * ix, o_y * iy, o_z * iz,
                                   ix, iy, iz, t_near, t_far)

        def tri_body(j, hit):
            base = leaf_buf[j]
            blk = tri_ref[pl.ds(base, LEAF_K), :]
            for k in range(LEAF_K):
                tt, u, v, ok = _mt_one(
                    blk[k, 0], blk[k, 1], blk[k, 2],
                    blk[k, 3], blk[k, 4], blk[k, 5],
                    blk[k, 6], blk[k, 7], blk[k, 8],
                    o_x, o_y, o_z, d_x, d_y, d_z,
                )
                ok = ok & (tt > t_near) & (tt < t_far)
                hit = jnp.maximum(hit, ok.astype(jnp.float32))
            return hit

        # float carry — Mosaic mis-lowers i1 vector loop carries
        hit = jax.lax.fori_loop(
            0, cnt, tri_body, jnp.zeros(o_x.shape, jnp.float32)
        )
        hit_out[:] = hit > 0.0


@partial(jax.jit, static_argnames=("max_leaves", "interpret"))
def bvh_any_hit_pair(pair, tris, o, d, t_near, t_far, max_leaves: int,
                     n_live=None, interpret: bool = False):
    """Any-hit over the SMEM pair-walk table."""
    n = o.shape[0]
    rows_pad, n_pad = _plan(n)
    if n_live is None:
        n_live = jnp.int32(n)
    planes = _common_planes(o, d, t_near, t_far, n_pad)
    ray_spec = pl.BlockSpec(
        (RAY_ROWS, LANE_BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _bvh_any_pair_kernel,
        grid=(rows_pad // RAY_ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [ray_spec] * 8,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK), jnp.bool_),
        scratch_shapes=[
            pltpu.SMEM((max(max_leaves, 1) + 1,), jnp.int32),
            # batched pops deepen the stack beyond tree depth; a node is
            # pushed at most once per walk, so n_internal bounds it
            pltpu.SMEM((max(256, pair.size // 16 + POP_W),), jnp.int32),
        ],
        compiler_params=_KERNEL_VMEM_LIMIT,
        interpret=interpret,
    )(jnp.asarray(n_live, jnp.int32).reshape(1), pair, tris, *planes)
    return out.reshape(-1)[:n]


def _bvh_any_kernel(n_live_ref, node_ref, tri_ref, ox, oy, oz,
                    dx, dy, dz, tn, tf, hit_out, leaf_buf, *, n_nodes):
    step_base = pl.program_id(0) * RAY_ROWS * LANE_BLOCK
    hit_out[:] = jnp.zeros(ox.shape, jnp.bool_)

    @pl.when(step_base < n_live_ref[0])
    def _run():
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        d_x, d_y, d_z = dx[:], dy[:], dz[:]
        ix, iy, iz = _safe_inv(d_x), _safe_inv(d_y), _safe_inv(d_z)
        t_near = tn[:]
        t_far = tf[:]
        cnt = _collect_leaves(node_ref, leaf_buf, o_x, o_y, o_z, ix, iy, iz,
                              t_near, t_far, n_nodes)

        def tri_body(j, hit):
            base = leaf_buf[j]
            blk = tri_ref[pl.ds(base, LEAF_K), :]
            for k in range(LEAF_K):
                tt, u, v, ok = _mt_one(
                    blk[k, 0], blk[k, 1], blk[k, 2],
                    blk[k, 3], blk[k, 4], blk[k, 5],
                    blk[k, 6], blk[k, 7], blk[k, 8],
                    o_x, o_y, o_z, d_x, d_y, d_z,
                )
                ok = ok & (tt > t_near) & (tt < t_far)
                hit = jnp.maximum(hit, ok.astype(jnp.float32))
            return hit

        # float carry — Mosaic mis-lowers i1 vector loop carries
        hit = jax.lax.fori_loop(
            0, cnt, tri_body, jnp.zeros(o_x.shape, jnp.float32)
        )
        hit_out[:] = hit > 0.0


# ===========================================================================
# Callers
# ===========================================================================


@partial(jax.jit, static_argnames=("n_nodes", "max_leaves", "interpret"))
def bvh_closest_hit(nodes, tris, o, d, t_near, t_far, n_nodes: int,
                    max_leaves: int, n_live=None, interpret: bool = False):
    """Returns (t, slot, u, v); slot indexes the leaf-padded tri table
    (-1 on miss) — map back with the slot_map from build_bvh_tables."""
    n = o.shape[0]
    rows_pad, n_pad = _plan(n)
    if n_live is None:
        n_live = jnp.int32(n)
    planes = _common_planes(o, d, t_near, t_far, n_pad)
    ray_spec = pl.BlockSpec(
        (RAY_ROWS, LANE_BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(_bvh_closest_kernel, n_nodes=n_nodes),
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
        scratch_shapes=[pltpu.SMEM((max(max_leaves, 1) + 1,), jnp.int32)],
        compiler_params=_KERNEL_VMEM_LIMIT,
        interpret=interpret,
    )(jnp.asarray(n_live, jnp.int32).reshape(1), nodes, tris, *planes)
    t, i, u, v = (x.reshape(-1)[:n] for x in out)
    return t, i, u, v


@partial(jax.jit, static_argnames=("max_leaves", "interpret"))
def bvh_closest_hit_attrs(pair, tris, attrs, o, d, t_near, t_far,
                          max_leaves: int, n_live=None,
                          interpret: bool = False):
    """Fused closest-hit + shading attributes over the SMEM pair-walk
    table. Returns a dict with keys t, id (i32 original tri, -1 on miss),
    ns (N,3) unnormalized interpolated shading normal, ng (N,3)
    unnormalized geometric normal, uv (N,2), mat (i32), em (i32)."""
    n = o.shape[0]
    rows_pad, n_pad = _plan(n)
    if n_live is None:
        n_live = jnp.int32(n)
    planes = _common_planes(o, d, t_near, t_far, n_pad)
    ray_spec = pl.BlockSpec(
        (RAY_ROWS, LANE_BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _bvh_closest_attr_kernel,
        grid=(rows_pad // RAY_ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [ray_spec] * 8,
        out_specs=[ray_spec] * 12,
        out_shape=[jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK), jnp.float32)]
        * 12,
        scratch_shapes=[
            pltpu.SMEM((max(max_leaves, 1) + 1,), jnp.int32),
            # batched pops deepen the stack beyond tree depth; a node is
            # pushed at most once per walk, so n_internal bounds it
            pltpu.SMEM((max(256, pair.size // 16 + POP_W),), jnp.int32),
        ],
        compiler_params=_KERNEL_VMEM_LIMIT,
        interpret=interpret,
    )(jnp.asarray(n_live, jnp.int32).reshape(1), pair, tris, attrs, *planes)
    (t, idf, nsx, nsy, nsz, ngx, ngy, ngz, uu, vv, matf, emf) = (
        x.reshape(-1)[:n] for x in out
    )
    return {
        "t": t,
        "id": idf.astype(jnp.int32),
        "ns": jnp.stack([nsx, nsy, nsz], axis=-1),
        "ng": jnp.stack([ngx, ngy, ngz], axis=-1),
        "uv": jnp.stack([uu, vv], axis=-1),
        "mat": matf.astype(jnp.int32),
        "em": emf.astype(jnp.int32),
    }


@partial(jax.jit, static_argnames=("n_nodes", "max_leaves", "interpret"))
def bvh_any_hit(nodes, tris, o, d, t_near, t_far, n_nodes: int,
                max_leaves: int, n_live=None, interpret: bool = False):
    n = o.shape[0]
    rows_pad, n_pad = _plan(n)
    if n_live is None:
        n_live = jnp.int32(n)
    planes = _common_planes(o, d, t_near, t_far, n_pad)
    ray_spec = pl.BlockSpec(
        (RAY_ROWS, LANE_BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(_bvh_any_kernel, n_nodes=n_nodes),
        grid=(rows_pad // RAY_ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [ray_spec] * 8,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK), jnp.bool_),
        scratch_shapes=[pltpu.SMEM((max(max_leaves, 1) + 1,), jnp.int32)],
        compiler_params=_KERNEL_VMEM_LIMIT,
        interpret=interpret,
    )(jnp.asarray(n_live, jnp.int32).reshape(1), nodes, tris, *planes)
    return out.reshape(-1)[:n]
