"""Host-side binned-SAH BVH2 builder + a jittable stack-based wavefront
traversal.

Round-2 groundwork for per-lane traversal selectivity (the reference rides
OptiX's BVH for `scene.ray_intersect`, path_guiding_integrator.py:185; the
current Pallas kernels in ops/pallas/intersect.py are brute/clustered).
The builder runs offline at scene-load time (numpy); the flattened arrays
are fixed-shape device constants, sized for a future Mosaic descent kernel
(VMEM-resident nodes, dynamic sublane row reads).

Layout (depth-first): inner node i's left child is i+1, right child is
``right[i]``; leaves have right[i] == -1 and reference ``count[i]``
triangles starting at ``start[i]`` in the BVH-permuted triangle order.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

N_BINS = 16
LEAF_SIZE = 4  # triangles per leaf target
MAX_STACK = 64  # >= 2 * max tree depth; SAH trees on these scenes are < 32


def build_bvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
              leaf_size: int = LEAF_SIZE, strict_leaf: bool = False):
    """Binned-SAH top-down build. Returns a dict of flat numpy arrays:
    node_lo/node_hi (N,3) f32, right (N,) i32 (-1 for leaves),
    start/count (N,) i32 (valid for leaves), order (T,) i32 triangle
    permutation. ``strict_leaf`` forces every leaf to hold <= leaf_size
    triangles (the Pallas skip-traversal kernel's fixed block size)."""
    t = len(v0)
    if t == 0:
        return {
            "node_lo": np.zeros((1, 3), np.float32),
            "node_hi": np.zeros((1, 3), np.float32),
            "right": np.full(1, -1, np.int32),
            "start": np.zeros(1, np.int32),
            "count": np.zeros(1, np.int32),
            "order": np.zeros(0, np.int32),
        }
    lo = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    hi = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    cen = ((lo + hi) * 0.5).astype(np.float32)

    order = np.arange(t, dtype=np.int32)
    node_lo, node_hi, right, start, count = [], [], [], [], []

    def new_node(l, h):
        node_lo.append(l)
        node_hi.append(h)
        right.append(-1)
        start.append(0)
        count.append(0)
        return len(node_lo) - 1

    def sah_split(idx):
        """Returns (axis, threshold) or None for a leaf."""
        if len(idx) <= leaf_size:
            return None
        c = cen[idx]
        cmin, cmax = c.min(0), c.max(0)
        ext = cmax - cmin
        axis = int(np.argmax(ext))
        if ext[axis] <= 1e-12:
            return ("median", axis)  # degenerate: object-median fallback
        # binned SAH along the widest axis
        scale = N_BINS * (1.0 - 1e-6) / ext[axis]
        bins = ((c[:, axis] - cmin[axis]) * scale).astype(np.int32)
        bin_lo = np.full((N_BINS, 3), np.inf, np.float32)
        bin_hi = np.full((N_BINS, 3), -np.inf, np.float32)
        bin_n = np.zeros(N_BINS, np.int64)
        for b in range(N_BINS):
            sel = idx[bins == b]
            if len(sel):
                bin_lo[b] = lo[sel].min(0)
                bin_hi[b] = hi[sel].max(0)
                bin_n[b] = len(sel)

        def area(l, h):
            d = np.maximum(h - l, 0)
            return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]

        # prefix/suffix sweeps
        lft_lo = np.minimum.accumulate(bin_lo, 0)
        lft_hi = np.maximum.accumulate(bin_hi, 0)
        lft_n = np.cumsum(bin_n)
        rgt_lo = np.minimum.accumulate(bin_lo[::-1], 0)[::-1]
        rgt_hi = np.maximum.accumulate(bin_hi[::-1], 0)[::-1]
        rgt_n = np.cumsum(bin_n[::-1])[::-1]
        costs = np.full(N_BINS - 1, np.inf)
        for s in range(N_BINS - 1):
            if lft_n[s] == 0 or rgt_n[s + 1] == 0:
                continue
            costs[s] = area(lft_lo[s], lft_hi[s]) * lft_n[s] + area(
                rgt_lo[s + 1], rgt_hi[s + 1]
            ) * rgt_n[s + 1]
        best = int(np.argmin(costs))
        leaf_cost = area(lo[idx].min(0), hi[idx].max(0)) * len(idx)
        if not np.isfinite(costs[best]) or costs[best] >= leaf_cost:
            if not strict_leaf and len(idx) <= 2 * leaf_size:
                return None
            return ("median", axis)
        thr = cmin[axis] + (best + 1) * ext[axis] / N_BINS
        return (axis, thr)

    out_order = []

    def build(idx):
        ni = new_node(lo[idx].min(0), hi[idx].max(0))
        split = sah_split(idx)
        if split is None:
            start[ni] = len(out_order)
            count[ni] = len(idx)
            out_order.extend(idx.tolist())
            return ni
        if split[0] == "median":
            axis = split[1]
            srt = idx[np.argsort(cen[idx, axis], kind="stable")]
            l_idx, r_idx = srt[: len(srt) // 2], srt[len(srt) // 2 :]
        else:
            axis, thr = split
            sel = cen[idx, axis] < thr
            l_idx, r_idx = idx[sel], idx[~sel]
            if len(l_idx) == 0 or len(r_idx) == 0:  # numeric edge
                srt = idx[np.argsort(cen[idx, axis], kind="stable")]
                l_idx, r_idx = srt[: len(srt) // 2], srt[len(srt) // 2 :]
        build(l_idx)
        right[ni] = build(r_idx)
        return ni

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        build(order)
    finally:
        sys.setrecursionlimit(old_limit)
    return {
        "node_lo": np.asarray(node_lo, np.float32),
        "node_hi": np.asarray(node_hi, np.float32),
        "right": np.asarray(right, np.int32),
        "start": np.asarray(start, np.int32),
        "count": np.asarray(count, np.int32),
        "order": np.asarray(out_order, np.int32),
    }


def bvh_depth(bvh) -> int:
    """Max depth (root=0) — sanity bound for MAX_STACK."""
    right = bvh["right"]
    depth = np.zeros(len(right), np.int64)
    best = 0
    for i in range(len(right)):
        if right[i] >= 0:
            depth[i + 1] = depth[i] + 1
            depth[right[i]] = depth[i] + 1
        best = max(best, int(depth[i]))
    return best


def _ray_aabb(o, inv_d, lo, hi, t_max):
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tmin = jnp.minimum(t0, t1).max()
    tmax = jnp.maximum(t0, t1).min()
    return (tmax >= jnp.maximum(tmin, 0.0)) & (tmin <= t_max)


def _mt(o, d, a, b, c):
    """Moller-Trumbore; returns (t, u, v, hit)."""
    e1 = b - a
    e2 = c - a
    p = jnp.cross(d, e2)
    det = jnp.dot(e1, p)
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    s = o - a
    u = jnp.dot(s, p) * inv
    q = jnp.cross(s, e1)
    v = jnp.dot(d, q) * inv
    t = jnp.dot(e2, q) * inv
    hit = (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
    return t, u, v, hit


def make_traverser(bvh, tri_v0, tri_v1, tri_v2, max_leaf: int):
    """Returns closest_hit(o, d, t_max) -> (t, prim, u, v) vmapped over rays.

    Stack-based descent with a fixed MAX_STACK i32 stack per lane. The
    triangle arrays must already be in BVH order (bvh['order'] applied);
    ``prim`` returns BVH-order indices. max_leaf bounds the inner
    fori_loop (static)."""
    node_lo = jnp.asarray(bvh["node_lo"])
    node_hi = jnp.asarray(bvh["node_hi"])
    right = jnp.asarray(bvh["right"])
    start = jnp.asarray(bvh["start"])
    count = jnp.asarray(bvh["count"])

    def one_ray(o, d, t_max):
        inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 1e12)
        stack = jnp.zeros(MAX_STACK, jnp.int32)
        sp = jnp.int32(1)  # stack[0] = 0 (root)

        def cond(s):
            return s["sp"] > 0

        def body(s):
            sp = s["sp"] - 1
            node = s["stack"][sp]
            hit_box = _ray_aabb(o, inv_d, node_lo[node], node_hi[node], s["t"])
            is_leaf = right[node] < 0

            def leaf_case(s):
                def tri_body(k, s):
                    j = start[node] + k
                    t, u, v, h = _mt(o, d, tri_v0[j], tri_v1[j], tri_v2[j])
                    better = h & (k < count[node]) & (t < s["t"])
                    return {
                        **s,
                        "t": jnp.where(better, t, s["t"]),
                        "prim": jnp.where(better, j, s["prim"]),
                        "u": jnp.where(better, u, s["u"]),
                        "v": jnp.where(better, v, s["v"]),
                    }

                return jax.lax.fori_loop(0, max_leaf, tri_body, s)

            def inner_case(s):
                st = s["stack"].at[s["sp"]].set(node + 1)
                st = st.at[s["sp"] + 1].set(right[node])
                return {**s, "stack": st, "sp": s["sp"] + 2}

            s = {**s, "sp": sp}
            return jax.lax.cond(
                hit_box,
                lambda s: jax.lax.cond(is_leaf, leaf_case, inner_case, s),
                lambda s: s,
                s,
            )

        init = {
            "stack": stack, "sp": sp, "t": t_max,
            "prim": jnp.int32(-1), "u": jnp.float32(0), "v": jnp.float32(0),
        }
        out = jax.lax.while_loop(cond, body, init)
        return out["t"], out["prim"], out["u"], out["v"]

    return jax.vmap(one_ray)
