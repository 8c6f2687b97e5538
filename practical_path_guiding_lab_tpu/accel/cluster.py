"""Host-side triangle clustering for the Pallas intersector.

Median-split BVH-style recursion (largest-extent axis, centroid median)
down to <= CLUSTER_SIZE triangles per leaf; triangles are reordered so each
cluster owns a contiguous, padded 64-slot block, and each cluster gets an
AABB. The kernel tests a whole ray tile against a cluster's AABB and skips
the 64 triangle tests when no lane can hit (coherent camera/shadow tiles
skip most clusters; incoherent bounce tiles degrade gracefully to brute
force). Plays the role of the reference's OptiX BVH build at scene load.
"""
from __future__ import annotations

import numpy as np

CLUSTER_SIZE = 64


def build_clusters(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray):
    """Returns (order (T,) int32 triangle permutation grouped by cluster,
    cluster_bounds (C, 8) float32 [lo.xyz, pad, hi.xyz, pad], n_clusters).

    Each cluster occupies exactly CLUSTER_SIZE slots in the reordered
    arrays; slots beyond a cluster's triangle count are padding (degenerate
    triangles, filled by the caller)."""
    t = len(v0)
    if t == 0:
        return (
            np.zeros(0, np.int32),
            np.zeros((1, 8), np.float32),
            1,
        )
    centroids = (v0 + v1 + v2) / 3.0
    lo_all = np.minimum(np.minimum(v0, v1), v2)
    hi_all = np.maximum(np.maximum(v0, v1), v2)

    clusters = []  # list of index arrays

    def split(idx):
        if len(idx) <= CLUSTER_SIZE:
            clusters.append(idx)
            return
        c = centroids[idx]
        ext = c.max(axis=0) - c.min(axis=0)
        axis = int(np.argmax(ext))
        order = np.argsort(c[:, axis], kind="stable")
        half = len(idx) // 2
        split(idx[order[:half]])
        split(idx[order[half:]])

    split(np.arange(t, dtype=np.int32))

    n_clusters = len(clusters)
    order = np.full(n_clusters * CLUSTER_SIZE, -1, np.int32)
    bounds = np.zeros((n_clusters, 8), np.float32)
    for ci, idx in enumerate(clusters):
        order[ci * CLUSTER_SIZE : ci * CLUSTER_SIZE + len(idx)] = idx
        bounds[ci, 0:3] = lo_all[idx].min(axis=0)
        bounds[ci, 4:7] = hi_all[idx].max(axis=0)
    return order, bounds, n_clusters
