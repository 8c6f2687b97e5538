"""BVH builder/traversal differential tests vs brute force (the builder is
round-2 groundwork; the reference's analog is OptiX's BVH behind
scene.ray_intersect, path_guiding_integrator.py:185)."""
import numpy as np
import jax.numpy as jnp

from practical_path_guiding_lab_tpu.accel import bvh as B


def _random_tris(n, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    base = rng.random((n, 3)).astype(np.float32) * 4 - 2
    e1 = (rng.random((n, 3)).astype(np.float32) - 0.5) * scale
    e2 = (rng.random((n, 3)).astype(np.float32) - 0.5) * scale
    return base, base + e1, base + e2


def _brute(o, d, v0, v1, v2):
    """numpy closest hit over all tris for each ray."""
    eps = 1e-4
    t_best = np.full(len(o), np.inf, np.float32)
    prim = np.full(len(o), -1, np.int32)
    for j in range(len(v0)):
        e1 = v1[j] - v0[j]
        e2 = v2[j] - v0[j]
        p = np.cross(d, e2)
        det = p @ e1
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1), 0.0)
        s = o - v0[j]
        u = np.einsum("ij,ij->i", s, p) * inv
        q = np.cross(s, e1)
        v = np.einsum("ij,ij->i", d, q) * inv
        t = (q @ e2) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > eps) & (t < t_best)
        t_best = np.where(hit, t, t_best)
        prim = np.where(hit, j, prim)
    return t_best, prim


def test_bvh_structure_valid():
    v0, v1, v2 = _random_tris(500, seed=1)
    bvh = B.build_bvh(v0, v1, v2)
    n = len(bvh["right"])
    # every triangle appears exactly once in order
    assert sorted(bvh["order"].tolist()) == list(range(500))
    # leaves cover [0, T) disjointly
    leaves = np.where(bvh["right"] < 0)[0]
    spans = sorted(
        (int(bvh["start"][i]), int(bvh["count"][i])) for i in leaves
    )
    pos = 0
    for s, c in spans:
        assert s == pos and c > 0
        pos += c
    assert pos == 500
    # children bboxes inside parent
    for i in range(n):
        r = bvh["right"][i]
        if r >= 0:
            for ch in (i + 1, r):
                assert np.all(bvh["node_lo"][ch] >= bvh["node_lo"][i] - 1e-5)
                assert np.all(bvh["node_hi"][ch] <= bvh["node_hi"][i] + 1e-5)
    assert B.bvh_depth(bvh) * 2 + 2 <= B.MAX_STACK


def test_bvh_matches_brute_force():
    v0, v1, v2 = _random_tris(300, seed=2, scale=0.8)
    bvh = B.build_bvh(v0, v1, v2)
    order = bvh["order"]
    s0, s1, s2 = v0[order], v1[order], v2[order]
    trav = B.make_traverser(
        bvh, jnp.asarray(s0), jnp.asarray(s1), jnp.asarray(s2),
        max_leaf=int(bvh["count"].max()),
    )
    rng = np.random.default_rng(3)
    m = 400
    o = (rng.random((m, 3)).astype(np.float32) * 6 - 3)
    d = rng.normal(size=(m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t, prim, u, v = trav(
        jnp.asarray(o), jnp.asarray(d), jnp.full(m, np.inf, np.float32)
    )
    t = np.asarray(t)
    prim = np.asarray(prim)
    tb, pb = _brute(o, d, s0, s1, s2)
    hit_a = prim >= 0
    hit_b = pb >= 0
    assert np.array_equal(hit_a, hit_b)
    assert np.allclose(t[hit_a], tb[hit_b], rtol=1e-4, atol=1e-5)
    # same primitive except exact-tie cases
    assert (prim[hit_a] == pb[hit_b]).mean() > 0.99
