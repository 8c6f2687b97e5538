"""Pallas kernel parity in CI via ``pallas_call(..., interpret=True)``.

The TPU kernels (ops/pallas) never execute on the CPU backend, so without
these tests kernel regressions would only surface on real hardware. Each
kernel runs in interpreter mode against the pure-XLA `_scan_triangles`
oracle on (a) a random triangle soup with random rays and (b) a real
camera wavefront of the cornell-box scene.
"""
from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from practical_path_guiding_lab_tpu.accel.traverse import _scan_triangles
from practical_path_guiding_lab_tpu.ops.pallas.bvh_traverse import (
    build_bvh_tables,
    bvh_any_hit,
    bvh_closest_hit,
)
from practical_path_guiding_lab_tpu.ops.pallas.intersect import (
    CLUSTER_SIZE,
    build_clustered_soa,
    build_tri_soa,
    pallas_any_hit,
    pallas_any_hit_clustered,
    pallas_closest_hit,
    pallas_closest_hit_clustered,
)


def _random_soup(n_tris=57, seed=3):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-2, 2, (n_tris, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.8, 0.8, (n_tris, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.8, 0.8, (n_tris, 3)).astype(np.float32)
    return v0, v1, v2


def _random_rays(n=700, seed=5):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _scan_tris_dict(v0, v1, v2):
    from practical_path_guiding_lab_tpu.accel.traverse import TRI_BLOCK

    t = len(v0)
    pad = (-t) % TRI_BLOCK if t else TRI_BLOCK
    pad3 = lambda a: np.concatenate([a, np.zeros((pad, 3), np.float32)])
    v0p, v1p, v2p = pad3(v0), pad3(v1), pad3(v2)
    nb = len(v0p) // TRI_BLOCK
    return {
        "v0b": jnp.asarray(v0p.reshape(nb, TRI_BLOCK, 3)),
        "e1b": jnp.asarray((v1p - v0p).reshape(nb, TRI_BLOCK, 3)),
        "e2b": jnp.asarray((v2p - v0p).reshape(nb, TRI_BLOCK, 3)),
    }


@pytest.fixture(scope="module")
def soup():
    v0, v1, v2 = _random_soup()
    o, d = _random_rays()
    n = o.shape[0]
    t_near = jnp.full((n,), 1e-4)
    t_far = jnp.full((n,), 1e30)
    rt, rp, ru, rv = _scan_triangles(
        o, d, _scan_tris_dict(v0, v1, v2), t_near, jnp.full((n,), jnp.inf)
    )
    return v0, v1, v2, o, d, t_near, t_far, np.asarray(rt), np.asarray(rp)


def _check(t, prim, rt, rp):
    t, prim = np.asarray(t), np.asarray(prim)
    assert ((prim >= 0) == (rp >= 0)).all()
    m = prim >= 0
    assert np.allclose(t[m], rt[m], rtol=1e-4, atol=1e-5)
    # same primitive except exact-tie cases
    agree = (prim[m] == rp[m]).mean()
    assert agree > 0.99


def test_brute_closest_interpret(soup):
    v0, v1, v2, o, d, t_near, t_far, rt, rp = soup
    soa = build_tri_soa(v0, v1, v2)
    t, i, u, v = pallas_closest_hit(
        jnp.asarray(soa), o, d, t_near, t_far, soa.shape[0], interpret=True
    )
    _check(t, i, rt, rp)


def test_clustered_closest_interpret(soup):
    v0, v1, v2, o, d, t_near, t_far, rt, rp = soup
    soa_c, bounds, cmap, nc = build_clustered_soa(v0, v1, v2)
    t, slot, u, v = pallas_closest_hit_clustered(
        jnp.asarray(soa_c), jnp.asarray(bounds), o, d, t_near, t_far, nc,
        interpret=True,
    )
    prim = jnp.where(slot >= 0, jnp.asarray(cmap)[jnp.maximum(slot, 0)], -1)
    _check(t, prim, rt, rp)


def test_bvh_closest_interpret(soup):
    v0, v1, v2, o, d, t_near, t_far, rt, rp = soup
    nodes, tris, smap, nn, nl, pair, npair = build_bvh_tables(v0, v1, v2)
    t, slot, u, v = bvh_closest_hit(
        jnp.asarray(nodes), jnp.asarray(tris), o, d, t_near, t_far, nn, nl,
        interpret=True,
    )
    prim = jnp.where(slot >= 0, jnp.asarray(smap)[jnp.maximum(slot, 0)], -1)
    _check(t, prim, rt, rp)


def test_any_hit_kernels_interpret(soup):
    v0, v1, v2, o, d, t_near, _, rt, rp = soup
    n = o.shape[0]
    t_far = jnp.full((n,), 2.0)
    oracle = np.asarray(
        _scan_triangles(
            o, d, _scan_tris_dict(v0, v1, v2), t_near, t_far, any_hit=True
        )
    )
    soa = build_tri_soa(v0, v1, v2)
    hb = pallas_any_hit(
        jnp.asarray(soa), o, d, t_near, t_far, soa.shape[0], interpret=True
    )
    assert (np.asarray(hb) == oracle).all()
    soa_c, bounds, cmap, nc = build_clustered_soa(v0, v1, v2)
    hc = pallas_any_hit_clustered(
        jnp.asarray(soa_c), jnp.asarray(bounds), o, d, t_near, t_far, nc,
        interpret=True,
    )
    assert (np.asarray(hc) == oracle).all()
    nodes, tris, smap, nn, nl, pair, npair = build_bvh_tables(v0, v1, v2)
    hv = bvh_any_hit(
        jnp.asarray(nodes), jnp.asarray(tris), o, d, t_near, t_far, nn, nl,
        interpret=True,
    )
    assert (np.asarray(hv) == oracle).all()
    from practical_path_guiding_lab_tpu.ops.pallas.bvh_traverse import (
        bvh_any_hit_pair,
    )

    hp = bvh_any_hit_pair(
        jnp.asarray(pair), jnp.asarray(tris), o, d, t_near, t_far, nl,
        interpret=True,
    )
    assert (np.asarray(hp) == oracle).all()


def test_bvh_camera_wavefront_interpret(cornell_small):
    """Real camera wavefront on cornell-box: BVH kernel vs scan oracle."""
    scene = cornell_small
    from practical_path_guiding_lab_tpu.scene.camera import generate_rays

    w, h = scene.camera.width, scene.camera.height
    yy, xx = np.meshgrid(
        np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij"
    )
    sx = (xx.reshape(-1) / w).astype(np.float32)
    sy = (yy.reshape(-1) / h).astype(np.float32)
    ray = generate_rays(scene.camera, jnp.asarray(sx), jnp.asarray(sy))
    n = ray.o.shape[0]
    t_near = jnp.full((n,), 1e-4)
    rt, rp, _, _ = _scan_triangles(
        ray.o, ray.d, scene.tris, t_near, jnp.full((n,), jnp.inf)
    )
    t, slot, _, _ = bvh_closest_hit(
        scene.tris["bvh_nodes"], scene.tris["bvh_tris"], ray.o, ray.d,
        t_near, jnp.full((n,), 1e30), scene.bvh_n_nodes, scene.bvh_n_leaves,
        interpret=True,
    )
    prim = jnp.where(
        slot >= 0, scene.tris["bvh_map"][jnp.maximum(slot, 0)], -1
    )
    _check(t, prim, np.asarray(rt), np.asarray(rp))


def test_bvh_n_live_watermark(soup):
    """Lanes beyond the live watermark are skipped wholesale."""
    v0, v1, v2, o, d, t_near, t_far, rt, rp = soup
    nodes, tris, smap, nn, nl, pair, npair = build_bvh_tables(v0, v1, v2)
    t, slot, _, _ = bvh_closest_hit(
        jnp.asarray(nodes), jnp.asarray(tris), o, d, t_near, t_far, nn, nl,
        n_live=jnp.int32(0), interpret=True,
    )
    assert (np.asarray(slot) == -1).all()


def test_bvh_attrs_kernel_matches_epilogue(cornell_small):
    """Fused closest-hit+attrs kernel == old kernel + XLA gather epilogue
    on a real camera wavefront (round-3 lever 1)."""
    from practical_path_guiding_lab_tpu.ops.pallas.bvh_traverse import (
        bvh_closest_hit_attrs,
    )
    from practical_path_guiding_lab_tpu.scene.camera import generate_rays

    scene = cornell_small
    w, h = scene.camera.width, scene.camera.height
    yy, xx = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij")
    sx = (xx.reshape(-1) / w).astype(np.float32)
    sy = (yy.reshape(-1) / h).astype(np.float32)
    ray = generate_rays(scene.camera, jnp.asarray(sx), jnp.asarray(sy))
    n = ray.o.shape[0]
    t_near = jnp.full((n,), 1e-4)
    t_far = jnp.full((n,), 1e30)

    t0, slot, tu, tv = bvh_closest_hit(
        scene.tris["bvh_nodes"], scene.tris["bvh_tris"], ray.o, ray.d,
        t_near, t_far, scene.bvh_n_nodes, scene.bvh_n_leaves, interpret=True,
    )
    ti = np.asarray(
        jnp.where(slot >= 0, scene.tris["bvh_map"][jnp.maximum(slot, 0)], -1)
    )
    # old epilogue (reference for attrs)
    tu, tv = np.asarray(tu), np.asarray(tv)
    wgt = 1.0 - tu - tv
    row = np.asarray(scene.tris["attr"])[np.maximum(ti, 0)]
    ns_ref = row[:, 0:3] * wgt[:, None] + row[:, 3:6] * tu[:, None] + row[:, 6:9] * tv[:, None]
    uv_ref = row[:, 12:14] * wgt[:, None] + row[:, 14:16] * tu[:, None] + row[:, 16:18] * tv[:, None]

    res = bvh_closest_hit_attrs(
        scene.tris["bvh_pair"], scene.tris["bvh_tris"],
        scene.tris["bvh_attr"], ray.o, ray.d, t_near, t_far,
        scene.bvh_n_leaves, interpret=True,
    )
    rid = np.asarray(res["id"])
    m = ti >= 0
    assert ((rid >= 0) == m).all()
    # identical winning triangle except exact-tie cases
    agree = (rid[m] == ti[m])
    assert agree.mean() > 0.99
    am = m & (rid == ti)
    assert np.allclose(np.asarray(res["t"])[am], np.asarray(t0)[am],
                       rtol=1e-4, atol=1e-5)
    assert np.allclose(np.asarray(res["ns"])[am], ns_ref[am],
                       rtol=1e-3, atol=1e-4)
    assert np.allclose(np.asarray(res["ng"])[am], row[:, 9:12][am],
                       rtol=1e-4, atol=1e-5)
    assert np.allclose(np.asarray(res["uv"])[am], uv_ref[am],
                       rtol=1e-3, atol=1e-4)
    assert (np.asarray(res["mat"])[am] == row[:, 18].astype(np.int32)[am]).all()
    assert (np.asarray(res["em"])[am] == row[:, 19].astype(np.int32)[am]).all()
