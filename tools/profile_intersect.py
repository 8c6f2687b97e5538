"""Round-3 profiling: intersect() breakdown on a realistic bounce
wavefront (veach-ajar, 1280x720 = 921600 lanes).

Measures (fetch-first warmup per docs/PERF_NOTES.md, block-until-ready,
per-rep wall times):
  1. bvh_closest_hit kernel alone
  2. full intersect() (kernel + attr epilogue)
  3. the attr epilogue alone (row gather + interpolation)
  4. bvh_any_hit kernel alone / occluded()
  5. one full PT bounce (_bounce_step)

Usage: python tools/profile_intersect.py [reps]
"""
from __future__ import annotations

import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

warnings.simplefilter("ignore")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, reps=8):
    out = fn()  # compile + warmup
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts)
    print(
        f"{label:42s} med {np.median(ts)*1e3:8.1f} ms   "
        f"min {ts.min()*1e3:8.1f}   max {ts.max()*1e3:8.1f}"
    )
    return float(np.median(ts))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from practical_path_guiding_lab_tpu.accel.traverse import intersect, occluded
    from practical_path_guiding_lab_tpu.core import rng
    from practical_path_guiding_lab_tpu.ops.pallas.bvh_traverse import (
        bvh_any_hit,
        bvh_closest_hit,
    )
    from practical_path_guiding_lab_tpu.render.path_tracer import (
        _bounce_step,
        _init_state,
    )
    from practical_path_guiding_lab_tpu.scene import load_file
    from practical_path_guiding_lab_tpu.scene.scene import compile_scene

    scene = compile_scene(
        load_file("/root/reference/scenes/veach-ajar/scene.xml",
                  resx=1280, resy=720)
    )
    n = 1280 * 720
    print(f"scene: veach-ajar  lanes={n}  bvh_nodes={scene.bvh_n_nodes} "
          f"leaves={scene.bvh_n_leaves}")

    # build a realistic incoherent bounce wavefront: primary hit points +
    # cosine-ish random directions
    yy, xx = jnp.meshgrid(jnp.arange(720.0), jnp.arange(1280.0), indexing="ij")
    lane_ids = jnp.arange(n, dtype=jnp.int32)
    state = jax.jit(_init_state)(scene, xx.reshape(-1) + 0.5,
                                 yy.reshape(-1) + 0.5, lane_ids)
    si0 = jax.jit(lambda o, d: intersect(scene, o, d))(state["o"], state["d"])
    u1, u2 = rng.uniform2(0, 0, 1, rng.PurposeId.BSDF_SAMPLE, lane_ids)
    phi = 2 * jnp.pi * u1
    ct = jnp.sqrt(u2)
    st = jnp.sqrt(1 - u2)
    # frame around shading normal
    nrm = si0.ns
    a = jnp.where(jnp.abs(nrm[:, 2:3]) < 0.9,
                  jnp.array([[0.0, 0.0, 1.0]]), jnp.array([[1.0, 0.0, 0.0]]))
    t1 = jnp.cross(nrm, a)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(nrm, t1)
    d1 = (t1 * (st * jnp.cos(phi))[:, None] + t2 * (st * jnp.sin(phi))[:, None]
          + nrm * ct[:, None])
    o1 = si0.p + nrm * 1e-4
    o1, d1 = jax.device_put(o1), jax.device_put(d1)
    jax.block_until_ready((o1, d1))
    # force first D2H fetch (axon laziness)
    _ = float(jnp.sum(d1))

    t_near = jnp.full((n,), 1e-4)
    t_far = jnp.full((n,), 1e30)

    nodes, tris = scene.tris["bvh_nodes"], scene.tris["bvh_tris"]
    nn, nl = scene.bvh_n_nodes, scene.bvh_n_leaves

    kern = jax.jit(lambda o, d: bvh_closest_hit(
        nodes, tris, o, d, t_near, t_far, nn, nl))
    t_kern = timeit("bvh_closest_hit kernel (bounce)", lambda: kern(o1, d1), reps)

    full = jax.jit(lambda o, d: intersect(scene, o, d))
    t_full = timeit("intersect() full (bounce)", lambda: full(o1, d1), reps)

    # epilogue alone: feed fixed kernel outputs through the attr path
    tt, slot, tu, tv = jax.block_until_ready(kern(o1, d1))

    def epilogue(tt, slot, tu, tv, o, d):
        ti = jnp.where(slot >= 0, scene.tris["bvh_map"][jnp.maximum(slot, 0)], -1)
        tt = jnp.where(ti >= 0, tt, jnp.inf)
        tid = jnp.maximum(ti, 0)
        w = 1.0 - tu - tv
        row = scene.tris["attr"][tid]
        n0, n1_, n2 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
        ns = n0 * w[:, None] + n1_ * tu[:, None] + n2 * tv[:, None]
        ns = ns / jnp.maximum(jnp.linalg.norm(ns, axis=-1, keepdims=True), 1e-12)
        uv = (row[:, 12:14] * w[:, None] + row[:, 14:16] * tu[:, None]
              + row[:, 16:18] * tv[:, None])
        ng = row[:, 9:12]
        ng = ng / jnp.maximum(jnp.linalg.norm(ng, axis=-1, keepdims=True), 1e-12)
        p_hit = o + d * jnp.where(jnp.isfinite(tt), tt, 0.0)[:, None]
        return ns, uv, ng, p_hit, row[:, 18].astype(jnp.int32)

    epi = jax.jit(epilogue)
    timeit("attr epilogue alone", lambda: epi(tt, slot, tu, tv, o1, d1), reps)

    akern = jax.jit(lambda o, d: bvh_any_hit(
        nodes, tris, o, d, t_near, jnp.full((n,), 0.5), nn, nl))
    timeit("bvh_any_hit kernel (bounce)", lambda: akern(o1, d1), reps)

    occ = jax.jit(lambda o, d: occluded(scene, o, d, jnp.full((n,), 0.5)))
    timeit("occluded() full (bounce)", lambda: occ(o1, d1), reps)

    bounce = lambda: _bounce_step(scene, 0, 0, state)
    timeit("full PT bounce (_bounce_step, primary)", bounce, reps)

    print(f"\nkernel {t_kern*1e3:.1f} ms  full {t_full*1e3:.1f} ms  "
          f"epilogue-ish delta {(t_full-t_kern)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
