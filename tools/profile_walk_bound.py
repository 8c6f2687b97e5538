"""Isolate what bounds the pair walk: per-trip control-flow overhead vs
vector slab work vs the any() vector->scalar reductions.

Variants, all doing 30 while-trips x POP_W=4 pops of 2 slab tests over an
(8,1024) tile (the measured real walk volume on the bounce wavefront):
  A. real walk (dynamic: scalar stack, data-dependent SMEM rows, any())
  B. static rows + any() feeding a scalar accumulator (no stack logic)
  C. static rows, NO any(): hits accumulated as vectors (pure vector work)
  D. empty while loop, same trip count (pure per-trip overhead)

Usage: python tools/profile_walk_bound.py [reps]
"""
from __future__ import annotations

import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.simplefilter("ignore")

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_ROWS = 8
LANE_BLOCK = 1024
TRIPS = 30
POP_W = 4


def timeit(label, fn, reps=8):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:52s} med {np.median(ts)*1e3:8.2f} ms", flush=True)
    return float(np.median(ts))


def _kernel(n_live_ref, pair_ref, ox, oy, oz, dx, dy, dz, tn, tf,
            out, stack_ref, *, variant):
    from practical_path_guiding_lab_tpu.ops.pallas.bvh_traverse import (
        _slab_scalar6,
    )
    from practical_path_guiding_lab_tpu.ops.pallas.intersect import _safe_inv

    out[:] = jnp.zeros(ox.shape, jnp.float32)

    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    ix, iy, iz = _safe_inv(dx[:]), _safe_inv(dy[:]), _safe_inv(dz[:])
    oix, oiy, oiz = o_x * ix, o_y * iy, o_z * iz
    t_near, t_far = tn[:], tf[:]
    n_rows = pair_ref.shape[0] // 16

    if variant == "D":  # empty loop, same trips
        def body(c):
            return c[0] - 1, c[1] + 1

        trips, acc = jax.lax.while_loop(lambda c: c[0] > 0, body,
                                        (jnp.int32(TRIPS), jnp.int32(0)))
        out[0:1, :] = jnp.full((1, LANE_BLOCK), 1.0) * acc.astype(jnp.float32)
        return

    if variant in ("B", "C"):
        def body(c):
            k, acc_s, acc_v = c
            accs = acc_s
            accv = acc_v
            for j in range(POP_W):
                b = ((k * POP_W + j) % (n_rows - 1)) * 16
                mayL = _slab_scalar6(pair_ref, b, oix, oiy, oiz,
                                     ix, iy, iz, t_near, t_far)
                mayR = _slab_scalar6(pair_ref, b + 6, oix, oiy, oiz,
                                     ix, iy, iz, t_near, t_far)
                if variant == "B":
                    accs = accs + jnp.any(mayL).astype(jnp.int32)
                    accs = accs + jnp.any(mayR).astype(jnp.int32)
                else:
                    accv = accv + mayL.astype(jnp.float32)
                    accv = accv + mayR.astype(jnp.float32)
            return k + 1, accs, accv

        k, acc_s, acc_v = jax.lax.while_loop(
            lambda c: c[0] < TRIPS, body,
            (jnp.int32(0), jnp.int32(0),
             jnp.zeros(ox.shape, jnp.float32)))
        out[:] = acc_v + acc_s.astype(jnp.float32)
        return

    # variant A: the real walk
    from practical_path_guiding_lab_tpu.ops.pallas.bvh_traverse import (
        _collect_leaves_pair,
    )
    leaf_buf = stack_ref  # reuse: stack sized generously
    cnt = _collect_leaves_pair(pair_ref, stack_ref, leaf_buf,
                               oix, oiy, oiz, ix, iy, iz, t_near, t_far)
    out[0:1, :] = jnp.full((1, LANE_BLOCK), 1.0) * cnt.astype(jnp.float32)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from practical_path_guiding_lab_tpu.accel.traverse import intersect
    from practical_path_guiding_lab_tpu.core import rng
    from practical_path_guiding_lab_tpu.ops.pallas.intersect import (
        _common_planes, _plan,
    )
    from practical_path_guiding_lab_tpu.render.path_tracer import _init_state
    from practical_path_guiding_lab_tpu.scene import load_file
    from practical_path_guiding_lab_tpu.scene.scene import compile_scene

    scene = compile_scene(
        load_file("/root/reference/scenes/veach-ajar/scene.xml",
                  resx=1280, resy=720)
    )
    n = 1280 * 720
    yy, xx = jnp.meshgrid(jnp.arange(720.0), jnp.arange(1280.0),
                          indexing="ij")
    lane_ids = jnp.arange(n, dtype=jnp.int32)
    state = jax.jit(_init_state)(scene, xx.reshape(-1) + 0.5,
                                 yy.reshape(-1) + 0.5, lane_ids)
    si0 = jax.jit(lambda o, d: intersect(scene, o, d))(
        state["o"], state["d"])
    u1, u2 = rng.uniform2(0, 0, 1, rng.PurposeId.BSDF_SAMPLE, lane_ids)
    phi = 2 * jnp.pi * u1
    ct = jnp.sqrt(u2)
    st = jnp.sqrt(1 - u2)
    nrm = si0.ns
    a = jnp.where(jnp.abs(nrm[:, 2:3]) < 0.9,
                  jnp.array([[0.0, 0.0, 1.0]]),
                  jnp.array([[1.0, 0.0, 0.0]]))
    t1 = jnp.cross(nrm, a)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(nrm, t1)
    d = (t1 * (jnp.cos(phi) * st)[:, None] + t2 * (jnp.sin(phi) * st)[:, None]
         + nrm * ct[:, None])
    o = si0.p + nrm * 1e-4

    rows_pad, n_pad = _plan(n)
    planes = _common_planes(o, d, jnp.full((n,), 1e-4),
                            jnp.full((n,), 1e30), n_pad)
    planes = [jax.device_put(p) for p in planes]
    pair = jnp.asarray(scene.tris["bvh_pair"])
    n_internal = scene.bvh_n_internal

    ray_spec = pl.BlockSpec((RAY_ROWS, LANE_BLOCK), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def run(variant):
        return pl.pallas_call(
            partial(_kernel, variant=variant),
            grid=(rows_pad // RAY_ROWS,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)] + [ray_spec] * 8,
            out_specs=ray_spec,
            out_shape=jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.SMEM((max(4096, 2 * n_internal + 64),), jnp.int32),
            ],
        )(jnp.asarray(n, jnp.int32).reshape(1), pair, *planes)

    for v, label in (("A", "real walk (dynamic stack + any)"),
                     ("B", "static rows + any -> scalar acc"),
                     ("C", "static rows, vector acc (no any)"),
                     ("D", "empty while loop, 30 trips")):
        fn = jax.jit(lambda v=v: run(v))
        timeit(f"{v}: {label}", fn, reps)


if __name__ == "__main__":
    main()
