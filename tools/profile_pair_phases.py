"""Phase split of the fused pair-walk closest+attrs kernel on a real
bounce wavefront: walk-only vs walk+MT vs walk+MT+attr (production).

Self-contained kernel variants (phases gated by a static flag) so the
production file stays untouched.

Usage: python tools/profile_pair_phases.py [reps]
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


def timeit(label, fn, reps=8):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:46s} med {np.median(ts)*1e3:8.1f} ms  "
          f"min {min(ts)*1e3:7.1f}  max {max(ts)*1e3:7.1f}", flush=True)
    return float(np.median(ts))


def _phase_kernel(n_live_ref, pair_ref, tri_ref, attr_ref, ox, oy, oz,
                  dx, dy, dz, tn, tf, t_out, cnt_out, leaf_buf, stack_ref,
                  *, phase):
    from practical_path_guiding_lab_tpu.ops.pallas.bvh_traverse import (
        LEAF_K, _collect_leaves_pair,
    )
    from practical_path_guiding_lab_tpu.ops.pallas.intersect import (
        _mt_one, _safe_inv,
    )

    step_base = pl.program_id(0) * ox.shape[0] * ox.shape[1]
    shape = ox.shape
    t_out[:] = tf[:]
    cnt_out[:] = jnp.zeros(shape, jnp.float32)

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
        cnt_out[:] = jnp.full(shape, 1.0, jnp.float32) * cnt.astype(jnp.float32)
        if phase == 0:
            return

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

        init = (t_far, jnp.full(shape, -1, jnp.int32),
                jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
        best_t, best_i, best_u, best_v = jax.lax.fori_loop(
            0, cnt, tri_body, init)
        if phase == 1:
            t_out[:] = best_t
            return

        bw = 1.0 - best_u - best_v

        def attr_body(j, acc):
            base = leaf_buf[j]
            blk = tri_ref[pl.ds(base, LEAF_K), :]
            ablk = attr_ref[pl.ds(base, LEAF_K), :]
            for k in range(LEAF_K):
                m = best_i == (base + k)
                ab = ablk[k]
                acc = jnp.where(
                    m, ab[0] * bw + ab[3] * best_u + ab[6] * best_v + blk[k, 9],
                    acc,
                )
            return acc

        acc = jax.lax.fori_loop(0, cnt, attr_body,
                                jnp.zeros(shape, jnp.float32))
        t_out[:] = best_t + 0.0 * acc


def run_phase(pair, tris, attrs, planes, n_live, rows_pad, max_leaves, phase):
    from practical_path_guiding_lab_tpu.ops.pallas.bvh_traverse import POP_W
    from practical_path_guiding_lab_tpu.ops.pallas.intersect import (
        LANE_BLOCK, RAY_ROWS,
    )

    ray_spec = pl.BlockSpec((RAY_ROWS, LANE_BLOCK), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_phase_kernel, phase=phase),
        grid=(rows_pad // RAY_ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [ray_spec] * 8,
        out_specs=[ray_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK), jnp.float32)]
        * 2,
        scratch_shapes=[
            pltpu.SMEM((max(max_leaves, 1) + 1,), jnp.int32),
            pltpu.SMEM((max(256, pair.size // 16 + POP_W),), jnp.int32),
        ],
    )(jnp.asarray(n_live, jnp.int32).reshape(1), pair, tris, attrs, *planes)
    return out


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
    tris = jnp.asarray(scene.tris["bvh_tris"])
    attrs = jnp.asarray(scene.tris["bvh_attr"])
    max_leaves = scene.bvh_n_leaves

    out = run_phase(pair, tris, attrs, planes, n, rows_pad, max_leaves, 0)
    cnts = np.asarray(out[1]).reshape(rows_pad // 8, 8, -1)[:, 0, 0]
    live_steps = (1280 * 720) // (8 * 1024)
    print(f"leaves collected per tile: med {np.median(cnts[:live_steps]):.0f} "
          f"max {cnts[:live_steps].max():.0f}  (of {max_leaves})", flush=True)

    for phase, label in ((0, "walk only"), (1, "walk+MT"),
                         (2, "walk+MT+attr")):
        fn = jax.jit(
            lambda *pl_args, _p=phase: run_phase(
                pair, tris, attrs, pl_args, n, rows_pad, max_leaves, _p
            )
        )
        timeit(label, lambda: fn(*planes), reps)


if __name__ == "__main__":
    main()
