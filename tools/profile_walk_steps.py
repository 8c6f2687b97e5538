"""Count pair-walk work per tile on the standard veach-ajar bounce
wavefront: while-loop steps, non-dummy pops, and leaves collected.

Sizes the dummy-pop waste of the POP_W-batched walk (short stacks get
padded with full-price slab tests on the builder's dummy row) and gives
the real visited-node count, so the walk's measured wall-clock can be
compared against a vector-issue bound.

Usage: python tools/profile_walk_steps.py
"""
from __future__ import annotations

import os
import sys
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


def _count_kernel(n_live_ref, pair_ref, ox, oy, oz, dx, dy, dz, tn, tf,
                  out, leaf_buf, stack_ref, *, pop_w):
    from practical_path_guiding_lab_tpu.ops.pallas.bvh_traverse import (
        _slab_scalar6,
    )
    from practical_path_guiding_lab_tpu.ops.pallas.intersect import _safe_inv

    step_base = pl.program_id(0) * RAY_ROWS * LANE_BLOCK
    out[:] = jnp.zeros(ox.shape, jnp.float32)

    @pl.when(step_base < n_live_ref[0])
    def _run():
        dummy = pair_ref.shape[0] // 16 - 1
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        ix, iy, iz = _safe_inv(dx[:]), _safe_inv(dy[:]), _safe_inv(dz[:])
        oix, oiy, oiz = o_x * ix, o_y * iy, o_z * iz
        t_near, t_far = tn[:], tf[:]
        stack_ref[0] = 0

        def cond(carry):
            return carry[0] > 0

        def body(carry):
            sp, cnt, steps, pops = carry
            steps = steps + 1
            pops = pops + jnp.minimum(sp, pop_w)
            idxs = []
            for j in range(pop_w):
                i = stack_ref[jnp.maximum(sp - 1 - j, 0)]
                idxs.append(jnp.where(sp > j, i, dummy) * 16)
            sp = jnp.maximum(sp - pop_w, 0)
            hits = []
            for b in idxs:
                mayL = _slab_scalar6(pair_ref, b, oix, oiy, oiz,
                                     ix, iy, iz, t_near, t_far)
                mayR = _slab_scalar6(pair_ref, b + 6, oix, oiy, oiz,
                                     ix, iy, iz, t_near, t_far)
                hits.append((jnp.any(mayL), jnp.any(mayR)))
            for b, (hitL, hitR) in zip(idxs, hits):
                cl = pair_ref[b + 12].astype(jnp.int32)
                cr = pair_ref[b + 13].astype(jnp.int32)
                leafL = cl < 0
                leafR = cr < 0
                leaf_buf[cnt] = -cl - 1
                cnt = jnp.where(hitL & leafL, cnt + 1, cnt)
                stack_ref[sp] = cl
                sp = jnp.where(hitL & ~leafL, sp + 1, sp)
                leaf_buf[cnt] = -cr - 1
                cnt = jnp.where(hitR & leafR, cnt + 1, cnt)
                stack_ref[sp] = cr
                sp = jnp.where(hitR & ~leafR, sp + 1, sp)
            return sp, cnt, steps, pops

        _, cnt, steps, pops = jax.lax.while_loop(
            cond, body, (jnp.int32(1), jnp.int32(0), jnp.int32(0),
                         jnp.int32(0))
        )
        one = jnp.full((1, LANE_BLOCK), 1.0, jnp.float32)
        out[0:1, :] = one * steps.astype(jnp.float32)
        out[1:2, :] = one * pops.astype(jnp.float32)
        out[2:3, :] = one * cnt.astype(jnp.float32)


def main():
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
    max_leaves = scene.bvh_n_leaves
    n_internal = scene.bvh_n_internal

    ray_spec = pl.BlockSpec((RAY_ROWS, LANE_BLOCK), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    for pop_w in (1, 2, 4):
        out = pl.pallas_call(
            partial(_count_kernel, pop_w=pop_w),
            grid=(rows_pad // RAY_ROWS,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)] + [ray_spec] * 8,
            out_specs=ray_spec,
            out_shape=jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.SMEM((max_leaves + 1,), jnp.int32),
                pltpu.SMEM((max(256, n_internal + pop_w),), jnp.int32),
            ],
        )(jnp.asarray(n, jnp.int32).reshape(1), pair, *planes)
        arr = np.asarray(out)
        n_tiles = n // (RAY_ROWS * LANE_BLOCK)
        steps = arr[0::RAY_ROWS, 0][:n_tiles]
        pops = arr[1::RAY_ROWS, 0][:n_tiles]
        leaves = arr[2::RAY_ROWS, 0][:n_tiles]
        waste = 1.0 - pops / np.maximum(steps * pop_w, 1)
        print(f"POP_W={pop_w}: steps med {np.median(steps):6.0f} "
              f"max {steps.max():6.0f} | nondummy pops med "
              f"{np.median(pops):6.0f} | dummy-slot waste med "
              f"{np.median(waste)*100:4.1f}% | leaves med "
              f"{np.median(leaves):5.0f} max {leaves.max():5.0f}",
              flush=True)


if __name__ == "__main__":
    main()
