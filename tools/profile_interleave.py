"""Interleaved pair-walk experiment (round 3): run IL independent
full-size (8,1024) tile walks per kernel instance so each walk's
per-step vector->scalar roundtrips (the two any() reductions + scalar
stack pushes) overlap with the other walks' vector work.

Hypothesis: the walk is serialized on those roundtrips (its arithmetic
is ~10x below VPU peak), so IL=2/4 should cut walk wall-clock nearly
proportionally; if it's flat, the walk is genuinely vector/data-bound
and the lever is dead (like the tile-height experiment).

Self-contained kernel (production untouched). Measures walk-only and
walk+MT on the standard veach-ajar bounce wavefront.

Usage: python tools/profile_interleave.py [reps]
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

SUB_ROWS = 8  # rows per walk (the production tile height)
LANE_BLOCK = 1024


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


def _il_kernel(n_live_ref, pair_ref, tri_ref, ox, oy, oz,
               dx, dy, dz, tn, tf, t_out, leaf_buf, stack_ref,
               *, il, phase, pop_w, leaf_stride, stack_stride):
    from practical_path_guiding_lab_tpu.ops.pallas.bvh_traverse import (
        LEAF_K, _slab_scalar6,
    )
    from practical_path_guiding_lab_tpu.ops.pallas.intersect import (
        _mt_one, _safe_inv,
    )

    step_base = pl.program_id(0) * il * SUB_ROWS * LANE_BLOCK
    t_out[:] = tf[:]

    @pl.when(step_base < n_live_ref[0])
    def _run():
        dummy = pair_ref.shape[0] // 16 - 1
        subs = []
        for w in range(il):
            r0 = w * SUB_ROWS
            o_x = ox[r0:r0 + SUB_ROWS, :]
            o_y = oy[r0:r0 + SUB_ROWS, :]
            o_z = oz[r0:r0 + SUB_ROWS, :]
            d_x = dx[r0:r0 + SUB_ROWS, :]
            d_y = dy[r0:r0 + SUB_ROWS, :]
            d_z = dz[r0:r0 + SUB_ROWS, :]
            ix, iy, iz = _safe_inv(d_x), _safe_inv(d_y), _safe_inv(d_z)
            subs.append((o_x * ix, o_y * iy, o_z * iz, ix, iy, iz,
                         tn[r0:r0 + SUB_ROWS, :], tf[r0:r0 + SUB_ROWS, :],
                         o_x, o_y, o_z, d_x, d_y, d_z))
            stack_ref[w * stack_stride] = 0

        def cond(carry):
            alive = carry[0][0] > 0
            for w in range(1, il):
                alive = alive | (carry[w][0] > 0)
            return alive

        def body(carry):
            out = []
            for w in range(il):
                sp, cnt = carry[w]
                oix, oiy, oiz, ix, iy, iz, t_near, t_far = subs[w][:8]
                sbase = w * stack_stride
                lbase = w * leaf_stride
                idxs = []
                for j in range(pop_w):
                    i = stack_ref[sbase + jnp.maximum(sp - 1 - j, 0)]
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
                    leaf_buf[lbase + cnt] = -cl - 1
                    cnt = jnp.where(hitL & leafL, cnt + 1, cnt)
                    stack_ref[sbase + sp] = cl
                    sp = jnp.where(hitL & ~leafL, sp + 1, sp)
                    leaf_buf[lbase + cnt] = -cr - 1
                    cnt = jnp.where(hitR & leafR, cnt + 1, cnt)
                    stack_ref[sbase + sp] = cr
                    sp = jnp.where(hitR & ~leafR, sp + 1, sp)
                out.append((sp, cnt))
            return tuple(out)

        init = tuple((jnp.int32(1), jnp.int32(0)) for _ in range(il))
        final = jax.lax.while_loop(cond, body, init)

        if phase == 0:
            # touch the counts so the walk isn't dead-code-eliminated
            acc = final[0][1]
            for w in range(1, il):
                acc = acc + final[w][1]
            t_out[:] = jnp.full(ox.shape, 1.0, jnp.float32) * acc.astype(
                jnp.float32)
            return

        for w in range(il):
            cnt = final[w][1]
            lbase = w * leaf_stride
            (_, _, _, _, _, _, t_near, t_far,
             o_x, o_y, o_z, d_x, d_y, d_z) = subs[w]

            def tri_body(j, carry):
                best_t, best_i = carry
                base = leaf_buf[lbase + j]
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
                return best_t, best_i

            init_w = (t_far, jnp.full(o_x.shape, -1, jnp.int32))
            best_t, best_i = jax.lax.fori_loop(0, cnt, tri_body, init_w)
            r0 = w * SUB_ROWS
            t_out[r0:r0 + SUB_ROWS, :] = best_t


def run_il(pair, tris, planes, n_live, max_leaves, n_internal, il, phase,
           pop_w=4):
    rows = planes[0].shape[0]
    block_rows = il * SUB_ROWS
    rows_pad = -(-rows // block_rows) * block_rows
    if rows_pad != rows:
        planes = [
            jnp.concatenate(
                [p, jnp.full((rows_pad - rows, LANE_BLOCK),
                             1.0 if i == 5 else (-1.0 if i == 7 else 0.0),
                             p.dtype)]
            )
            for i, p in enumerate(planes)
        ]
    leaf_stride = max_leaves + 1
    stack_stride = max(256, n_internal + pop_w)
    ray_spec = pl.BlockSpec((block_rows, LANE_BLOCK), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_il_kernel, il=il, phase=phase, pop_w=pop_w,
                leaf_stride=leaf_stride, stack_stride=stack_stride),
        grid=(rows_pad // block_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [ray_spec] * 8,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((il * leaf_stride,), jnp.int32),
            pltpu.SMEM((il * stack_stride,), jnp.int32),
        ],
    )(jnp.asarray(n_live, jnp.int32).reshape(1), pair, tris, *planes)
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
    max_leaves = scene.bvh_n_leaves
    n_internal = scene.bvh_n_internal

    # correctness: IL=2 walk+MT t must equal IL=1 walk+MT t on live lanes
    ref = np.asarray(run_il(pair, tris, planes, n, max_leaves, n_internal,
                            1, 1).reshape(-1)[:n])
    for il in (2, 4):
        got = np.asarray(run_il(pair, tris, planes, n, max_leaves,
                                n_internal, il, 1).reshape(-1)[:n])
        ok = np.array_equal(ref, got)
        print(f"IL={il} walk+MT closest-t equality vs IL=1: {ok}",
              flush=True)
        assert ok

    for phase, label in ((0, "walk only"), (1, "walk+MT")):
        for il in (1, 2, 4):
            fn = jax.jit(
                lambda il=il, phase=phase: run_il(
                    pair, tris, planes, n, max_leaves, n_internal, il, phase
                )
            )
            timeit(f"IL={il} {label}", fn, reps)
    # pop-width interaction at the winning interleave
    for pop_w in (2, 4):
        for il in (2, 4):
            fn = jax.jit(
                lambda il=il, pop_w=pop_w: run_il(
                    pair, tris, planes, n, max_leaves, n_internal, il, 0,
                    pop_w=pop_w,
                )
            )
            timeit(f"IL={il} walk only POP_W={pop_w}", fn, reps)


if __name__ == "__main__":
    main()
