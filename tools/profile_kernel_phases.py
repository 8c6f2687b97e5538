"""Phase-level BVH kernel profiling: walk-only vs full kernel, across
tile heights (PPG_RAY_ROWS). Self-contained kernel variants so the
production file stays untouched.

Usage: python tools/profile_kernel_phases.py [reps]
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
    ts = np.array(ts)
    print(f"{label:46s} med {np.median(ts)*1e3:8.1f} ms  "
          f"min {ts.min()*1e3:7.1f}  max {ts.max()*1e3:7.1f}")
    return float(np.median(ts))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from practical_path_guiding_lab_tpu.accel.traverse import intersect
    from practical_path_guiding_lab_tpu.core import rng
    from practical_path_guiding_lab_tpu.ops.pallas.bvh_traverse import (
        bvh_closest_hit,
        _collect_leaves,
    )
    from practical_path_guiding_lab_tpu.ops.pallas.intersect import (
        LANE_BLOCK,
        RAY_ROWS,
        _common_planes,
        _plan,
        _safe_inv,
    )
    from practical_path_guiding_lab_tpu.render.path_tracer import _init_state
    from practical_path_guiding_lab_tpu.scene import load_file
    from practical_path_guiding_lab_tpu.scene.scene import compile_scene

    scene = compile_scene(
        load_file("/root/reference/scenes/veach-ajar/scene.xml",
                  resx=1280, resy=720)
    )
    n = 1280 * 720
    print(f"RAY_ROWS={RAY_ROWS} lanes/step={RAY_ROWS*LANE_BLOCK} "
          f"nodes={scene.bvh_n_nodes} leaves={scene.bvh_n_leaves}")

    yy, xx = jnp.meshgrid(jnp.arange(720.0), jnp.arange(1280.0), indexing="ij")
    lane_ids = jnp.arange(n, dtype=jnp.int32)
    state = jax.jit(_init_state)(scene, xx.reshape(-1) + 0.5,
                                 yy.reshape(-1) + 0.5, lane_ids)
    si0 = jax.jit(lambda o, d: intersect(scene, o, d))(state["o"], state["d"])
    u1, u2 = rng.uniform2(0, 0, 1, rng.PurposeId.BSDF_SAMPLE, lane_ids)
    phi = 2 * jnp.pi * u1
    ct = jnp.sqrt(u2)
    st = jnp.sqrt(1 - u2)
    nrm = si0.ns
    a = jnp.where(jnp.abs(nrm[:, 2:3]) < 0.9,
                  jnp.array([[0.0, 0.0, 1.0]]), jnp.array([[1.0, 0.0, 0.0]]))
    t1 = jnp.cross(nrm, a)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(nrm, t1)
    d1 = (t1 * (st * jnp.cos(phi))[:, None] + t2 * (st * jnp.sin(phi))[:, None]
          + nrm * ct[:, None])
    o1 = si0.p + nrm * 1e-4
    jax.block_until_ready((o1, d1))
    _ = float(jnp.sum(d1))

    t_near = jnp.full((n,), 1e-4)
    t_far = jnp.full((n,), 1e30)
    nodes, tris = scene.tris["bvh_nodes"], scene.tris["bvh_tris"]
    nn, nl = scene.bvh_n_nodes, scene.bvh_n_leaves

    # ---- walk-only kernel: phase 1 only, outputs leaf count per step ----
    def walk_kernel(node_ref, ox, oy, oz, dx, dy, dz, tn, tf, cnt_out,
                    leaf_buf, *, n_nodes):
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        ix, iy, iz = _safe_inv(dx[:]), _safe_inv(dy[:]), _safe_inv(dz[:])
        cnt = _collect_leaves(node_ref, leaf_buf, o_x, o_y, o_z, ix, iy, iz,
                              tn[:], tf[:], n_nodes)
        cnt_out[:] = jnp.full(o_x.shape, 0, jnp.int32) + cnt

    rows_pad, n_pad = _plan(n)
    planes = _common_planes(o1, d1, t_near, t_far, n_pad)
    ray_spec = pl.BlockSpec((RAY_ROWS, LANE_BLOCK), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    walk = pl.pallas_call(
        partial(walk_kernel, n_nodes=nn),
        grid=(rows_pad // RAY_ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 8,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK), jnp.int32),
        scratch_shapes=[pltpu.SMEM((max(nl, 1),), jnp.int32)],
    )
    wfn = jax.jit(lambda: walk(nodes, *planes))
    cnts = jax.block_until_ready(wfn())
    per_step = np.asarray(cnts)[::RAY_ROWS, 0]
    print(f"leaves/step: med {np.median(per_step):.0f} "
          f"min {per_step.min()} max {per_step.max()} steps={len(per_step)}")
    t_walk = timeit("walk-only (bounce)", wfn, reps)

    kern = jax.jit(lambda: bvh_closest_hit(
        nodes, tris, o1, d1, t_near, t_far, nn, nl))
    t_kern = timeit("full closest-hit (bounce)", kern, reps)
    print(f"-> walk {t_walk*1e3:.1f} ms, MT phase ~{(t_kern-t_walk)*1e3:.1f} ms")

    # primary rays for contrast
    planes_p = _common_planes(state["o"], state["d"], t_near, t_far, n_pad)
    wfnp = jax.jit(lambda: walk(nodes, *planes_p))
    cnts = jax.block_until_ready(wfnp())
    per_step = np.asarray(cnts)[::RAY_ROWS, 0]
    print(f"primary leaves/step: med {np.median(per_step):.0f} "
          f"max {per_step.max()}")
    timeit("walk-only (primary)", wfnp, reps)
    kern_p = jax.jit(lambda: bvh_closest_hit(
        nodes, tris, state["o"], state["d"], t_near, t_far, nn, nl))
    timeit("full closest-hit (primary)", kern_p, reps)


def smem_walk_experiment(reps=4):
    """E1: node table in SMEM (scalar loads) instead of VMEM rows."""
    import warnings
    warnings.simplefilter("ignore")
    from practical_path_guiding_lab_tpu.accel.traverse import intersect
    from practical_path_guiding_lab_tpu.core import rng
    from practical_path_guiding_lab_tpu.ops.pallas.intersect import (
        LANE_BLOCK, RAY_ROWS, _common_planes, _plan, _safe_inv,
    )
    from practical_path_guiding_lab_tpu.render.path_tracer import _init_state
    from practical_path_guiding_lab_tpu.scene import load_file
    from practical_path_guiding_lab_tpu.scene.scene import compile_scene

    scene = compile_scene(
        load_file("/root/reference/scenes/veach-ajar/scene.xml",
                  resx=1280, resy=720)
    )
    n = 1280 * 720
    yy, xx = jnp.meshgrid(jnp.arange(720.0), jnp.arange(1280.0), indexing="ij")
    lane_ids = jnp.arange(n, dtype=jnp.int32)
    state = jax.jit(_init_state)(scene, xx.reshape(-1) + 0.5,
                                 yy.reshape(-1) + 0.5, lane_ids)
    si0 = jax.jit(lambda o, d: intersect(scene, o, d))(state["o"], state["d"])
    u1, u2 = rng.uniform2(0, 0, 1, rng.PurposeId.BSDF_SAMPLE, lane_ids)
    phi = 2 * jnp.pi * u1
    ct = jnp.sqrt(u2); st = jnp.sqrt(1 - u2)
    nrm = si0.ns
    a = jnp.where(jnp.abs(nrm[:, 2:3]) < 0.9,
                  jnp.array([[0.0, 0.0, 1.0]]), jnp.array([[1.0, 0.0, 0.0]]))
    t1 = jnp.cross(nrm, a); t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(nrm, t1)
    d1 = (t1 * (st * jnp.cos(phi))[:, None] + t2 * (st * jnp.sin(phi))[:, None]
          + nrm * ct[:, None])
    o1 = si0.p + nrm * 1e-4
    jax.block_until_ready((o1, d1)); _ = float(jnp.sum(d1))
    t_near = jnp.full((n,), 1e-4); t_far = jnp.full((n,), 1e30)
    nodes = scene.tris["bvh_nodes"]
    nn, nl = scene.bvh_n_nodes, scene.bvh_n_leaves

    def walk_kernel_smem(node_ref, ox, oy, oz, dx, dy, dz, tn, tf, cnt_out,
                         leaf_buf, *, n_nodes):
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        ix, iy, iz = _safe_inv(dx[:]), _safe_inv(dy[:]), _safe_inv(dz[:])
        t_near, t_far = tn[:], tf[:]

        def cond(c):
            return c[0] < n_nodes

        def body(c):
            idx, cnt = c
            b = idx * 16
            lo0 = node_ref[b]; lo1 = node_ref[b + 1]; lo2 = node_ref[b + 2]
            hi0 = node_ref[b + 3]; hi1 = node_ref[b + 4]; hi2 = node_ref[b + 5]
            t0 = (lo0 - o_x) * ix; t1 = (hi0 - o_x) * ix
            tmin = jnp.minimum(t0, t1); tmax = jnp.maximum(t0, t1)
            t0 = (lo1 - o_y) * iy; t1 = (hi1 - o_y) * iy
            tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
            tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
            t0 = (lo2 - o_z) * iz; t1 = (hi2 - o_z) * iz
            tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
            tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
            may = (tmax >= tmin) & (tmax > t_near) & (tmin < t_far)
            anyhit = jnp.any(may)
            skip = node_ref[b + 6].astype(jnp.int32)
            base = node_ref[b + 7].astype(jnp.int32)
            is_leaf = base >= 0
            take = anyhit & is_leaf
            leaf_buf[cnt] = base
            cnt2 = jnp.where(take, cnt + 1, cnt)
            idx2 = jnp.where(anyhit & ~is_leaf, idx + 1, skip)
            return idx2, cnt2

        _, cnt = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
        cnt_out[:] = jnp.full(o_x.shape, 0, jnp.int32) + cnt

    rows_pad, n_pad = _plan(n)
    planes = _common_planes(o1, d1, t_near, t_far, n_pad)
    ray_spec = pl.BlockSpec((RAY_ROWS, LANE_BLOCK), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    walk = pl.pallas_call(
        partial(walk_kernel_smem, n_nodes=nn),
        grid=(rows_pad // RAY_ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [ray_spec] * 8,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((rows_pad, LANE_BLOCK), jnp.int32),
        scratch_shapes=[pltpu.SMEM((max(nl, 1),), jnp.int32)],
    )
    nodes_flat = nodes.reshape(-1)
    wfn = jax.jit(lambda: walk(nodes_flat, *planes))
    jax.block_until_ready(wfn())
    timeit("walk-only SMEM nodes (bounce)", wfn, reps)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "smem":
        smem_walk_experiment(int(sys.argv[1]))
    else:
        main()
