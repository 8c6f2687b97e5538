"""On-TPU veach-mis divergence probe (round 5): the full-res driver runs
render ~68x-bright splotches (exact small-emitter radiance) on wall
pixels at the image top; the CPU path and the interpret-mode kernel are
both correct. Localize the TPU-only divergence: compare one PT pass and
its components TPU-vs-reference at 320x180.

Usage (chip must be free): python tools/probe_mis_tpu.py
"""
import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.simplefilter("ignore")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from practical_path_guiding_lab_tpu.scene import load_file
    from practical_path_guiding_lab_tpu.scene.scene import compile_scene
    from practical_path_guiding_lab_tpu.scene.camera import generate_rays
    from practical_path_guiding_lab_tpu.accel import traverse as tr

    desc = load_file(
        "/root/reference/scenes/veach-mis/scene.xml", resx=320, resy=180
    )
    scene = compile_scene(desc)
    w, h = 320, 180
    n = w * h
    yy, xx = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                         indexing="ij")
    ray = generate_rays(
        scene.camera,
        jnp.asarray(xx.reshape(-1) / w, jnp.float32),
        jnp.asarray(yy.reshape(-1) / h, jnp.float32),
    )
    tn = jnp.full((n,), 1e-4)
    tf = jnp.full((n,), 1e30)

    # 1. kernel vs XLA scan (triangle ids) ON TPU
    from practical_path_guiding_lab_tpu.ops.pallas.bvh_traverse import (
        bvh_closest_hit_attrs,
    )

    res = bvh_closest_hit_attrs(
        scene.tris["bvh_pair"], scene.tris["bvh_tris"],
        scene.tris["bvh_attr"], ray.o, ray.d, tn, tf, scene.bvh_n_leaves,
    )
    tt, ti, tu, tv = tr._scan_triangles(ray.o, ray.d, scene.tris, tn, tf)
    ti_k = np.asarray(res["id"])
    ti_s = np.asarray(ti)
    agree = (ti_k == ti_s).mean()
    print(f"[1] kernel-vs-scan tri id agreement on TPU: {agree:.6f}",
          flush=True)
    if agree < 1.0:
        bad = np.nonzero(ti_k != ti_s)[0]
        print("    first disagreements:", bad[:10],
              ti_k[bad[:10]], ti_s[bad[:10]])
        ys, xs2 = bad // w, bad % w
        print("    rows", ys.min(), ys.max(), "cols", xs2.min(), xs2.max())

    # 2. kernel attr columns (mat/em) vs host attr table
    attr = np.asarray(scene.tris["attr"])
    tid = np.maximum(ti_s, 0)
    mat_ref = attr[tid, 18].astype(np.int32)
    em_ref = attr[tid, 19].astype(np.int32)
    mk = np.asarray(res["mat"]).astype(np.int32)
    ek = np.asarray(res["em"]).astype(np.int32)
    hit = ti_s >= 0
    print(f"[2] mat agree {np.mean(mk[hit]==mat_ref[hit]):.6f} "
          f"em agree {np.mean(ek[hit]==em_ref[hit]):.6f}", flush=True)

    # 3. sphere intersect on TPU vs numpy oracle
    st, si_ = tr._intersect_spheres(ray.o, ray.d, scene.spheres, tn, tf)
    o_np = np.asarray(ray.o, np.float64)
    d_np = np.asarray(ray.d, np.float64)
    c = np.asarray(scene.spheres["center"], np.float64)
    r = np.asarray(scene.spheres["radius"], np.float64)
    oc = o_np[:, None, :] - c[None]
    b = np.sum(oc * d_np[:, None, :], axis=-1)
    disc = b * b - (np.sum(oc * oc, axis=-1) - (r * r)[None])
    ok = disc > 0
    sq = np.sqrt(np.maximum(disc, 0))
    t0 = -b - sq
    t1 = -b + sq
    t_np = np.where(t0 > 1e-4, t0, t1)
    ok = ok & (t_np > 1e-4)
    t_np = np.where(ok, t_np, np.inf)
    j = np.argmin(t_np, axis=-1)
    hit_np = np.isfinite(t_np[np.arange(n), j])
    hit_tpu = np.asarray(si_) >= 0
    print(f"[3] sphere hit agreement: {np.mean(hit_np == hit_tpu):.6f} "
          f"(np {hit_np.sum()} vs tpu {hit_tpu.sum()})", flush=True)

    # 4. one full PT pass TPU vs stored CPU result
    from practical_path_guiding_lab_tpu.render.path_tracer import (
        render_pass_auto,
    )

    L, px, py, rays = render_pass_auto(scene, 0, 0)
    L = np.asarray(L)
    np.save("/tmp/mis_tpu_pass.npy", L)
    print(f"[4] TPU 1-spp pass mean {L.mean():.4f} max {L.max():.1f} "
          f"lanes>1000: {(L.max(axis=-1) > 1000).sum()}", flush=True)
    big = np.nonzero(L.max(axis=-1) > 1000)[0]
    ys, xs2 = big // w, big % w
    if len(big):
        print("    bright lanes rows", ys.min(), ys.max(),
              "cols", xs2.min(), xs2.max(), "count", len(big))
        i = big[0]
        print("    example lane", i, "px", (xs2[0], ys[0]), "L", L[i])


if __name__ == "__main__":
    main()
