"""Guided-pass component profile at 1280x720 (veach-ajar): trace with
record on/off, splat, moments/develop — finds where the guided-vs-PT gap
lives (bench r3: guided train 7.2 s vs PT 2.13 s).

Usage: python tools/profile_guided.py [reps]
"""
from __future__ import annotations

import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.simplefilter("ignore")

import numpy as np
import jax


def timeit(label, fn, reps=4):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:44s} med {np.median(ts)*1e3:8.0f} ms  "
          f"min {min(ts)*1e3:7.0f}", flush=True)
    return float(np.median(ts))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from practical_path_guiding_lab_tpu.render.guided import (
        _splat_jit,
        guided_wavefront_pass,
    )
    from practical_path_guiding_lab_tpu.render.integrator import (
        PathGuidingIntegrator,
        develop_pass_image,
    )
    from practical_path_guiding_lab_tpu.render import variance as var_mod
    from practical_path_guiding_lab_tpu.scene import load_file
    from practical_path_guiding_lab_tpu.scene.scene import compile_scene

    scene = compile_scene(
        load_file("/root/reference/scenes/veach-ajar/scene.xml",
                  resx=1280, resy=720)
    )
    integ = PathGuidingIntegrator(scene)
    integ.setup()
    spp = 0
    for iteration, passes in ((1, 2), (2, 4)):
        integ.setIteration(iteration, False)
        for p in range(passes):
            integ.render_pass(0, spp)
            spp += 1
        integ.refineAndPrepareSDTreeForNextIteration()
    print(f"tree: kd={integ.tree_prev.kd_count} quad={integ.tree_prev.q_count}",
          flush=True)

    import functools
    wave = jax.jit(
        functools.partial(guided_wavefront_pass, bsdf_fraction=0.5),
        static_argnames=("record",),
    )
    tree = integ.dev_tree

    out = wave(scene, tree, 0, spp, 3, record=False)
    jax.block_until_ready(out[0])
    _ = float(np.asarray(out[0]).sum())  # defeat laziness
    t_f = timeit("guided trace record=OFF (iter 3)",
                 lambda: wave(scene, tree, 0, spp, 3, record=False), reps)
    t_unguided = timeit("guided trace record=OFF (iter 1: PT-like)",
                        lambda: wave(scene, tree, 0, spp, 1, record=False),
                        reps)
    t_rec_unguided = timeit("guided trace record=ON  (iter 1)",
                            lambda: wave(scene, tree, 0, spp, 1, record=True),
                            reps)
    t_r = timeit("guided trace record=ON  (iter 3)",
                 lambda: wave(scene, tree, 0, spp, 3, record=True), reps)

    L, px, py, rays, recs = wave(scene, tree, 0, spp, 3, record=True)
    jax.block_until_ready(recs.wo_pdf)

    def splat():
        # donated arg: re-make a tree copy each call is expensive; instead
        # time with donation disabled via a non-donating jit
        from practical_path_guiding_lab_tpu.render.guided import process_and_splat
        return jax.jit(process_and_splat)(tree, recs, L, 0, spp)

    t_s = timeit("process_and_splat", splat, reps)

    sum_l = integ.sum_l
    t_m = timeit("moments + develop (aligned)", lambda: (
        var_mod.accumulate_moments_aligned(sum_l, sum_l, L)[0],
        develop_pass_image(scene, L, px, py),
    ), reps)
    print(f"\ntrace(final)={t_f:.2f}s trace(train)={t_r:.2f}s splat={t_s:.2f}s "
          f"moments={t_m:.2f}s  unguided-trace={t_unguided:.2f}s "
          f"record-overhead(unguided)={t_rec_unguided - t_unguided:.2f}s "
          f"tree-overhead(final)={t_f - t_unguided:.2f}s")


if __name__ == "__main__":
    main()
