"""Op-level XLA device profile of the splat epilogue (process_and_splat)
with a realistic trained tree + real records at 1280x720 (veach-ajar).

The guided profile attributes ~380 ms/pass to jit_process_and_splat in
four ~90-100 ms fusions; this names them (big Lv gather vs the
scatter-adds vs reconstruction).

Usage: python tools/profile_splat_ops.py [reps]
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


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from practical_path_guiding_lab_tpu.scene import load_file
    from practical_path_guiding_lab_tpu.scene.scene import compile_scene
    from practical_path_guiding_lab_tpu.render.integrator import (
        PathGuidingIntegrator,
    )
    from practical_path_guiding_lab_tpu.render import guided as g

    desc = load_file(
        "/root/reference/scenes/veach-ajar/scene.xml", resx=1280, resy=720
    )
    scene = compile_scene(desc)
    integ = PathGuidingIntegrator(scene)
    integ.setup()
    spp = 0
    for iteration, passes in ((1, 4), (2, 8)):
        integ.setIteration(iteration, False)
        for _ in range(passes):
            integ.render_pass(0, spp)
            spp += 1
        integ.refineAndPrepareSDTreeForNextIteration()
    integ.setIteration(3, False)

    # one traced wavefront -> records; then time the splat alone
    lane_ids, px, py = g._film_samples_jit(scene, 0, spp)
    L, rays, recs = g.render_guided_wavefront_stepped(
        scene, integ.dev_tree, 0, spp, lane_ids, px, py, 3, record=True
    )
    tree = integ.dev_tree
    t2 = g._splat_jit(tree, recs, L, 0, spp)  # compile
    float(t2.q_irr_acc[0])
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        t2 = g._splat_jit(t2, recs, L, 0, spp + i)
        float(t2.q_irr_acc[0])
        ts.append(time.perf_counter() - t0)
    print(f"splat med {np.median(ts)*1e3:.0f} ms", flush=True)

    trace_dir = "/tmp/ppg_trace_splat"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for i in range(2):
            t2 = g._splat_jit(t2, recs, L, 0, spp + 10 + i)
        float(t2.q_irr_acc[0])

    from profile_guided_ops import agg_trace

    agg_trace(trace_dir, 2)


if __name__ == "__main__":
    main()
