"""Op-level profile of guided train passes against a PRODUCTION-SCALE
saved tree (the bench_guided_deep workload). Decomposes the deep-tree
guided gap (BENCH_r04: 4.51x PT) per device op.

Usage: python tools/profile_deep_ops.py [tree.npz] [n_passes]
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

from profile_guided_ops import agg_trace


def main():
    tree_path = sys.argv[1] if len(sys.argv) > 1 else (
        "debug_r3b/kdc2500-blend/veach-ajar/tree-data/veach-ajar_iter-4.npz"
    )
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from practical_path_guiding_lab_tpu.scene import load_file
    from practical_path_guiding_lab_tpu.scene.scene import compile_scene
    from practical_path_guiding_lab_tpu.render.integrator import (
        PathGuidingIntegrator,
    )

    desc = load_file(
        "/root/reference/scenes/veach-ajar/scene.xml", resx=1280, resy=720
    )
    scene = compile_scene(desc)
    integ = PathGuidingIntegrator(scene)
    integ.setup()
    integ.loadSDTreeFromFile(tree_path)
    integ.setIteration(5, False)
    spp = 1000
    _, rays = integ.render_pass(0, spp)  # compile + fetch
    spp += 1
    integ.render_pass(0, spp)  # frozen-plan program
    spp += 1
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, _ = integ.render_pass(0, spp)
        spp += 1
        ts.append(time.perf_counter() - t0)
    print(f"deep train pass median {np.median(ts)*1e3:.0f} ms "
          f"({float(rays)/np.median(ts)/1e6:.2f} Mrays/s)", flush=True)

    trace_dir = "/tmp/ppg_trace_deep"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(n_passes):
            L, _ = integ.render_pass(0, spp)
            spp += 1
        jax.block_until_ready(L)
    agg_trace(trace_dir, n_passes)


if __name__ == "__main__":
    main()
