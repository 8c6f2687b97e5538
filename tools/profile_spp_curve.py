"""Mrays/s vs spp-per-dispatch curve for the PT pass (verdict r2 item 9):
amortizes per-dispatch fixed cost + late-bounce small-wavefront
underutilization by tracing k spp in ONE dispatch (bitwise-equal to k
sequential 1-spp passes via rng.spp_fold).

Usage: python tools/profile_spp_curve.py [reps]
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from practical_path_guiding_lab_tpu.render.path_tracer import render_pass
    from practical_path_guiding_lab_tpu.scene import load_file
    from practical_path_guiding_lab_tpu.scene.scene import compile_scene

    scene = compile_scene(
        load_file("/root/reference/scenes/veach-ajar/scene.xml",
                  resx=1280, resy=720)
    )
    fn = jax.jit(render_pass, static_argnums=(3, 4))
    for spp in (1, 2, 4, 8):
        L, _, _, rays = fn(scene, 0, 0, True, spp)
        rays = float(rays)  # compile + fetch (defeat laziness)
        ts = []
        for p in range(1, reps + 1):
            t0 = time.perf_counter()
            out = fn(scene, 0, p, True, spp)
            jax.block_until_ready(out[0])
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"spp/dispatch {spp}: med {med*1e3:8.1f} ms  "
              f"{rays/med/1e6:7.2f} Mrays/s  (min {min(ts)*1e3:.1f})",
              flush=True)


if __name__ == "__main__":
    main()
