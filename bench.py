"""Benchmark harness: Mrays/sec/chip on veach-ajar (BASELINE.json metric).

Renders the flagship scene with the unguided-or-guided wavefront integrator
on the available accelerator and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}
vs_baseline is value / 100 (the BASELINE.json north-star of 100 Mrays/s/chip).
"""
from __future__ import annotations

import json
import time
import warnings

warnings.simplefilter("ignore")

import jax
import numpy as np


def main():
    from practical_path_guiding_lab_tpu.scene import load_file
    from practical_path_guiding_lab_tpu.scene.scene import compile_scene
    from practical_path_guiding_lab_tpu.render.path_tracer import render_pass

    scene_path = "/root/reference/scenes/veach-ajar/scene.xml"
    desc = load_file(scene_path, resx=1280, resy=720)
    scene = compile_scene(desc)

    fn = jax.jit(render_pass, static_argnums=(3,))
    # warmup / compile
    L, _, _, rays = fn(scene, 0, 0, True)
    L.block_until_ready()

    n_passes = 4
    t0 = time.perf_counter()
    total_rays = 0.0
    for p in range(1, n_passes + 1):
        L, _, _, rays = fn(scene, 0, p, True)
        L.block_until_ready()
        total_rays += float(rays)
    dt = time.perf_counter() - t0
    mrays = total_rays / dt / 1e6

    print(
        json.dumps(
            {
                "metric": "veach-ajar Mrays/sec/chip (wavefront PT, 1280x720)",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 100.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
