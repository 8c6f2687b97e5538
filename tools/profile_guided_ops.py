"""Op-level XLA device profile of one GUIDED train pass (trace + record
+ splat) on the real TPU, with a real trained/refined tree (iterations
1-2 grown first, profile at iteration 3). Names the fusions the
guided-vs-PT gap lives in.

Usage: python tools/profile_guided_ops.py [n_passes]
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
import warnings
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.simplefilter("ignore")

import numpy as np
import jax


def agg_trace(trace_dir, n_passes):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace produced")
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        pid for pid, nm in proc_names.items()
        if "TPU" in nm or "tpu" in nm or "Device" in nm or "device" in nm
    }
    agg = defaultdict(lambda: [0.0, 0])
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        agg[e.get("name", "?")][0] += e.get("dur", 0) / 1e3
        agg[e.get("name", "?")][1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"{'op':<72s} {'ms/pass':>9s} {'count':>6s}")
    for name, (ms, cnt) in rows[:40]:
        print(f"{name[:72]:<72s} {ms/n_passes:>9.2f} {cnt:>6d}")


def main():
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
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
    spp = 0
    for iteration, passes in ((1, 4), (2, 8)):
        integ.setIteration(iteration, False)
        for _ in range(passes):
            integ.render_pass(0, spp)
            spp += 1
        integ.refineAndPrepareSDTreeForNextIteration()
    integ.setIteration(3, False)
    _, rays = integ.render_pass(0, spp)  # warm/compile
    spp += 1
    t0 = time.perf_counter()
    _, _ = integ.render_pass(0, spp)
    spp += 1
    t_pass = time.perf_counter() - t0
    print(f"guided train pass {t_pass*1e3:.0f} ms "
          f"({float(rays)/t_pass/1e6:.2f} Mrays/s)", flush=True)

    trace_dir = "/tmp/ppg_trace_guided"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(n_passes):
            L, _ = integ.render_pass(0, spp)
            spp += 1
        jax.block_until_ready(L)
    agg_trace(trace_dir, n_passes)


if __name__ == "__main__":
    main()
