"""Op-level XLA profile of one PT render pass on the real TPU.

Runs ``render_pass`` under ``jax.profiler.trace`` and aggregates the
device-trace op durations, attributing pass wall-clock to individual
fusions/kernels — the honest per-op view (pass-level diffs tell the
truth but not the *address*; this names the ops).

Usage: python tools/profile_xla_ops.py [spp] [n_passes]
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


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from practical_path_guiding_lab_tpu.scene import load_file
    from practical_path_guiding_lab_tpu.scene.scene import compile_scene
    from practical_path_guiding_lab_tpu.render.path_tracer import render_pass

    desc = load_file(
        "/root/reference/scenes/veach-ajar/scene.xml", resx=1280, resy=720
    )
    scene = compile_scene(desc)

    fn = jax.jit(render_pass, static_argnums=(3, 4))
    L, _, _, rays = fn(scene, 0, 0, True, spp)
    rays = float(rays)
    t0 = time.perf_counter()
    L, _, _, _ = fn(scene, 0, spp, True, spp)
    jax.block_until_ready(L)
    t_pass = time.perf_counter() - t0
    print(f"pass {t_pass*1e3:.1f} ms  {rays/t_pass/1e6:.2f} Mrays/s", flush=True)

    trace_dir = "/tmp/ppg_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for p in range(2, 2 + n_passes):
            L, _, _, _ = fn(scene, 0, p * spp, True, spp)
        jax.block_until_ready(L)

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace.json.gz produced; files:", flush=True)
        for f in glob.glob(f"{trace_dir}/**/*", recursive=True):
            print("  ", f)
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)

    # aggregate device-thread complete events by name
    events = trace.get("traceEvents", [])
    # find process ids whose name mentions TPU/device
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        pid for pid, nm in proc_names.items()
        if "TPU" in nm or "tpu" in nm or "Device" in nm or "device" in nm
    }
    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        agg[name][0] += dur
        agg[name][1] += 1
        total += dur
    print(f"\ndevice pids: { {p: proc_names.get(p) for p in dev_pids} }")
    print(f"total device op time {total:.1f} ms over {n_passes} passes "
          f"({total/n_passes:.1f} ms/pass)\n")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"{'op':<72s} {'ms/pass':>9s} {'count':>6s}")
    for name, (ms, cnt) in rows[:45]:
        print(f"{name[:72]:<72s} {ms/n_passes:>9.2f} {cnt:>6d}")


if __name__ == "__main__":
    main()
