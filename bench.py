"""Benchmark harness: Mrays/sec/chip on veach-ajar (BASELINE.json metric).

Prints ONE JSON line. Headline value = median unguided-PT throughput
(comparable across rounds); the same line carries the guided-pass numbers
(train = record+splat, final = record-off) because the guided integrator
is the flagship workload (reference main.py), plus per-pass spread so the
number's noise floor is visible (round-2 verdict items 3 & 8).

Protocol per docs/PERF_NOTES.md: force a device->host fetch before timing
(the axon backend is lazy until the first D2H), then time whole passes
with a block_until_ready at each pass end.
"""
from __future__ import annotations

import json
import os
import sys
import time
import warnings

warnings.simplefilter("ignore")

import numpy as np
import jax


def _stats(ts):
    ts = np.asarray(ts)
    return {
        "passes": int(len(ts)),
        "s_median": round(float(np.median(ts)), 4),
        "s_min": round(float(ts.min()), 4),
        "s_max": round(float(ts.max()), 4),
    }


def bench_pt(scene, n_passes=16, spp=1):
    from practical_path_guiding_lab_tpu.render.path_tracer import (
        render_pass_auto,
    )

    L, _, _, rays = render_pass_auto(scene, 0, 0, True, spp)
    rays = float(rays)  # compile + first D2H fetch (defeats laziness)
    # pass 1 compiles the shrunk cascade program; exclude it from timing
    L, _, _, _ = render_pass_auto(scene, 0, spp, True, spp)
    jax.block_until_ready(L)
    ts = []
    for p in range(2, n_passes + 2):
        t0 = time.perf_counter()
        L, _, _, r = render_pass_auto(scene, 0, p * spp, True, spp)
        jax.block_until_ready(L)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    return {**_stats(ts), "mrays_median": round(rays / med / 1e6, 3)}, rays


def bench_guided(scene, n_timed=6):
    """Guided-pass throughput with a real (trained+refined) tree: train
    iterations 1..2 to grow structure, then time iteration-3 train passes
    (record + splat) and final-render passes (record off)."""
    from practical_path_guiding_lab_tpu.render.integrator import (
        PathGuidingIntegrator,
    )

    integ = PathGuidingIntegrator(scene)
    integ.setup()
    spp = 0
    for iteration, passes in ((1, 4), (2, 8)):
        integ.setIteration(iteration, False)
        for p in range(passes):
            integ.render_pass(0, spp)
            spp += 1
        integ.refineAndPrepareSDTreeForNextIteration()

    integ.setIteration(3, False)
    _, rays_train = integ.render_pass(0, spp)  # warm/compile (probe)
    spp += 1
    integ.render_pass(0, spp)  # warm the FROZEN shrink-plan program too
    spp += 1
    ts = []
    for _ in range(n_timed):
        t0 = time.perf_counter()
        _, r = integ.render_pass(0, spp)
        spp += 1
        ts.append(time.perf_counter() - t0)
    train = {**_stats(ts), "mrays_median": round(
        rays_train / float(np.median(ts)) / 1e6, 3)}

    # final-iteration protocol = the driver's: record-off passes at the
    # measured-best dispatch width (train.py final_dispatch, default 1 —
    # the 4-spp amortization win inverted once per-pass fixed costs fell)
    import os as _os
    fd = max(1, int(_os.environ.get("PPG_FINAL_DISPATCH", "1")))
    integ.setIteration(3, True)
    _, rays_final = integ.render_pass(0, spp, spp=fd)  # probe
    spp += fd
    integ.render_pass(0, spp, spp=fd)  # warm the frozen-plan program
    spp += fd
    ts = []
    for _ in range(n_timed):
        t0 = time.perf_counter()
        _, r = integ.render_pass(0, spp, spp=fd)
        spp += fd
        ts.append(time.perf_counter() - t0)
    final = {**_stats(ts), "spp_per_dispatch": fd, "mrays_median": round(
        rays_final / float(np.median(ts)) / 1e6, 3)}
    return train, final


def _drive_passes(integ, gt, n_timed, spp0, spp_step=1, w_w=1.0):
    """Driver-grade timed passes: render_pass_driver with ONE blocking
    read per pass (the production protocol — drivers/train.py round 4).
    Returns per-pass times."""
    import jax.numpy as jnp

    n = integ.scene.camera.width * integ.scene.camera.height
    acc_w = jnp.zeros((n, 3))
    acc_u = jnp.zeros((n, 3))
    rays_acc = jnp.zeros(())
    spp = spp0
    ts = []
    for i in range(n_timed + 2):
        t0 = time.perf_counter()
        out = integ.render_pass_driver(
            0, spp, spp=spp_step, acc_w=acc_w, acc_u=acc_u, w_w=w_w,
            w_u=0.0, spp_total=spp + spp_step, rays_acc=rays_acc,
            ground_truth=gt,
        )
        acc_w, acc_u, rays_acc = out["acc_w"], out["acc_u"], out["rays_acc"]
        if out["ovf"] is not None and bool(np.asarray(out["ovf"])):
            out = integ.render_pass_driver(
                0, spp, spp=spp_step, acc_w=acc_w, acc_u=acc_u, w_w=w_w,
                w_u=0.0, spp_total=spp + spp_step, rays_acc=rays_acc,
                ground_truth=gt, force_full=True,
            )
            acc_w, acc_u, rays_acc = (
                out["acc_w"], out["acc_u"], out["rays_acc"],
            )
        jax.block_until_ready(out["mse"])
        spp += spp_step
        if i >= 2:  # first two passes warm probe + frozen-plan programs
            ts.append(time.perf_counter() - t0)
    return ts, float(np.asarray(rays_acc)) / (n_timed + 2)


def bench_pt_driver(scene, n_timed=8):
    """PT throughput under the production driver protocol (fused post
    pass: moments + develop + accumulate + metrics on device, one
    blocking read per pass — what drivers/baseline.py actually runs)."""
    from practical_path_guiding_lab_tpu.render.integrator import (
        PathTracingIntegrator,
    )

    integ = PathTracingIntegrator(scene)
    ts, rays = _drive_passes(integ, None, n_timed, 0)
    med = float(np.median(ts))
    return {**_stats(ts), "mrays_median": round(rays / med / 1e6, 3)}


def bench_guided_driver(scene, n_timed=6, tree_path=None):
    """Guided train-pass throughput under the production driver protocol.
    With ``tree_path``: production-scale saved tree (deep section);
    otherwise trains iterations 1-2 first (small-tree section)."""
    from practical_path_guiding_lab_tpu.render.integrator import (
        PathGuidingIntegrator,
    )

    integ = PathGuidingIntegrator(scene)
    integ.setup()
    if tree_path is None:
        spp = 0
        for iteration, passes in ((1, 4), (2, 8)):
            integ.setIteration(iteration, False)
            for _ in range(passes):
                integ.render_pass(0, spp)
                spp += 1
            integ.refineAndPrepareSDTreeForNextIteration()
        integ.setIteration(3, False)
        spp0 = spp
    else:
        integ.loadSDTreeFromFile(tree_path)
        integ.setIteration(5, False)
        spp0 = 1000
    ts, rays = _drive_passes(integ, None, n_timed, spp0)
    med = float(np.median(ts))
    out = {**_stats(ts), "mrays_median": round(rays / med / 1e6, 3)}
    if tree_path is not None:
        integ.free_device_tree()
    return out


def bench_guided_deep(scene, n_timed=6):
    """Guided passes against a PRODUCTION-SCALE saved tree (a committed
    late-iteration npz — kd-C=2500 veach-ajar iteration 5, 46.9k kd /
    7.43M quad nodes): the small-tree guided numbers miss the
    gather-table cost at trained scale (round-3 verdict item 5). Returns
    None when no saved tree is available."""
    from pathlib import Path

    from practical_path_guiding_lab_tpu import knobs
    from practical_path_guiding_lab_tpu.render.integrator import (
        PathGuidingIntegrator,
    )

    tree_path = knobs.get("PPG_BENCH_DEEP_TREE")
    if not Path(tree_path).exists():
        return None
    integ = PathGuidingIntegrator(scene)
    integ.setup()
    integ.loadSDTreeFromFile(tree_path)

    out = {}
    for label, is_final in (("train", False), ("final", True)):
        integ.setIteration(5, is_final)
        spp = 0 if is_final else 1000
        _, rays = integ.render_pass(0, spp)  # warm/compile (probe)
        spp += 1
        integ.render_pass(0, spp)  # warm the frozen-plan program
        spp += 1
        ts = []
        for _ in range(n_timed):
            t0 = time.perf_counter()
            integ.render_pass(0, spp)
            spp += 1
            ts.append(time.perf_counter() - t0)
        out[label] = {**_stats(ts), "mrays_median": round(
            rays / float(np.median(ts)) / 1e6, 3)}
    integ.free_device_tree()
    return out


def _load_scene():
    from practical_path_guiding_lab_tpu.scene import load_file
    from practical_path_guiding_lab_tpu.scene.scene import compile_scene
    from practical_path_guiding_lab_tpu.drivers.config import scene_path as _sp

    desc = load_file(str(_sp("veach-ajar")), resx=1280, resy=720)
    return compile_scene(desc)


def _refexact_section():
    """Subprocess entry (bench.py --refexact): guided driver-grade train
    passes under the REFERENCE-EXACT constant bsdfSamplingFraction
    (PPG_ADAPTIVE_FRACTION=0, path_guiding_integrator.py:223), so guided
    cross-round comparisons aren't confounded by the adaptive-fraction
    policy knob (round-4 verdict weak-item 7). Run as a subprocess
    because the policy is baked at trace time."""
    scene = _load_scene()
    print(json.dumps(bench_guided_driver(scene)))


def main():
    scene = _load_scene()

    pt, _ = bench_pt(scene)
    pt4, _ = bench_pt(scene, n_passes=8, spp=4)
    train, final = bench_guided(scene)
    deep = bench_guided_deep(scene)
    # driver-grade sections: the production protocol (fused post pass,
    # deferred overflow, ONE blocking read per pass) on both integrators —
    # the legacy sections above keep cross-round comparability, these
    # measure what drivers/train.py and drivers/baseline.py actually pay
    pt_drv = bench_pt_driver(scene)
    train_drv = bench_guided_driver(scene)
    from practical_path_guiding_lab_tpu import knobs as _knobs
    from pathlib import Path as _Path

    deep_path = _knobs.get("PPG_BENCH_DEEP_TREE")
    deep_drv = (
        bench_guided_driver(scene, tree_path=deep_path)
        if _Path(deep_path).exists() else None
    )
    # reference-exact fraction policy (constant 0.5) in a subprocess (the
    # policy is baked at trace time; a fresh process gets a fresh jit)
    import subprocess

    refexact = None
    try:
        env = dict(os.environ, PPG_ADAPTIVE_FRACTION="0")
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--refexact"],
            capture_output=True, text=True, timeout=2400, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in reversed(r.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                refexact = json.loads(line)
                break
    except Exception:
        pass

    out = {
        "metric": "veach-ajar Mrays/sec/chip (wavefront PT, 1280x720)",
        "value": pt["mrays_median"],
        "unit": "Mrays/s",
        "vs_baseline": round(pt["mrays_median"] / 100.0, 4),
        "pt": pt,
        "pt_4spp_dispatch": pt4,
        "guided_train": train,
        "guided_final": final,
        "guided_train_vs_pt_s": round(
            train["s_median"] / pt["s_median"], 3
        ),
        "pt_driver": pt_drv,
        "guided_train_driver": train_drv,
        "guided_train_vs_pt_driver_s": round(
            train_drv["s_median"] / pt_drv["s_median"], 3
        ),
    }
    if refexact is not None:
        out["guided_train_driver_refexact"] = refexact
        out["guided_refexact_vs_pt_driver_s"] = round(
            refexact["s_median"] / pt_drv["s_median"], 3
        )
    if deep is not None:
        out["guided_deep_train"] = deep["train"]
        out["guided_deep_final"] = deep["final"]
        out["guided_deep_train_vs_pt_s"] = round(
            deep["train"]["s_median"] / pt["s_median"], 3
        )
    if deep_drv is not None:
        out["guided_deep_train_driver"] = deep_drv
        out["guided_deep_train_vs_pt_driver_s"] = round(
            deep_drv["s_median"] / pt_drv["s_median"], 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    if "--refexact" in sys.argv:
        _refexact_section()
    else:
        main()
