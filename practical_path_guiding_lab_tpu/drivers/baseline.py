"""Unguided NEE path-tracing baseline driver — reference
path_tracing_render.py semantics: fixed-spp (target_spp, chunked) or
wall-clock time budget (timeBudget seconds, 4-spp chunks), per-chunk
variance/MSE CSV rows, averaged image written as PNG+EXR.
(path_tracing_render.py:46-162)
"""
from __future__ import annotations

import math
import time
from pathlib import Path

import numpy as np

from ..io import exr as exr_io
from ..io import image as image_io
from .. import knobs
from ..render.integrator import PathTracingIntegrator
from ..scene import load_file
from ..scene.scene import compile_scene
from ..utils import FileNameManager, PerformanceData, print_bold_underline
from .config import BaselineConfig, scene_path
from .train import load_ground_truth


def render_baseline(cfg: BaselineConfig):
    desc = load_file(scene_path(cfg.scene), **cfg.scene_overrides)
    scene = compile_scene(desc)
    gt = load_ground_truth(cfg, scene)

    FileNameManager.DEBUG_ROOT = Path(cfg.out_root)
    FileNameManager.setSceneName(cfg.scene)
    if cfg.save_outputs:
        FileNameManager.createDebugFolder()
        knobs.write_manifest(
            FileNameManager.DEBUG_ROOT / cfg.scene, run_config=cfg,
            extra={"driver": "baseline"},
        )

    integ = PathTracingIntegrator(scene)
    perf = PerformanceData()
    mse_perf = PerformanceData()

    acc = None
    spp = 0
    cumm_time = 0.0
    total_rays = 0.0

    def do_chunk(chunk_spp, seed_base):
        nonlocal acc, spp, cumm_time, total_rays
        t0 = time.perf_counter()
        # whole chunk in ONE wavefront dispatch (bitwise-equal to the
        # sequential 1-spp passes via rng.spp_fold; amortizes fixed
        # per-dispatch cost — measured +30% Mrays/s at 4 spp). The
        # returned img is the chunk AVERAGE, so weight it back to
        # per-sample units for the running sum.
        img, rays = integ.render_pass(cfg.initial_seed, seed_base,
                                      spp=chunk_spp)
        total_rays += rays
        # device-side accumulation; host transfer deferred to save time
        # (np.asarray per chunk moved 11 MB over the tunnel every chunk)
        w_img = img * chunk_spp
        acc = w_img if acc is None else acc + w_img
        spp += chunk_spp
        # scalar fetch syncs the async backend before the clock stops
        float(acc[0, 0, 0])
        cumm_time += time.perf_counter() - t0
        variance = integ.computeVariance(spp)
        var_gt = integ.computeVariance(spp, gt) if gt is not None else None
        mse = integ.computeMSE(spp, gt) if gt is not None else None
        perf.append(time=cumm_time, spp=spp, cumm_spp=spp, variance=var_gt if var_gt is not None else variance)
        mse_perf.append(time=cumm_time, spp=spp, cumm_spp=spp, mse=mse)
        print_bold_underline(
            f"spp {spp} t {cumm_time:.1f}s var {variance:.3e} mse "
            f"{mse if mse is not None else float('nan'):.3e}"
        )

    if cfg.use_time_budget:
        while cumm_time < cfg.time_budget:
            do_chunk(cfg.chunk_spp, spp)
    else:
        n_chunks = math.ceil(cfg.target_spp / cfg.chunk_spp)
        for c in range(n_chunks):
            do_chunk(min(cfg.chunk_spp, cfg.target_spp - spp), spp)

    image = np.asarray(acc) / spp
    if cfg.save_outputs:
        base = (
            FileNameManager.IMAGE_FOLDER_PATH
            + f"{cfg.scene}_pt-nee_spp-{spp}"
        )
        image_io.write_png(base + ".png", image)
        exr_io.write(base + ".exr", image)
        perf.saveToFile(
            FileNameManager.PERFORMANCE_FOLDER_PATH + "pt_nee_variance.csv"
        )
        mse_perf.saveToFile(
            FileNameManager.PERFORMANCE_FOLDER_PATH + "pt_nee_mse.csv"
        )
    return {
        "image": image,
        "spp": spp,
        "time": cumm_time,
        "total_rays": total_rays,
        "variance_csv": perf,
        "mse_csv": mse_perf,
        "mse": integ.computeMSE(spp, gt) if gt is not None else None,
    }


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell-box")
    ap.add_argument("--spp", type=int, default=40)
    ap.add_argument("--time-budget", type=float, default=None)
    ap.add_argument("--resx", type=int, default=None)
    ap.add_argument("--resy", type=int, default=None)
    ap.add_argument("--out", default="debug", help="output root directory")
    args = ap.parse_args()
    overrides = {}
    if args.resx:
        overrides["resx"] = args.resx
    if args.resy:
        overrides["resy"] = args.resy
    cfg = BaselineConfig(
        scene=args.scene,
        scene_overrides=overrides,
        target_spp=args.spp,
        use_time_budget=args.time_budget is not None,
        time_budget=args.time_budget or 1000.0,
        out_root=args.out or "debug",
    )
    out = render_baseline(cfg)
    print_bold_underline(
        f"done: {out['spp']} spp in {out['time']:.1f}s "
        f"({out['total_rays']/max(out['time'],1e-9)/1e6:.2f} Mrays/s), MSE {out['mse']}"
    )
