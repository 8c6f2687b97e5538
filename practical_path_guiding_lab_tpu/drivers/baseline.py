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

    import jax
    import jax.numpy as jnp

    h_px, w_px = scene.camera.height, scene.camera.width
    acc = jnp.zeros((h_px, w_px, 3), jnp.float32)
    acc_u = jnp.zeros((h_px, w_px, 3), jnp.float32)  # unused second slot
    rays_acc = jnp.zeros((), jnp.float32)
    spp = 0
    cumm_time = 0.0
    # deferred per-chunk metric rows: (time, spp, var, var_gt, mse) with
    # the scalars left on device; ONE stacked fetch at the end converts
    # them (the old loop paid ~6 dispatches + 4 blocking round trips per
    # chunk — the reference computes its chunk metrics on device too,
    # path_tracing_render.py:60-98)
    pending = []

    def do_chunk(chunk_spp, seed_base):
        nonlocal acc, acc_u, rays_acc, spp, cumm_time
        t0 = time.perf_counter()
        # whole chunk in ONE wavefront dispatch (bitwise-equal to the
        # sequential 1-spp passes via rng.spp_fold); render + moments +
        # develop + acc update + metrics = two dispatches, no fetches
        out = integ.render_pass_driver(
            cfg.initial_seed, seed_base, spp=chunk_spp,
            acc_w=acc, acc_u=acc_u, w_w=chunk_spp, w_u=0.0,
            spp_total=spp + chunk_spp, rays_acc=rays_acc,
            ground_truth=gt,
        )
        acc, acc_u, rays_acc = out["acc_w"], out["acc_u"], out["rays_acc"]
        # one blocking read per chunk (the deferred cascade-overflow flag
        # doubles as the sync); an overflowed chunk contributed exactly
        # nothing (device-gated) — re-run it at full width
        if out["ovf"] is not None and bool(np.asarray(out["ovf"])):
            out = integ.render_pass_driver(
                cfg.initial_seed, seed_base, spp=chunk_spp,
                acc_w=acc, acc_u=acc_u, w_w=chunk_spp, w_u=0.0,
                spp_total=spp + chunk_spp, rays_acc=rays_acc,
                ground_truth=gt, force_full=True,
            )
            acc, acc_u, rays_acc = (
                out["acc_w"], out["acc_u"], out["rays_acc"]
            )
        # the clock must include the chunk's post/metric programs, not
        # just the render program the ovf flag rides on — block on a
        # post-program output so every row's timestamp (and time-budget
        # accounting) covers the full chunk, consistently across steady
        # and re-run rows
        jax.block_until_ready(out["mse"])
        spp += chunk_spp
        cumm_time += time.perf_counter() - t0
        pending.append(
            (cumm_time, spp, out["var"], out["var_gt"], out["mse"])
        )
        print_bold_underline(f"spp {spp} t {cumm_time:.1f}s")

    if cfg.use_time_budget:
        while cumm_time < cfg.time_budget:
            do_chunk(cfg.chunk_spp, spp)
    else:
        n_chunks = math.ceil(cfg.target_spp / cfg.chunk_spp)
        for c in range(n_chunks):
            do_chunk(min(cfg.chunk_spp, cfg.target_spp - spp), spp)

    total_rays = float(rays_acc)
    flat = np.asarray(
        jnp.stack([s for row in pending for s in row[2:5]])
    ).reshape(-1, 3)
    for (t_row, spp_row, *_), (v, vg, m) in zip(pending, flat):
        perf.append(
            time=t_row, spp=spp_row, cumm_spp=spp_row,
            variance=float(vg) if gt is not None else float(v),
        )
        mse_perf.append(
            time=t_row, spp=spp_row, cumm_spp=spp_row,
            mse=float(m) if gt is not None else None,
        )

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
