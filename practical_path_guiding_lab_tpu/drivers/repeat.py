"""Repeated high-spp measurement driver — reference
repeat_high_spp_renderer.py semantics: re-render every training iteration
at a fixed high spp (1024) reusing the SAVED SD-trees (tree-data npz from a
prior training run), repeat the whole simulation N times, and average the
per-simulation CSVs (pandas groupby mean). Theoretical cumulative spp/time
bookkeeping mirrors :45-62,137-140,197-198.
"""
from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from ..analysis.performance_plot import average_simulations
from .. import knobs
from ..render.integrator import PathGuidingIntegrator
from ..scene import load_file
from ..scene.scene import compile_scene
from ..utils import FileNameManager, PerformanceData, print_bold_underline, print_title
from .config import RepeatConfig, scene_path
from .train import load_ground_truth


def do_full_simulation(cfg: RepeatConfig, scene, gt, sim_index: int):
    """One simulation: iterations 0..N-1, each loading the saved tree of the
    previous iteration and rendering iter_spp samples
    (reference doFullSimulation, repeat_high_spp_renderer.py:25-214)."""
    integ = PathGuidingIntegrator(scene)
    integ.setup()

    variance_rec = PerformanceData()
    variance_gt_rec = PerformanceData()
    mse_rec = PerformanceData()

    theoretical_cumm_spp = 0
    cumm_time = 0.0

    for iteration in range(cfg.iterations):
        print_title(f"sim {sim_index} iteration {iteration}")
        tree_file = Path(
            FileNameManager.generateTreeDataFileName(iteration - 1)
        )
        if iteration > 0:
            if not tree_file.exists():
                print_bold_underline(f"missing tree {tree_file}; stopping")
                break
            integ.loadSDTreeFromFile(tree_file)
        integ.setIteration(iteration, True)
        integ.resetVarianceCounter()

        t0 = time.perf_counter()
        theoretical_iter_spp = 2 ** (iteration + 2)
        k = max(1, cfg.dispatch)
        p = 0
        while p < cfg.iter_spp:
            step = min(k, cfg.iter_spp - p)
            integ.render_pass(
                cfg.initial_seed + sim_index * 131071, p, spp=step
            )
            p += step
            spp = p
            if p % cfg.record_every == 0 or p == cfg.iter_spp:
                elapse = time.perf_counter() - t0 + cumm_time
                variance_rec.append(
                    time=elapse, spp=spp,
                    cumm_spp=theoretical_cumm_spp + theoretical_iter_spp,
                    iteration=iteration,
                    variance=integ.computeVariance(spp),
                )
                if gt is not None:
                    variance_gt_rec.append(
                        time=elapse, spp=spp,
                        cumm_spp=theoretical_cumm_spp + theoretical_iter_spp,
                        iteration=iteration,
                        variance=integ.computeVariance(spp, gt),
                    )
                    mse_rec.append(
                        time=elapse, spp=spp,
                        cumm_spp=theoretical_cumm_spp + theoretical_iter_spp,
                        iteration=iteration,
                        mse=integ.computeMSE(spp, gt),
                    )
        cumm_time += time.perf_counter() - t0
        theoretical_cumm_spp += theoretical_iter_spp

    perf = FileNameManager.PERFORMANCE_FOLDER_PATH
    paths = {}
    for name, rec in (
        ("variance", variance_rec),
        ("variance_groundTruth", variance_gt_rec),
        ("mse_groundTruth", mse_rec),
    ):
        p = f"{perf}repeat_{name}_sim-{sim_index}.csv"
        rec.saveToFile(p)
        paths[name] = p
    return paths


def run_repeat(cfg: RepeatConfig):
    desc = load_file(scene_path(cfg.scene), **cfg.scene_overrides)
    scene = compile_scene(desc)
    gt = load_ground_truth(cfg, scene)

    FileNameManager.DEBUG_ROOT = Path(cfg.out_root)
    FileNameManager.setSceneName(cfg.scene)
    FileNameManager.createDebugFolder()
    knobs.write_manifest(
        FileNameManager.DEBUG_ROOT / cfg.scene, run_config=cfg,
        extra={"driver": "repeat"},
    )

    all_paths = []
    for sim in range(cfg.total_simulations):
        all_paths.append(do_full_simulation(cfg, scene, gt, sim))

    perf = FileNameManager.PERFORMANCE_FOLDER_PATH
    averaged = {}
    for name in all_paths[0]:
        csvs = [p[name] for p in all_paths]
        out = f"{perf}repeat_{name}_avg-{cfg.total_simulations}-sim.csv"
        average_simulations(csvs, out)
        averaged[name] = out
    return averaged


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell-box")
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--spp", type=int, default=1024)
    ap.add_argument("--sims", type=int, default=2)
    ap.add_argument(
        "--record-every", type=int, default=1,
        help="metric-row cadence in passes (reference: every pass)",
    )
    ap.add_argument(
        "--dispatch", type=int, default=1,
        help="spp per wavefront dispatch (bitwise-equal to sequential "
        "1-spp passes; amortizes round trips at small films)",
    )
    ap.add_argument("--out", default="debug", help="output root directory")
    ap.add_argument("--resx", type=int, default=None)
    ap.add_argument("--resy", type=int, default=None)
    args = ap.parse_args()
    run_repeat(
        RepeatConfig(
            scene=args.scene,
            iterations=args.iterations,
            iter_spp=args.spp,
            total_simulations=args.sims,
            record_every=args.record_every,
            dispatch=args.dispatch,
            out_root=args.out or "debug",
            scene_overrides={
                k: v
                for k, v in (("resx", args.resx), ("resy", args.resy))
                if v
            },
        )
    )
