"""Guided training + rendering driver — full reference main.py semantics:

* geometric budget doubling: iteration k renders 2^(k+2) spp (main.py:170)
* 1 spp per pass while training; batching allowed in the final iteration
  (recording off) (main.py:192-197)
* seed = initial_seed + cumm_spp per pass (main.py:218)
* spp-weighted in-iteration image accumulation (main.py:221-225)
* estimated final variance = variance * image_spp / (budget - cumm_spp_prev)
  (main.py:323-328)
* stop-training rule: estimated variance increases after 256 cumulative spp,
  hard stop at cumm_spp >= 1000 (main.py:334-377)
* once training stops, the remaining budget continues rendering and the
  final image blends up to two iterations by spp weight (main.py:267-291)
* per-iteration outputs: PNG+EXR image, SD-tree npz, kd-leaf OBJ; CSVs of
  variance/MSE (in-iteration and end-of-iteration) (main.py:398-429)
"""
from __future__ import annotations

import math
import time
import warnings

import numpy as np

from ..io import exr as exr_io
from ..io import image as image_io
from ..render.integrator import PathGuidingIntegrator
from ..scene import load_file
from ..scene.scene import compile_scene
from ..utils import FileNameManager, PerformanceData, print_bold_underline, print_title
from .config import TrainConfig, scene_path
from .. import knobs


def load_ground_truth(cfg: TrainConfig, scene):
    p = scene_path(cfg.scene).parent / "TungstenRender.exr"
    if not p.exists():
        return None
    gt = exr_io.read(p)
    h, w = scene.camera.height, scene.camera.width
    if gt.shape[:2] != (h, w):
        # average-pool to the render resolution (driver may render smaller)
        fy, fx = gt.shape[0] // h, gt.shape[1] // w
        if fy >= 1 and fx >= 1 and gt.shape[0] % h == 0 and gt.shape[1] % w == 0:
            gt = gt.reshape(h, fy, w, fx, 3).mean(axis=(1, 3))
        else:
            return None
    return gt.astype(np.float32)


def _save_csvs(cfg: TrainConfig, records) -> None:
    """Write every metric CSV stream (overwrite-in-place). Called after each
    iteration and at the end, so a crash mid-run keeps all completed rows."""
    perf = FileNameManager.PERFORMANCE_FOLDER_PATH
    if cfg.record_in_iteration:
        records["variance_inIter"].saveToFile(perf + "variance_inIter.csv")
        records["variance_groundTruth_inIter"].saveToFile(
            perf + "variance_groundTruth_inIter.csv"
        )
        records["mse_groundTruth_inIter"].saveToFile(
            perf + "mse_groundTruth_inIter.csv"
        )
    records["variance_endIter"].saveToFile(perf + "variance_endIter.csv")
    records["variance_groundTruth_endIter"].saveToFile(
        perf + "variance_groundTruth_endIter.csv"
    )
    records["mse_groundTruth_endIter"].saveToFile(
        perf + "mse_groundTruth_endIter.csv"
    )
    records["variance_estimated_final"].saveToFile(
        perf + "variance_estimated_final.csv"
    )
    if records["mse_groundTruth_blend"].rows:
        records["mse_groundTruth_blend"].saveToFile(
            perf + "mse_groundTruth_blend.csv"
        )


def invvar_combine(segments, min_spp: int = 32, ratio_cap: float = 16.0):
    """Inverse-variance combination of per-iteration box-mean films (an
    extension past the reference, whose final image keeps only the last
    iteration(s); its own spp-weighted two-iteration blend, main.py:287-291,
    is the equal-per-sample-variance special case).

    Every iteration's film is an independent unbiased estimate of the same
    image, so the 1/Var-weighted mean minimizes combined variance — IF the
    variance estimates are trustworthy. Moment-based self-variance is
    unreliable for low-spp heavy-tailed iterations (measured: a 4-spp
    cornell segment under-estimates its true error 1.6x, and 1/Var then
    over-weights it into a net loss), so segments only qualify with
    ``spp >= min_spp`` AND variance within ``ratio_cap`` of the final
    segment's (excluded segments would get tiny weights anyway — the
    tail-risk of a mis-estimated weight isn't worth their contribution).

    Returns (combined (N,3) f32, weights, combined-variance estimate) or
    None when fewer than two segments qualify. ``segments``: dicts with
    'mean' ((N,3) box-mean film), 'var' (self-variance), 'spp'."""
    if not segments:
        return None
    fin = segments[-1]
    v_f = max(fin["var"], 1e-12)
    use = [
        s
        for s in segments[:-1]
        if s["spp"] >= min_spp and s["var"] <= ratio_cap * v_f
    ]
    use.append(fin)  # the final segment always participates
    if len(use) < 2:
        return None
    inv = np.array([1.0 / max(s["var"], 1e-12) for s in use], np.float64)
    ws = inv / inv.sum()
    comb = np.zeros_like(use[0]["mean"], dtype=np.float64)
    for w, s in zip(ws, use):
        comb += w * s["mean"]
    return comb.astype(np.float32), ws, 1.0 / float(inv.sum())


def train(cfg: TrainConfig):
    desc = load_file(scene_path(cfg.scene), **cfg.scene_overrides)
    scene = compile_scene(desc)
    gt = load_ground_truth(cfg, scene)

    FileNameManager.DEBUG_ROOT = __import__("pathlib").Path(cfg.out_root)
    FileNameManager.setSceneName(cfg.scene)
    if cfg.save_outputs:
        FileNameManager.createDebugFolder()
        knobs.write_manifest(
            FileNameManager.DEBUG_ROOT / cfg.scene, run_config=cfg,
            extra={"driver": "train"},
        )

    integrator = PathGuidingIntegrator(
        scene, bsdf_sampling_fraction=cfg.bsdf_sampling_fraction
    )
    integrator.setup(
        sd_tree_max_depth=cfg.sd_tree_max_depth,
        quad_tree_max_depth=cfg.quad_tree_max_depth,
        store_nee=cfg.store_nee,
        bbox_eps=cfg.bbox_eps,
        kd_capacity=cfg.kd_capacity,
        quad_capacity=cfg.quad_capacity,
    )
    if cfg.mesh_devices:
        import jax as _jax

        from ..parallel.sharding import make_mesh

        n_dev = len(_jax.devices())
        if n_dev < cfg.mesh_devices:
            raise SystemExit(
                f"--mesh {cfg.mesh_devices} needs {cfg.mesh_devices} devices "
                f"but only {n_dev} visible (hint: JAX_PLATFORMS=cpu "
                f"XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{cfg.mesh_devices})"
            )
        integrator.set_mesh(make_mesh(cfg.mesh_devices))

    # possible cumulative spp checkpoints (main.py:105-117)
    possible_cumm = []
    c = 0
    i = 0
    while c < cfg.budget_spp:
        c += 2 ** (i + 2)
        possible_cumm.append(c)
        i += 1

    records = {
        "variance_inIter": PerformanceData(),
        "variance_groundTruth_inIter": PerformanceData(),
        "mse_groundTruth_inIter": PerformanceData(),
        "variance_endIter": PerformanceData(),
        "variance_groundTruth_endIter": PerformanceData(),
        "mse_groundTruth_endIter": PerformanceData(),
        "variance_estimated_final": PerformanceData(),
        "mse_groundTruth_blend": PerformanceData(),
    }

    budget_spp = cfg.budget_spp
    remaining = budget_spp
    cumm_spp = 0
    cumm_spp_prev = 0
    image_spp = 0
    iteration = 0
    is_final = False
    train_tree = True
    clear_data = True
    variance_prev = 0.0
    variance_current = 0.0
    prev_iter_image = None
    image = None
    cumm_time = 0.0
    total_rays = 0.0
    # per-segment (= contiguous moment-accumulation span) box-mean films +
    # self-variance estimates for the end-of-run inverse-variance
    # combination (an EXTENSION past the reference: its final image keeps
    # only the last iteration(s); every iteration's film is an independent
    # unbiased estimate, so the 1/Var-weighted mean is strictly better.
    # Weights use SELF-estimated variance only — no ground-truth peeking).
    segments = []
    import os as _os_blend

    blend_enabled = knobs.get_bool("PPG_INVVAR_BLEND")

    while remaining > 0:
        t_iter0 = time.perf_counter()
        seg_new = bool(clear_data)
        if clear_data:
            integrator.resetVarianceCounter()
            image_spp = 0
        curr_iter_image = None
        curr_iter_image_acc = None

        if not is_final:
            iter_spp = 2 ** (iteration + 2)
            if iter_spp == remaining:
                is_final = True
        else:
            iter_spp = remaining

        integrator.setIteration(iteration, is_final)
        print_title(f"Iteration {iteration}")
        print(
            f"SPP: {iter_spp}, cumm_SPP: {cumm_spp}, "
            f"remaining: {budget_spp - cumm_spp}, isFinalIter: {is_final}"
        )

        # Training is 1 spp/pass (reference main.py:192-197, one metric row
        # per spp). PPG_TRAIN_SPP>1 opts into batching k training samples
        # into ONE recorded dispatch (k-fold fewer in-iteration metric
        # rows; identical estimates — the per-slice RNG reproduces the
        # sequential passes and the splat is additive).
        import os as _os

        spp_per_pass = (
            cfg.batch_spp if is_final
            else max(1, knobs.get_int("PPG_TRAIN_SPP"))
        )
        iter_pass = math.ceil(iter_spp / spp_per_pass)
        iter_spp_count = 0

        # Device dispatch width within a final-iteration batch. The 4-spp
        # single dispatch was a round-2 win but REGRESSED once per-pass
        # fixed costs fell (measured: PT 0.62 s/spp at 1-spp dispatch vs
        # 0.86 s/spp at 4-spp, docs/PERF_NOTES.md round-3 session 2), so
        # the default is now 1-spp dispatches; the 4-spp *accounting*
        # (metric rows, blending weights, snapshots — main.py:123) is
        # unchanged, and the per-slice RNG makes the sub-dispatch split
        # reproduce the same sample streams (seed = seed0 + cumm_spp per
        # slice, main.py:218). PPG_FINAL_DISPATCH restores wider ones.
        final_dispatch = max(1, knobs.get_int("PPG_FINAL_DISPATCH"))

        # Fused per-pass path: one render dispatch + one post dispatch
        # per sub-pass, metric scalars deferred on device and fetched
        # once per iteration (same rows, same timestamps modulo the
        # removed per-pass round trips — the reference's metrics are
        # device reductions too, main.py:208-265). Mesh mode rides the
        # same protocol via sharded trace/post programs (round-4 verdict
        # item 6); only the stepped backend keeps the legacy loop.
        use_fused = not integrator._stepped
        if integrator.mesh is not None:
            final_dispatch = 1  # mesh driver passes are 1 spp/dispatch
        if use_fused:
            import jax as _jax
            import jax.numpy as _jnp

            h_px = scene.camera.height
            w_px = scene.camera.width
            acc_w = _jnp.zeros((h_px, w_px, 3), _jnp.float32)
            acc_u = _jnp.zeros((h_px, w_px, 3), _jnp.float32)
            rays_acc = _jnp.zeros((), _jnp.float32)
        pending_rows = []  # (elapse, image_spp, cumm_spp, var, var_gt, mse)

        for pass_i in range(iter_pass):
            curr_pass_spp = min(spp_per_pass, iter_spp - iter_spp_count)
            d = final_dispatch if is_final else curr_pass_spp
            if use_fused:
                done = 0
                outs = []
                while done < curr_pass_spp:
                    k = min(d, curr_pass_spp - done)
                    out = integrator.render_pass_driver(
                        cfg.initial_seed, cumm_spp + done, spp=k,
                        acc_w=acc_w, acc_u=acc_u,
                        w_w=k / iter_spp,
                        w_u=(k / curr_pass_spp) if is_final else 0.0,
                        spp_total=image_spp + done + k,
                        rays_acc=rays_acc, ground_truth=gt,
                    )
                    acc_w = out["acc_w"]
                    acc_u = out["acc_u"]
                    rays_acc = out["rays_acc"]
                    outs.append((done, k, out))
                    done += k
                # ONE blocking read per pass (deferred cascade-overflow
                # flags double as the sync): an overflowed sub-dispatch
                # contributed exactly nothing (device-gated), so re-run
                # it at full width and use the re-run's metrics
                flagged = [
                    (off, k, o) for off, k, o in outs if o["ovf"] is not None
                ]
                if flagged:
                    flags = np.asarray(
                        _jnp.stack([o["ovf"] for _, _, o in flagged])
                    )
                else:
                    flags = np.zeros(0, bool)
                    _jax.block_until_ready(out["mse"])
                reran = False
                for (off, k, _), bad in zip(flagged, flags):
                    if bad:
                        out = integrator.render_pass_driver(
                            cfg.initial_seed, cumm_spp + off, spp=k,
                            acc_w=acc_w, acc_u=acc_u,
                            w_w=k / iter_spp,
                            w_u=(k / curr_pass_spp) if is_final else 0.0,
                            spp_total=image_spp + curr_pass_spp,
                            rays_acc=rays_acc, ground_truth=gt,
                            force_full=True,
                        )
                        acc_w = out["acc_w"]
                        acc_u = out["acc_u"]
                        rays_acc = out["rays_acc"]
                        reran = True
                # row timestamps must cover the pass's post/metric
                # programs too (not just the render program the ovf flag
                # rides on): block on a post output before the row clock
                # stops, so steady and re-run rows are timed consistently
                _jax.block_until_ready(out["mse"])
                curr_iter_image = acc_w
                if is_final:
                    curr_iter_image_acc = acc_u
            else:
                img = None
                rays = 0.0
                done = 0
                while done < curr_pass_spp:
                    k = min(d, curr_pass_spp - done)
                    im, r = integrator.render_pass(
                        cfg.initial_seed, cumm_spp + done, spp=k
                    )
                    w_im = im * (k / curr_pass_spp)
                    img = w_im if img is None else img + w_im
                    rays += r
                    done += k
                total_rays += rays
                w_img = img * (curr_pass_spp / iter_spp)
                curr_iter_image = (
                    w_img if curr_iter_image is None
                    else curr_iter_image + w_img
                )
                if is_final:
                    curr_iter_image_acc = (
                        img
                        if curr_iter_image_acc is None
                        else curr_iter_image_acc + img
                    )
                # scalar fetch: forces the async backend to finish the
                # pass so per-pass wall-clock attribution stays honest
                float(curr_iter_image[0, 0, 0])
                if is_final:
                    float(curr_iter_image_acc[0, 0, 0])

            image_spp += curr_pass_spp
            iter_spp_count += curr_pass_spp
            cumm_spp += curr_pass_spp

            # per-pass progress line (reference progressbar, main.py:204-205)
            print(
                f"  pass {pass_i + 1}/{iter_pass} "
                f"(iter spp {iter_spp_count}/{iter_spp}, "
                f"{time.perf_counter() - t_iter0:.1f}s)",
                flush=True,
            )

            if cfg.record_in_iteration:
                elapse = (time.perf_counter() - t_iter0) + cumm_time
                if use_fused:
                    pending_rows.append(
                        (
                            elapse, image_spp, cumm_spp,
                            out["var"], out["var_gt"], out["mse"],
                        )
                    )
                else:
                    variance = integrator.computeVariance(image_spp)
                    records["variance_inIter"].append(
                        time=elapse, spp=image_spp, cumm_spp=cumm_spp,
                        iteration=iteration, variance=variance,
                    )
                    if gt is not None:
                        records["variance_groundTruth_inIter"].append(
                            time=elapse, spp=image_spp, cumm_spp=cumm_spp,
                            iteration=iteration,
                            variance=integrator.computeVariance(
                                image_spp, gt
                            ),
                        )
                        records["mse_groundTruth_inIter"].append(
                            time=elapse, spp=image_spp, cumm_spp=cumm_spp,
                            iteration=iteration,
                            mse=integrator.computeMSE(image_spp, gt),
                        )

            if is_final and cumm_spp in possible_cumm and cfg.save_outputs:
                # power-of-two cumulative-spp snapshots (main.py:267-278)
                cur_cnt = cumm_spp - cumm_spp_prev
                non_weighted = curr_iter_image_acc / (pass_i + 1)
                blend = (
                    non_weighted * cur_cnt
                    + (prev_iter_image if prev_iter_image is not None else 0)
                    * (image_spp - cur_cnt)
                ) / image_spp
                base = FileNameManager.generateImageFileName(iteration, image_spp)
                image_io.write_png(f"{base}_cumm_spp-{cumm_spp}.png", blend)
                exr_io.write(f"{base}_cumm_spp-{cumm_spp}.exr", blend)

        if use_fused:
            # one stacked fetch converts every deferred per-pass metric
            # scalar of the iteration (the old path paid 3 round trips
            # per pass); row values/timestamps are unchanged
            total_rays += float(rays_acc)
            if pending_rows:
                import jax.numpy as _jnp

                flat = np.asarray(
                    _jnp.stack(
                        [s for row in pending_rows for s in row[3:6]]
                    )
                ).reshape(-1, 3)
                for (elapse_r, spp_r, cumm_r, *_), (v, vg, m) in zip(
                    pending_rows, flat
                ):
                    records["variance_inIter"].append(
                        time=elapse_r, spp=spp_r, cumm_spp=cumm_r,
                        iteration=iteration, variance=float(v),
                    )
                    if gt is not None:
                        records["variance_groundTruth_inIter"].append(
                            time=elapse_r, spp=spp_r, cumm_spp=cumm_r,
                            iteration=iteration, variance=float(vg),
                        )
                        records["mse_groundTruth_inIter"].append(
                            time=elapse_r, spp=spp_r, cumm_spp=cumm_r,
                            iteration=iteration, mse=float(m),
                        )

        # two-iteration blend after training stopped (main.py:287-291)
        if is_final and not train_tree and prev_iter_image is not None:
            image = (
                curr_iter_image * iter_spp
                + prev_iter_image * (image_spp - iter_spp)
            ) / image_spp
        else:
            image = curr_iter_image

        variance = integrator.computeVariance(image_spp)
        variance_gt = (
            integrator.computeVariance(image_spp, gt) if gt is not None else 0.0
        )
        mse_gt = integrator.computeMSE(image_spp, gt) if gt is not None else 0.0
        elapse = (time.perf_counter() - t_iter0) + cumm_time

        records["variance_endIter"].append(
            time=elapse, spp=image_spp, cumm_spp=cumm_spp,
            iteration=iteration, variance=variance,
        )
        records["variance_groundTruth_endIter"].append(
            time=elapse, spp=image_spp, cumm_spp=cumm_spp,
            iteration=iteration, variance=variance_gt,
        )
        records["mse_groundTruth_endIter"].append(
            time=elapse, spp=image_spp, cumm_spp=cumm_spp,
            iteration=iteration, mse=mse_gt,
        )
        if blend_enabled:
            # capture this segment's box-mean film (the CSV-protocol image)
            # for the end-of-run invvar combination; a continued segment
            # (clear_data was False) REPLACES its previous snapshot since
            # sum_l kept accumulating
            try:
                seg = {
                    "mean": np.asarray(integrator.sum_l, np.float32)
                    / max(image_spp, 1),
                    "var": float(variance),
                    "spp": image_spp,
                    "iteration": iteration,
                }
                if seg_new or not segments:
                    segments.append(seg)
                else:
                    segments[-1] = seg
            except Exception as e:  # noqa: BLE001
                warnings.warn(
                    f"[train] blend-segment capture failed "
                    f"({type(e).__name__}: {str(e)[:120]}) — skipping"
                )
        print_bold_underline("Variance:", variance)
        print_bold_underline("Variance wrt. Ground Truth:", variance_gt)
        print_bold_underline("MSE wrt. Ground Truth:", mse_gt)

        # estimated final variance (main.py:323-328)
        budget_upto_prev = budget_spp - cumm_spp_prev
        variance_current = variance * image_spp / budget_upto_prev
        print_bold_underline("Estimated Variance Final Image:", variance_current)
        records["variance_estimated_final"].append(
            time=elapse, spp=image_spp, cumm_spp=cumm_spp,
            iteration=iteration, variance=variance_current,
        )

        # next-iteration decision tree (main.py:334-377)
        next_iter_spp = 2 ** (iteration + 3)
        remaining = budget_spp - cumm_spp
        if remaining > 0:
            stop = (
                cumm_spp > cfg.stable_variance_spp_threshold
                and variance_current > variance_prev
            ) or cumm_spp >= 1000
            if next_iter_spp < remaining:
                if stop:
                    is_final = True
                    train_tree = False
                    clear_data = False
            elif next_iter_spp == remaining:
                is_final = True
                if stop:
                    train_tree = False
                    clear_data = False
            else:
                is_final = True
                train_tree = False
                clear_data = False

        if train_tree:
            integrator.refineAndPrepareSDTreeForNextIteration()
            tree = integrator.tree_prev
            print(
                f"  refine: {getattr(tree, 'last_refine_seconds', 0.0):.2f}s"
                f" -> {tree.kd_count} kd nodes, {tree.q_count} quad nodes"
            )
        elif prev_iter_image is None:
            print_bold_underline("-- Stop training SDTree --")

        if budget_spp - cumm_spp <= 0:
            # budget exhausted: every render is done, so release the device
            # tree mirror BEFORE the final image develops/fetches below (on
            # big trees the mirror is ~GBs and the last PNG write OOM'd
            # with it resident)
            integrator.free_device_tree()

        prev_iter_image = image
        cumm_time += time.perf_counter() - t_iter0

        if cfg.save_outputs:
            # a snapshot write must never kill a multi-hundred-second run:
            # the image fetch is a device op and has OOM'd right after a
            # near-capacity refine (kd-C=2500 full-res ajar) — warn and
            # keep training instead
            try:
                base = FileNameManager.generateImageFileName(
                    iteration, image_spp
                )
                image_io.write_png(f"{base}_cumm_spp-{cumm_spp}.png", image)
                exr_io.write(f"{base}_cumm_spp-{cumm_spp}.exr", image)
                integrator.saveSDTreeToFile(
                    FileNameManager.generateTreeDataFileName(iteration)
                )
                integrator.saveSDTreeOBJ(
                    FileNameManager.generateOBJFileName(iteration)
                )
            except Exception as e:  # noqa: BLE001
                warnings.warn(
                    f"[train] iteration-{iteration} snapshot save failed "
                    f"({type(e).__name__}: {str(e)[:160]}) — continuing"
                )

        variance_prev = variance_current
        iteration += 1
        cumm_spp_prev = cumm_spp
        # flush the CSV streams after EVERY iteration (overwrite-in-place,
        # a few rows each): an end-of-run-only save lost all metric CSVs
        # when a kd-C=3000 run crashed at its very last image fetch
        if cfg.save_outputs:
            _save_csvs(cfg, records)

    # ---- end-of-run inverse-variance combination (extension) ----
    # Combine every segment's box-mean film with weights 1/Var_i (self
    # estimates). The reference's own final blend (main.py:287-291) is the
    # spp-weighted special case over the last two iterations; this uses
    # all iterations with principled weights. Reported as EXTRA outputs —
    # the reference-protocol CSVs/artifacts above are untouched.
    mse_blend = None
    blended = invvar_combine(segments) if blend_enabled else None
    if blended is not None:
        comb, ws, var_blend = blended
        if gt is not None:
            lw = np.array([0.212671, 0.715160, 0.072169], np.float32)
            d2 = ((comb - gt.reshape(-1, 3)) ** 2) @ lw
            mse_blend = float(np.mean(np.minimum(d2, 1e4)))
            records["mse_groundTruth_blend"].append(
                time=cumm_time, spp=cumm_spp, cumm_spp=cumm_spp,
                iteration=iteration - 1, variance=var_blend, mse=mse_blend,
            )
            print_bold_underline(
                "MSE invvar-combined image:", mse_blend,
                f"(weights {np.round(ws, 3).tolist()})",
            )
        if cfg.save_outputs:
            try:
                h, w_ = scene.camera.height, scene.camera.width
                img_b = comb.reshape(h, w_, 3)
                base = (
                    FileNameManager.IMAGE_FOLDER_PATH
                    + f"{cfg.scene}_invvar-blend_spp-{cumm_spp}"
                )
                image_io.write_png(base + ".png", img_b)
                exr_io.write(base + ".exr", img_b)
            except Exception as e:  # noqa: BLE001
                warnings.warn(
                    f"[train] invvar-blend save failed "
                    f"({type(e).__name__}: {str(e)[:120]})"
                )

    if cfg.save_outputs:
        _save_csvs(cfg, records)

    return {
        "image": image,
        "records": records,
        "integrator": integrator,
        "cumm_spp": cumm_spp,
        "time": cumm_time,
        "total_rays": total_rays,
        "mse": mse_gt,
        "mse_blend": mse_blend,
        "variance": variance,
    }


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell-box")
    ap.add_argument("--budget", type=int, default=252)
    ap.add_argument("--resx", type=int, default=None)
    ap.add_argument("--resy", type=int, default=None)
    ap.add_argument("--out", default="debug", help="output root directory")
    ap.add_argument(
        "--mesh", type=int, default=0,
        help="shard the wavefront over N devices (multi-chip DP; film "
        "height must divide by N)",
    )
    args = ap.parse_args()
    overrides = {}
    if args.resx:
        overrides["resx"] = args.resx
    if args.resy:
        overrides["resy"] = args.resy
    out = train(
        TrainConfig(scene=args.scene, budget_spp=args.budget,
                    scene_overrides=overrides, out_root=args.out or "debug",
                    mesh_devices=args.mesh)
    )
    blend_note = (
        f", invvar-blend MSE {out['mse_blend']:.6f}"
        if out.get("mse_blend") is not None
        else ""
    )
    print_bold_underline(
        f"done: {out['cumm_spp']} spp, {out['time']:.1f}s, "
        f"{out['total_rays'] / max(out['time'], 1e-9) / 1e6:.2f} Mrays/s, "
        f"MSE {out['mse']:.6f}{blend_note}"
    )
