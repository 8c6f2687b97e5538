"""PathGuidingIntegrator: stateful orchestration around the jitted guided
render pass — reference-parity surface (path_guiding_integrator.py:29-620):
setup, setIteration, per-pass render + moment accumulation,
computeVariance/computeMSE, refineAndPrepareSDTreeForNextIteration,
saveSDTreeToFile/loadSDTreeFromFile, saveSDTreeOBJ, resetVarianceCounter.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..guiding.sdtree import SDTree
from . import film as film_mod
from . import variance as var_mod


_SPLAT_JITS = {}


def develop_pass_image(scene, L, px, py):
    """Per-pass image with the scene's reconstruction filter (the metrics
    buffers stay box-filtered, matching the reference whose sumL bypasses
    the rfilter; the displayed image uses it, main.py:221-239)."""
    key = scene.camera.width, scene.camera.height, scene.rfilter
    if key not in _SPLAT_JITS:
        w, h, rf = key

        def fn(L, px, py):
            # lanes are always pixel-major aligned (film prologue), so the
            # scatter-free shifted-add splat applies
            img, wgt = film_mod.splat_filtered_aligned(w, h, px, py, L, rf)
            return film_mod.develop(img, wgt)

        _SPLAT_JITS[key] = jax.jit(fn)
    return _SPLAT_JITS[key](L, px, py)
from .guided import (
    _splat_jit,
    guided_wavefront_pass,
    render_guided_pass_stepped,
)
from . import path_tracer as pt_mod
from .path_tracer import _film_prologue
from .path_tracer import render_wavefront_stepped
from .. import knobs


_FILM_JIT = None


def _film_jit():
    global _FILM_JIT
    if _FILM_JIT is None:
        _FILM_JIT = jax.jit(_film_prologue)
    return _FILM_JIT


def _stepped_backend() -> bool:
    """Opt-in host-stepped bounce dispatch (one jitted bounce per call).
    Normally OFF: the fused single-jit pass is faster (no per-dispatch
    round trips) and compiles in seconds; stepped mode exists as a fallback
    for backends where big fused programs misbehave (PPG_TPU_STEPPED=1)."""
    import os

    return knobs.get_bool("PPG_TPU_STEPPED")


class PathGuidingIntegrator:
    def __init__(self, scene, bsdf_sampling_fraction=0.5):
        from .guided import log_fraction_policy

        log_fraction_policy()
        self.scene = scene
        self.bsdf_sampling_fraction = bsdf_sampling_fraction
        self.iteration = 0
        self.is_final = False
        n = scene.camera.width * scene.camera.height
        self.sum_l = jnp.zeros((n, 3))
        self.sum_l2 = jnp.zeros((n, 3))
        self.tree_prev: SDTree | None = None
        self.tree_current: SDTree | None = None
        self.dev_tree = None
        self.mesh = None  # multi-chip DP mesh (set_mesh)
        self._stepped = _stepped_backend()
        self._jit_wave = jax.jit(
            partial(guided_wavefront_pass, bsdf_fraction=bsdf_sampling_fraction),
            static_argnames=("record", "spp", "schedule"),
        )

    def set_mesh(self, mesh):
        """Enable multi-chip data parallelism: passes run through
        parallel.sharding.guided_pass_sharded (dp-sharded wavefront, psum'd
        SD-tree histograms and film moments)."""
        self.mesh = mesh

    # ------------------------------------------------------------------ #

    def setup(
        self,
        sd_tree_max_depth=20,
        quad_tree_max_depth=20,
        store_nee=True,
        bbox_eps=1e-4,
        kd_capacity=1 << 15,
        quad_capacity=1 << 20,
    ):
        """Reference setup (path_guiding_integrator.py:77-105): trees over
        the scene bbox +- eps (main.py:55-59)."""
        lo = np.asarray(self.scene.bbox_lo) - bbox_eps
        hi = np.asarray(self.scene.bbox_hi) + bbox_eps
        self.tree_current = SDTree(
            lo, hi,
            kd_max_depth=sd_tree_max_depth,
            quad_max_depth=quad_tree_max_depth,
            kd_capacity=kd_capacity,
            quad_capacity=quad_capacity,
            store_nee=store_nee,
        )
        self.tree_prev = self.tree_current.copy()
        self._sync_device()

    def _sync_device(self):
        """Device mirror: structure + prev irradiance (sampling) + zeroed
        accumulators (current splats)."""
        self.dev_tree = self.tree_prev.to_device()
        # Retire the async device-table derive BEFORE the driver issues
        # its next allocations: the derive's transient peak (structural
        # uploads + derived outputs + temps, ~8 GB at a 12.6M-node
        # kd-C=2000 tree) plus driver-side allocations OOM'd a run right
        # AFTER a successful refine (measured round 4). Blocking here
        # lets the upload buffers and temps free at their true death
        # point instead of overlapping the next iteration's setup.
        import gc

        import jax as _jax

        big = [
            a for a in (
                self.dev_tree.grid_v, self.dev_tree.sub_v,
                self.dev_tree.q_pack, self.dev_tree.leaf_geomp,
            ) if a is not None
        ]
        if big:
            _jax.block_until_ready(big)
        gc.collect()

    def setIteration(self, iteration, is_final):
        self.iteration = iteration
        self.is_final = is_final

    def resetVarianceCounter(self):
        self.sum_l = jnp.zeros_like(self.sum_l)
        self.sum_l2 = jnp.zeros_like(self.sum_l2)

    # ------------------------------------------------------------------ #

    def render_pass(self, seed0, cumm_spp, spp=1):
        """One pass of ``spp`` samples/pixel (single wavefront dispatch
        when supported); accumulates film moments; returns the
        filter-developed pass image ((H,W,3)) and rays cast."""
        if spp > 1 and (self.mesh is not None or self._stepped):
            # mesh/stepped paths dispatch per-sample; average the images
            img = None
            rays_tot = 0.0
            for sub in range(spp):
                im, r = self.render_pass(seed0, cumm_spp + sub)
                img = im if img is None else img + im
                rays_tot += r
            return img / spp, rays_tot
        if self.mesh is not None:
            from ..parallel.sharding import guided_pass_sharded

            # per-pixel film moments accumulate device-locally inside the
            # sharded step; the stop-training scalars come from psum
            # reductions (computeVariance/computeMSE below) — no full-film
            # gather on the training path (SURVEY.md section 2.3(b))
            L, px, py, rays, tree2, (self.sum_l, self.sum_l2) = (
                guided_pass_sharded(
                    self.scene, self.dev_tree, self.mesh, seed0, cumm_spp,
                    self.iteration, record=not self.is_final,
                    bsdf_fraction=self.bsdf_sampling_fraction,
                    sum_l=self.sum_l, sum_l2=self.sum_l2,
                )
            )
            if tree2 is not None:
                self.dev_tree = tree2
            img = develop_pass_image(self.scene, L, px, py)
            return img, float(rays)
        elif self._stepped:
            L, px, py, rays, dev = render_guided_pass_stepped(
                self.scene, self.dev_tree, self.dev_tree, seed0, cumm_spp,
                self.iteration, is_final=self.is_final,
                bsdf_fraction=self.bsdf_sampling_fraction,
            )
            self.dev_tree = dev
        else:
            record = not self.is_final
            row_widths = None
            if pt_mod.cascade_enabled():
                n_total = (
                    self.scene.camera.width * self.scene.camera.height * spp
                )
                key = (
                    pt_mod.scene_token(self.scene), n_total, "guided", record,
                    self.iteration > 1,
                )
                sched = pt_mod.plan_for(key, n_total, self.scene.max_depth)
                L, px, py, rays, recs, counts, ovf = self._jit_wave(
                    self.scene, self.dev_tree, seed0, cumm_spp,
                    self.iteration, record=record, spp=spp, schedule=sched,
                )
                if not pt_mod.plan_is_frozen(key):
                    pt_mod.plan_update(key, counts)
                if sched and bool(ovf):
                    # live lanes dropped (rare): truncated transport —
                    # discard and re-run this pass at full width, then
                    # refreeze the plan from the grown counts
                    sched = ()
                    L, px, py, rays, recs, counts, _ = self._jit_wave(
                        self.scene, self.dev_tree, seed0, cumm_spp,
                        self.iteration, record=record, spp=spp, schedule=(),
                    )
                    pt_mod.plan_update(key, counts)
                    pt_mod.plan_overflowed(key, n_total, self.scene.max_depth)
                # shrunk bounces wrote partial record rows: the splat can
                # statically slice each row to its width (~40% fewer lanes)
                row_widths = pt_mod.schedule_row_widths(
                    sched, n_total, self.scene.max_depth
                )
            else:
                L, px, py, rays, recs = self._jit_wave(
                    self.scene, self.dev_tree, seed0, cumm_spp,
                    self.iteration, record=record, spp=spp,
                )
            if record:
                self.dev_tree = _splat_jit(
                    self.dev_tree, recs, L, seed0, cumm_spp,
                    row_widths=row_widths,
                )
        self.sum_l, self.sum_l2 = var_mod.accumulate_moments_aligned(
            self.sum_l, self.sum_l2, L
        )
        img = develop_pass_image(self.scene, L, px, py)
        return img, float(rays)

    # ------------------------------------------------------------------ #
    # Fused driver post-pass: moments + develop + image accumulation +
    # all three CSV metrics in ONE dispatch, everything staying on device.
    # The old driver loop issued ~6 dispatches and ~4 blocking fetches per
    # pass (develop, moments, acc update, scalar sync, three metric
    # programs) — ~0.9 s/spp of tunnel round trips on the remote backend.
    # The reference's per-pass loop (main.py:208-265) computes its metrics
    # as device reductions too.
    # ------------------------------------------------------------------ #

    _POST_JITS: dict = {}

    def _post_jit_for(self, has_gt: bool):
        key = (
            self.scene.camera.width, self.scene.camera.height,
            self.scene.rfilter, has_gt,
        )
        cache = PathGuidingIntegrator._POST_JITS
        if key not in cache:
            w, h, rf, _ = key

            def fn(L, px, py, sum_l, sum_l2, acc_w, acc_u, w_w, w_u,
                   spp_total, rays_acc, rays, gate, gt=None):
                # async-overflow gating: an overflowed pass contributes
                # nothing (driver re-runs it on reading the deferred flag)
                L = L * gate
                rays = rays * gate
                sum_l, sum_l2 = var_mod.accumulate_moments_aligned(
                    sum_l, sum_l2, L
                )
                img, wgt = film_mod.splat_filtered_aligned(w, h, px, py, L, rf)
                img = film_mod.develop(img, wgt)
                acc_w = acc_w + img * w_w
                acc_u = acc_u + img * w_u
                var_self, var_gt, mse = var_mod.metrics_all(
                    sum_l, sum_l2, spp_total, gt
                )
                return (
                    sum_l, sum_l2, img, acc_w, acc_u,
                    var_self, var_gt, mse, rays_acc + rays,
                )

            cache[key] = jax.jit(
                fn, donate_argnums=(3, 4, 5, 6, 10)
            )
        return cache[key]

    def render_pass_driver(
        self, seed0, cumm_spp, spp, acc_w, acc_u, w_w, w_u,
        spp_total, rays_acc, ground_truth=None, force_full=False,
    ):
        """One driver pass with ZERO host round trips: render dispatch +
        (train) gated splat dispatch + one fused post dispatch, all async.
        The cascade overflow flag is returned as a DEVICE scalar ('ovf',
        None when no shrink schedule ran); an overflowed pass contributes
        exactly nothing (splat and post are gated by 1-ovf on device), so
        the caller re-invokes with ``force_full=True`` after reading the
        deferred flag — the re-run adds the true contribution.

        Returns a dict of DEVICE values: img, acc_w, acc_u (weighted /
        unweighted running images, ``acc += img * w``), var/var_gt/mse
        scalars for the pass's CSV row, rays_acc, ovf. Caller must block
        (e.g. on the stacked ovf flags, or ['mse']) before timestamping
        the row."""
        record = not self.is_final
        row_widths = None
        ovf = None
        gate = jnp.float32(1.0)
        if self._stepped:
            raise RuntimeError(
                "render_pass_driver: stepped mode uses render_pass"
            )
        if self.mesh is not None:
            # mesh mode rides the SAME fused protocol: one sharded trace
            # (+ in-shard splat with psum'd tree deltas, device-local film
            # moments) + one sharded post (halo-exchanged film splat,
            # psum'd metric scalars) — SURVEY.md section 2.3(b); round-4
            # verdict item 6 (mesh previously fell back to the legacy
            # ~10-round-trip per-pass loop)
            from ..parallel.sharding import (
                guided_pass_sharded, guided_post_sharded,
            )

            if spp != 1:
                raise ValueError("mesh driver pass is 1 spp per dispatch")
            L, px, py, rays, tree2, (self.sum_l, self.sum_l2) = (
                guided_pass_sharded(
                    self.scene, self.dev_tree, self.mesh, seed0, cumm_spp,
                    self.iteration, record=record,
                    bsdf_fraction=self.bsdf_sampling_fraction,
                    sum_l=self.sum_l, sum_l2=self.sum_l2,
                )
            )
            if tree2 is not None:
                self.dev_tree = tree2
            gt = (
                self._gt_device(ground_truth)
                if ground_truth is not None else None
            )
            img, acc_w, acc_u, var_self, var_gt, mse, rays_acc = (
                guided_post_sharded(
                    self.scene, self.mesh, L, px, py, self.sum_l,
                    self.sum_l2, acc_w, acc_u, w_w, w_u, spp_total,
                    rays_acc, rays, gt=gt,
                )
            )
            return {
                "img": img, "acc_w": acc_w, "acc_u": acc_u,
                "var": var_self, "var_gt": var_gt, "mse": mse,
                "rays_acc": rays_acc, "ovf": None,
            }
        if pt_mod.cascade_enabled():
            n_total = self.scene.camera.width * self.scene.camera.height * spp
            key = (
                pt_mod.scene_token(self.scene), n_total, "guided", record,
                self.iteration > 1,
            )
            sched = () if force_full else pt_mod.plan_for(
                key, n_total, self.scene.max_depth
            )
            L, px, py, rays, recs, counts, ovf_d = self._jit_wave(
                self.scene, self.dev_tree, seed0, cumm_spp,
                self.iteration, record=record, spp=spp, schedule=sched,
            )
            if not sched:
                # full width cannot overflow; its counts seed/refresh the
                # plan (the only blocking fetch, once per key + re-runs)
                pt_mod.plan_update(key, counts)
                if force_full:
                    pt_mod.plan_overflowed(key, n_total, self.scene.max_depth)
            else:
                ovf = ovf_d
                gate = 1.0 - ovf_d.astype(jnp.float32)
            row_widths = pt_mod.schedule_row_widths(
                sched, n_total, self.scene.max_depth
            )
        else:
            L, px, py, rays, recs = self._jit_wave(
                self.scene, self.dev_tree, seed0, cumm_spp,
                self.iteration, record=record, spp=spp,
            )
        if record:
            self.dev_tree = _splat_jit(
                self.dev_tree, recs, L, seed0, cumm_spp,
                row_widths=row_widths, gate=gate,
            )
        gt = (
            self._gt_device(ground_truth) if ground_truth is not None else None
        )
        post = self._post_jit_for(gt is not None)
        args = (
            L, px, py, self.sum_l, self.sum_l2, acc_w, acc_u,
            jnp.float32(w_w), jnp.float32(w_u), jnp.float32(spp_total),
            rays_acc, rays, gate,
        )
        out = post(*args, gt) if gt is not None else post(*args)
        (
            self.sum_l, self.sum_l2, img, acc_w, acc_u,
            var_self, var_gt, mse, rays_acc,
        ) = out
        return {
            "img": img, "acc_w": acc_w, "acc_u": acc_u,
            "var": var_self, "var_gt": var_gt, "mse": mse,
            "rays_acc": rays_acc, "ovf": ovf,
        }

    # ------------------------------------------------------------------ #

    def _gt_device(self, ground_truth):
        """Device-resident ground truth, cached by identity: the drivers
        call computeVariance/computeMSE with the same host array 2-3x per
        pass, and re-uploading the 11 MB film each call cost more than
        the metric itself on the remote backend."""
        cached = getattr(self, "_gt_cache", None)
        if cached is not None and cached[0] is ground_truth:
            return cached[1]
        dev = jnp.asarray(ground_truth.reshape(-1, 3))
        self._gt_cache = (ground_truth, dev)
        return dev

    def computeVariance(self, spp, ground_truth=None):
        mesh = getattr(self, "mesh", None)
        if mesh is not None:
            from ..parallel import sharding as sh

            if ground_truth is None:
                return sh.variance_self_sharded(
                    mesh, self.sum_l, self.sum_l2, spp
                )
            return sh.variance_gt_sharded(
                mesh, self.sum_l2, spp, ground_truth.reshape(-1, 3)
            )
        if ground_truth is None:
            return float(var_mod.compute_variance_self(self.sum_l, self.sum_l2, spp))
        gt = self._gt_device(ground_truth)
        return float(
            var_mod.compute_variance_gt(self.sum_l, self.sum_l2, spp, gt)
        )

    def computeMSE(self, spp, ground_truth):
        mesh = getattr(self, "mesh", None)
        if mesh is not None:
            from ..parallel import sharding as sh

            return sh.mse_sharded(
                mesh, self.sum_l, spp, ground_truth.reshape(-1, 3)
            )
        gt = self._gt_device(ground_truth)
        return float(var_mod.compute_mse(self.sum_l, spp, gt))

    # ------------------------------------------------------------------ #

    def free_device_tree(self):
        """Drop the device tree mirror. Called by the training driver once
        all renders are done (budget exhausted): on big trees the mirror is
        hundreds of MB to ~GBs of HBM, and keeping it resident through the
        final image develop/metric fetches caused a RESOURCE_EXHAUSTED at
        the last PNG write on a kd-C=3000 veach-ajar run (16.7M quad
        nodes). The host-authoritative tree (tree_prev/tree_current) is
        untouched, so save/plot/refine-from-host all still work."""
        self.dev_tree = None

    def refineAndPrepareSDTreeForNextIteration(self):
        """Reference :566-586: absorb splats -> set kd threshold -> refine ->
        compact -> prev = current -> reset current counters.

        HBM cap: a refined tree can outgrow one chip's device mirror (the
        kd C=2000 full-res ajar tree reaches 16.7M quad nodes and the
        derive program needs 18.6G of 15.75G HBM). Rather than kill a
        multi-hundred-second training run, the refine is attempted and —
        if the device mirror fails to compile/allocate — REVERTED: the
        run continues on the pre-refine structure, which keeps sampler,
        pdf and splat consistent while still using the newly absorbed
        irradiance. The reference has no equivalent (Dr.Jit trees live in
        host RAM); this is the single-chip memory-capacity policy."""
        self.tree_current.absorb_accumulators(self.dev_tree)
        # the old mirror is dead once its accumulators are absorbed; free
        # it BEFORE building the refined mirror — keeping both resident
        # doubled peak HBM during the rebuild and pushed the kd-C=2500
        # full-res ajar run over the edge (measured)
        self.dev_tree = None
        self.tree_current.set_refinement_threshold(self.iteration)
        snapshot = self.tree_current.copy()
        self.tree_current.refine()
        self.tree_prev = self.tree_current.copy()
        self.tree_current.reset_counters()
        if self.tree_prev.q_count >= (1 << 22):
            # big-tree rebuild: drop every cached executable first — the
            # per-shape-tier programs accumulated over the run pin device
            # constants and fragment the heap; a 12.6M-node mirror that
            # builds fine on a clean chip (measured, round-4 repro) OOM'd
            # in-run. Re-execution recompiles through the persistent
            # cache (seconds, not minutes). Deallocation on the remote
            # backend is asynchronous, so give it a moment to settle and
            # log the allocator's view for diagnosis.
            import gc
            import time as _time

            import jax as _jax

            _jax.clear_caches()
            gc.collect()
            _time.sleep(5.0)
            try:
                ms = _jax.devices()[0].memory_stats() or {}
                print(
                    "  [refine] HBM in use before rebuild: "
                    f"{ms.get('bytes_in_use', -1) / 1e9:.2f} G "
                    f"(peak {ms.get('peak_bytes_in_use', -1) / 1e9:.2f} G)",
                    flush=True,
                )
            except Exception:
                pass
        try:
            self._sync_device()
        except Exception as e:  # jax.errors.JaxRuntimeError: HBM OOM
            import gc
            import traceback
            import warnings

            warnings.warn(
                "[sdtree] refined tree's device mirror does not fit on "
                f"this chip ({type(e).__name__}: {str(e)[:200]}) — "
                "reverting the refine and continuing on the previous "
                "structure (irradiance update kept). Last frames:\n"
                + "".join(traceback.format_exc().splitlines(True)[-12:])
            )
            self.dev_tree = None  # drop any partially-built mirror
            gc.collect()
            self.tree_current = snapshot
            self.tree_prev = snapshot.copy()
            self.tree_current.reset_counters()
            try:
                self._sync_device()
            except Exception:
                # even the SMALLER pre-refine mirror can fail right after
                # a big-mirror OOM (orphaned buffers / fragmentation —
                # deallocation on the remote backend is asynchronous):
                # drop every cached executable, WAIT for the backend to
                # actually release, and retry
                import time as _time

                import jax as _jax

                self.dev_tree = None
                _jax.clear_caches()
                gc.collect()
                _time.sleep(15.0)
                self._sync_device()

    def saveSDTreeToFile(self, path):
        """Saves the PREV tree (reference :589-595 saves each iteration)."""
        self.tree_prev.save(path)

    def loadSDTreeFromFile(self, path):
        """npz -> prev; current = copy with reset counters (:597-608)."""
        self.tree_prev = SDTree.load(path)
        self.tree_current = self.tree_prev.copy()
        self.tree_current.reset_counters()
        self._sync_device()

    def saveSDTreeOBJ(self, path):
        self.tree_prev.save_obj(path)


class PathTracingIntegrator:
    """Unguided baseline with the same bookkeeping surface
    (path_tracing_integrator_py.py)."""

    def __init__(self, scene):
        self.scene = scene
        n = scene.camera.width * scene.camera.height
        self.sum_l = jnp.zeros((n, 3))
        self.sum_l2 = jnp.zeros((n, 3))
        self._stepped = _stepped_backend()

    def resetVarianceCounter(self):
        self.sum_l = jnp.zeros_like(self.sum_l)
        self.sum_l2 = jnp.zeros_like(self.sum_l2)

    def render_pass(self, seed0, pass_index, spp=1):
        if self._stepped:
            if spp > 1:
                # stepped backend has no multi-spp dispatch: average the
                # equivalent sequential passes (bitwise-equal stream)
                img = None
                rays_tot = 0.0
                for sub in range(spp):
                    im, r = self.render_pass(seed0, pass_index + sub)
                    rays_tot += r
                    img = im if img is None else img + im
                return img / spp, rays_tot
            lane_ids, px, py = _film_jit()(self.scene, seed0, pass_index)
            L, rays = render_wavefront_stepped(
                self.scene, seed0, pass_index, lane_ids, px, py
            )
        else:
            L, px, py, rays = pt_mod.render_pass_auto(
                self.scene, seed0, pass_index, spp=spp
            )
        self.sum_l, self.sum_l2 = var_mod.accumulate_moments_aligned(
            self.sum_l, self.sum_l2, L
        )
        img = develop_pass_image(self.scene, L, px, py)
        return img, float(rays)

    _gt_device = PathGuidingIntegrator._gt_device
    computeVariance = PathGuidingIntegrator.computeVariance
    computeMSE = PathGuidingIntegrator.computeMSE
    _post_jit_for = PathGuidingIntegrator._post_jit_for

    def render_pass_driver(
        self, seed0, pass_index, spp, acc_w, acc_u, w_w, w_u,
        spp_total, rays_acc, ground_truth=None, force_full=False,
    ):
        """Fused driver chunk for the unguided baseline: render dispatch +
        one post dispatch (moments + develop + acc + metrics), all values
        on device, overflow deferred — see
        PathGuidingIntegrator.render_pass_driver."""
        if self._stepped:
            raise RuntimeError("render_pass_driver: stepped mode unsupported")
        L, px, py, rays, ovf = pt_mod.render_pass_async(
            self.scene, seed0, pass_index, spp=spp, force_full=force_full
        )
        gate = (
            jnp.float32(1.0) if ovf is None
            else 1.0 - ovf.astype(jnp.float32)
        )
        gt = (
            self._gt_device(ground_truth) if ground_truth is not None else None
        )
        post = self._post_jit_for(gt is not None)
        args = (
            L, px, py, self.sum_l, self.sum_l2, acc_w, acc_u,
            jnp.float32(w_w), jnp.float32(w_u), jnp.float32(spp_total),
            rays_acc, rays, gate,
        )
        out = post(*args, gt) if gt is not None else post(*args)
        (
            self.sum_l, self.sum_l2, img, acc_w, acc_u,
            var_self, var_gt, mse, rays_acc,
        ) = out
        return {
            "img": img, "acc_w": acc_w, "acc_u": acc_u,
            "var": var_self, "var_gt": var_gt, "mse": mse,
            "rays_acc": rays_acc, "ovf": ovf,
        }
