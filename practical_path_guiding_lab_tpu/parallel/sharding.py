"""Multi-chip data parallelism: shard the pixel-sample wavefront over a
device mesh; reduce film moments and (for guided rendering) SD-tree
histograms with psum over ICI.

The reference is single-GPU (SURVEY.md section 2.3) — this module is the
TPU-native scaling layer it lacks: rendering is embarrassingly parallel
over pixel samples; the ONLY cross-device traffic the algorithm needs is
 (a) all-reduce of quadtree irradiance / kd-tree vertex-count histograms
     between passes (the splat is a fixed-size segment-sum per device),
 (b) all-reduce of scalar film moments for the stop-training logic,
 (c) replicated tree refinement (deterministic, no communication).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core import rng
from ..render.path_tracer import render_wavefront


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return Mesh(devs[:n_devices], (axis,))


def render_pass_sharded(scene, mesh: Mesh, seed0: int, pass_index: int):
    """Render one 1-spp pass with rays sharded over the mesh.

    Returns (L (N,3) sharded, pixel index (N,), rays_cast scalar).
    The film stays device-local (each device owns its pixel rows);
    rays_cast is psum'd as a demonstration of the metric reduction path.
    """
    w, h = scene.camera.width, scene.camera.height
    n_dev = mesh.devices.size
    assert h % n_dev == 0, f"film height {h} must divide over {n_dev} devices"

    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    px = xx.reshape(-1)
    py = yy.reshape(-1)
    lane_ids = jnp.arange(w * h, dtype=jnp.int32)
    u1, u2 = rng.uniform2(seed0, pass_index, 0, rng.PurposeId.CAMERA, lane_ids)
    px = px + u1
    py = py + u2

    def shard_fn(lane_s, px_s, py_s):
        L, rays = render_wavefront(scene, seed0, pass_index, lane_s, px_s, py_s)
        rays = jax.lax.psum(rays, "dp")
        return L, rays

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp"), P()),
        check_vma=False,
    )
    L, rays = fn(lane_ids, px, py)
    return L, px, py, rays


def guided_pass_sharded(
    scene, tree_dev, mesh: Mesh, seed0: int, pass_index: int, iteration,
    record: bool = True, bsdf_fraction: float = 0.5,
    sum_l=None, sum_l2=None,
):
    """One FULL guided pass sharded over the mesh: each device traces its
    pixel slice; when ``record`` is on (training iterations) it also
    reconstructs and splats its records locally, then the SD-tree leaf
    histograms are all-reduced with psum over ICI (the only cross-device
    traffic the algorithm needs, SURVEY.md section 2.3). Per-pixel film
    moments (sumL, sumL2 — reference path_guiding_integrator.py:404-426)
    are accumulated DEVICE-LOCALLY inside the sharded step: each device
    owns its film rows' moment buffers; only the stop-training scalars are
    ever reduced (variance_scalars_sharded), so no full-film gather is
    needed for the training logic on a multi-host mesh.

    Returns (L (N,3) in film order, px, py, rays_cast, updated tree or
    None, (sum_l, sum_l2) updated per-pixel moment buffers, dp-sharded)."""
    from ..render.guided import process_and_splat, render_guided_wavefront

    w, h = scene.camera.width, scene.camera.height
    n_dev = mesh.devices.size
    assert h % n_dev == 0, f"film height {h} must divide over {n_dev} devices"
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    lane_ids = jnp.arange(w * h, dtype=jnp.int32)
    u1, u2 = rng.uniform2(seed0, pass_index, 0, rng.PurposeId.CAMERA, lane_ids)
    px = xx.reshape(-1) + u1
    py = yy.reshape(-1) + u2
    if sum_l is None:
        sum_l = jnp.zeros((w * h, 3))
    if sum_l2 is None:
        sum_l2 = jnp.zeros((w * h, 3))

    from ..render.path_tracer import scene_token

    key = (scene_token(scene), id(mesh), record, float(bsdf_fraction))
    fn = _SHARDED_TRACE_CACHE.get(key)
    if fn is None:
        def shard_fn(tree, lane_s, px_s, py_s, sl_s, sl2_s, seed0,
                     pass_index, iteration):
            L, rays, recs = render_guided_wavefront(
                scene, tree, seed0, pass_index, lane_s, px_s, py_s,
                iteration, record=record, bsdf_fraction=bsdf_fraction,
            )
            if record:
                # the accumulators CARRY previous passes' already-psum'd
                # totals; all-reduce only this pass's local delta over ICI
                # (psum of the carried part would multiply it by n_dev
                # each pass — 8^passes blowup)
                kd_acc0, q_acc0 = tree.kd_vert_acc, tree.q_irr_acc
                tree2 = process_and_splat(
                    tree, recs, L, seed0, pass_index, lane_offset=lane_s[0]
                )
                tree2 = tree2.replace(
                    kd_vert_acc=kd_acc0
                    + jax.lax.psum(tree2.kd_vert_acc - kd_acc0, "dp"),
                    q_irr_acc=q_acc0
                    + jax.lax.psum(tree2.q_irr_acc - q_acc0, "dp"),
                )
            else:
                tree2 = tree
            rays = jax.lax.psum(rays, "dp")
            # L is in film order within the shard (1 lane per pixel row),
            # so the per-pixel moment update is elementwise, device-local
            sl_s = sl_s + L
            sl2_s = sl2_s + L * L
            return L, rays, tree2, sl_s, sl2_s

        # jitted + cached: the scalars are traced args so one program
        # serves every pass (the old per-call closure re-traced per pass)
        fn = jax.jit(jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P(), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
                P(), P(), P(),
            ),
            out_specs=(P("dp"), P(), P(), P("dp"), P("dp")),
            check_vma=False,
        ))
        _SHARDED_TRACE_CACHE[key] = fn
    L, rays, tree2, sum_l, sum_l2 = fn(
        tree_dev, lane_ids, px, py, sum_l, sum_l2,
        jnp.int32(seed0), jnp.int32(pass_index), jnp.int32(iteration),
    )
    return L, px, py, rays, (tree2 if record else None), (sum_l, sum_l2)


_SHARDED_TRACE_CACHE: dict = {}


# --------------------------------------------------------------------------- #
# Stop-training scalars from device-local moments (SURVEY.md section 2.3(b)):
# per-pixel math runs on each device's film slice; ONLY the scalar
# numerator/denominator cross devices (psum over ICI).
# --------------------------------------------------------------------------- #


def _scalar_reduction(mesh: Mesh, local_fn, *arrays):
    def f(*xs):
        v = local_fn(*xs)  # per-pixel values, shape (n_local,)
        s = jax.lax.psum(jnp.sum(v), "dp")
        c = jax.lax.psum(jnp.float32(v.shape[0]), "dp")
        return s / c

    fn = jax.shard_map(
        f, mesh=mesh, in_specs=tuple(P("dp") for _ in arrays),
        out_specs=P(), check_vma=False,
    )
    return float(fn(*arrays))


def variance_self_sharded(mesh, sum_l, sum_l2, spp):
    """compute_variance_self via psum'd scalars (no film gather)."""
    from ..core.math import luminance
    from ..render.variance import CLAMP

    def local(a, b):
        L = a / spp
        L2 = b / spp
        var = luminance(L2 - L * L)
        return jnp.minimum(var, CLAMP)

    v = _scalar_reduction(mesh, local, sum_l, sum_l2)
    return v / max(spp - 1.0, 1.0) if spp > 1.0 else v


def variance_gt_sharded(mesh, sum_l2, spp, gt):
    from ..core.math import luminance
    from ..render.variance import CLAMP

    def local(b, g):
        var = luminance(b / spp - g * g)
        return jnp.minimum(var, CLAMP)

    return _scalar_reduction(mesh, local, sum_l2, jnp.asarray(gt)) / spp


def mse_sharded(mesh, sum_l, spp, gt):
    from ..core.math import luminance
    from ..render.variance import CLAMP

    def local(a, g):
        diff2 = luminance((a / spp - g) ** 2)
        return jnp.minimum(diff2, CLAMP)

    return _scalar_reduction(mesh, local, sum_l, jnp.asarray(gt))


# --------------------------------------------------------------------------- #
# Fused driver post for mesh mode (round-4 verdict item 6): film splat +
# develop + image accumulation + all three CSV metrics in ONE sharded
# dispatch, everything device-local except (a) the psum'd metric scalars
# and (b) a 1-2 row film-halo exchange over ICI for tent/gaussian
# reconstruction filters (filter support spills across the row-sharded
# film's slice boundaries; ppermute sends each device's spill rows to its
# neighbours — drops at the film edge match the single-device bounds clip).
# --------------------------------------------------------------------------- #


def _aligned_splat_halo(width, h_local, u1, u2, val, rfilter, axis):
    """Shard-local film splat for pixel-aligned jittered samples with
    halo exchange; numerically identical to
    film.splat_filtered_aligned on the full film (same shift math, same
    add order per pixel)."""
    from ..render import film as film_mod

    kind = film_mod.FILTER_IDS.get(rfilter, film_mod.FILTER_TENT)
    u1 = u1.reshape(h_local, width)
    u2 = u2.reshape(h_local, width)
    val = val.reshape(h_local, width, 3)
    if kind == film_mod.FILTER_BOX:
        return val, jnp.ones((h_local, width))
    r = 1 if kind == film_mod.FILTER_TENT else 2
    imgp = jnp.zeros((h_local + 2 * r, width, 3))
    wgtp = jnp.zeros((h_local + 2 * r, width))

    for oy in range(-r, r + 1):
        for ox in range(-r, r + 1):
            fx = jnp.abs(u1 - (ox + 0.5))
            fy = jnp.abs(u2 - (oy + 0.5))
            if kind == film_mod.FILTER_TENT:
                w = jnp.maximum(1.0 - fx, 0.0) * jnp.maximum(1.0 - fy, 0.0)
            else:
                sig2 = 2.0 * 0.5 * 0.5
                cutoff = jnp.exp(-(r * r) / sig2)
                wx = jnp.maximum(jnp.exp(-(fx * fx) / sig2) - cutoff, 0.0)
                wy = jnp.maximum(jnp.exp(-(fy * fy) / sig2) - cutoff, 0.0)
                w = wx * wy
            c = val * w[..., None]
            # x shift within the row (rows are wholly owned): zero fill
            cpad = jnp.pad(c, ((0, 0), (max(ox, 0), max(-ox, 0)), (0, 0)))
            wpad = jnp.pad(w, ((0, 0), (max(ox, 0), max(-ox, 0))))
            xs = max(-ox, 0)
            csh = cpad[:, xs:xs + width]
            wsh = wpad[:, xs:xs + width]
            # y shift = placement into the padded row range [r+oy, ..)
            imgp = imgp.at[r + oy:r + oy + h_local].add(csh)
            wgtp = wgtp.at[r + oy:r + oy + h_local].add(wsh)

    n = jax.lax.axis_size(axis)
    img = imgp[r:r + h_local]
    wgt = wgtp[r:r + h_local]
    if n > 1:
        # my top halo rows belong to device i-1's last rows; bottom halo
        # to device i+1's first rows. Devices with no source receive 0
        # (film-edge spills drop, like the single-device bounds clip).
        up = [(i, i - 1) for i in range(1, n)]
        down = [(i, i + 1) for i in range(n - 1)]
        recv_tail_i = jax.lax.ppermute(imgp[:r], axis, up)
        recv_tail_w = jax.lax.ppermute(wgtp[:r], axis, up)
        recv_head_i = jax.lax.ppermute(imgp[r + h_local:], axis, down)
        recv_head_w = jax.lax.ppermute(wgtp[r + h_local:], axis, down)
        img = img.at[h_local - r:].add(recv_tail_i).at[:r].add(recv_head_i)
        wgt = wgt.at[h_local - r:].add(recv_tail_w).at[:r].add(recv_head_w)
    return img, wgt


_DRIVER_POST_CACHE: dict = {}


def guided_post_sharded(scene, mesh: Mesh, L, px, py, sum_l, sum_l2,
                        acc_w, acc_u, w_w, w_u, spp_total, rays_acc, rays,
                        gt=None):
    """Mesh-mode fused driver post (one sharded dispatch): shard-local
    film splat (halo-exchanged) + develop + weighted image accumulation +
    the three CSV metrics as psum'd device scalars — the multi-chip
    equivalent of PathGuidingIntegrator._post_jit_for. ``sum_l/sum_l2``
    are the ALREADY-UPDATED per-pixel moments (guided_pass_sharded
    accumulates them device-locally inside the trace step).

    Returns (img (H,W,3) row-sharded, acc_w, acc_u, var, var_gt, mse,
    rays_acc)."""
    from ..core.math import luminance
    from ..render.path_tracer import scene_token
    from ..render.variance import CLAMP

    w_px, h_px = scene.camera.width, scene.camera.height
    n_dev = mesh.devices.size
    h_local = h_px // n_dev
    rfilter = scene.rfilter
    has_gt = gt is not None
    key = (scene_token(scene), id(mesh), has_gt)
    fn = _DRIVER_POST_CACHE.get(key)
    if fn is None:
        def post_fn(L_s, px_s, py_s, sl_s, sl2_s, aw_s, au_s, w_w, w_u,
                    spp_total, rays_acc, rays, *gt_s):
            u1 = px_s - jnp.floor(px_s)
            u2 = py_s - jnp.floor(py_s)
            img, wgt = _aligned_splat_halo(
                w_px, h_local, u1, u2, L_s, rfilter, "dp"
            )
            from ..render import film as film_mod

            img = film_mod.develop(img, wgt)
            aw_s = aw_s + img * w_w
            au_s = au_s + img * w_u
            # metrics: per-pixel math device-local, ONLY scalars cross
            # devices (psum) — reference-exact formula order
            # (variance.py / path_guiding_integrator.py:503-550)
            spp = spp_total
            Lm = sl_s / spp
            L2m = sl2_s / spp
            var_px = jnp.minimum(luminance(L2m - Lm * Lm), CLAMP)
            num = jax.lax.psum(jnp.sum(var_px), "dp")
            cnt = jax.lax.psum(jnp.float32(var_px.shape[0]), "dp")
            var_self = num / cnt
            var_self = jnp.where(
                spp > 1.0, var_self / jnp.maximum(spp - 1.0, 1.0), var_self
            )
            if gt_s:
                g = gt_s[0]
                vg_px = jnp.minimum(luminance(L2m - g * g), CLAMP)
                var_gt = jax.lax.psum(jnp.sum(vg_px), "dp") / cnt / spp
                mse_px = jnp.minimum(luminance((Lm - g) ** 2), CLAMP)
                mse = jax.lax.psum(jnp.sum(mse_px), "dp") / cnt
            else:
                var_gt = jnp.zeros(())
                mse = jnp.zeros(())
            return (
                img, aw_s, au_s, var_self, var_gt, mse, rays_acc + rays
            )

        dp = P("dp")
        rep = P()
        in_specs = [dp, dp, dp, dp, dp, dp, dp, rep, rep, rep, rep, rep]
        if has_gt:
            in_specs.append(dp)
        fn = jax.jit(jax.shard_map(
            post_fn, mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(dp, dp, dp, rep, rep, rep, rep),
            check_vma=False,
        ))
        _DRIVER_POST_CACHE[key] = fn
    args = [
        L, px, py, sum_l, sum_l2, acc_w, acc_u,
        jnp.float32(w_w), jnp.float32(w_u), jnp.float32(spp_total),
        rays_acc, jnp.asarray(rays, jnp.float32),
    ]
    if has_gt:
        args.append(gt)
    return fn(*args)


def guided_train_step_sharded(
    scene, tree_dev, mesh: Mesh, seed0: int, pass_index: int, iteration,
    bsdf_fraction: float = 0.5,
):
    """Back-compat wrapper: one recorded training pass; returns
    (L, rays_cast, updated tree)."""
    L, _, _, rays, tree2, _ = guided_pass_sharded(
        scene, tree_dev, mesh, seed0, pass_index, iteration,
        record=True, bsdf_fraction=bsdf_fraction,
    )
    return L, rays, tree2
