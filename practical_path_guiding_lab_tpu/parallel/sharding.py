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

    def shard_fn(tree, lane_s, px_s, py_s, sl_s, sl2_s):
        L, rays, recs = render_guided_wavefront(
            scene, tree, seed0, pass_index, lane_s, px_s, py_s, iteration,
            record=record, bsdf_fraction=bsdf_fraction,
        )
        if record:
            # the accumulators CARRY previous passes' already-psum'd
            # totals; all-reduce only this pass's local delta over ICI
            # (psum of the carried part would multiply it by n_dev each
            # pass — 8^passes blowup)
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
        # L is in film order within the shard (1 lane per pixel row), so
        # the per-pixel moment update is elementwise and device-local
        sl_s = sl_s + L
        sl2_s = sl2_s + L * L
        return L, rays, tree2, sl_s, sl2_s

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp"), P(), P(), P("dp"), P("dp")),
        check_vma=False,
    )
    L, rays, tree2, sum_l, sum_l2 = fn(
        tree_dev, lane_ids, px, py, sum_l, sum_l2
    )
    return L, px, py, rays, (tree2 if record else None), (sum_l, sum_l2)


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
