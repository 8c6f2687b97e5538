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
):
    """One FULL guided pass sharded over the mesh: each device traces its
    pixel slice; when ``record`` is on (training iterations) it also
    reconstructs and splats its records locally, then the SD-tree leaf
    histograms are all-reduced with psum over ICI (the only cross-device
    traffic the algorithm needs, SURVEY.md section 2.3). Per-pass film
    moments (sum L, sum L^2 over the device's lanes) are also psum'd so the
    driver's variance/stop-training logic sees global scalars
    (reference path_guiding_integrator.py:404-426).

    Returns (L (N,3) in film order, px, py, rays_cast, updated tree or
    None, (momL, momL2) global (3,) film-moment sums)."""
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

    def shard_fn(tree, lane_s, px_s, py_s):
        L, rays, recs = render_guided_wavefront(
            scene, tree, seed0, pass_index, lane_s, px_s, py_s, iteration,
            record=record, bsdf_fraction=bsdf_fraction,
        )
        if record:
            tree2 = process_and_splat(tree, recs, L, seed0, pass_index)
            # all-reduce the splat histograms over ICI
            tree2 = tree2.replace(
                kd_vert_acc=jax.lax.psum(tree2.kd_vert_acc, "dp"),
                q_irr_acc=jax.lax.psum(tree2.q_irr_acc, "dp"),
            )
        else:
            tree2 = tree
        rays = jax.lax.psum(rays, "dp")
        momL = jax.lax.psum(jnp.sum(L, axis=0), "dp")
        momL2 = jax.lax.psum(jnp.sum(L * L, axis=0), "dp")
        return L, rays, tree2, momL, momL2

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp"), P(), P(), P(), P()),
        check_vma=False,
    )
    L, rays, tree2, momL, momL2 = fn(tree_dev, lane_ids, px, py)
    return L, px, py, rays, (tree2 if record else None), (momL, momL2)


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
