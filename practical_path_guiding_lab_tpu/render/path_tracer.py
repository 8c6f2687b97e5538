"""Unguided NEE path tracer with MIS — the baseline integrator.

Capability parity with the reference's ``path_tracing_integrator_py``
(path_tracing_integrator_py.py:49-228): per-bounce loop of intersect ->
emission MIS -> NEE with MIS -> BSDF sampling -> Russian roulette from
``rr_depth`` at p <= 0.95 with eta^2 correction. TPU-first: a
``lax.while_loop`` over the bounce axis carrying an SoA wavefront, one lane
per pixel sample; all control flow is masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import bsdf as bsdf_mod
from ..accel.traverse import intersect, occluded
from ..core import rng
from ..core.math import (
    dot, mis_power_heuristic, nan_to_zero, small_table_gather,
)
from ..scene import emitters as em_mod
from ..scene.camera import generate_rays


def compact_wavefront(s, keys3, keys1):
    """Stable-partition live lanes to the front of the wavefront so the
    intersection kernels can skip whole dead blocks (n_live watermark).

    It only runs when the live set has at least halved since the last
    compaction (lanes only ever die, so the old watermark stays valid when
    we skip). keys3/keys1: state keys holding (N,3) / (N,) arrays.

    All state columns are packed into ONE (N, C) f32 matrix and permuted
    with a single row gather: separate per-array gathers cost ~4-5 ms
    EACH on TPU at 1M lanes (the old form was ~69 ms per firing, ~23% of
    a whole pass; the packed form is ~one gather, tools/
    profile_gather_shapes.py entries f vs g)."""
    alive = s["active"]
    n = alive.shape[0]
    n_live = jnp.sum(alive.astype(jnp.int32))

    def do_compact(s):
        s = dict(s)
        live_rank = jnp.cumsum(alive.astype(jnp.int32)) - 1
        dead_rank = n_live + jnp.cumsum((~alive).astype(jnp.int32)) - 1
        new_pos = jnp.where(alive, live_rank, dead_rank)
        gather_idx = jnp.zeros(n, jnp.int32).at[new_pos].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        cols = []
        for k in keys3:
            v = s[k]
            cols += [v[:, 0], v[:, 1], v[:, 2]]
        for k in keys1:
            v = s[k]
            if v.dtype == jnp.bool_:
                cols.append(v.astype(jnp.float32))
            elif v.dtype in (jnp.int32, jnp.uint32):
                # bitcast, not value-cast: exact for any 32-bit payload
                cols.append(jax.lax.bitcast_convert_type(v, jnp.float32))
            else:
                cols.append(v)
        packed = jnp.stack(cols, axis=-1)  # (N, C)
        g = packed[gather_idx]             # THE one row gather
        i = 0
        for k in keys3:
            s[k] = g[:, i:i + 3]
            i += 3
        for k in keys1:
            v = s[k]
            col = g[:, i]
            i += 1
            if v.dtype == jnp.bool_:
                s[k] = col != 0.0
            elif v.dtype in (jnp.int32, jnp.uint32):
                s[k] = jax.lax.bitcast_convert_type(col, v.dtype)
            else:
                s[k] = col
        s["n_live"] = n_live
        return s

    def skip(s):
        return dict(s)

    return jax.lax.cond(n_live * 2 < s["n_live"], do_compact, skip, s)


_PT_KEYS3 = ("o", "d", "throughput", "L")
_PT_KEYS1 = ("eta_scale", "active", "prev_pdf", "prev_delta", "lane")


def rr_mode() -> str:
    """Russian-roulette semantics (PPG_RR env var):

    * ``reference`` (default) — kill at q = min(tp*eta^2, 0.95) WITHOUT
      reweighting survivors. This is what the reference actually computes:
      its 1/q lands on a dead temporary (`throughput_weight_max[rr_active]
      *= dr.rcp(rr_prob)`, path_guiding_integrator.py:372-378 and
      path_tracing_integrator_py.py:180-186 — `throughput_weight_max` is a
      copy made by dr.max, never read again), so deep low-throughput paths
      are truncated rather than amplified. Slightly biased (dims transport
      past rr_depth) but tail-free — and the semantics the reference's
      guided-vs-PT comparisons were run with.
    * ``unbiased`` — survivors reweighted by 1/q (textbook RR). Heavier
      tails: a lane with tp=0.01 that survives is re-inflated to tp=1 and
      re-enters the high-variance NEE lottery at full strength.
    * ``clamped`` — unbiased with q clamped to [0.1, 0.95]: amplification
      bounded at 10x per bounce.
    """
    import os

    return os.environ.get("PPG_RR", "reference")


def apply_rr(tp_new, eta_scale, u_rr, do_rr, n_rays):
    """Shared RR step -> (tp_new, survive). Mode picked at trace time."""
    mode = rr_mode()
    q_raw = jnp.max(tp_new, axis=-1) * eta_scale
    if mode == "clamped":
        q = jnp.clip(q_raw, 0.1, 0.95)
    else:
        q = jnp.minimum(q_raw, 0.95)
    survive = jnp.where(do_rr, u_rr < q, jnp.ones(n_rays, bool))
    if mode != "reference":
        tp_new = jnp.where(
            do_rr, tp_new / jnp.maximum(q, 1e-6)[:, None], tp_new
        )
    return tp_new, survive


def _init_state(scene, px, py, lane_ids):
    n_rays = px.shape[0]
    sx = px / scene.camera.width
    sy = py / scene.camera.height
    ray = generate_rays(scene.camera, sx, sy)
    return {
        "lane": lane_ids,
        "lane_base": lane_ids[0],
        "n_live": jnp.int32(n_rays),
        "o": ray.o,
        "d": ray.d,
        "throughput": jnp.ones((n_rays, 3)),
        "L": jnp.zeros((n_rays, 3)),
        "eta_scale": jnp.ones(n_rays),
        "active": jnp.ones(n_rays, bool),
        "prev_pdf": jnp.full((n_rays,), 1.0),
        "prev_delta": jnp.ones(n_rays, bool),  # treat depth-0 emission as unweighted
        "depth": jnp.int32(0),
        "rays_cast": jnp.float32(0.0),  # closest-hit + shadow rays (for Mrays/s)
    }


def _bounce_body(scene, seed0, pass_index, s):
    """One bounce of the wavefront; pure function of the state dict.
    Lanes are compacted live-first; randomness is keyed by s["lane"]
    (original sample ids), so compaction never changes results."""
    lane_ids = s["lane"]
    n_rays = lane_ids.shape[0]
    # per-spp-slice RNG streams: multi-spp dispatches reproduce sequential
    # 1-spp passes bitwise (rng.spp_fold)
    rpass, rlane = rng.spp_fold(
        pass_index, lane_ids, scene.camera.width * scene.camera.height
    )
    s = dict(s)
    depth = s["depth"]

    # dead-but-uncompacted lanes get t_far=-inf so their STALE rays fail
    # every slab test and stop inflating the tile-shared walk's node union
    # (compaction only fires when the live set halves)
    si = intersect(
        scene, s["o"], s["d"],
        t_far=jnp.where(s["active"], 1e30, -1e30),
        n_live=s["n_live"],
    )
    active = s["active"]
    s["rays_cast"] = s["rays_cast"] + jnp.sum(active.astype(jnp.float32))
    esc = active & ~si.valid
    hit = active & si.valid

    L = s["L"]
    tp = s["throughput"]

    # --- emission on hit (MIS vs previous bounce pdf) ---
    em = scene.emitters
    Le = jnp.where(
        (si.emitter >= 0)[:, None],
        small_table_gather(em.radiance, jnp.maximum(si.emitter, 0)),
        0.0,
    )
    # one-sided: emit only toward the front side (original orientation)
    Le = jnp.where(si.entering[:, None], Le, 0.0)
    pdf_em_dir = em_mod.pdf_hit_dir(em, s["o"], s["d"], si.emitter, si.t, si.n)
    w_mis = jnp.where(
        s["prev_delta"], 1.0, mis_power_heuristic(s["prev_pdf"], pdf_em_dir)
    )
    L = L + jnp.where(hit[:, None], tp * Le * w_mis[:, None], 0.0)

    # --- escaped rays: envmap / constant emitters ---
    if em.has_envmap:
        env_L = em_mod.env_eval(em, s["d"])
        pdf_env = em_mod.pdf_env_dir(em, s["d"])
        w_env = jnp.where(
            s["prev_delta"], 1.0, mis_power_heuristic(s["prev_pdf"], pdf_env)
        )
        L = L + jnp.where(esc[:, None], tp * env_L * w_env[:, None], 0.0)

    # --- NEE ---
    ctx = bsdf_mod.make_context(scene, si)
    u_sel = rng.uniform1(seed0, rpass, depth, rng.PurposeId.NEE_SELECT, rlane)
    u1, u2 = rng.uniform2(seed0, rpass, depth, rng.PurposeId.NEE_POS, rlane)
    nee = em_mod.sample_nee(em, scene.tris, si.p, u_sel, u1, u2)
    f_nee, pdf_bsdf_nee = bsdf_mod.eval_pdf(ctx, si.wi_world, nee["wo"])
    nee_pre = hit & nee["valid"] & (nee["pdf"] > 0)
    nee_pre = nee_pre & (dot(nee["wo"], si.n) > 0)  # same hemisphere as geo normal
    # known-zero contributions (delta lobes, back-side eval, black emitter
    # sample) need no shadow ray: masked lanes get t_max=-inf so they drop
    # out of the any-hit walk's tile union entirely
    nee_pre = nee_pre & (jnp.max(f_nee * nee["Li"], axis=-1) > 0)
    shadowed = occluded(
        scene, si.p + si.n * 1e-4, nee["wo"],
        jnp.where(nee_pre, nee["dist"], -1e30),
        n_live=s["n_live"],
    )
    nee_ok = nee_pre & ~shadowed
    # rays_cast counts the reference-equivalent workload (one NEE shadow
    # ray per hit, as Dr.Jit's masked megakernel executes) so Mrays/s stays
    # comparable across rounds; known-zero lanes resolve trivially in-kernel
    s["rays_cast"] = s["rays_cast"] + jnp.sum(hit.astype(jnp.float32))
    w_nee = jnp.where(
        nee["is_delta"], 1.0, mis_power_heuristic(nee["pdf"], pdf_bsdf_nee)
    )
    contrib = tp * f_nee * nee["Li"] * (w_nee / jnp.maximum(nee["pdf"], 1e-20))[:, None]
    L = L + jnp.where(nee_ok[:, None], nan_to_zero(contrib), 0.0)

    # --- BSDF sampling ---
    ub0, ub1, ub2 = rng.uniform3(seed0, rpass, depth, rng.PurposeId.BSDF_SAMPLE, rlane)
    bs = bsdf_mod.sample(ctx, si.wi_world, ub0, ub1, ub2)
    tp_new = tp * bs["weight"]
    alive = hit & bs["valid"] & (jnp.max(tp_new, axis=-1) > 0)

    # --- Russian roulette (reference: depth >= rr_depth, p <= 0.95,
    #     eta^2 correction; path_guiding_integrator.py:367-381) ---
    eta_scale = s["eta_scale"] * bs["eta"] ** 2
    u_rr = rng.uniform1(seed0, rpass, depth, rng.PurposeId.RR, rlane)
    do_rr = depth >= scene.rr_depth  # scalar (loop counter)
    tp_new, survive = apply_rr(tp_new, eta_scale, u_rr, do_rr, n_rays)
    alive = alive & survive

    s["o"] = jnp.where(alive[:, None], si.p + bs["wo"] * 1e-4, s["o"])
    s["d"] = jnp.where(alive[:, None], bs["wo"], s["d"])
    s["throughput"] = jnp.where(alive[:, None], tp_new, tp)
    s["L"] = L
    s["eta_scale"] = jnp.where(alive, eta_scale, s["eta_scale"])
    s["active"] = alive
    s["prev_pdf"] = jnp.where(alive, bs["pdf"], s["prev_pdf"])
    s["prev_delta"] = jnp.where(alive, bs["delta"], s["prev_delta"])
    s["depth"] = depth + 1
    return compact_wavefront(s, list(_PT_KEYS3), list(_PT_KEYS1))


_bounce_step = jax.jit(_bounce_body)


def render_wavefront(scene, seed0, pass_index, lane_ids, px, py):
    """Trace one wavefront of camera samples; returns radiance (N,3).

    Single fused jit (lax.while_loop over bounces) — used on CPU and inside
    shard_map.
    """
    state = _init_state(scene, px, py, lane_ids)

    def cond(s):
        return (s["depth"] < scene.max_depth) & (s["n_live"] > 0)

    def body(s):
        return _bounce_body(scene, seed0, pass_index, s)

    final = jax.lax.while_loop(cond, body, state)
    # un-permute the compacted lanes back to film order (lane ids are
    # GLOBAL; subtract the shard-local base so this works under shard_map)
    n = px.shape[0]
    idx = final["lane"] - lane_ids[0]
    L = jnp.zeros((n, 3)).at[idx].set(final["L"])
    return nan_to_zero(L), final["rays_cast"]


_init_jit = None


def render_wavefront_stepped(scene, seed0, pass_index, lane_ids, px, py):
    """Host-stepped variant: one jitted bounce per dispatch. The axon TPU
    backend compiles Pallas-in-while_loop pathologically slowly (~80s per
    kernel) and adds ~25x per-iteration overhead; a python loop over a
    single cached jitted bounce avoids both.
    """
    global _init_jit
    if _init_jit is None:
        _init_jit = jax.jit(_init_state)
    state = _init_jit(scene, px, py, lane_ids)
    for depth in range(scene.max_depth):
        state = _bounce_step(scene, seed0, pass_index, state)
        if depth >= 8 and depth % 4 == 0:
            if not int(state["n_live"]):
                break
    n = px.shape[0]
    idx = state["lane"] - lane_ids[0]
    L = jnp.zeros((n, 3)).at[idx].set(state["L"])
    return nan_to_zero(L), state["rays_cast"]


def render_pass(scene, seed0, pass_index, jitter=True, spp=1):
    """Render one pass over the full film; returns per-sample radiance
    ((H*W*spp, 3)) plus film coordinates. The reference renders training
    iterations 1 spp per pass (main.py:192) and the final iteration in
    4-spp batches (main.py:123); ``spp`` > 1 traces all samples in ONE
    wavefront dispatch, amortizing the fixed per-dispatch cost over a
    larger in-flight ray count."""
    w, h = scene.camera.width, scene.camera.height
    n = w * h
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    px = jnp.tile(xx.reshape(-1), spp)
    py = jnp.tile(yy.reshape(-1), spp)
    lane_ids = jnp.arange(n * spp, dtype=jnp.int32)
    if jitter:
        rpass, rlane = rng.spp_fold(pass_index, lane_ids, n)
        u1, u2 = rng.uniform2(seed0, rpass, 0, rng.PurposeId.CAMERA, rlane)
        px = px + u1
        py = py + u2
    else:
        px = px + 0.5
        py = py + 0.5
    L, rays_cast = render_wavefront(scene, seed0, pass_index, lane_ids, px, py)
    return L, px, py, rays_cast


_film_prologue_jit = None


def _film_prologue(scene, seed0, pass_index):
    """Jittable film-sample generation (jittered pixel positions)."""
    w, h = scene.camera.width, scene.camera.height
    n = w * h
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    lane_ids = jnp.arange(n, dtype=jnp.int32)
    u1, u2 = rng.uniform2(seed0, pass_index, 0, rng.PurposeId.CAMERA, lane_ids)
    return lane_ids, xx.reshape(-1) + u1, yy.reshape(-1) + u2
