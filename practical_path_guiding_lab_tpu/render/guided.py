"""Path-guiding integrator: one-sample MIS between the BSDF and the
SD-tree directional distribution, guided-aware NEE MIS, per-vertex record
writing and post-pass splatting into the current tree.

Reference semantics (path_guiding_integrator.py):
 * guiding only when iteration > 1 and the sampled lobe is non-delta (:283,286)
 * woPdf = f * bsdf_pdf + (1-f) * tree_pdf, f = bsdfSamplingFraction (:310)
 * NEE surface pdf = f * bsdf_pdf + (1-f) * tree_pdf * P(smooth lobe) (:226-253)
 * records at globalIndex = ray*max_depth + depth (:318-346)
 * radiance reconstruction: outgoing = (Lfinal - throughputRadiance) /
   throughputBsdf; incoming = outgoing / bsdf_weight; luminance (:434-453)
 * record filters: active, not both-radiance-zero, woPdf > 0 & finite (:456-478)
 * splat: vertCount += 1; irradiance += luminance/woPdf at the path
   direction, + luminance(nee)/woPdf at the NEE direction (:455-464)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import bsdf as bsdf_mod
from ..accel.traverse import intersect, occluded
from ..core import rng
from ..core.math import (
    dot, luminance, mis_power_heuristic, nan_to_zero, small_table_gather,
)
from ..core.records import PathRecords
from ..core.sphere_map import canonical_to_dir, dir_to_canonical
from ..guiding import sdtree as sd
from ..scene import emitters as em_mod
from ..scene.camera import generate_rays
from .. import knobs


def adaptive_fraction_enabled() -> bool:
    """Per-lane adaptive bsdfSamplingFraction (default on): the tree's
    mixture share is scaled by its usable-hemisphere mass. Set
    PPG_ADAPTIVE_FRACTION=0 for the reference's constant 0.5
    (path_guiding_integrator.py:223)."""
    return knobs.get_bool("PPG_ADAPTIVE_FRACTION")


_policy_logged = False


def log_fraction_policy():
    """One line per process stating the active mixture-fraction policy, so
    A/B comparisons against the reference can't silently run with a
    non-reference default."""
    global _policy_logged
    if _policy_logged:
        return
    _policy_logged = True
    import sys

    if adaptive_fraction_enabled():
        pol = knobs.get("PPG_FRAC_POLICY")
        print(
            "[guided] adaptive per-lane bsdfSamplingFraction ON "
            f"(PPG_FRAC_POLICY={pol}); set PPG_ADAPTIVE_FRACTION=0 for the "
            "reference's constant fraction (path_guiding_integrator.py:223)",
            file=sys.stderr,
        )
    else:
        print(
            "[guided] constant bsdfSamplingFraction (reference semantics)",
            file=sys.stderr,
        )


def _mixture_fraction(hemi, vert_cnt, depth, bsdf_fraction):
    """Per-lane bsdfSamplingFraction. Reference mode: the constant
    (path_guiding_integrator.py:223). Adaptive mode (default): scale the
    tree's share by its usable hemisphere mass h — f = 1 - (1-f0)*h —
    so cells whose flux lies below this surface's horizon degrade to
    BSDF sampling instead of wasting up to ~86% of their tree picks
    (unbiased: every pdf uses the same per-lane fraction)."""
    if not adaptive_fraction_enabled():
        return jnp.full(hemi.shape, bsdf_fraction)
    policy = knobs.get("PPG_FRAC_POLICY")
    if policy == "trust":  # only trees with >50% usable mass
        share = jnp.maximum(2.0 * hemi - 1.0, 0.0)
    elif policy.startswith("hsq"):
        share = hemi * hemi
    else:  # "h": tree share proportional to usable mass
        share = hemi
    if policy.endswith("m"):  # maturity gate: distrust sparse cells
        share = share * jnp.clip(vert_cnt / 1000.0, 0.0, 1.0)
    frac = 1.0 - (1.0 - bsdf_fraction) * share
    max_guided_depth = knobs.get_int("PPG_GUIDE_MAX_DEPTH")
    return jnp.where(depth < max_guided_depth, frac, 1.0)


def _init_state(scene, px, py, lane_ids, record: bool):
    n_rays = px.shape[0]
    sx = px / scene.camera.width
    sy = py / scene.camera.height
    ray = generate_rays(scene.camera, sx, sy)
    state = {
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
        "prev_delta": jnp.ones(n_rays, bool),
        "depth": jnp.int32(0),
        "rays_cast": jnp.float32(0.0),
    }
    if record:
        state["recs"] = PathRecords.zeros(
            n_rays, scene.max_depth,
            slim=not knobs.get_bool("PPG_FULL_RECORDS"),
        )
    return state


def _bounce_body(scene, tree_prev, seed0, pass_index, iteration,
                 bsdf_fraction, s):
    """One guided bounce; pure function of the state dict. Recording is on
    iff the state carries a 'recs' entry (structural, so one jit each).
    Lanes are compacted live-first; randomness and record writes are keyed
    by s["lane"] (original sample ids)."""
    lane_ids = s["lane"]
    n_rays = lane_ids.shape[0]
    # per-spp-slice RNG streams: multi-spp dispatches reproduce sequential
    # 1-spp passes bitwise (rng.spp_fold)
    rpass, rlane = rng.spp_fold(
        pass_index, lane_ids, scene.camera.width * scene.camera.height
    )
    record = "recs" in s
    use_guiding = iteration > 1  # reference :223,283 — traced scalar is fine
    s = dict(s)
    depth = s["depth"]

    # dead-but-uncompacted lanes get t_far=-inf so their STALE rays fail
    # every slab test and stop inflating the tile-shared walk's node union
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
    em = scene.emitters

    # --- emission with MIS vs previous mixture pdf ---
    Le = jnp.where(
        (si.emitter >= 0)[:, None],
        small_table_gather(em.radiance, jnp.maximum(si.emitter, 0)),
        0.0,
    )
    Le = jnp.where(si.entering[:, None], Le, 0.0)
    pdf_em_dir = em_mod.pdf_hit_dir(em, s["o"], s["d"], si.emitter, si.t, si.n)
    w_mis = jnp.where(
        s["prev_delta"], 1.0, mis_power_heuristic(s["prev_pdf"], pdf_em_dir)
    )
    L = L + jnp.where(hit[:, None], tp * Le * w_mis[:, None], 0.0)

    if em.has_envmap:
        env_L = em_mod.env_eval(em, s["d"])
        pdf_env = em_mod.pdf_env_dir(em, s["d"])
        w_env = jnp.where(
            s["prev_delta"], 1.0, mis_power_heuristic(s["prev_pdf"], pdf_env)
        )
        L = L + jnp.where(esc[:, None], tp * env_L * w_env[:, None], 0.0)

    # --- NEE sampling (emitter side) ---
    ctx = bsdf_mod.make_context(scene, si)
    u_sel = rng.uniform1(seed0, rpass, depth, rng.PurposeId.NEE_SELECT, rlane)
    u1, u2 = rng.uniform2(seed0, rpass, depth, rng.PurposeId.NEE_POS, rlane)
    nee = em_mod.sample_nee(em, scene.tris, si.p, u_sel, u1, u2)
    f_nee, pdf_bsdf_nee = bsdf_mod.eval_pdf(ctx, si.wi_world, nee["wo"])
    smooth_frac = bsdf_mod.smooth_fraction(ctx, si.wi_world)
    nee_pre = hit & nee["valid"] & (nee["pdf"] > 0)
    nee_pre = nee_pre & (dot(nee["wo"], si.n) > 0)
    # known-zero contributions need no shadow ray: masked lanes get
    # t_max=-inf so they drop out of the any-hit walk's tile union
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

    # --- one-sample-MIS direction: BSDF vs SD-tree (:272-311) ---
    ub0, ub1, ub2 = rng.uniform3(seed0, rpass, depth, rng.PurposeId.BSDF_SAMPLE, rlane)
    bs = bsdf_mod.sample(ctx, si.wi_world, ub0, ub1, ub2)

    u_guide = rng.uniform1(seed0, rpass, depth, rng.PurposeId.GUIDE_SELECT, rlane)
    g1, g2 = rng.uniform2(seed0, rpass, depth, rng.PurposeId.GUIDE_DIR, rlane)

    # All SD-tree descents behind one lax.cond: unguided iterations
    # (0 and 1, and pure-PT comparisons) skip the gather-heavy tree work
    # entirely; guided iterations run it once per bounce. Every tree
    # gather is masked to the lanes that actually consume its result
    # (gathers are HBM-latency-bound: pruned reads are direct wins).
    def _tree_work(args):
        p, ns, wo_nee, bs_wo, g1, g2, hit, nee_ok, bs_delta, u_g = args
        kd_leaf, slot, srow = sd.kd_lookup_grid(tree_prev, p, ok=hit)
        h = sd.hemisphere_flat(tree_prev, slot, ns, ok=hit)
        frac = _mixture_fraction(h, srow[..., 4], depth, bsdf_fraction)
        # tree-vs-BSDF pick (reference :283,286 minus the use_guiding
        # term, which is True inside this branch)
        take = hit & ~bs_delta & (u_g >= frac)
        xy2 = dir_to_canonical(jnp.concatenate([wo_nee, bs_wo], axis=0))
        slot2 = jnp.concatenate([slot, slot])
        srow2 = jnp.concatenate([srow, srow], axis=0)
        # pdf AND leaf ids from one packed gather chain: the leaf ids are
        # captured into the records so the splat needs no point location.
        # Gathers are HBM-latency-bound, so each half is masked to exactly
        # the lanes that consume it: the NEE half only where the shadow
        # ray PASSED (w_nee is zeroed elsewhere); the BSDF half never on
        # tree-sampled lanes (their pdf is the alias sample's t_pdf_s and
        # their record leaf is cap_leaf_t) and, when not recording, never
        # on delta lanes (do_mix is False there; records do need
        # cap_leaf_b for delta vertices).
        ok_b = hit & ~take
        if not record:
            ok_b = ok_b & ~bs_delta
        ok2 = jnp.concatenate([hit & nee_ok, ok_b])
        pdf2, leaf2 = sd.quad_pdf_leaf_fast2(
            tree_prev, slot2, srow2, xy2, ok=ok2
        )
        nn = p.shape[0]
        t_pdf_nee, t_pdf_b = pdf2[:nn], pdf2[nn:]
        leaf_nee, leaf_b = leaf2[:nn], leaf2[nn:]
        t_xy, t_pdf_s, leaf_t = sd.quad_sample_fast2(
            tree_prev, srow, g1, g2, ok=take
        )
        return (
            t_pdf_nee, t_xy, t_pdf_s, t_pdf_b, frac, take,
            kd_leaf, leaf_nee, leaf_b, leaf_t,
        )

    def _no_tree(args):
        p = args[0]
        z = jnp.zeros(p.shape[:-1], jnp.float32)
        neg = jnp.full(p.shape[:-1], -1, jnp.int32)
        return (
            z, jnp.zeros(p.shape[:-1] + (2,), jnp.float32), z, z,
            jnp.full(p.shape[:-1], bsdf_fraction, jnp.float32),
            jnp.zeros(p.shape[:-1], bool),
            neg, neg, neg, neg,
        )

    (
        tree_pdf_nee, tree_xy, tree_pdf_t, tree_pdf_b, frac, take_tree,
        cap_kd, cap_leaf_nee, cap_leaf_b, cap_leaf_t,
    ) = jax.lax.cond(
        use_guiding,
        _tree_work,
        _no_tree,
        (
            si.p, si.ns, nee["wo"], bs["wo"], g1, g2,
            hit, nee_ok, bs["delta"], u_guide,
        ),
    )
    surface_pdf = jnp.where(
        use_guiding,
        frac * pdf_bsdf_nee
        + (1.0 - frac) * tree_pdf_nee * smooth_frac,
        pdf_bsdf_nee,
    )

    # NEE contribution with guided-aware MIS weight
    w_nee = jnp.where(
        nee["is_delta"], 1.0, mis_power_heuristic(nee["pdf"], surface_pdf)
    )
    Lr_dir = jnp.where(
        nee_ok[:, None],
        nan_to_zero(
            tp
            * f_nee
            * nee["Li"]
            * (w_nee / jnp.maximum(nee["pdf"], 1e-20))[:, None]
        ),
        0.0,
    )
    L = L + Lr_dir

    do_mix = use_guiding & ~bs["delta"]  # :283,286

    wo_tree = canonical_to_dir(tree_xy)
    f_tree, bsdf_pdf_tree = bsdf_mod.eval_pdf(ctx, si.wi_world, wo_tree)

    wo = jnp.where(take_tree[:, None], wo_tree, bs["wo"])
    bsdf_pdf = jnp.where(take_tree, bsdf_pdf_tree, bs["pdf"])
    # tree pdf of the chosen direction (tree_pdf_b from the cond above)
    tree_pdf = jnp.where(take_tree, tree_pdf_t, tree_pdf_b)

    # f * cos of the chosen direction for mixture-weight lanes
    f_bsdf_dir = bs["weight"] * bs["pdf"][:, None]  # = f*cos for smooth lanes
    f_mix = jnp.where(take_tree[:, None], f_tree, f_bsdf_dir)
    wo_pdf_mix = frac * bsdf_pdf + (1.0 - frac) * tree_pdf
    weight_mix = f_mix / jnp.maximum(wo_pdf_mix, 1e-20)[:, None]

    wo_pdf = jnp.where(do_mix, wo_pdf_mix, bs["pdf"])
    bsdf_weight = jnp.where(do_mix[:, None], weight_mix, bs["weight"])
    valid_dir = jnp.where(do_mix, wo_pdf > 0, bs["valid"])
    bsdf_weight = jnp.where(
        valid_dir[:, None] & jnp.isfinite(bsdf_weight), bsdf_weight, 0.0
    )

    # --- record this vertex (:318-346) ---
    if record:
        store = hit  # & ~final (record=False in final iteration)
        r = s["recs"]
        rec_idx = lane_ids - s["lane_base"]  # shard-local original row

        def put(field, value, mask=None):
            # depth-major layout: each bounce writes one contiguous row
            arr = getattr(r, field)
            if mask is not None:
                value = jnp.where(
                    mask[:, None] if value.ndim > 1 else mask, value, 0.0
                )
            if value.shape[0] == arr.shape[1]:
                return jax.lax.dynamic_update_index_in_dim(
                    arr, value, depth, 0
                )
            # cascade-shrunk wavefront: partial row write at column 0; the
            # untouched tail keeps lane=-1 (PathRecords.zeros), so the
            # splat's record mask drops it
            return jax.lax.dynamic_update_slice(
                arr,
                value[None].astype(arr.dtype),
                (depth,) + (0,) * (arr.ndim - 1),
            )

        nee_rad_rec = Lr_dir / jnp.maximum(tp, 1e-20)
        updates = dict(
            lane=put("lane", jnp.where(store, rec_idx, -1)),
            position=put("position", si.p, store),
            canonical_dir=put("canonical_dir", dir_to_canonical(wo), store),
            nee_dir=put("nee_dir", dir_to_canonical(nee["wo"]), store & nee_ok),
            # captured splat targets (-1 where unavailable: unguided
            # iterations or unstored lanes -> splat falls back to lookups)
            kd_leaf=put("kd_leaf", jnp.where(store, cap_kd, -1)),
            q_leaf=put(
                "q_leaf",
                jnp.where(
                    store,
                    jnp.where(take_tree, cap_leaf_t, cap_leaf_b),
                    -1,
                ),
            ),
            q_leaf_nee=put(
                "q_leaf_nee",
                jnp.where(store & nee_ok, cap_leaf_nee, -1),
            ),
        )
        if r.splat_ca is not None:
            # folded reconstruction coefficients (see PathRecords): the
            # splat reads value = dot(L_final, ca) - b, nee = splat_nee —
            # identical math to the raw-field reconstruction, with the
            # zero/bad-pdf guards applied per channel at record time
            lum_w = jnp.asarray([0.212671, 0.715160, 0.072169], jnp.float32)
            good_pdf = (wo_pdf > 0) & jnp.isfinite(wo_pdf)
            den = tp * bsdf_weight  # (N,3) thrBsdf * bsdfWeight
            inv_den = jnp.where(jnp.abs(den) > 0, 1.0 / den, 0.0)
            safe_pdf = jnp.maximum(wo_pdf, 1e-30)
            ca = jnp.where(
                good_pdf[:, None], lum_w * inv_den / safe_pdf[:, None], 0.0
            )
            b_val = jnp.where(
                good_pdf,
                jnp.sum(lum_w * L * inv_den, axis=-1) / safe_pdf,
                0.0,
            )
            nee_val = jnp.where(
                good_pdf, luminance(nee_rad_rec) / safe_pdf, 0.0
            )
            updates.update(
                splat_ca=put("splat_ca", nan_to_zero(ca), store),
                splat_b=put("splat_b", nan_to_zero(b_val), store),
                splat_nee=put(
                    "splat_nee", nan_to_zero(nee_val), store & nee_ok
                ),
            )
        else:
            updates.update(
                throughput_radiance=put("throughput_radiance", L, store),
                throughput_bsdf=put("throughput_bsdf", tp, store),
                bsdf_weight=put("bsdf_weight", bsdf_weight, store),
                nee_radiance=put("nee_radiance", nee_rad_rec, store & nee_ok),
                wo_pdf=put("wo_pdf", wo_pdf, store),
                bsdf_pdf=put("bsdf_pdf", bs["pdf"], store),
                is_delta=put("is_delta", bs["delta"] & store),
            )
        s["recs"] = r.replace(**updates)

    # --- spawn / throughput / RR ---
    tp_new = tp * bsdf_weight
    alive = hit & valid_dir & (jnp.max(tp_new, axis=-1) > 0)
    eta_scale = s["eta_scale"] * bs["eta"] ** 2
    u_rr = rng.uniform1(seed0, rpass, depth, rng.PurposeId.RR, rlane)
    do_rr = depth >= scene.rr_depth
    from .path_tracer import apply_rr

    tp_new, survive = apply_rr(tp_new, eta_scale, u_rr, do_rr, n_rays)
    alive = alive & survive

    s["o"] = jnp.where(alive[:, None], si.p + wo * 1e-4, s["o"])
    s["d"] = jnp.where(alive[:, None], wo, s["d"])
    s["throughput"] = jnp.where(alive[:, None], tp_new, tp)
    s["L"] = L
    s["eta_scale"] = jnp.where(alive, eta_scale, s["eta_scale"])
    s["active"] = alive
    s["prev_pdf"] = jnp.where(alive, wo_pdf, s["prev_pdf"])
    s["prev_delta"] = jnp.where(alive, bs["delta"], s["prev_delta"])
    s["depth"] = depth + 1
    from .path_tracer import _PT_KEYS1, _PT_KEYS3, compact_wavefront

    return compact_wavefront(s, list(_PT_KEYS3), list(_PT_KEYS1))


_bounce_step = jax.jit(_bounce_body, static_argnames=("bsdf_fraction",))


def render_guided_wavefront(
    scene, tree_prev, seed0, pass_index, lane_ids, px, py, iteration,
    record: bool, bsdf_fraction: float = 0.5, schedule=None,
):
    """Single-jit guided wavefront (lax.while_loop) — CPU / shard_map path.

    ``schedule`` (STATIC): None = full width, (L, rays, recs) return; a
    cascade schedule / the empty probe tuple adds (counts, overflow) —
    see path_tracer.run_cascade. Records stay full-width (their rows carry
    explicit lane ids; shrunk bounces write partial rows)."""
    state = _init_state(scene, px, py, lane_ids, record)
    max_depth = scene.max_depth
    n = px.shape[0]

    def body(s):
        return _bounce_body(
            scene, tree_prev, seed0, pass_index, iteration, bsdf_fraction, s
        )

    if schedule is None:
        def cond(s):
            return (s["depth"] < max_depth) & (s["n_live"] > 0)

        final = jax.lax.while_loop(cond, body, state)
        idx = final["lane"] - lane_ids[0]
        L = nan_to_zero(jnp.zeros((n, 3)).at[idx].set(final["L"]))
        return L, final["rays_cast"], (final["recs"] if record else None)

    from .path_tracer import run_cascade

    film = jnp.zeros((n, 3))
    sched = tuple(schedule) if schedule else ((max_depth, n),)
    final, film, counts, overflow = run_cascade(
        state, film, sched, body, max_depth, lane_ids[0]
    )
    film = nan_to_zero(film.at[final["lane"] - lane_ids[0]].add(final["L"]))
    return (
        film, final["rays_cast"], (final["recs"] if record else None),
        counts, overflow,
    )


_init_jit = jax.jit(_init_state, static_argnames=("record",))


def render_guided_wavefront_stepped(
    scene, tree_prev, seed0, pass_index, lane_ids, px, py, iteration,
    record: bool, bsdf_fraction: float = 0.5,
):
    """Host-stepped guided wavefront: one jitted bounce per dispatch (the
    axon backend compiles Pallas-in-while_loop pathologically slowly)."""
    state = _init_jit(scene, px, py, lane_ids, record)
    for depth in range(scene.max_depth):
        state = _bounce_step(
            scene, tree_prev, seed0, pass_index, iteration, bsdf_fraction,
            state,
        )
        if depth >= 8 and depth % 4 == 0:
            if not int(state["n_live"]):
                break
    n = px.shape[0]
    idx = state["lane"] - lane_ids[0]
    L = nan_to_zero(jnp.zeros((n, 3)).at[idx].set(state["L"]))
    return L, state["rays_cast"], (state["recs"] if record else None)


def splat_filter_mode() -> str:
    """Stochastic splat filtering mode (Mueller's practical improvement):
    '0' point splats (reference default), '1' spatial (jitter records
    within their kd leaf extent — box filter in expectation; can leak
    energy through thin geometry), 'dir' directional (jitter each
    direction within its quad leaf width — non-leaking)."""
    return knobs.get("PPG_SPLAT_FILTER")


def process_and_splat(tree_current: sd.SDTreeDevice, recs: PathRecords, L_final,
                      seed0=0, pass_index=0, lane_offset=0, row_widths=None,
                      gate=None):
    """Reconstruct per-vertex incident radiance and splat into the current
    tree (reference processPathData + scatterDataIntoSDTree + addDataPropagate).
    Returns the updated tree. ``L_final`` must be in FILM order (the record
    rows carry original sample indices). ``lane_offset``: global id of this
    shard's first lane, so sharded splat jitter draws independent streams
    per device.

    ``row_widths`` (STATIC, optional): per-depth record-row widths from the
    wavefront-shrink cascade (path_tracer.schedule_row_widths). Rows written
    by a shrunk bounce only hold entries in their first ``w`` columns (the
    tail is lane=-1 padding), so the splat slices each depth row to its
    width and runs the whole reconstruct+scatter chain over sum(w_d) lanes
    instead of D*N — on veach-ajar that is ~7.5M instead of 12M (the deep
    post-RR rows are ~0% occupied). Identical results: the dropped entries
    are masked zeros, and the jitter stream ids reproduce the full-width
    flat indices (depth*N + column)."""
    d, n = recs.lane.shape
    flat_ids = None
    if row_widths is not None and tuple(row_widths) != (n,) * d:
        rw = tuple(row_widths)
        assert len(rw) == d, (len(rw), d)

        def _sel(a):
            if a is None:
                return None
            return jnp.concatenate([a[i, :w] for i, w in enumerate(rw)], axis=0)

        recs = PathRecords(
            **{k: _sel(getattr(recs, k)) for k in recs.__dataclass_fields__}
        )
        flat_ids = jnp.concatenate(
            [i * n + jnp.arange(w, dtype=jnp.int32) for i, w in enumerate(rw)]
        )
    # Row gather by sample id. A (V,3)-row gather output forces the
    # T(8,128) minor-dim pad 3 -> 128 on TPU (the same pathology measured
    # for (M,2) operands, docs/PERF_NOTES.md); 4-wide rows gather at the
    # 1-D floor (gather-shape microbench: u32[R,4] == floor), so the film
    # is padded with one zero column before the gather.
    L4 = jnp.concatenate(
        [L_final, jnp.zeros((L_final.shape[0], 1), L_final.dtype)], axis=-1
    )
    Lv = L4[jnp.maximum(recs.lane, 0)][..., :3]  # (D, N, 3) by sample row
    if recs.splat_ca is not None:
        # folded-coefficient path (production trace): value is linear in
        # L_final; the guards are baked into the coefficients. The
        # subtraction can cancel catastrophically when dot(L, ca) ~ b
        # with huge 1/throughput coefficients (deep low-weight paths), so
        # values below the fp noise floor of the two terms snap to zero —
        # which also restores the raw path's value==0 record-drop
        # semantics for no-further-contribution vertices. Values are also
        # capped ABOVE: the raw reconstruction runs (L-Lrec)/thrBsdf
        # /bsdfWeight stepwise in f32, so extreme-1/throughput records
        # overflow to inf mid-chain and are sanitized to 0 — the folded
        # single product den=thrBsdf*bsdfWeight keeps them FINITE
        # (~1e29..1e38) and one such splat poisons a quad root's flux
        # total, whose 1% split threshold then goes negative/huge and
        # refinement explodes (observed: 5 records at +-1e36 grew the
        # quad pool past 134M nodes at iteration 3 on veach-ajar).
        # Physical value scales here are < ~1e12; 1e20 <= cancellation
        # noise scale; negatives are nonphysical (ratio of nonnegatives).
        t1 = jnp.sum(Lv * recs.splat_ca, axis=-1)
        raw = t1 - recs.splat_b
        noise = 4e-7 * (jnp.abs(t1) + jnp.abs(recs.splat_b))
        value = nan_to_zero(
            jnp.where((raw > noise) & (raw <= 1e20), raw, 0.0)
        )
        nee_value = recs.splat_nee
        mask = (recs.lane >= 0) & ~((value == 0) & (nee_value == 0))
    else:
        outgoing = nan_to_zero(
            (Lv - recs.throughput_radiance)
            / jnp.where(
                jnp.abs(recs.throughput_bsdf) > 0, recs.throughput_bsdf, jnp.inf
            )
        )
        incoming = nan_to_zero(
            outgoing
            / jnp.where(jnp.abs(recs.bsdf_weight) > 0, recs.bsdf_weight, jnp.inf)
        )
        radiance = nan_to_zero(luminance(incoming))
        nee_lum = nan_to_zero(luminance(recs.nee_radiance))

        wo_pdf = recs.wo_pdf
        good_pdf = (wo_pdf > 0) & jnp.isfinite(wo_pdf)
        mask = (recs.lane >= 0) & good_pdf & ~(
            (radiance == 0) & (nee_lum == 0)
        )

        value = jnp.where(good_pdf, radiance / jnp.maximum(wo_pdf, 1e-30), 0.0)
        nee_value = jnp.where(
            good_pdf, nee_lum / jnp.maximum(wo_pdf, 1e-30), 0.0
        )

    if gate is not None:
        # async-overflow gating (drivers): a cascade-overflowed pass must
        # contribute EXACTLY nothing (the driver re-runs it full-width
        # once it reads the deferred flag); mask=False rows drop out of
        # every scatter, so the tree is bit-identical to never splatting
        mask = mask & (gate > 0)
    if flat_ids is None:
        flat = lambda a: a.reshape((n * d,) + a.shape[2:])
        n_verts = n * d
    else:
        flat = lambda a: a  # records already flat (V, ...)
        n_verts = int(recs.lane.shape[0])
    jitter_u = None
    dir_jitter_u = None
    mode = splat_filter_mode()
    if mode in ("1", "dir"):
        # key the jitter stream on GLOBAL vertex ids (shard base + local);
        # sliced records reproduce the full-width flat index per entry
        ids = flat_ids if flat_ids is not None \
            else jnp.arange(n * d, dtype=jnp.int32)
        v_ids = lane_offset * d + ids
        j0, j1 = rng.uniform2(
            seed0, pass_index, 0, rng.PurposeId.SPLAT_JITTER, v_ids
        )
        j2, j3 = rng.uniform2(
            seed0, pass_index, 1, rng.PurposeId.SPLAT_JITTER, v_ids
        )
        if mode == "1":
            jitter_u = jnp.stack([j0, j1, j2], axis=-1)
        else:
            dir_jitter_u = jnp.stack([j0, j1, j2, j3], axis=-1)
    return sd.splat(
        tree_current,
        flat(recs.position),
        flat(recs.canonical_dir),
        flat(value),
        jnp.ones(n_verts, jnp.float32),
        nee_xy=flat(recs.nee_dir),
        nee_value=flat(nee_value),
        mask=flat(mask),
        jitter_u=jitter_u,
        cap_kd=flat(recs.kd_leaf),
        cap_q=flat(recs.q_leaf),
        cap_q_nee=flat(recs.q_leaf_nee),
        dir_jitter_u=dir_jitter_u,
    )


def render_guided_pass(
    scene,
    tree_prev: sd.SDTreeDevice,
    tree_current: sd.SDTreeDevice,
    seed0,
    pass_index,
    iteration,
    is_final: bool,
    bsdf_fraction: float = 0.5,
):
    """One full guided 1-spp pass: trace + (train only) splat.

    Returns (L (N,3), px, py, rays_cast, updated current tree)."""
    w, h = scene.camera.width, scene.camera.height
    n = w * h
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    lane_ids = jnp.arange(n, dtype=jnp.int32)
    u1, u2 = rng.uniform2(seed0, pass_index, 0, rng.PurposeId.CAMERA, lane_ids)
    px = xx.reshape(-1) + u1
    py = yy.reshape(-1) + u2

    L, rays, recs = render_guided_wavefront(
        scene, tree_prev, seed0, pass_index, lane_ids, px, py, iteration,
        record=not is_final, bsdf_fraction=bsdf_fraction,
    )
    if not is_final:
        tree_current = process_and_splat(tree_current, recs, L, seed0, pass_index)
    return L, px, py, rays, tree_current


_splat_jit = jax.jit(
    process_and_splat, donate_argnums=(0,), static_argnames=("row_widths",)
)


def _film_samples(scene, seed0, pass_index, spp=1):
    """spp camera samples per pixel in one wavefront (tiled film order;
    the reference's final iteration renders 4-spp batches, main.py:123)."""
    w, h = scene.camera.width, scene.camera.height
    n = w * h
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    lane_ids = jnp.arange(n * spp, dtype=jnp.int32)
    rpass, rlane = rng.spp_fold(pass_index, lane_ids, n)
    u1, u2 = rng.uniform2(seed0, rpass, 0, rng.PurposeId.CAMERA, rlane)
    px = jnp.tile(xx.reshape(-1), spp) + u1
    py = jnp.tile(yy.reshape(-1), spp) + u2
    return lane_ids, px, py


_film_samples_jit = jax.jit(_film_samples)


def render_guided_pass_stepped(
    scene,
    tree_prev,
    tree_current,
    seed0,
    pass_index,
    iteration,
    is_final: bool,
    bsdf_fraction: float = 0.5,
):
    """Host-stepped full guided pass (TPU path): jitted film-sample
    prologue, one jitted bounce per dispatch, jitted splat epilogue."""
    lane_ids, px, py = _film_samples_jit(scene, seed0, pass_index)
    L, rays, recs = render_guided_wavefront_stepped(
        scene, tree_prev, seed0, pass_index, lane_ids, px, py, iteration,
        record=not is_final, bsdf_fraction=bsdf_fraction,
    )
    if not is_final:
        tree_current = _splat_jit(tree_current, recs, L, seed0, pass_index)
    return L, px, py, rays, tree_current


def guided_wavefront_pass(
    scene, tree_prev, seed0, pass_index, iteration, record: bool,
    bsdf_fraction: float = 0.5, spp: int = 1, schedule=None,
):
    """Film sampling + fused while_loop wavefront, WITHOUT the splat —
    keeping the two halves in separate executables roughly halves XLA
    compile time on slow remote-compile backends. ``schedule`` non-None
    adds (counts, overflow) outputs (cascade; see render_wavefront)."""
    lane_ids, px, py = _film_samples(scene, seed0, pass_index, spp)
    out = render_guided_wavefront(
        scene, tree_prev, seed0, pass_index, lane_ids, px, py, iteration,
        record=record, bsdf_fraction=bsdf_fraction, schedule=schedule,
    )
    if schedule is None:
        L, rays, recs = out
        return L, px, py, rays, recs
    L, rays, recs, counts, overflow = out
    return L, px, py, rays, recs, counts, overflow
