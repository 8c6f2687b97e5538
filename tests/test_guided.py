"""Guided-integrator integration tests: unbiasedness of the mixture
estimator against the unguided PT, and variance improvement from guiding."""
import numpy as np
import pytest

from practical_path_guiding_lab_tpu.render.integrator import PathGuidingIntegrator


@pytest.fixture(scope="module")
def trained(cornell_small):
    """Train 3 iterations (4+8+16 spp) on cornell 64x64."""
    integ = PathGuidingIntegrator(cornell_small)
    integ.setup(kd_capacity=1 << 12, quad_capacity=1 << 16)
    cumm = 0
    for it, spp in [(0, 4), (1, 8), (2, 16)]:
        integ.setIteration(it, False)
        for _ in range(spp):
            integ.render_pass(0, cumm)
            cumm += 1
        integ.refineAndPrepareSDTreeForNextIteration()
    return integ


def _render(integ, iteration, spp, seed):
    integ.setIteration(iteration, True)
    integ.resetVarianceCounter()
    acc = None
    for p in range(spp):
        img, _ = integ.render_pass(seed, p)
        acc = img if acc is None else acc + img
    return np.asarray(acc) / spp


@pytest.mark.slow
def test_guided_unbiased(trained):
    """Guided and unguided renders must agree in the mean (the guided bias
    bug class this guards: quadrant/pdf inconsistencies)."""
    guided = _render(trained, 3, 24, 11)
    unguided = _render(trained, 0, 24, 12)
    assert abs(guided.mean() / unguided.mean() - 1.0) < 0.05


def test_tree_refined(trained):
    t = trained.tree_prev
    assert t.kd_count > 1
    assert t.q_count > 100
    # npz integrity after training
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        trained.saveSDTreeToFile(f.name)
        trained.loadSDTreeFromFile(f.name)
    assert trained.tree_prev.kd_count == t.kd_count


@pytest.mark.slow
def test_guided_variance_not_worse(trained):
    """With a trained tree, guided sampling should not increase variance on
    this diffuse scene (usually decreases it)."""
    trained.setIteration(3, True)
    trained.resetVarianceCounter()
    for p in range(8):
        trained.render_pass(21, p)
    var_guided = trained.computeVariance(8)
    trained.setIteration(0, True)
    trained.resetVarianceCounter()
    for p in range(8):
        trained.render_pass(22, p)
    var_unguided = trained.computeVariance(8)
    assert var_guided < var_unguided * 1.5


def test_process_and_splat_numpy_oracle():
    """Depth-major reconstruction oracle: hand-build PathRecords with a
    scrambled lane map and verify the splatted totals against a plain
    numpy re-derivation of the reference formulas
    (path_guiding_integrator.py:434-500)."""
    import numpy as np
    import jax.numpy as jnp
    from practical_path_guiding_lab_tpu.core.records import PathRecords
    from practical_path_guiding_lab_tpu.guiding import sdtree as sd
    from practical_path_guiding_lab_tpu.render.guided import process_and_splat

    rng_np = np.random.default_rng(42)
    N, D = 64, 4
    recs = PathRecords.zeros(N, D)
    # scrambled, partially-unwritten lane map (live compaction permutes rows)
    lane = np.full((D, N), -1, np.int32)
    for d in range(D):
        k = N - d * 10  # fewer live lanes at deeper bounces
        lane[d, :k] = rng_np.permutation(N)[:k]
    f3 = lambda: rng_np.random((D, N, 3)).astype(np.float32) + 0.1
    tp_rad = f3() * 0.2
    tp_bsdf = f3()
    bsdf_w = f3()
    nee_rad = f3() * 0.5
    wo_pdf = (rng_np.random((D, N)).astype(np.float32) + 0.05)
    wo_pdf[1, ::7] = 0.0  # some invalid pdf rows must be dropped
    pos = rng_np.random((D, N, 3)).astype(np.float32)
    cdir = rng_np.random((D, N, 2)).astype(np.float32)
    ndir = rng_np.random((D, N, 2)).astype(np.float32)
    recs = recs.replace(
        lane=jnp.asarray(lane), position=jnp.asarray(pos),
        canonical_dir=jnp.asarray(cdir), nee_dir=jnp.asarray(ndir),
        throughput_radiance=jnp.asarray(tp_rad),
        throughput_bsdf=jnp.asarray(tp_bsdf),
        bsdf_weight=jnp.asarray(bsdf_w),
        nee_radiance=jnp.asarray(nee_rad),
        wo_pdf=jnp.asarray(wo_pdf),
    )
    L_final = (rng_np.random((N, 3)).astype(np.float32) + 0.3)

    tree = sd.SDTree([0, 0, 0], [1, 1, 1], kd_capacity=64, quad_capacity=256)
    dev = process_and_splat(tree.to_device(), recs, jnp.asarray(L_final))

    # numpy oracle of the same reconstruction
    lum = lambda c: c @ np.array([0.212671, 0.71516, 0.072169], np.float32)
    Lv = L_final[np.maximum(lane, 0)]
    outgoing = (Lv - tp_rad) / tp_bsdf
    incoming = outgoing / bsdf_w
    radiance = lum(incoming)
    nee_lum = lum(nee_rad)
    good = (wo_pdf > 0) & np.isfinite(wo_pdf)
    mask = (lane >= 0) & good & ~((radiance == 0) & (nee_lum == 0))
    exp_irr = ((radiance / np.where(good, wo_pdf, np.inf)) * mask).sum() \
        + ((nee_lum / np.where(good, wo_pdf, np.inf)) * mask).sum()
    exp_vert = mask.sum()

    got_irr = float(np.asarray(dev.q_irr_acc).sum())
    got_vert = float(np.asarray(dev.kd_vert_acc).sum())
    assert abs(got_vert - exp_vert) < 1e-3
    assert abs(got_irr - exp_irr) < 1e-3 * max(exp_irr, 1.0)


@pytest.mark.slow
def test_splat_capture_matches_lookups(trained, cornell_small):
    """Trace-time-captured splat targets (kd leaf, quad leaf of the
    recorded and NEE directions) must reproduce the splat-time lookup
    path exactly: forcing the capture fields to -1 flips sd.splat onto
    its lookup fallback, and both must accumulate identical histograms."""
    import jax
    import jax.numpy as jnp

    from practical_path_guiding_lab_tpu.render.guided import (
        process_and_splat,
        render_guided_wavefront,
    )
    from practical_path_guiding_lab_tpu.render.path_tracer import (
        _film_prologue,
    )

    scene = cornell_small
    tree = trained.dev_tree
    lane_ids, px, py = jax.jit(_film_prologue)(scene, 3, 40)
    L, _, recs = render_guided_wavefront(
        scene, tree, 3, 40, lane_ids, px, py, iteration=3, record=True
    )
    assert int((np.asarray(recs.q_leaf) >= 0).sum()) > 0

    t_cap = process_and_splat(tree, recs, L, 3, 40)
    neg = jnp.full_like(recs.kd_leaf, -1)
    recs_nocap = recs.replace(kd_leaf=neg, q_leaf=neg, q_leaf_nee=neg)
    t_look = process_and_splat(tree, recs_nocap, L, 3, 40)

    np.testing.assert_array_equal(
        np.asarray(t_cap.kd_vert_acc), np.asarray(t_look.kd_vert_acc)
    )
    np.testing.assert_array_equal(
        np.asarray(t_cap.q_irr_acc), np.asarray(t_look.q_irr_acc)
    )


@pytest.mark.slow
def test_splat_dir_filter_conserves_mass(trained, cornell_small):
    """PPG_SPLAT_FILTER=dir: the directional box filter redistributes each
    record's energy among neighboring quad cells but must (a) leave the kd
    vertex histogram EXACTLY equal to point splats (positions untouched —
    the non-leaking property), (b) conserve total irradiance mass, and
    (c) actually move some energy between quad leaves."""
    import jax
    import jax.numpy as jnp

    from practical_path_guiding_lab_tpu.render import guided as g
    from practical_path_guiding_lab_tpu.render.path_tracer import (
        _film_prologue,
    )

    scene = cornell_small
    tree = trained.dev_tree
    lane_ids, px, py = jax.jit(_film_prologue)(scene, 3, 44)
    L, _, recs = g.render_guided_wavefront(
        scene, tree, 3, 44, lane_ids, px, py, iteration=3, record=True
    )

    t_point = g.process_and_splat(tree, recs, L, 3, 44)
    import os

    os.environ["PPG_SPLAT_FILTER"] = "dir"
    try:
        t_dir = g.process_and_splat(tree, recs, L, 3, 44)
    finally:
        os.environ.pop("PPG_SPLAT_FILTER")

    np.testing.assert_array_equal(
        np.asarray(t_point.kd_vert_acc), np.asarray(t_dir.kd_vert_acc)
    )
    tot_p = float(np.asarray(t_point.q_irr_acc).sum())
    tot_d = float(np.asarray(t_dir.q_irr_acc).sum())
    assert abs(tot_d - tot_p) < 1e-3 * max(tot_p, 1.0)
    moved = np.abs(
        np.asarray(t_point.q_irr_acc) - np.asarray(t_dir.q_irr_acc)
    ).sum()
    assert moved > 0


@pytest.mark.slow
def test_slim_records_match_full_reconstruction(cornell_small):
    """The production trace records folded splat coefficients
    (value = dot(L_final, ca) - b) instead of the raw radiometric fields;
    the folded math is algebraically identical to the reference
    reconstruction (luminance is linear), so splatting either record set
    must produce the same tree accumulators up to fp reassociation and
    the documented noise-floor snap on no-information records."""
    import os

    import jax.numpy as jnp

    from practical_path_guiding_lab_tpu.render import guided as g
    from practical_path_guiding_lab_tpu.render.integrator import (
        PathGuidingIntegrator,
    )

    scene = cornell_small
    integ = PathGuidingIntegrator(scene)
    integ.setup()
    spp = 0
    for iteration, passes in ((1, 2), (2, 3)):
        integ.setIteration(iteration, False)
        for _ in range(passes):
            integ.render_pass(0, spp)
            spp += 1
        integ.refineAndPrepareSDTreeForNextIteration()
    integ.setIteration(3, False)
    lane_ids, px, py = g._film_samples(scene, 0, spp)

    prev = os.environ.get("PPG_FULL_RECORDS")
    try:
        os.environ["PPG_FULL_RECORDS"] = "1"
        L1, _, recs_full = g.render_guided_wavefront_stepped(
            scene, integ.dev_tree, 0, spp, lane_ids, px, py, 3, record=True
        )
        g._init_jit.clear_cache()
        g._bounce_step.clear_cache()
        os.environ["PPG_FULL_RECORDS"] = "0"
        L2, _, recs_slim = g.render_guided_wavefront_stepped(
            scene, integ.dev_tree, 0, spp, lane_ids, px, py, 3, record=True
        )
    finally:
        if prev is None:
            os.environ.pop("PPG_FULL_RECORDS", None)
        else:
            os.environ["PPG_FULL_RECORDS"] = prev
        g._init_jit.clear_cache()
        g._bounce_step.clear_cache()

    assert recs_slim.splat_ca is not None
    assert recs_full.splat_ca is None
    np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))

    t_full = g.process_and_splat(integ.dev_tree, recs_full, L1, 0, spp)
    t_slim = g.process_and_splat(integ.dev_tree, recs_slim, L2, 0, spp)
    qf = np.asarray(t_full.q_irr_acc)
    qs = np.asarray(t_slim.q_irr_acc)
    vf = np.asarray(t_full.kd_vert_acc)
    vs = np.asarray(t_slim.kd_vert_acc)
    assert abs(qf.sum() - qs.sum()) / max(qf.sum(), 1e-9) < 1e-4
    # per-node: deep paths with ~1e6-scale 1/throughput coefficients sit
    # at the folded form's cancellation limit — isolated vertices can
    # differ by up to ~1% of the largest node's flux, far below the
    # pass-to-pass MC noise of the estimates themselves
    assert np.abs(qf - qs).max() < 1e-2 * max(qf.max(), 1.0)
    # drop-mask may differ only on no-information records (noise snap)
    assert np.abs(vf - vs).sum() <= 1e-3 * max(vf.sum(), 1.0)


@pytest.mark.slow
def test_sliced_splat_matches_full_width(cornell_small):
    """Cascade-sliced splat (static per-depth row widths) must produce
    exactly the full-width splat's accumulators: the sliced-away row tails
    are lane=-1 masked padding, and the jitter stream ids reproduce the
    full-width flat indices."""
    import os

    import jax.numpy as jnp

    from practical_path_guiding_lab_tpu.render import guided as g
    from practical_path_guiding_lab_tpu.render.integrator import (
        PathGuidingIntegrator,
    )

    scene = cornell_small
    integ = PathGuidingIntegrator(scene)
    integ.setup()
    spp = 0
    for iteration, passes in ((1, 2), (2, 2)):
        integ.setIteration(iteration, False)
        for _ in range(passes):
            integ.render_pass(0, spp)
            spp += 1
        integ.refineAndPrepareSDTreeForNextIteration()
    n = scene.camera.width * scene.camera.height
    d = scene.max_depth
    # shrink hard at depth 2: overflow (dropped live lanes) is fine here —
    # we only compare the two splats of the SAME record buffer
    sched = ((2, n), (d, max(n // 4, 1)))
    out = g.guided_wavefront_pass(
        scene, integ.dev_tree, 0, spp, 3, record=True, schedule=sched
    )
    L, recs = out[0], out[4]
    from practical_path_guiding_lab_tpu.render.path_tracer import (
        schedule_row_widths,
    )

    rw = schedule_row_widths(sched, n, d)
    assert rw is not None and len(rw) == d and rw[2] == max(n // 4, 1)

    for mode in ("0", "dir"):
        prev = os.environ.get("PPG_SPLAT_FILTER")
        os.environ["PPG_SPLAT_FILTER"] = mode
        try:
            t_full = g.process_and_splat(integ.dev_tree, recs, L, 0, spp)
            t_sliced = g.process_and_splat(
                integ.dev_tree, recs, L, 0, spp, row_widths=rw
            )
        finally:
            if prev is None:
                os.environ.pop("PPG_SPLAT_FILTER", None)
            else:
                os.environ["PPG_SPLAT_FILTER"] = prev
        np.testing.assert_array_equal(
            np.asarray(t_full.kd_vert_acc), np.asarray(t_sliced.kd_vert_acc),
            err_msg=f"mode={mode}",
        )
        np.testing.assert_array_equal(
            np.asarray(t_full.q_irr_acc), np.asarray(t_sliced.q_irr_acc),
            err_msg=f"mode={mode}",
        )


def test_folded_splat_drops_overflow_scale_records():
    """Extreme-1/throughput vertices: the raw reconstruction overflows to
    inf mid-chain in f32 and sanitizes to zero, but the folded
    coefficients keep the value FINITE (~1e29..1e38). One such splat
    poisons its quad root's flux total and the 1%-of-root refinement
    threshold goes negative/huge -> unbounded splits (observed: 5 poison
    records grew the quad pool past 134M nodes on veach-ajar iteration
    3). The folded path must drop them (and any negative cancellation
    residue) while keeping normal records."""
    import numpy as np
    import jax.numpy as jnp
    from practical_path_guiding_lab_tpu.core.records import PathRecords
    from practical_path_guiding_lab_tpu.guiding import sdtree as sd
    from practical_path_guiding_lab_tpu.render.guided import process_and_splat

    N, D = 8, 2
    recs = PathRecords.zeros(N, D, slim=True)
    lane = np.arange(N, dtype=np.int32)[None].repeat(D, 0)
    ca = np.zeros((D, N, 3), np.float32)
    b = np.zeros((D, N), np.float32)
    nee = np.zeros((D, N), np.float32)
    # vertex 0: normal record — value = dot(L, ca) - b = 2.0 - 0.5
    ca[0, 0] = [1.0, 1.0, 1.0]
    b[0, 0] = 0.5
    # vertex 1: poison — den ~ 1e-35 style coefficients, finite-huge value
    ca[0, 1] = [1e35, 1e35, 1e35]
    b[0, 1] = 1e34
    # vertex 2: negative cancellation residue beyond the noise window
    ca[0, 2] = [1.0, 1.0, 1.0]
    b[0, 2] = 10.0
    recs = recs.replace(
        lane=jnp.asarray(lane),
        position=jnp.zeros((D, N, 3)) + 0.5,
        canonical_dir=jnp.zeros((D, N, 2)) + 0.5,
        nee_dir=jnp.zeros((D, N, 2)) + 0.5,
        splat_ca=jnp.asarray(ca), splat_b=jnp.asarray(b),
        splat_nee=jnp.asarray(nee),
    )
    L_final = np.zeros((N, 3), np.float32)
    L_final[:, :] = [1.0, 0.5, 0.5]

    tree = sd.SDTree([0, 0, 0], [1, 1, 1], kd_capacity=64, quad_capacity=256)
    dev = process_and_splat(tree.to_device(), recs, jnp.asarray(L_final))
    got = float(np.asarray(dev.q_irr_acc).sum())
    vert = float(np.asarray(dev.kd_vert_acc).sum())
    assert abs(got - 1.5) < 1e-5, got     # only vertex 0 splats
    assert vert == 1.0, vert              # poison/negative records dropped


def test_refine_hbm_cap_fallback(cornell_small, monkeypatch):
    """Single-chip memory-capacity policy: when the refined tree's device
    mirror fails to build (HBM OOM at large pools — seen for real at kd
    C=2000 full-res ajar, 16.7M quad nodes / 18.6G of 15.75G HBM), the
    refine is reverted and training continues on the previous structure
    with the absorbed irradiance kept."""
    from practical_path_guiding_lab_tpu.guiding.sdtree import SDTree

    integ = PathGuidingIntegrator(cornell_small)
    integ.setup(kd_capacity=1 << 12, quad_capacity=1 << 16)
    cumm = 0
    integ.setIteration(0, False)
    for _ in range(4):
        integ.render_pass(0, cumm)
        cumm += 1

    # what an unconstrained refine would do (growth expected at iter 0)
    probe = integ.tree_current.copy()
    probe.absorb_accumulators(integ.dev_tree)
    probe.set_refinement_threshold(0)
    probe.refine()
    kd_before = integ.tree_current.kd_count
    assert probe.kd_count > kd_before  # the revert below is non-vacuous

    orig = SDTree.to_device
    calls = {"n": 0}

    def failing(self):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: simulated HBM OOM")
        return orig(self)

    monkeypatch.setattr(SDTree, "to_device", failing)
    with pytest.warns(UserWarning, match="device mirror"):
        integ.refineAndPrepareSDTreeForNextIteration()
    assert calls["n"] == 2
    # refine reverted: pre-refine structure on BOTH trees, mirror rebuilt
    assert integ.tree_prev.kd_count == kd_before
    assert integ.tree_current.kd_count == kd_before
    # the run continues (guided iteration on the reverted mirror)
    monkeypatch.setattr(SDTree, "to_device", orig)
    integ.setIteration(2, False)
    img, _ = integ.render_pass(0, cumm)
    assert np.isfinite(np.asarray(img)).all()
