"""Integration tests: intersector correctness and golden-image MSE on
cornell-box (the reference's statistical oracle, SURVEY.md section 4.3)."""
import numpy as np
import jax.numpy as jnp
import pytest

from practical_path_guiding_lab_tpu.accel.traverse import intersect, occluded
from practical_path_guiding_lab_tpu.io import exr
from practical_path_guiding_lab_tpu.render.path_tracer import render_pass

SCENES = "/root/reference/scenes"


def test_intersect_known_hits(cornell_small):
    s = cornell_small
    # ray above the boxes must hit the back wall at z=-1
    o = jnp.asarray([[0.0, 1.5, 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    si = intersect(s, o, d)
    assert bool(si.valid[0])
    assert abs(float(si.t[0]) - 4.0) < 1e-3
    assert np.allclose(np.asarray(si.p[0]), [0, 1.5, -1], atol=1e-3)
    assert np.allclose(np.asarray(si.n[0]), [0, 0, 1], atol=1e-3)
    # ray pointing away hits nothing
    si2 = intersect(s, o, -d)
    assert not bool(si2.valid[0])


def test_occlusion(cornell_small):
    s = cornell_small
    o = jnp.asarray([[0.0, 1.5, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    # back wall at z=-1: distance 1.0 -> occluded at t_max 2, clear at 0.5
    assert bool(occluded(s, o, d, jnp.asarray([2.0]))[0])
    assert not bool(occluded(s, o, d, jnp.asarray([0.5]))[0])


@pytest.mark.slow
def test_cornell_golden_mse(cornell_small):
    """Render 64x64 @ 16spp; luminance must match the Tungsten GT closely
    (statistical oracle, reference main.py:38-41 + computeMSE)."""
    s = cornell_small
    acc = np.zeros((64 * 64, 3), np.float32)
    spp = 16
    for p in range(spp):
        L, _, _, _ = render_pass(s, 0, p)
        acc += np.asarray(L)
    img = (acc / spp).reshape(64, 64, 3)
    gt = exr.read(f"{SCENES}/cornell-box/TungstenRender.exr")
    gtd = gt.reshape(64, 16, 64, 16, 3).mean(axis=(1, 3))
    lum = lambda x: x @ np.array([0.212671, 0.71516, 0.072169])
    # brightness within 3%, correlation > 0.99
    assert abs(img.mean() / gtd.mean() - 1.0) < 0.03
    corr = np.corrcoef(lum(img).ravel(), lum(gtd).ravel())[0, 1]
    assert corr > 0.99


def test_rr_modes(monkeypatch):
    """apply_rr semantics: reference truncates (no reweight), unbiased
    reweights by 1/q, clamped bounds q to [0.1, 0.95]."""
    import jax.numpy as jnp
    from practical_path_guiding_lab_tpu.render import path_tracer as pt

    n = 4
    tp = jnp.full((n, 3), 0.2)
    eta = jnp.ones(n)
    u = jnp.asarray([0.05, 0.15, 0.5, 0.9])

    monkeypatch.setenv("PPG_RR", "reference")
    tp_ref, sv_ref = pt.apply_rr(tp, eta, u, True, n)
    assert np.allclose(np.asarray(tp_ref), 0.2)  # never reweighted
    assert list(np.asarray(sv_ref)) == [True, True, False, False]  # q=0.2

    monkeypatch.setenv("PPG_RR", "unbiased")
    tp_u, sv_u = pt.apply_rr(tp, eta, u, True, n)
    assert np.allclose(np.asarray(tp_u), 1.0)  # 0.2 / q(=0.2)
    assert list(np.asarray(sv_u)) == list(np.asarray(sv_ref))

    monkeypatch.setenv("PPG_RR", "clamped")
    tp_c, sv_c = pt.apply_rr(tp, eta, u, True, n)
    assert np.allclose(np.asarray(tp_c), 1.0)  # q clamped at >= 0.1 -> 0.2
    tp_tiny = jnp.full((n, 3), 0.01)
    tp_c2, _ = pt.apply_rr(tp_tiny, eta, u, True, n)
    assert np.allclose(np.asarray(tp_c2), 0.1)  # 0.01 / 0.1 floor


@pytest.mark.slow
def test_multi_spp_single_dispatch(cornell_small):
    """spp>1 traces all samples in one wavefront; statistics must match
    the equivalent 1-spp pass loop (different RNG streams, same mean)."""
    import numpy as np
    import jax.numpy as jnp
    from practical_path_guiding_lab_tpu.render.path_tracer import render_pass

    scene = cornell_small
    acc = None
    rays1 = 0.0
    for p in range(4):
        L, _, _, r = render_pass(scene, 0, p, True)
        acc = L if acc is None else acc + L
        rays1 += float(r)
    m1 = float(jnp.mean(acc)) / 4

    L4, px, py, r4 = render_pass(scene, 7, 0, True, spp=4)
    assert L4.shape[0] == 4 * scene.camera.width * scene.camera.height
    m4 = float(jnp.mean(L4))
    assert abs(m4 - m1) / m1 < 0.05, (m1, m4)
    # similar ray counts (same RR statistics)
    assert abs(float(r4) - rays1) / rays1 < 0.05
    # film coordinates cover each pixel spp times
    idx = (np.asarray(py).astype(int) * scene.camera.width
           + np.asarray(px).astype(int))
    counts = np.bincount(idx, minlength=scene.camera.width * scene.camera.height)
    assert (counts == 4).all()


def test_multispp_dispatch_matches_sequential_passes():
    """A k-spp single dispatch draws per-slice streams (rng.spp_fold), so
    it must reproduce k sequential 1-spp passes bitwise."""
    import warnings

    import jax
    import numpy as np

    from practical_path_guiding_lab_tpu.render.path_tracer import render_pass
    from practical_path_guiding_lab_tpu.scene import load_file
    from practical_path_guiding_lab_tpu.scene.scene import compile_scene

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        s = compile_scene(
            load_file(
                f"{SCENES}/cornell-box/cornell-box-empty.xml",
                resx=16, resy=16,
            )
        )
    fn = jax.jit(render_pass, static_argnames=("jitter", "spp"))
    L3, px3, py3, _ = fn(s, 7, 4, jitter=True, spp=3)
    n = 16 * 16
    for sub in range(3):
        L1, px1, py1, _ = fn(s, 7, 4 + sub, jitter=True, spp=1)
        np.testing.assert_array_equal(
            np.asarray(L3[sub * n:(sub + 1) * n]), np.asarray(L1)
        )
        np.testing.assert_array_equal(
            np.asarray(px3[sub * n:(sub + 1) * n]), np.asarray(px1)
        )


@pytest.mark.slow
def test_cascade_matches_full_width(cornell_small):
    """Wavefront-shrink cascade: segmented shrinking dispatch must be
    radiance-identical to the full-width while_loop (lanes are keyed by
    original ids; dropped dead lanes' L is banked into the film)."""
    s = cornell_small
    n = 64 * 64
    L_full, _, _, rays_full = render_pass(s, 3, 1)
    # probe (full width + bookkeeping) must also match
    Lp, _, _, rp, counts, ovf = render_pass(s, 3, 1, schedule=())
    assert not bool(ovf)
    np.testing.assert_array_equal(np.asarray(L_full), np.asarray(Lp))
    counts = np.asarray(counts)
    from practical_path_guiding_lab_tpu.render.path_tracer import (
        plan_schedule,
    )
    sched = plan_schedule(counts, n, s.max_depth, min_width=256, slack=1.3)
    assert sched is not None and sched[0][1] == n  # shrinks exist here
    Lc, _, _, rc, counts2, ovf2 = render_pass(s, 3, 1, schedule=sched)
    assert not bool(ovf2)
    assert float(rc) == float(rays_full)
    np.testing.assert_allclose(
        np.asarray(Lc), np.asarray(L_full), rtol=0, atol=0
    )


def test_cascade_overflow_flag(cornell_small):
    """A schedule too tight for the live set must raise the overflow flag
    (the auto planner then discards and re-runs at full width)."""
    s = cornell_small
    n = 64 * 64
    # shrink to 256 lanes right after bounce 1 — cornell keeps ~90%+ alive
    sched = ((1, n), (s.max_depth, 256))
    _, _, _, _, _, ovf = render_pass(s, 3, 1, schedule=sched)
    assert bool(ovf)


def test_cascade_auto_wrapper(cornell_small):
    """render_pass_auto: first call probes, second call runs the shrunk
    schedule; both must equal the plain pass radiance."""
    from practical_path_guiding_lab_tpu.render import path_tracer as pt

    s = cornell_small
    L_ref, _, _, _ = render_pass(s, 5, 2)
    pt._PLAN_COUNTS.clear()
    L1, _, _, _ = pt.render_pass_auto(s, 5, 2)
    L2, _, _, _ = pt.render_pass_auto(s, 5, 2)
    np.testing.assert_array_equal(np.asarray(L1), np.asarray(L_ref))
    np.testing.assert_array_equal(np.asarray(L2), np.asarray(L_ref))


@pytest.mark.slow
def test_cascade_guided_matches(cornell_small):
    """Guided wavefront cascade: radiance AND record streams must be
    identical to the full-width pass (records carry explicit lane ids;
    shrunk bounces write partial rows, tail keeps lane=-1)."""
    import jax
    from practical_path_guiding_lab_tpu.guiding.sdtree import SDTree
    from practical_path_guiding_lab_tpu.render.guided import (
        guided_wavefront_pass,
    )

    s = cornell_small
    n = 64 * 64
    tree = SDTree(
        np.array([-2.0, -2.0, -2.0]), np.array([2.0, 2.0, 2.0]),
        kd_capacity=1 << 8, quad_capacity=1 << 12,
    )
    dev = tree.to_device()
    fn = jax.jit(
        guided_wavefront_pass, static_argnames=("record", "spp", "schedule")
    )
    L0, _, _, r0, recs0, counts, ovf = fn(
        s, dev, 0, 0, 2, record=True, schedule=()
    )
    assert not bool(ovf)
    from practical_path_guiding_lab_tpu.render.path_tracer import (
        plan_schedule,
    )
    sched = plan_schedule(
        np.asarray(counts), n, s.max_depth, min_width=256, slack=1.3
    )
    assert sched is not None
    L1, _, _, r1, recs1, _, ovf1 = fn(
        s, dev, 0, 0, 2, record=True, schedule=sched
    )
    assert not bool(ovf1)
    np.testing.assert_array_equal(np.asarray(L0), np.asarray(L1))
    assert float(r0) == float(r1)
    # record streams: same multiset of records — compare after sorting
    # rows by (depth-major row, lane id)
    a0 = np.asarray(recs0.lane)
    a1 = np.asarray(recs1.lane)
    d = a0.shape[0]
    for dep in range(d):
        set0 = set(a0[dep][a0[dep] >= 0].tolist())
        set1 = set(a1[dep][a1[dep] >= 0].tolist())
        assert set0 == set1, f"depth {dep} record lanes differ"
    # and the splat values agree record-by-record (match rows via lane id)
    v0 = np.asarray(recs0.splat_b)
    v1 = np.asarray(recs1.splat_b)
    for dep in range(d):
        m0 = {int(l): v0[dep, i] for i, l in enumerate(a0[dep]) if l >= 0}
        m1 = {int(l): v1[dep, i] for i, l in enumerate(a1[dep]) if l >= 0}
        assert m0.keys() == m1.keys()
        for k in m0:
            np.testing.assert_array_equal(m0[k], m1[k])
