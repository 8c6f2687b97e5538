"""Multi-device sharding tests on the 8-way virtual CPU mesh
(conftest sets xla_force_host_platform_device_count=8)."""
import numpy as np
import jax
import pytest

from practical_path_guiding_lab_tpu.parallel.sharding import (
    make_mesh,
    render_pass_sharded,
)


def test_eight_devices():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_sharded_render_matches_single(cornell_small):
    from practical_path_guiding_lab_tpu.render.path_tracer import render_pass

    mesh = make_mesh(8)
    L_sh, px, py, rays = render_pass_sharded(cornell_small, mesh, 0, 0)
    L, _, _, rays1 = render_pass(cornell_small, 0, 0)
    # same RNG streams -> identical radiance regardless of sharding
    assert np.allclose(np.asarray(L_sh), np.asarray(L), atol=1e-5)
    assert abs(float(rays) - float(rays1)) < 1


@pytest.mark.slow
def test_guided_train_step_sharded_matches_single(cornell_small):
    """Full GUIDED training pass (trace + record + splat): the dp-sharded
    step must reproduce the single-device step — radiance bit-identical
    (lane-keyed RNG), psum'd tree histograms equal up to float reduction
    order, film moments equal."""
    from practical_path_guiding_lab_tpu.parallel.sharding import (
        guided_pass_sharded,
    )
    from practical_path_guiding_lab_tpu.render.guided import (
        render_guided_pass,
    )
    from practical_path_guiding_lab_tpu.render.integrator import (
        PathGuidingIntegrator,
    )

    scene = cornell_small
    integ = PathGuidingIntegrator(scene)
    integ.setup(kd_capacity=1 << 10, quad_capacity=1 << 14)
    # give the tree some structure so descents are non-trivial: run one
    # training pass single-device and refine
    L0, px0, py0, rays0, tree_cur = render_guided_pass(
        scene, integ.dev_tree, integ.dev_tree, 3, 0, iteration=2,
        is_final=False,
    )
    integ.dev_tree = tree_cur
    integ.setIteration(2, False)
    integ.refineAndPrepareSDTreeForNextIteration()
    tree = integ.dev_tree

    # single-device step
    L1, px1, py1, rays1, tree1 = render_guided_pass(
        scene, tree, tree, 7, 5, iteration=3, is_final=False
    )
    # sharded step from the SAME starting tree
    mesh = make_mesh(8)
    L8, px8, py8, rays8, tree8, (sum_l, sum_l2) = guided_pass_sharded(
        scene, tree, mesh, 7, 5, iteration=3, record=True
    )
    assert np.allclose(np.asarray(L8), np.asarray(L1), atol=1e-5)
    assert abs(float(rays8) - float(rays1)) < 1
    # tree histograms: equal up to float32 reduction order
    assert np.allclose(
        np.asarray(tree8.kd_vert_acc), np.asarray(tree1.kd_vert_acc),
        rtol=1e-5, atol=1e-4,
    )
    # rtol 1e-3: the jitted sharded step may reorder the per-shard
    # scatter-add + psum summation vs the single-device splat (float
    # associativity); totals agree to ~1e-6 rel, per-entry outliers at
    # ~2-3e-4 rel were observed on the 8-dev CPU mesh
    assert np.allclose(
        np.asarray(tree8.q_irr_acc), np.asarray(tree1.q_irr_acc),
        rtol=1e-3, atol=1e-3,
    )
    # device-local per-pixel film moments equal the host-side ones
    assert np.allclose(np.asarray(sum_l), np.asarray(L1), atol=1e-5)
    assert np.allclose(
        np.asarray(sum_l2), np.asarray(L1) ** 2, rtol=1e-5, atol=1e-5
    )
    # stop-training scalars via psum reductions == single-device formulas
    from practical_path_guiding_lab_tpu.parallel.sharding import (
        mse_sharded,
        variance_gt_sharded,
        variance_self_sharded,
    )
    from practical_path_guiding_lab_tpu.render import variance as var_mod

    spp = 2.0
    v_sh = variance_self_sharded(mesh, sum_l, sum_l2, spp)
    v_ref = float(var_mod.compute_variance_self(sum_l, sum_l2, spp))
    assert abs(v_sh - v_ref) < 1e-6 + 1e-4 * abs(v_ref)
    gt = np.asarray(L1)
    vg_sh = variance_gt_sharded(mesh, sum_l2, spp, gt)
    vg_ref = float(var_mod.compute_variance_gt(sum_l, sum_l2, spp, gt))
    assert abs(vg_sh - vg_ref) < 1e-6 + 1e-4 * abs(vg_ref)
    m_sh = mse_sharded(mesh, sum_l, spp, gt)
    m_ref = float(var_mod.compute_mse(sum_l, spp, gt))
    assert abs(m_sh - m_ref) < 1e-6 + 1e-4 * abs(m_ref)
    # final-iteration (record off) path also runs sharded
    Lf, _, _, _, tree_none, _ = guided_pass_sharded(
        scene, tree, mesh, 7, 6, iteration=3, record=False
    )
    assert tree_none is None
    assert np.isfinite(np.asarray(Lf)).all()


@pytest.mark.slow
def test_train_driver_mesh(tmp_path):
    """drivers.train with mesh_devices=8 runs end-to-end on the virtual
    CPU mesh (VERDICT round-1 item 5: train --mesh 8)."""
    from practical_path_guiding_lab_tpu.drivers.config import TrainConfig
    from practical_path_guiding_lab_tpu.drivers.train import train

    out = train(
        TrainConfig(
            scene="cornell-box-empty",
            budget_spp=12,
            scene_overrides={"resx": 32, "resy": 32},
            out_root=str(tmp_path),
            mesh_devices=8,
        )
    )
    assert out["cumm_spp"] == 12
    assert np.isfinite(out["mse"])
    # the mesh-mode driver (psum'd moment scalars) must reproduce the
    # single-device driver's metrics (lane-keyed RNG -> same samples)
    out1 = train(
        TrainConfig(
            scene="cornell-box-empty",
            budget_spp=12,
            scene_overrides={"resx": 32, "resy": 32},
            out_root=str(tmp_path / "single"),
            mesh_devices=0,
        )
    )
    assert np.isclose(out["mse"], out1["mse"], rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_graft_entry_dryrun():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[1] == 3
    mod.dryrun_multichip(8)


@pytest.mark.parametrize("rfilter", ["box", "tent", "gaussian"])
def test_sharded_post_halo_matches_single(cornell_small, rfilter):
    """The mesh driver's sharded post (shard-local film splat with
    ppermute halo exchange) must reproduce the single-device aligned
    splat + develop + metrics for every reconstruction filter — the
    gaussian's radius-2 support spans half an 8-way shard of a 32-row
    film, so every halo path is exercised."""
    import jax.numpy as jnp

    from practical_path_guiding_lab_tpu.parallel.sharding import (
        guided_post_sharded,
    )
    from practical_path_guiding_lab_tpu.render import film as film_mod
    from practical_path_guiding_lab_tpu.render import variance as var_mod

    scene = cornell_small.replace(rfilter=rfilter)
    w, h = scene.camera.width, scene.camera.height
    n = w * h
    rng = np.random.default_rng(7)
    L = jnp.asarray(rng.random((n, 3)), jnp.float32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = jnp.asarray(xx.reshape(-1) + rng.random(n), jnp.float32)
    py = jnp.asarray(yy.reshape(-1) + rng.random(n), jnp.float32)
    sum_l = jnp.asarray(rng.random((n, 3)), jnp.float32)
    sum_l2 = sum_l * sum_l + jnp.asarray(rng.random((n, 3)), jnp.float32)
    gt = jnp.asarray(rng.random((n, 3)), jnp.float32)
    acc_w = jnp.zeros((h, w, 3))
    acc_u = jnp.zeros((h, w, 3))

    mesh = make_mesh(8)
    img8, aw8, au8, var8, vgt8, mse8, rays8 = guided_post_sharded(
        scene, mesh, L, px, py, sum_l, sum_l2, acc_w, acc_u,
        w_w=0.5, w_u=0.25, spp_total=3.0, rays_acc=jnp.zeros(()),
        rays=jnp.float32(17.0), gt=gt,
    )

    # single-device reference: the aligned splat + reference-exact metrics
    img_s, wgt_s = film_mod.splat_filtered_aligned(w, h, px, py, L, rfilter)
    img1 = film_mod.develop(img_s, wgt_s)
    var1, vgt1, mse1 = var_mod.metrics_all(sum_l, sum_l2, 3.0, gt)
    assert np.allclose(np.asarray(img8), np.asarray(img1), atol=1e-5), rfilter
    assert np.allclose(np.asarray(aw8), np.asarray(img1) * 0.5, atol=1e-5)
    assert np.allclose(np.asarray(au8), np.asarray(img1) * 0.25, atol=1e-5)
    assert np.isclose(float(var8), float(var1), rtol=1e-5, atol=1e-8)
    assert np.isclose(float(vgt8), float(vgt1), rtol=1e-5, atol=1e-8)
    assert np.isclose(float(mse8), float(mse1), rtol=1e-5, atol=1e-8)
    assert float(rays8) == 17.0
