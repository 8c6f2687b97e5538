"""Analysis/tooling tests: perf CSV plots, tree plotter, file naming."""
import numpy as np
import pytest

from practical_path_guiding_lab_tpu.analysis import performance_plot as pp
from practical_path_guiding_lab_tpu.analysis.tree_plotter import (
    KDTreePlotter,
    QuadTreePlotter,
)
from practical_path_guiding_lab_tpu.guiding import sdtree as sd
from practical_path_guiding_lab_tpu.utils import FileNameManager, PerformanceData


def _write_csv(path, rows):
    rec = PerformanceData()
    for r in rows:
        rec.append(**r)
    rec.saveToFile(path)


def test_performance_csv_and_plots(tmp_path):
    csv = tmp_path / "var.csv"
    _write_csv(
        csv,
        [
            dict(time=i * 0.1, spp=i + 1, cumm_spp=i + 1,
                 iteration=i // 4, variance=1.0 / (i + 1))
            for i in range(12)
        ],
    )
    pp.plot_one_simulation_performance(csv, tmp_path / "one.png")
    pp.plot_convergence_performance([csv, csv], ["a", "b"], tmp_path / "conv.png")
    pp.plot_variance_cross_section([csv], ["a"], [2, 4, 8], tmp_path / "xs.png")
    pp.plot_guided_vs_pt(csv, csv, tmp_path / "cmp.png")
    for f in ("one.png", "conv.png", "xs.png", "cmp.png"):
        assert (tmp_path / f).stat().st_size > 1000
    df = pp._load(csv)
    inc = pp.convert_to_incremental_spp(df)
    assert inc["incr_spp"].iloc[1] == 1
    spp, t = pp.get_stop_training_spp_and_time(df)
    assert spp == 9  # first row of the last iteration


def test_average_simulations(tmp_path):
    a = tmp_path / "a.csv"
    b = tmp_path / "b.csv"
    _write_csv(a, [dict(time=1, spp=4, cumm_spp=4, iteration=0, variance=2.0)])
    _write_csv(b, [dict(time=3, spp=4, cumm_spp=4, iteration=0, variance=4.0)])
    avg = pp.average_simulations([a, b], tmp_path / "avg.csv")
    assert float(avg["variance"].iloc[0]) == 3.0


def test_tree_plotter_roundtrip(tmp_path):
    """Save a trained-ish tree and render its heat map through the plotter
    (reference tree_plotter.py parity, reads the same npz schema)."""
    rng = np.random.default_rng(0)
    t = sd.SDTree([0, 0, 0], [1, 1, 1], kd_capacity=1 << 10,
                  quad_capacity=1 << 14)
    dev = t.to_device()
    import jax.numpy as jnp

    n = 20000
    xy = jnp.asarray(0.25 + 0.5 * rng.random((n, 2)).astype(np.float32) ** 2)
    dev = sd.splat(dev, jnp.asarray(rng.random((n, 3)), jnp.float32), xy,
                   jnp.ones(n), jnp.ones(n))
    t.absorb_accumulators(dev)
    t.set_refinement_threshold(0)
    t.refine()
    path = tmp_path / "tree.npz"
    t.save(path)
    z = np.load(path)
    kd = KDTreePlotter(z)
    leaf = kd.find_leaf([0.5, 0.5, 0.5])
    qt = QuadTreePlotter(z)
    img = qt.sample_irradiance(int(kd.quad_root[leaf]), 32)
    assert img.shape == (32, 32)
    assert img.max() > 0
    qt.plot(int(kd.quad_root[leaf]), tmp_path / "quad.png", res=32)
    assert (tmp_path / "quad.png").stat().st_size > 1000


def test_file_name_manager(tmp_path):
    FileNameManager.DEBUG_ROOT = tmp_path
    FileNameManager.setSceneName("test-scene")
    FileNameManager.createDebugFolder()
    assert (tmp_path / "test-scene" / "tree-data").is_dir()
    assert (tmp_path / "test-scene" / "performance").is_dir()
    f = FileNameManager.generateTreeDataFileName(3)
    assert f.endswith("test-scene_iter-3.npz")
    assert FileNameManager.generateImageFileName(2, 64).endswith(
        "test-scene_iter-2_spp-64"
    )
    assert FileNameManager.generateOBJFileName(1).endswith("test-scene_iter-1.obj")
