"""Driver end-to-end tests: the training schedule (main.py semantics),
checkpoint outputs, CSV streams, baseline renderer, and the repeat driver
re-using saved SD-trees."""
import csv
from pathlib import Path

import numpy as np
import pytest

from practical_path_guiding_lab_tpu.drivers.baseline import render_baseline
from practical_path_guiding_lab_tpu.drivers.config import (
    BaselineConfig,
    RepeatConfig,
    TrainConfig,
)
from practical_path_guiding_lab_tpu.drivers.repeat import run_repeat
from practical_path_guiding_lab_tpu.drivers.train import train


@pytest.fixture(scope="module")
def train_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("debug")
    cfg = TrainConfig(
        scene="cornell-box",
        budget_spp=12,
        scene_overrides={"resx": 32, "resy": 32},
        out_root=str(out),
        kd_capacity=1 << 11,
        quad_capacity=1 << 15,
    )
    return train(cfg), out


def test_train_schedule_and_outputs(train_run):
    result, out = train_run
    # budget 12 = iterations of 4 + 8 spp
    assert result["cumm_spp"] == 12
    assert result["mse"] < 0.1
    base = out / "cornell-box"
    # per-iteration artifacts (main.py:398-411)
    for it, spp in ((0, 4), (1, 8)):
        assert (base / "tree-data" / f"cornell-box_iter-{it}.npz").exists()
        assert (base / "obj" / f"cornell-box_iter-{it}.obj").exists()
        pngs = list((base / "image").glob(f"cornell-box_iter-{it}_*.png"))
        exrs = list((base / "image").glob(f"cornell-box_iter-{it}_*.exr"))
        assert pngs and exrs
    # CSV streams (main.py:419-429)
    perf = base / "performance"
    for name in (
        "variance_inIter", "variance_groundTruth_inIter",
        "mse_groundTruth_inIter", "variance_endIter",
        "variance_groundTruth_endIter", "mse_groundTruth_endIter",
        "variance_estimated_final",
    ):
        f = perf / f"{name}.csv"
        assert f.exists(), name
        rows = list(csv.DictReader(open(f)))
        assert rows and "cumm_spp" in rows[0]
    # trees remain structurally valid
    result["integrator"].tree_prev.validate()


def test_train_invvar_blend_gated_at_low_spp(train_run):
    """The invvar combination only engages for segments with spp >= 32
    (low-spp self-variance estimates are unreliable, see invvar_combine
    docstring): the 12-spp fixture run must NOT produce blend outputs and
    the reference-protocol outputs stay untouched."""
    result, out = train_run
    assert result["mse_blend"] is None
    base = out / "cornell-box"
    assert not (base / "performance" / "mse_groundTruth_blend.csv").exists()
    assert not list((base / "image").glob("cornell-box_invvar-blend_*"))


def test_invvar_combine_synthetic():
    """invvar_combine on controlled data: known noise levels -> the
    combination beats the best single segment, weights follow 1/Var, and
    unqualified (low-spp / high-variance) segments are excluded."""
    from practical_path_guiding_lab_tpu.drivers.train import invvar_combine

    rng = np.random.default_rng(7)
    truth = rng.random((4096, 3)).astype(np.float32) * 2
    lw = np.array([0.212671, 0.71516, 0.072169], np.float32)

    def seg(sigma, spp):
        noisy = truth + rng.normal(0, sigma, truth.shape).astype(np.float32)
        # per-pixel luminance variance of an isotropic-sigma image
        return {"mean": noisy, "var": float(sigma**2 * np.sum(lw**2)), "spp": spp}

    s_a, s_b, s_c = seg(0.4, 32), seg(0.25, 64), seg(0.15, 128)
    out = invvar_combine([s_a, s_b, s_c])
    assert out is not None
    comb, ws, var_blend = out
    # weights ordered by 1/Var and sum to 1
    assert ws[0] < ws[1] < ws[2]
    assert abs(ws.sum() - 1.0) < 1e-9
    def mse(img):
        return float(np.mean(((img - truth) ** 2) @ lw))
    assert mse(comb) < mse(s_c["mean"]) * 0.75  # clear win over the best
    assert var_blend < s_c["var"]
    # low-spp segment is excluded: 2-segment result identical to dropping it
    s_low = seg(0.05, 4)  # tiny spp, deceptively low variance
    out2 = invvar_combine([s_low, s_b, s_c])
    comb2, ws2, _ = out2
    assert len(ws2) == 2
    # wildly-worse variance segment is excluded by the ratio cap
    s_bad = seg(5.0, 64)
    out3 = invvar_combine([s_bad, s_c])
    assert out3 is None  # only the final qualifies -> no blend
    # fewer than two segments -> None
    assert invvar_combine([s_c]) is None
    assert invvar_combine([]) is None


@pytest.mark.slow
def test_repeat_driver(train_run):
    _, out = train_run
    cfg = RepeatConfig(
        scene="cornell-box",
        scene_overrides={"resx": 32, "resy": 32},
        iterations=2,
        iter_spp=4,
        total_simulations=2,
        out_root=str(out),
    )
    averaged = run_repeat(cfg)
    f = Path(averaged["mse_groundTruth"])
    assert f.exists()
    rows = list(csv.DictReader(open(f)))
    assert rows
    # theoretical cumulative spp offsets (repeat_high_spp_renderer.py:45-62)
    assert float(rows[0]["cumm_spp"]) == 4.0


def test_baseline_driver(tmp_path):
    cfg = BaselineConfig(
        scene="cornell-box",
        scene_overrides={"resx": 32, "resy": 32},
        target_spp=8,
        chunk_spp=4,
        use_time_budget=False,
        out_root=str(tmp_path),
    )
    out = render_baseline(cfg)
    assert out["spp"] == 8
    assert out["mse"] is not None and out["mse"] < 0.1
    assert len(out["variance_csv"].rows) == 2  # one row per chunk


def test_baseline_time_budget(tmp_path):
    """Wall-clock budget mode (path_tracing_render.py:119-156)."""
    cfg = BaselineConfig(
        scene="cornell-box",
        scene_overrides={"resx": 32, "resy": 32},
        use_time_budget=True,
        time_budget=3.0,
        chunk_spp=2,
        out_root=str(tmp_path),
        save_outputs=False,
    )
    out = render_baseline(cfg)
    assert out["spp"] >= 2
    assert out["time"] >= 3.0
