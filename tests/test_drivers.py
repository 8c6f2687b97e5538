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
