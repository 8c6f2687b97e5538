"""Config-surface tests: the knob registry and the per-run manifest
(SURVEY.md section 5 config system; replaces the reference's
edit-the-source constants, main.py:28-35)."""
import json
import os

from practical_path_guiding_lab_tpu import knobs


def test_defaults_and_env_override(monkeypatch):
    assert knobs.get("PPG_RR") == "reference"
    assert knobs.get_int("PPG_BVH_LEAF") == 8
    monkeypatch.setenv("PPG_RR", "throughput")
    assert knobs.get("PPG_RR") == "throughput"
    snap = knobs.snapshot()
    assert snap["PPG_RR"] == {"value": "throughput", "overridden": True}
    assert snap["PPG_CASCADE"]["overridden"] is False


def test_every_code_knob_is_registered():
    """Grep the package for PPG_* literals: each must be in the registry
    (no unregistered env knobs can creep back in)."""
    import pathlib
    import re

    pkg = pathlib.Path(knobs.__file__).parent
    found = set()
    for py in pkg.rglob("*.py"):
        found |= set(re.findall(r"PPG_[A-Z_0-9]+", py.read_text()))
    # test-only helper vars are not runtime knobs
    found -= {"PPG_TPU_TEST_REEXEC"}
    unregistered = found - set(knobs.KNOBS)
    assert not unregistered, f"unregistered knobs: {sorted(unregistered)}"


def test_manifest_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("PPG_KD_SPLIT_C", "2500")
    from practical_path_guiding_lab_tpu.drivers.config import TrainConfig

    p = knobs.write_manifest(
        tmp_path, run_config=TrainConfig(scene="veach-ajar"),
        extra={"driver": "train"},
    )
    m = json.loads(p.read_text())
    assert m["driver"] == "train"
    assert m["run_config"]["scene"] == "veach-ajar"
    assert m["run_config"]["budget_spp"] == 252
    assert m["knobs"]["PPG_KD_SPLIT_C"] == {"value": "2500", "overridden": True}
    # every registered knob appears in the manifest
    assert set(m["knobs"]) == set(knobs.KNOBS)


def test_scene_root_knob(monkeypatch, tmp_path):
    monkeypatch.setenv("PPG_SCENES_ROOT", str(tmp_path))
    import importlib

    from practical_path_guiding_lab_tpu.drivers import config as cfg_mod

    importlib.reload(cfg_mod)
    assert str(cfg_mod.scene_path("cornell-box")).startswith(str(tmp_path))
    monkeypatch.delenv("PPG_SCENES_ROOT")
    importlib.reload(cfg_mod)


def test_perf_data_unfilled_fields_serialize_as_zero(tmp_path):
    """Reference PerformanceData writes the default 0 for unfilled metric
    columns (common.py:77-95); pandas tooling must read 0, not NaN."""
    from practical_path_guiding_lab_tpu.utils.perf_data import PerformanceData

    pd_rec = PerformanceData()
    pd_rec.append(time=1.0, spp=4, cumm_spp=4, iteration=0, variance=0.5)
    out = tmp_path / "v.csv"
    pd_rec.saveToFile(out)
    lines = out.read_text().strip().split("\n")
    assert lines[1].endswith(",0.5,0")
