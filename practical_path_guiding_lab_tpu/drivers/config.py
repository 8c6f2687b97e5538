"""Run configuration (replaces the reference's edit-the-source constants:
main.py:28-35,98-129, path_tracing_render.py:46-52,
repeat_high_spp_renderer.py:267-278)."""
from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from .. import knobs

# Overridable via PPG_SCENES_ROOT; defaults to the test corpus checkout.
SCENES_ROOT = Path(knobs.get("PPG_SCENES_ROOT"))

SCENE_FILES = {
    "cornell-box": "cornell-box/scene.xml",
    "cornell-box-empty": "cornell-box/cornell-box-empty.xml",
    "torus": "torus/scene.xml",
    "teapot": "teapot/teapot_compact.xml",
    "veach-mis": "veach-mis/scene.xml",
    "veach-bidir": "veach-bidir/scene.xml",
    "veach-ajar": "veach-ajar/scene.xml",
}


@dataclass
class TrainConfig:
    """Guided-training driver knobs (main.py semantics)."""

    scene: str = "cornell-box"
    scene_overrides: dict = field(default_factory=dict)  # $var overrides
    budget_spp: int = 252                  # main.py:99
    batch_spp: int = 4                     # main.py:123
    stable_variance_spp_threshold: int = 256  # main.py:128
    initial_seed: int = 0                  # main.py:66-67
    sd_tree_max_depth: int = 20            # main.py:60
    quad_tree_max_depth: int = 20
    store_nee: bool = True
    bsdf_sampling_fraction: float = 0.5
    bbox_eps: float = 1e-4                 # main.py:55-59
    record_in_iteration: bool = True
    save_outputs: bool = True
    out_root: str = "debug"
    kd_capacity: int = 1 << 15
    quad_capacity: int = 1 << 20
    # multi-chip data parallelism: shard the wavefront over this many
    # devices (0 = single-device). SURVEY.md section 2.3.
    mesh_devices: int = 0


@dataclass
class BaselineConfig:
    """Unguided PT driver knobs (path_tracing_render.py:46-52)."""

    scene: str = "cornell-box"
    scene_overrides: dict = field(default_factory=dict)
    target_spp: int = 40
    time_budget: float = 1000.0
    chunk_spp: int = 4
    use_time_budget: bool = True
    initial_seed: int = 0
    save_outputs: bool = True
    out_root: str = "debug"


@dataclass
class RepeatConfig:
    """High-spp repeat driver (repeat_high_spp_renderer.py:267-278)."""

    scene: str = "cornell-box"
    scene_overrides: dict = field(default_factory=dict)
    iterations: int = 10
    iter_spp: int = 1024
    total_simulations: int = 2
    initial_seed: int = 0
    out_root: str = "debug"
    # metric-row cadence: the reference records a row EVERY pass
    # (repeat_high_spp_renderer.py:149-163); raise to thin the CSVs
    record_every: int = 1
    # samples per wavefront dispatch (repeat renders record-off, so
    # multi-spp dispatches are bitwise-equal to sequential 1-spp passes
    # via rng.spp_fold; amortizes the per-dispatch round trip at small
    # films). Must divide record_every when record_every > 1.
    dispatch: int = 1


def scene_path(name: str) -> Path:
    if name not in SCENE_FILES:
        raise SystemExit(
            f"unknown scene '{name}'; available: {', '.join(sorted(SCENE_FILES))}"
        )
    return SCENES_ROOT / SCENE_FILES[name]
