"""Central registry for every runtime knob.

The reference keeps its experimental knobs as edit-the-source constants
(main.py:28-35,98-129); this framework exposes them as env-var overrides, but
ALL of them are declared here with their defaults and documentation, and every
run dumps a `config.json` manifest of the active values into its output tree so
any results row is reproducible from the manifest alone (SURVEY.md section 5,
config system).

Call sites read knobs via :func:`get` / :func:`get_int` / :func:`get_float` /
:func:`get_bool`; an env var with the same name overrides the default.
"""
from __future__ import annotations

import json
import os
from pathlib import Path

# name -> (default, doc). Defaults are strings exactly as an env var would be.
KNOBS: dict[str, tuple[str, str]] = {
    "PPG_SCENES_ROOT": ("/root/reference/scenes", "root directory of the scene corpus"),
    "PPG_RR": ("reference", "russian-roulette policy: 'reference' (mirrors path_guiding_integrator.py:370-381 incl. its dead-temporary semantics) or 'throughput'"),
    "PPG_CASCADE": ("1", "wavefront-shrink cascade in the PT/guided bounce loop (0 disables)"),
    "PPG_ADAPTIVE_FRACTION": ("1", "per-lane adaptive bsdfSamplingFraction (0 = reference constant fraction, path_guiding_integrator.py:223)"),
    "PPG_FRAC_POLICY": ("hsq", "adaptive-fraction policy: hsq (hemisphere-mass sqrt) or hemi"),
    "PPG_GUIDE_MAX_DEPTH": ("99", "max bounce depth that consults the guiding tree"),
    "PPG_FULL_RECORDS": ("0", "1 = full per-vertex record struct (reference layout); 0 = slim records"),
    "PPG_SPLAT_FILTER": ("0", "training-splat filter mode (0 = nearest, reference default)"),
    "PPG_KD_SPLIT_C": ("12000", "kd split constant c in c*sqrt(2^k) (kdtree.py:239); reference uses 12000"),
    "PPG_DEVICE_TABLES": ("1", "derive the big guiding tables on device from the structural upload (0 = host build)"),
    "PPG_TPU_FAST_TREE": ("1", "flattened alias/grid fast paths for tree sample/pdf (0 = oracle descents)"),
    "PPG_DEBUG_REFINE": ("", "non-empty = dump pre-refine tree state for debugging"),
    "PPG_TRAIN_SPP": ("1", "spp per dispatch during training iterations"),
    "PPG_FINAL_DISPATCH": ("1", "spp per dispatch in the final (record-off) iteration"),
    "PPG_INVVAR_BLEND": ("1", "end-of-run inverse-variance combination across iteration films (gated extension; reference protocol rows are untouched)"),
    "PPG_BVH_LEAF": ("8", "BVH max leaf size (measured: 8 beats 4 on this backend)"),
    "PPG_RAY_ROWS": ("8", "Pallas ray-tile sublane rows"),
    "PPG_INTERSECT": ("bvh", "intersection backend: bvh | brute | clustered"),
    "PPG_TPU_STEPPED": ("0", "1 = per-bounce stepped dispatch (debugging) instead of the fused while_loop"),
    "PPG_TPU_NO_NATIVE": ("0", "1 = disable the C++ host engines (pure-python fallbacks)"),
    "PPG_TPU_JIT_CACHE": ("/tmp/ppg_tpu_jit_cache", "persistent XLA compilation cache dir ('' disables)"),
    "PPG_TPU_CACHE": ("/tmp/ppg_tpu_cache", "decoded-asset (EXR/texture) cache dir"),
    "PPG_SLIM_MIRROR": ("auto", "drop oracle/derive-only tables from the device mirror: auto (trees >= 2^21 quad nodes), 1 (always), 0 (never) — ~1.3 GB HBM at a 16.7M-node tree"),
    "PPG_BENCH_DEEP_TREE": (
        "debug_r3b/kdc2500-blend/veach-ajar/tree-data/veach-ajar_iter-4.npz",
        "saved late-iteration tree npz for the bench's production-scale "
        "guided section. NB iter-4, not iter-5: the final iteration's "
        "saved tree is structure-only (training refines+resets after the "
        "last trained iteration — reference main.py:382-383 does the "
        "same), so iter-5's all-zero flux would benchmark uniform "
        "sampling, not a trained distribution (found round 5)",
    ),
}


def get(name: str) -> str:
    """Active value of a registered knob (env override, else default)."""
    default, _doc = KNOBS[name]
    return os.environ.get(name, default)


def get_int(name: str) -> int:
    return int(get(name))


def get_float(name: str) -> float:
    return float(get(name))


def get_bool(name: str) -> bool:
    return get(name) not in ("", "0", "false", "False")


def snapshot() -> dict:
    """All registered knobs: active value + whether the env overrode it."""
    out = {}
    for name, (default, _doc) in sorted(KNOBS.items()):
        active = os.environ.get(name, default)
        out[name] = {"value": active, "overridden": name in os.environ}
    return out


def write_manifest(out_dir, run_config=None, extra=None) -> Path:
    """Dump a config.json of every active knob (+ driver dataclass fields)
    into `out_dir` at run start. Returns the manifest path."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    manifest = {"knobs": snapshot()}
    if run_config is not None:
        import dataclasses

        if dataclasses.is_dataclass(run_config):
            cfg = dataclasses.asdict(run_config)
        else:
            cfg = dict(run_config)
        manifest["run_config"] = {
            k: (str(v) if isinstance(v, Path) else v) for k, v in cfg.items()
        }
    if extra:
        manifest.update(extra)
    path = out_dir / "config.json"
    path.write_text(json.dumps(manifest, indent=2, default=str) + "\n")
    return path
