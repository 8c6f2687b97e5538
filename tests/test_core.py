"""Core math/unit tests: sphere map round-trip (the reference's
common.py:270-307 self-test, formalized), frames, MIS guard."""
import numpy as np
import jax.numpy as jnp

from practical_path_guiding_lab_tpu.core import sphere_map
from practical_path_guiding_lab_tpu.core.math import (
    build_frame,
    mis_power_heuristic,
    normalize,
    to_local,
    to_world,
)


def test_sphere_map_roundtrip(rng_np):
    d = normalize(jnp.asarray(rng_np.normal(size=(1000, 3)), jnp.float32))
    p = sphere_map.dir_to_canonical(d)
    assert float(p.min()) >= 0.0 and float(p.max()) < 1.0
    d2 = sphere_map.canonical_to_dir(p)
    assert np.allclose(np.asarray(d), np.asarray(d2), atol=1e-5)


def test_sphere_map_nonfinite():
    d = jnp.array([[np.nan, 0.0, 1.0], [np.inf, 1.0, 0.0]])
    p = sphere_map.dir_to_canonical(d)
    assert np.allclose(np.asarray(p), 0.0)


def test_sphere_map_area_preserving(rng_np):
    """Uniform directions -> uniform canonical coords (equal-area)."""
    d = normalize(jnp.asarray(rng_np.normal(size=(200000, 3)), jnp.float32))
    p = np.asarray(sphere_map.dir_to_canonical(d))
    hist, _, _ = np.histogram2d(p[:, 0], p[:, 1], bins=8, range=[[0, 1], [0, 1]])
    expected = len(p) / 64
    assert np.all(np.abs(hist - expected) < 5 * np.sqrt(expected))


def test_frame_orthonormal(rng_np):
    n = normalize(jnp.asarray(rng_np.normal(size=(100, 3)), jnp.float32))
    t, b = build_frame(n)
    assert np.allclose(np.asarray(jnp.sum(t * b, -1)), 0, atol=1e-5)
    assert np.allclose(np.asarray(jnp.sum(t * n, -1)), 0, atol=1e-5)
    assert np.allclose(np.asarray(jnp.linalg.norm(t, axis=-1)), 1, atol=1e-5)


def test_local_world_roundtrip(rng_np):
    n = normalize(jnp.asarray(rng_np.normal(size=(50, 3)), jnp.float32))
    v = normalize(jnp.asarray(rng_np.normal(size=(50, 3)), jnp.float32))
    v2 = to_world(to_local(v, n), n)
    assert np.allclose(np.asarray(v), np.asarray(v2), atol=1e-5)


def test_mis_nan_guard():
    w = mis_power_heuristic(jnp.array([0.0]), jnp.array([0.0]))
    assert float(w[0]) == 0.0
    w = mis_power_heuristic(jnp.array([1.0]), jnp.array([1.0]))
    assert abs(float(w[0]) - 0.5) < 1e-6
