"""Differential test: the C++ SD-tree host engine must produce EXACTLY the
same trees as the Python reference implementation."""
import numpy as np
import jax.numpy as jnp

from practical_path_guiding_lab_tpu.guiding import native
from practical_path_guiding_lab_tpu.guiding import sdtree as sd
import pytest


def _make_trained(use_native: bool, seed=3, n=40000):
    rng = np.random.default_rng(seed)
    t = sd.SDTree([0, 0, 0], [1, 1, 1], kd_capacity=1 << 11,
                  quad_capacity=1 << 15)
    for round_seed in (1, 2):
        dev = t.to_device()
        r2 = np.random.default_rng(seed * 100 + round_seed)
        p = jnp.asarray(r2.random((n, 3)), jnp.float32)
        xy = jnp.asarray(r2.random((n, 2)) ** 2, jnp.float32)
        val = jnp.asarray(r2.random(n), jnp.float32)
        dev = sd.splat(dev, p, xy, val, jnp.ones(n, jnp.float32))
        # absorb via python propagate to keep the input identical
        kd_acc = np.ascontiguousarray(np.asarray(dev.kd_vert_acc, np.float64))
        q_acc = np.ascontiguousarray(np.asarray(dev.q_irr_acc, np.float64))
        t.kd_vert += t._kd_propagate(kd_acc)
        t.q_irr += t._quad_propagate(q_acc)
        t.kd_threshold = 4000.0
        if use_native:
            assert native.refine(t), "native library unavailable"
        else:
            t._kd_refine()
            t._quad_refine()
            t._compact_quad()
        t.reset_counters() if round_seed == 1 else None
    return t


@pytest.mark.slow
def test_native_matches_python_refine():
    if native.load() is None:
        import pytest

        pytest.skip("native sdtree engine unavailable")
    a = _make_trained(True)
    b = _make_trained(False)
    assert a.kd_count == b.kd_count
    assert a.q_count == b.q_count
    nk, nq = a.kd_count, a.q_count
    assert np.array_equal(a.kd_left[:nk], b.kd_left[:nk])
    assert np.array_equal(a.kd_leaf[:nk], b.kd_leaf[:nk])
    assert np.array_equal(a.kd_quad_root[:nk], b.kd_quad_root[:nk])
    assert np.allclose(a.kd_vert[:nk], b.kd_vert[:nk])
    assert np.array_equal(a.q_child[:nq], b.q_child[:nq])
    assert np.allclose(a.q_irr[:nq], b.q_irr[:nq])
    assert np.array_equal(a.q_depth[:nq], b.q_depth[:nq])


def test_native_propagate_matches_python():
    if native.load() is None:
        import pytest

        pytest.skip("native sdtree engine unavailable")
    t = _make_trained(True, seed=7)
    rng = np.random.default_rng(0)
    leaf_kd = rng.random(t.kd_capacity)
    leaf_q = rng.random(t.quad_capacity)
    a = native.kd_propagate(leaf_kd, t.kd_left, t.kd_count)
    b = t._kd_propagate(leaf_kd)
    assert np.allclose(a[: t.kd_count], b[: t.kd_count])
    a = native.quad_propagate(leaf_q, t.q_child, t.q_count)
    b = t._quad_propagate(leaf_q)
    assert np.allclose(a[: t.q_count], b[: t.q_count])
