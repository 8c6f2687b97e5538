"""Variance / MSE metric oracles against numpy (reference semantics:
luminance-based, clamp at 1e4, /(spp-1) self-variance, /spp GT-variance —
path_guiding_integrator.py:503-550)."""
import numpy as np
import jax.numpy as jnp

from practical_path_guiding_lab_tpu.render import variance as V

LUM = np.array([0.212671, 0.71516, 0.072169], np.float32)


def _buffers(seed=0, n=256, spp=8):
    rng = np.random.default_rng(seed)
    samples = rng.random((spp, n, 3)).astype(np.float32) * 2
    sum_l = samples.sum(0)
    sum_l2 = (samples**2).sum(0)
    return samples, sum_l, sum_l2


def test_mse_matches_numpy_and_clamps():
    samples, sum_l, _ = _buffers()
    gt = np.random.default_rng(1).random((256, 3)).astype(np.float32)
    got = float(V.compute_mse(jnp.asarray(sum_l), 8.0, jnp.asarray(gt)))
    diff2 = ((sum_l / 8) @ LUM - gt @ LUM) ** 2
    assert abs(got - np.mean(np.minimum(diff2, 1e4))) < 1e-5
    # clamp: a huge outlier pixel contributes exactly 1e4
    sum_l_hot = sum_l.copy()
    sum_l_hot[0] = 1e6
    got_hot = float(V.compute_mse(jnp.asarray(sum_l_hot), 8.0, jnp.asarray(gt)))
    diff2_hot = ((sum_l_hot / 8) @ LUM - gt @ LUM) ** 2
    assert abs(got_hot - np.mean(np.minimum(diff2_hot, 1e4))) < 1e-2
    assert np.minimum(diff2_hot, 1e4)[0] == 1e4


def test_variance_self_matches_numpy():
    samples, sum_l, sum_l2 = _buffers(seed=2)
    got = float(V.compute_variance_self(jnp.asarray(sum_l), jnp.asarray(sum_l2), 8.0))
    mean = (sum_l @ LUM) / 8
    mean2 = (sum_l2 @ LUM) / 8
    var = np.clip((mean2 - mean**2) / 7.0, 0.0, 1e4)
    assert abs(got - var.mean()) < 1e-5
    # variance of the MEAN estimator shrinks ~1/spp: doubling spp on the
    # same distribution roughly halves it
    s2, l2a, l2b = _buffers(seed=2, spp=32)
    got32 = float(V.compute_variance_self(jnp.asarray(l2a), jnp.asarray(l2b), 32.0))
    assert got32 < got * 0.5


def test_variance_gt_matches_numpy():
    samples, sum_l, sum_l2 = _buffers(seed=3)
    gt = samples.mean(0)
    got = float(
        V.compute_variance_gt(jnp.asarray(sum_l), jnp.asarray(sum_l2), 8.0, jnp.asarray(gt))
    )
    mean2 = (sum_l2 @ LUM) / 8
    g = gt @ LUM
    var = np.clip((mean2 - g * g) / 8.0, 0.0, 1e4)
    assert abs(got - var.mean()) < 1e-5


def test_accumulate_moments_pixel_major():
    w = 4
    px = jnp.asarray([0.2, 3.9, 1.5], jnp.float32)
    py = jnp.asarray([0.0, 1.0, 2.2], jnp.float32)
    L = jnp.ones((3, 3), jnp.float32) * 2.0
    sl, sl2 = V.accumulate_moments(
        jnp.zeros((12, 3)), jnp.zeros((12, 3)), L, px, py, w
    )
    sl = np.asarray(sl)
    assert sl[0, 0] == 2.0 and sl[1 * w + 3, 0] == 2.0 and sl[2 * w + 1, 0] == 2.0
    assert np.asarray(sl2)[0, 0] == 4.0
