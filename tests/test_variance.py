"""Variance / MSE metric oracles against numpy (reference-exact semantics:
per-channel moments, THEN luminance, per-pixel clamp at 1e4 BEFORE the mean,
final /(spp-1) self / /spp GT division after the clamped mean —
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
    # reference order: luminance OF the per-channel squared error
    diff2 = ((sum_l / 8 - gt) ** 2) @ LUM
    assert abs(got - np.mean(np.minimum(diff2, 1e4))) < 1e-5
    # clamp: a huge outlier pixel contributes exactly 1e4
    sum_l_hot = sum_l.copy()
    sum_l_hot[0] = 1e6
    got_hot = float(V.compute_mse(jnp.asarray(sum_l_hot), 8.0, jnp.asarray(gt)))
    diff2_hot = ((sum_l_hot / 8 - gt) ** 2) @ LUM
    assert abs(got_hot - np.mean(np.minimum(diff2_hot, 1e4))) < 1e-2
    assert np.minimum(diff2_hot, 1e4)[0] == 1e4


def test_mse_luminance_of_squares_not_square_of_luminances():
    """The reference computes lum((L-GT)^2), NOT (lum(L)-lum(GT))^2; the
    two differ whenever channel errors have mixed signs. Pin the order."""
    sum_l = np.array([[1.0, 0.0, 0.0]], np.float32)
    gt = np.array([[0.0, 1.0, 0.0]], np.float32)
    got = float(V.compute_mse(jnp.asarray(sum_l), 1.0, jnp.asarray(gt)))
    ref = float((np.array([1.0, 1.0, 0.0], np.float32) @ LUM))  # (Δ^2)@lum
    wrong = float((sum_l @ LUM - gt @ LUM) ** 2)  # ≈ 0.25 — must NOT match
    assert abs(got - ref) < 1e-6
    assert abs(got - wrong) > 0.1


def test_variance_self_matches_numpy():
    samples, sum_l, sum_l2 = _buffers(seed=2)
    got = float(V.compute_variance_self(jnp.asarray(sum_l), jnp.asarray(sum_l2), 8.0))
    # reference: per-channel L2 - L*L, luminance, clamp, mean, THEN /(spp-1)
    L = sum_l / 8
    L2 = sum_l2 / 8
    var = (L2 - L * L) @ LUM
    ref = np.mean(np.minimum(var, 1e4)) / 7.0
    assert abs(got - ref) < 1e-5
    # variance of the MEAN estimator shrinks ~1/spp: doubling spp on the
    # same distribution roughly halves it
    s2, l2a, l2b = _buffers(seed=2, spp=32)
    got32 = float(V.compute_variance_self(jnp.asarray(l2a), jnp.asarray(l2b), 32.0))
    assert got32 < got * 0.5
    # spp == 1: no /(spp-1) division (reference `if spp > 1` guard); the
    # self-variance of one sample is identically zero
    one = samples[:1]
    got1 = float(
        V.compute_variance_self(
            jnp.asarray(one.sum(0)), jnp.asarray((one**2).sum(0)), 1.0
        )
    )
    assert abs(got1) < 1e-5


def test_variance_gt_matches_numpy():
    samples, sum_l, sum_l2 = _buffers(seed=3)
    gt = samples.mean(0)
    got = float(
        V.compute_variance_gt(jnp.asarray(sum_l), jnp.asarray(sum_l2), 8.0, jnp.asarray(gt))
    )
    # reference: per-channel sumL2/spp - GT*GT, luminance, clamp, mean, /spp
    var = (sum_l2 / 8 - gt * gt) @ LUM
    ref = np.mean(np.minimum(var, 1e4)) / 8.0
    assert abs(got - ref) < 1e-5


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
