"""Variance / MSE metrics with the reference's exact semantics
(path_guiding_integrator.py:503-550): luminance-based, outliers clamped at
1e4, sample variance /(spp-1) against self, population /spp against GT.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import luminance

CLAMP = 1e4


@jax.jit
def accumulate_moments(sum_l, sum_l2, L, px, py, width):
    """Add per-sample radiance into per-pixel sumL / sumL2 buffers
    ((H*W, 3) each, pixel-major like the reference layout)."""
    idx = (py.astype(jnp.int32) * width + px.astype(jnp.int32)).astype(jnp.int32)
    sum_l = sum_l.at[idx].add(L)
    sum_l2 = sum_l2.at[idx].add(L * L)
    return sum_l, sum_l2


@jax.jit
def accumulate_moments_aligned(sum_l, sum_l2, L):
    """Scatter-free moment accumulation for film-prologue lane order
    (pixel-major, spp slices tiled): the scatter index is exactly
    ``tile(arange(n), spp)``, so the update is a reshape-sum + add."""
    n = sum_l.shape[0]
    spp = L.shape[0] // n
    Ls = L.reshape(spp, n, 3)
    return sum_l + Ls.sum(axis=0), sum_l2 + (Ls * Ls).sum(axis=0)


@jax.jit
def compute_mse(sum_l, spp, gt):
    """Luminance of the per-channel squared error of the mean image vs
    ground truth, per-pixel clamp at 1e4, mean — reference-exact order of
    operations (computeMSE, path_guiding_integrator.py:503-517:
    ``mse = luminance((L - GT)**2); minimum(mse, 10000); mean``)."""
    mean = sum_l / spp
    diff2 = luminance((mean - gt) ** 2)
    return jnp.mean(jnp.minimum(diff2, CLAMP))


@jax.jit
def compute_variance_self(sum_l, sum_l2, spp):
    """Sample variance of the per-pixel mean estimator — reference-exact
    (computeVariance, path_guiding_integrator.py:520-538): per-channel
    ``L2 - L*L``, THEN luminance, per-pixel clamp at 1e4 (no lower clamp),
    mean, and the /(spp-1) division applied AFTER the clamped mean."""
    L = sum_l / spp
    L2 = sum_l2 / spp
    var = luminance(L2 - L * L)
    var = jnp.mean(jnp.minimum(var, CLAMP))
    return jnp.where(spp > 1.0, var / jnp.maximum(spp - 1.0, 1.0), var)


def metrics_all(sum_l, sum_l2, spp, gt):
    """All three per-pass CSV metrics as device scalars in one traced
    computation (no separate dispatches): (sample variance vs self,
    population variance vs GT, MSE vs GT). ``gt`` may be None (no ground
    truth): the GT metrics come back as 0-scalars. Intended for the fused
    driver post-pass program — the reference computes these per pass on
    device too (main.py:208-265)."""
    var_self = compute_variance_self(sum_l, sum_l2, spp)
    if gt is None:
        z = jnp.zeros(())
        return var_self, z, z
    var_gt = compute_variance_gt(sum_l, sum_l2, spp, gt)
    mse = compute_mse(sum_l, spp, gt)
    return var_self, var_gt, mse


@jax.jit
def compute_variance_gt(sum_l, sum_l2, spp, gt):
    """Population variance against ground truth — reference-exact
    (path_guiding_integrator.py:540-550): per-channel ``sumL2/spp - GT*GT``,
    THEN luminance, per-pixel clamp at 1e4 (no lower clamp), mean, /spp
    after the clamped mean."""
    var = luminance(sum_l2 / spp - gt * gt)
    return jnp.mean(jnp.minimum(var, CLAMP)) / spp
