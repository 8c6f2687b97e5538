"""Microfacet distributions (Beckmann, GGX) with Smith shadowing.

Classic D * cos(theta_m) normal sampling (not VNDF): sampling pdf and MIS
weights are mutually consistent, which is all unbiasedness needs.
All directions are in the local shading frame (z up).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math import PI, safe_sqrt


def _cos2(m):
    return jnp.clip(m[..., 2] * m[..., 2], 0.0, 1.0)


def d_beckmann(m, alpha):
    c2 = _cos2(m)
    t2 = (1.0 - c2) / jnp.maximum(c2, 1e-12)
    a2 = alpha * alpha
    d = jnp.exp(-t2 / a2) / jnp.maximum(PI * a2 * c2 * c2, 1e-20)
    return jnp.where(m[..., 2] > 0, d, 0.0)


def d_ggx(m, alpha):
    c2 = _cos2(m)
    a2 = alpha * alpha
    denom = c2 * (a2 - 1.0) + 1.0
    d = a2 / jnp.maximum(PI * denom * denom, 1e-20)
    return jnp.where(m[..., 2] > 0, d, 0.0)


def g1_beckmann(w, alpha):
    c = jnp.abs(w[..., 2])
    t = safe_sqrt(1.0 - c * c) / jnp.maximum(c, 1e-12)
    a = 1.0 / jnp.maximum(alpha * t, 1e-12)
    g = jnp.where(
        a < 1.6,
        (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a),
        1.0,
    )
    return g


def g1_ggx(w, alpha):
    c = jnp.abs(w[..., 2])
    c2 = c * c
    t2 = (1.0 - c2) / jnp.maximum(c2, 1e-12)
    return 2.0 / (1.0 + safe_sqrt(1.0 + alpha * alpha * t2))


def smith_g(wi, wo, alpha, ggx):
    g1 = jnp.where(ggx, g1_ggx(wi, alpha), g1_beckmann(wi, alpha))
    g2 = jnp.where(ggx, g1_ggx(wo, alpha), g1_beckmann(wo, alpha))
    return g1 * g2


def eval_d(m, alpha, ggx):
    return jnp.where(ggx, d_ggx(m, alpha), d_beckmann(m, alpha))


def sample_m(alpha, ggx, u1, u2):
    """Sample a microfacet normal m ~ D(m) cos(theta_m); returns (m, pdf_m)."""
    phi = 2.0 * PI * u2
    a2 = alpha * alpha
    # Beckmann: tan^2 = -a2 ln(1-u)
    t2_b = -a2 * jnp.log(jnp.maximum(1.0 - u1, 1e-20))
    # GGX: tan^2 = a2 u/(1-u)
    t2_g = a2 * u1 / jnp.maximum(1.0 - u1, 1e-12)
    t2 = jnp.where(ggx, t2_g, t2_b)
    c = 1.0 / safe_sqrt(1.0 + t2)
    s = safe_sqrt(1.0 - c * c)
    m = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), c], axis=-1)
    pdf = eval_d(m, alpha, ggx) * c
    return m, pdf


def pdf_m(m, alpha, ggx):
    return eval_d(m, alpha, ggx) * jnp.clip(m[..., 2], 0.0, 1.0)
