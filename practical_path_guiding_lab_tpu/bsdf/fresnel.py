"""Fresnel terms (dielectric exact, conductor complex-IOR per RGB channel)."""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math import safe_sqrt


def fresnel_dielectric(cos_i, eta):
    """Unpolarized Fresnel reflectance for relative IOR ``eta`` (= int/ext
    when entering). cos_i may be signed: negative = exiting.

    Returns (F, cos_t_abs, eta_it, eta_ti): reflectance, |cos| of the
    transmitted angle, relative IOR for the actual transmission direction
    and its inverse.
    """
    entering = cos_i >= 0.0
    eta_it = jnp.where(entering, eta, 1.0 / eta)
    eta_ti = 1.0 / eta_it
    c = jnp.abs(cos_i)
    sin_t2 = (1.0 - c * c) * (eta_ti * eta_ti)
    tir = sin_t2 >= 1.0
    cos_t = safe_sqrt(1.0 - sin_t2)
    rs = (c - eta_it * cos_t) / jnp.maximum(c + eta_it * cos_t, 1e-12)
    rp = (eta_it * c - cos_t) / jnp.maximum(eta_it * c + cos_t, 1e-12)
    f = 0.5 * (rs * rs + rp * rp)
    f = jnp.where(tir, 1.0, f)
    return f, cos_t, eta_it, eta_ti


def fresnel_conductor(cos_i, eta, k):
    """Conductor Fresnel; eta/k shaped (..., 3) for RGB."""
    c = jnp.clip(jnp.abs(cos_i), 0.0, 1.0)[..., None]
    c2 = c * c
    s2 = 1.0 - c2
    e2 = eta * eta
    k2 = k * k
    t0 = e2 - k2 - s2
    a2b2 = safe_sqrt(t0 * t0 + 4.0 * e2 * k2)
    t1 = a2b2 + c2
    a = safe_sqrt(0.5 * (a2b2 + t0))
    t2 = 2.0 * a * c
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-12)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-12)
    return 0.5 * (rs + rp)
