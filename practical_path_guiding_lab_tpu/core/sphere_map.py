"""Cylindrical equal-area mapping between the unit sphere and [0,1]^2.

The directional quadtrees are defined over this square. Semantics mirror the
reference (common.py:100-158): ``x = phi / 2pi`` with phi wrapped to [0, 2pi),
``y = (cos(theta) + 1) / 2``; the inverse uses ``cos(theta) = 2y - 1``.
Non-finite directions map to (0, 0) (common.py:156-158). The map is
area-preserving, so solid-angle pdfs relate to canonical-square pdfs by the
constant factor 1/(4 pi).
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import TWO_PI, safe_sqrt


def canonical_to_dir(p):
    """(..., 2) canonical coords -> (..., 3) unit direction."""
    cos_theta = 2.0 * p[..., 1] - 1.0
    phi = TWO_PI * p[..., 0]
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta],
        axis=-1,
    )


def dir_to_canonical(d):
    """(..., 3) direction -> (..., 2) canonical coords in [0, 1)^2.

    Non-finite inputs produce (0, 0), matching common.py:156-158.
    """
    cos_theta = jnp.clip(d[..., 2], -1.0, 1.0)
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    # Wrap into [0, 2pi) (reference loops, common.py:148-150).
    phi = jnp.mod(phi, TWO_PI)
    x = phi / TWO_PI
    y = (cos_theta + 1.0) * 0.5
    out = jnp.stack([x, y], axis=-1)
    finite = jnp.all(jnp.isfinite(d), axis=-1, keepdims=True)
    out = jnp.where(finite, out, 0.0)
    # Guard against x == 1.0 from phi == 2pi after rounding.
    return jnp.clip(out, 0.0, 1.0 - 1e-7)
