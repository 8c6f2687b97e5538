"""Counter-based random numbers for the wavefront renderer.

The reference uses Mitsuba's stateful ``independent`` sampler with
``seed = seed0 + cumulative_spp`` per pass (main.py:218). On TPU we use
stateless threefry keys derived from (seed0, pass_index, purpose) and draw
per-lane numbers with ``jax.random`` over the whole wavefront at once; this
is deterministic, replay-able, and shard-friendly (each device slices the
same logical lane space).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class PurposeId:
    """Stable stream ids so adding draws never perturbs other streams."""

    CAMERA = 0
    NEE_SELECT = 1
    NEE_POS = 2
    BSDF_SAMPLE = 3
    GUIDE_SELECT = 4
    GUIDE_DIR = 5
    RR = 6
    FILTER = 7
    LOBE = 8


def pass_key(seed0: int, pass_index) -> jax.Array:
    """Key for one render pass (reference: seed0 + cumm_spp, main.py:218)."""
    return jax.random.fold_in(jax.random.PRNGKey(seed0), pass_index)


def stream(key: jax.Array, bounce, purpose: int) -> jax.Array:
    """Sub-key for a (bounce, purpose) draw within a pass."""
    return jax.random.fold_in(key, bounce * 16 + purpose)


def uniform(key: jax.Array, shape, lo=0.0, hi=1.0) -> jax.Array:
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


def uniform2(key: jax.Array, shape):
    u = jax.random.uniform(key, shape + (2,), jnp.float32)
    return u[..., 0], u[..., 1]
