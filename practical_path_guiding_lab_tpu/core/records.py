"""SoA record structs as frozen pytree dataclasses.

The reference keeps a giant ``SurfaceInteractionRecord`` DRJIT_STRUCT SoA
buffer of one row per path vertex (common.py:14-63,
path_guiding_integrator.py:318-346). Here the equivalent is a pytree of
``(num_rays, max_depth, ...)`` float32 arrays with static shapes, written at
``[:, depth]`` inside the bounce loop and flattened for splatting.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Ray:
    o: jnp.ndarray  # (..., 3) origin
    d: jnp.ndarray  # (..., 3) unit direction

    def at(self, t):
        return self.o + self.d * t[..., None]


@struct.dataclass
class Intersection:
    """Closest-hit surface interaction for a wavefront of rays."""

    valid: jnp.ndarray      # (...,) bool — hit anything
    t: jnp.ndarray          # (...,) hit distance
    p: jnp.ndarray          # (..., 3) hit position
    n: jnp.ndarray          # (..., 3) geometric normal (faceforward'd to wi side)
    ns: jnp.ndarray         # (..., 3) shading normal
    uv: jnp.ndarray         # (..., 2) texture coords
    prim: jnp.ndarray       # (...,) int32 primitive index
    material: jnp.ndarray   # (...,) int32 material index
    emitter: jnp.ndarray    # (...,) int32 emitter index (-1 if none)
    wi_world: jnp.ndarray   # (..., 3) direction toward the origin of the ray
    entering: jnp.ndarray   # (...,) bool — original geometric normal faced the ray
                            # (false = hit from inside; drives dielectric IOR)


@struct.dataclass
class PathRecords:
    """Per-vertex training records, shape (num_rays, max_depth, ...).

    Mirrors the reference record fields (common.py:17-40); radiance here is
    reconstructed after the pass (path_guiding_integrator.py:434-453).
    """

    position: jnp.ndarray            # (N, D, 3)
    canonical_dir: jnp.ndarray       # (N, D, 2) wo in canonical square
    throughput_radiance: jnp.ndarray # (N, D, 3) L at record time (:334)
    throughput_bsdf: jnp.ndarray     # (N, D, 3) path throughput BEFORE this
                                     # bounce's weight multiply (:332)
    bsdf_weight: jnp.ndarray         # (N, D, 3) bsdf_value / woPdf (:330)
    nee_radiance: jnp.ndarray        # (N, D, 3) Lr_dir / throughput (:337)
    nee_dir: jnp.ndarray             # (N, D, 2) canonical NEE direction
    wo_pdf: jnp.ndarray              # (N, D) one-sample-MIS mixture pdf
    bsdf_pdf: jnp.ndarray            # (N, D)
    is_delta: jnp.ndarray            # (N, D) bool
    active: jnp.ndarray              # (N, D) bool — row was written

    @staticmethod
    def zeros(num_rays: int, max_depth: int) -> "PathRecords":
        n, d = num_rays, max_depth
        f = lambda *s: jnp.zeros((n, d) + s, jnp.float32)
        b = lambda: jnp.zeros((n, d), bool)
        return PathRecords(
            position=f(3), canonical_dir=f(2),
            throughput_radiance=f(3), throughput_bsdf=f(3), bsdf_weight=f(3),
            nee_radiance=f(3), nee_dir=f(2),
            wo_pdf=f(), bsdf_pdf=f(), is_delta=b(), active=b(),
        )
