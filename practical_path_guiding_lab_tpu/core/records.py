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
    """Per-vertex training records, DEPTH-major: shape (max_depth, N, ...).

    Mirrors the reference record fields (common.py:17-40, written at
    globalIndex = ray * max_depth + depth, path_guiding_integrator.py:318);
    depth-major lets each bounce write one contiguous row (a cheap
    dynamic_update_index) instead of N scatters. ``lane`` maps each row
    entry back to its original film sample (-1 = not written) since the
    wavefront is live-compacted.
    """

    lane: jnp.ndarray                # (D, N) int32 original sample row, -1 unused
    position: jnp.ndarray            # (D, N, 3)
    canonical_dir: jnp.ndarray       # (D, N, 2) wo in canonical square
    throughput_radiance: jnp.ndarray # (D, N, 3) L at record time (:334)
    throughput_bsdf: jnp.ndarray     # (D, N, 3) path throughput BEFORE this
                                     # bounce's weight multiply (:332)
    bsdf_weight: jnp.ndarray         # (D, N, 3) bsdf_value / woPdf (:330)
    nee_radiance: jnp.ndarray        # (D, N, 3) Lr_dir / throughput (:337)
    nee_dir: jnp.ndarray             # (D, N, 2) canonical NEE direction
    wo_pdf: jnp.ndarray              # (D, N) one-sample-MIS mixture pdf
    bsdf_pdf: jnp.ndarray            # (D, N)
    is_delta: jnp.ndarray            # (D, N) bool
    # trace-time-captured splat targets (-1 = not captured, e.g. the
    # unguided iterations 0-1 where the bounce skips the tree work): the
    # kd leaf of the vertex, the quad leaf of the recorded direction, and
    # the quad leaf of the NEE direction — free byproducts of the bounce's
    # own tree queries, so the splat needs no point location of its own
    kd_leaf: jnp.ndarray             # (D, N) int32
    q_leaf: jnp.ndarray              # (D, N) int32
    q_leaf_nee: jnp.ndarray          # (D, N) int32
    # Folded splat coefficients (production trace): the per-vertex
    # radiance reconstruction (path_guiding_integrator.py:434-453)
    #   value = luminance((L_final - thrRad) / thrBsdf / bsdfWeight)/woPdf
    # is LINEAR in L_final, so it folds into two record-time terms:
    #   value = dot(L_final, splat_ca) - splat_b,
    #   splat_ca = lum_w / (thrBsdf * bsdfWeight * woPdf)  (per channel)
    #   splat_b  = luminance(thrRad / (thrBsdf*bsdfWeight)) / woPdf
    # and the NEE stream is fully record-time:
    #   splat_nee = luminance(nee_radiance) / woPdf.
    # The splat then reads 5 scalars/vertex instead of 15 — it was
    # HBM-traffic-bound on record reads. Zeroed where any denominator
    # channel is 0 or the pdf is bad (exactly the old guard semantics).
    # None when the trace records the reference-parity raw fields instead
    # (PPG_FULL_RECORDS=1, or records built by hand in tests/tools).
    splat_ca: jnp.ndarray = None     # (D, N, 3)
    splat_b: jnp.ndarray = None      # (D, N)
    splat_nee: jnp.ndarray = None    # (D, N)

    @staticmethod
    def zeros(num_rays: int, max_depth: int, slim: bool = False) -> "PathRecords":
        """``slim``: production layout — folded splat coefficients
        present, raw radiometric fields absent (None). The raw fields are
        only consumed by the splat's reconstruction (now folded) and by
        parity tooling; PPG_FULL_RECORDS=1 restores them."""
        n, d = num_rays, max_depth
        f = lambda *s: jnp.zeros((d, n) + s, jnp.float32)
        neg = lambda: jnp.full((d, n), -1, jnp.int32)
        if slim:
            return PathRecords(
                lane=neg(),
                position=f(3), canonical_dir=f(2),
                throughput_radiance=None, throughput_bsdf=None,
                bsdf_weight=None, nee_radiance=None, nee_dir=f(2),
                wo_pdf=None, bsdf_pdf=None, is_delta=None,
                kd_leaf=neg(), q_leaf=neg(), q_leaf_nee=neg(),
                splat_ca=f(3), splat_b=f(), splat_nee=f(),
            )
        return PathRecords(
            lane=neg(),
            position=f(3), canonical_dir=f(2),
            throughput_radiance=f(3), throughput_bsdf=f(3), bsdf_weight=f(3),
            nee_radiance=f(3), nee_dir=f(2),
            wo_pdf=f(), bsdf_pdf=f(), is_delta=jnp.zeros((d, n), bool),
            kd_leaf=neg(), q_leaf=neg(), q_leaf_nee=neg(),
        )
