"""Small vector-math helpers shared by the whole framework.

Everything operates on SoA arrays with a trailing component axis of size 3
(positions/directions are ``(..., 3)`` float32). All functions are jittable
and shape-polymorphic over leading axes.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6
INF = jnp.inf
PI = 3.14159265358979323846
INV_PI = 1.0 / PI
TWO_PI = 2.0 * PI
INV_TWO_PI = 1.0 / TWO_PI
INV_FOUR_PI = 1.0 / (4.0 * PI)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def norm(a):
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a):
    n = norm(a)
    return a / jnp.maximum(n, 1e-20)[..., None]


def cross(a, b):
    return jnp.cross(a, b)


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def sqr(x):
    return x * x


def nan_to_zero(x):
    """Replace NaN/Inf with 0 (the reference sanitizes pervasively,
    e.g. mis_weight path_guiding_integrator.py:23)."""
    return jnp.where(jnp.isfinite(x), x, 0.0)


def lerp(a, b, t):
    return a + (b - a) * t


def build_frame(n):
    """Orthonormal frame (t, b, n) from normals ``n`` (..., 3).

    Branchless Duff et al. construction; matches the usual shading-frame
    conventions (local z = n).
    """
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


def to_local(v, n):
    """World direction -> local shading frame with z = n."""
    t, b = build_frame(n)
    return jnp.stack([dot(v, t), dot(v, b), dot(v, n)], axis=-1)


def to_world(v, n):
    """Local shading-frame direction -> world."""
    t, b = build_frame(n)
    return (
        v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n
    )


def reflect_local(wi):
    """Mirror reflection in the local frame (z-up)."""
    return jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)


def spherical_direction(cos_theta, phi):
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def square_to_cosine_hemisphere(u1, u2):
    """Cosine-weighted hemisphere sample in local frame; pdf = cos/pi."""
    r = jnp.sqrt(jnp.clip(u1, 0.0, 1.0))
    phi = TWO_PI * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = safe_sqrt(1.0 - u1)
    return jnp.stack([x, y, z], axis=-1)


def square_to_uniform_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    phi = TWO_PI * u2
    r = safe_sqrt(1.0 - z * z)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def mis_power_heuristic(pdf_a, pdf_b):
    """Power heuristic (beta=2) with NaN guard -> 0.

    Reference: path_guiding_integrator.py:16-24 (mis_weight).
    """
    a2 = pdf_a * pdf_a
    w = a2 / (a2 + pdf_b * pdf_b)
    return nan_to_zero(w)


def luminance(rgb):
    """Rec.709 luminance (reference uses mi.luminance,
    path_guiding_integrator.py:452)."""
    return (
        rgb[..., 0] * 0.212671 + rgb[..., 1] * 0.715160 + rgb[..., 2] * 0.072169
    )


def transform_point(m, p):
    """Apply 4x4 matrix to points (..., 3)."""
    return jnp.einsum("ij,...j->...i", m[:3, :3], p) + m[:3, 3]


def transform_vector(m, v):
    return jnp.einsum("ij,...j->...i", m[:3, :3], v)


def small_table_gather(table, idx, max_onehot_rows: int = 128):
    """Row gather via one-hot matmul on the MXU.

    XLA's native gather lowers to a serial per-lane loop on TPU (~7 ms
    per instruction at ~1M lanes, docs/PERF_NOTES.md); for small tables a
    lane-wise compare + (N, M) @ (M, W) matmul is ~10x cheaper and rides
    the MXU. Exact: the one-hot matmul is a masked sum of rows, and every
    f32 table value times 1.0 is itself. Falls back to the native gather
    for tables taller than ``max_onehot_rows``.
    """
    import jax.numpy as jnp

    m = table.shape[0]
    if m > max_onehot_rows:
        return table[idx]
    flat = table.reshape(m, -1).astype(jnp.float32)
    oh = (idx[..., None] == jnp.arange(m, dtype=jnp.int32)).astype(jnp.float32)
    # HIGHEST: the default matmul precision drops low mantissa bits
    # (measured: a one-hot gather of the f32 value 2457601.0 returned
    # 2457600.0), which corrupts integer payloads like table offsets
    import jax

    out = jnp.matmul(oh, flat, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(idx.shape + table.shape[1:]).astype(table.dtype)
