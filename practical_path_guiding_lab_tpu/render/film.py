"""Film: per-sample radiance -> image with reconstruction filters, plus the
sumL / sumL2 moment buffers the variance bookkeeping needs
(reference: path_guiding_integrator.py:400-426, layout pixel-major).

Metrics always use the box-filtered per-pixel sample mean (matching the
reference, whose sumL accumulation bypasses the rfilter); the displayed
image uses the scene's rfilter (tent/gaussian/box) via splatting.
"""
from __future__ import annotations

import jax.numpy as jnp

FILTER_BOX = 0
FILTER_TENT = 1
FILTER_GAUSSIAN = 2

FILTER_IDS = {"box": FILTER_BOX, "tent": FILTER_TENT, "gaussian": FILTER_GAUSSIAN}


def splat_filtered(width, height, px, py, value, rfilter: str):
    """Splat samples at continuous film coords (px, py) into an image.

    Returns (weighted_sum (H,W,3), weight (H,W)). Tent radius 1, gaussian
    radius 2 (sigma 0.5, Mitsuba default), box radius 0.5.
    """
    kind = FILTER_IDS.get(rfilter, FILTER_TENT)
    if kind == FILTER_BOX:
        xi = jnp.clip(px.astype(jnp.int32), 0, width - 1)
        yi = jnp.clip(py.astype(jnp.int32), 0, height - 1)
        img = jnp.zeros((height, width, 3)).at[yi, xi].add(value)
        wgt = jnp.zeros((height, width)).at[yi, xi].add(1.0)
        return img, wgt

    radius = 1 if kind == FILTER_TENT else 2
    img = jnp.zeros((height, width, 3))
    wgt = jnp.zeros((height, width))
    x0 = jnp.floor(px - 0.5).astype(jnp.int32)
    y0 = jnp.floor(py - 0.5).astype(jnp.int32)
    for dy in range(-radius + 1, radius + 1):
        for dx in range(-radius + 1, radius + 1):
            xi = x0 + dx
            yi = y0 + dy
            fx = jnp.abs(px - (xi.astype(jnp.float32) + 0.5))
            fy = jnp.abs(py - (yi.astype(jnp.float32) + 0.5))
            if kind == FILTER_TENT:
                w = jnp.maximum(1.0 - fx, 0.0) * jnp.maximum(1.0 - fy, 0.0)
            else:
                sig2 = 2.0 * 0.5 * 0.5
                cutoff = jnp.exp(-(radius * radius) / sig2)
                wx = jnp.maximum(jnp.exp(-(fx * fx) / sig2) - cutoff, 0.0)
                wy = jnp.maximum(jnp.exp(-(fy * fy) / sig2) - cutoff, 0.0)
                w = wx * wy
            inside = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
            w = jnp.where(inside, w, 0.0)
            xi = jnp.clip(xi, 0, width - 1)
            yi = jnp.clip(yi, 0, height - 1)
            img = img.at[yi, xi].add(value * w[:, None])
            wgt = wgt.at[yi, xi].add(w)
    return img, wgt


def develop(img_sum, wgt_sum):
    return img_sum / jnp.maximum(wgt_sum, 1e-12)[..., None]


def _shift2d(a, oy, ox):
    """Shift an (..., H, W, C) image by (oy, ox) with zero fill (content
    that would leave the film is dropped, like the splat bounds check)."""
    h, w = a.shape[-3], a.shape[-2]
    pad = [(0, 0)] * (a.ndim - 3) + [
        (max(oy, 0), max(-oy, 0)),
        (max(ox, 0), max(-ox, 0)),
        (0, 0),
    ]
    a = jnp.pad(a, pad)
    ys = max(-oy, 0)
    xs = max(-ox, 0)
    return a[..., ys:ys + h, xs:xs + w, :]


def splat_filtered_aligned(width, height, px, py, value, rfilter: str):
    """Scatter-free splat for pixel-aligned jittered samples.

    When lanes come from the film prologue (pixel-major, one sample per
    pixel per spp slice, ``px = x + u1`` with ``u1 in [0,1)``), the filter
    weight for stencil offset ``ox`` is ``|u1 - ox - 0.5|`` — independent
    of the pixel — so the whole splat is elementwise products plus a few
    statically-shifted adds (no TPU scatter). Numerically identical to
    :func:`splat_filtered` on such samples.
    """
    kind = FILTER_IDS.get(rfilter, FILTER_TENT)
    n = width * height
    spp = px.shape[0] // n
    u1 = (px - jnp.floor(px)).reshape(spp, height, width)
    u2 = (py - jnp.floor(py)).reshape(spp, height, width)
    val = value.reshape(spp, height, width, 3)
    if kind == FILTER_BOX:
        return (
            val.sum(axis=0),
            jnp.full((height, width), float(spp)),
        )
    radius = 1 if kind == FILTER_TENT else 2
    img = jnp.zeros((height, width, 3))
    wgt = jnp.zeros((height, width))
    for oy in range(-radius, radius + 1):
        for ox in range(-radius, radius + 1):
            fx = jnp.abs(u1 - (ox + 0.5))
            fy = jnp.abs(u2 - (oy + 0.5))
            if kind == FILTER_TENT:
                w = jnp.maximum(1.0 - fx, 0.0) * jnp.maximum(1.0 - fy, 0.0)
            else:
                sig2 = 2.0 * 0.5 * 0.5
                cutoff = jnp.exp(-(radius * radius) / sig2)
                wx = jnp.maximum(jnp.exp(-(fx * fx) / sig2) - cutoff, 0.0)
                wy = jnp.maximum(jnp.exp(-(fy * fy) / sig2) - cutoff, 0.0)
                w = wx * wy
            img = img + _shift2d(val * w[..., None], oy, ox).sum(axis=0)
            wgt = wgt + _shift2d(
                w[..., None], oy, ox
            )[..., 0].sum(axis=0)
    return img, wgt
