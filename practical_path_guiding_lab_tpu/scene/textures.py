"""Texture evaluation: constant / bitmap / checkerboard.

Compiled scenes hold a static list of texture tables; lookups are masked
per-lane gathers (the texture count per scene is tiny, <= 4 in the corpus),
so evaluation python-loops over textures at trace time — fully unrolled and
fused by XLA.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TextureTable:
    """All textures of one scene. ``images`` is a tuple of (H,W,3) device
    arrays (static length); per-texture metadata is stacked."""

    images: tuple  # tuple of jnp arrays, static structure
    kinds: jnp.ndarray       # (K,) 0=constant 1=bitmap 2=checkerboard
    values: jnp.ndarray      # (K,3) constant value / checkerboard color0
    values2: jnp.ndarray     # (K,3) checkerboard color1
    uv_scale: jnp.ndarray    # (K,2)
    # bitmap 2x2-neighborhood packs: (H*W, 16) rows [c00|c01|c10|c11|pad]
    # with repeat wrap baked in — bilinear filtering in ONE row gather
    # (XLA TPU gathers cost ~7 ms per instruction at 1M lanes)
    packed_images: tuple = ()


def build_textures(tex_descs, scene_path) -> TextureTable:
    from ..io.image import read_texture

    images, kinds, values, values2, uv_scale = [], [], [], [], []
    for t in tex_descs:
        if t.kind == "constant":
            kinds.append(0)
            values.append(t.value)
            values2.append((0, 0, 0))
            uv_scale.append((1, 1))
            images.append(jnp.zeros((1, 1, 3), jnp.float32))
        elif t.kind == "bitmap":
            kinds.append(1)
            values.append((1, 1, 1))
            values2.append((0, 0, 0))
            uv_scale.append((1, 1))
            img = read_texture(scene_path / t.filename)
            images.append(jnp.asarray(img, jnp.float32))
        elif t.kind == "checkerboard":
            kinds.append(2)
            values.append(t.color0)
            values2.append(t.color1)
            m = t.to_uv if t.to_uv is not None else np.eye(4)
            uv_scale.append((m[0, 0], m[1, 1]))
            images.append(jnp.zeros((1, 1, 3), jnp.float32))
        else:
            raise NotImplementedError(t.kind)
    packed = []
    for img in images:
        img_np = np.asarray(img)
        if img_np.size <= 3:
            packed.append(jnp.zeros((1, 16), jnp.float32))
            continue
        h, w = img_np.shape[:2]
        right = np.roll(img_np, -1, axis=1)
        down = np.roll(img_np, -1, axis=0)
        downright = np.roll(down, -1, axis=1)
        pk = np.zeros((h * w, 16), np.float32)
        pk[:, 0:3] = img_np.reshape(-1, 3)
        pk[:, 3:6] = right.reshape(-1, 3)
        pk[:, 6:9] = down.reshape(-1, 3)
        pk[:, 9:12] = downright.reshape(-1, 3)
        packed.append(jnp.asarray(pk))
    return TextureTable(
        images=tuple(images),
        kinds=jnp.asarray(kinds, jnp.int32),
        values=jnp.asarray(np.asarray(values, np.float32)),
        values2=jnp.asarray(np.asarray(values2, np.float32)),
        uv_scale=jnp.asarray(np.asarray(uv_scale, np.float32)),
        packed_images=tuple(packed),
    )


def eval_all_textures(table: TextureTable, uv):
    """Evaluate EVERY texture at ``uv`` once -> list of (..., 3) values.

    One packed row gather per bitmap (vs 4 texel gathers x one call per
    material channel); callers then select per-lane values by texture id
    with cheap elementwise masks. Constants/checkerboards cost no gathers.
    """
    n = len(table.images)
    out = []
    for k in range(n):
        kind = table.kinds[k]
        const_val = jnp.broadcast_to(
            table.values[k], uv.shape[:-1] + (3,)
        )
        img = table.images[k]
        h, w = img.shape[0], img.shape[1]
        if img.size > 3:  # bitmap: bilinear, repeat wrap, v flipped
            u = uv[..., 0] * w - 0.5
            v = (1.0 - uv[..., 1]) * h - 0.5
            u0 = jnp.floor(u)
            v0 = jnp.floor(v)
            fu = (u - u0)[..., None]
            fv = (v - v0)[..., None]
            u0i = jnp.mod(u0.astype(jnp.int32), w)
            v0i = jnp.mod(v0.astype(jnp.int32), h)
            row = table.packed_images[k][v0i * w + u0i]  # (..., 16)
            bmap = (
                row[..., 0:3] * (1 - fu) * (1 - fv)
                + row[..., 3:6] * fu * (1 - fv)
                + row[..., 6:9] * (1 - fu) * fv
                + row[..., 9:12] * fu * fv
            )
            out.append(bmap)
            continue
        su = uv[..., 0] * table.uv_scale[k, 0]
        sv = uv[..., 1] * table.uv_scale[k, 1]
        checker = (
            jnp.floor(jnp.mod(su, 1.0) * 2).astype(jnp.int32)
            ^ jnp.floor(jnp.mod(sv, 1.0) * 2).astype(jnp.int32)
        ) & 1
        cval = jnp.where(
            (checker == 1)[..., None],
            jnp.broadcast_to(table.values2[k], const_val.shape),
            const_val,
        )
        out.append(jnp.where(kind == 2, cval, const_val))
    return out


def select_texture(tex_vals, tex_id):
    """Per-lane select from eval_all_textures output by texture id."""
    out = jnp.zeros_like(tex_vals[0])
    for k, v in enumerate(tex_vals):
        out = jnp.where((tex_id == k)[..., None], v, out)
    return out


def eval_texture(table: TextureTable, tex_id, uv):
    """Evaluate texture ``tex_id`` (per-lane int32) at ``uv`` (..., 2)."""
    out = jnp.zeros(uv.shape[:-1] + (3,), jnp.float32)
    n = len(table.images)
    for k in range(n):
        sel = tex_id == k
        kind = table.kinds[k]
        const_val = jnp.broadcast_to(table.values[k], out.shape)
        img = table.images[k]
        h, w = img.shape[0], img.shape[1]
        if img.size > 3:  # bitmap: bilinear, repeat wrap, v flipped
            u = uv[..., 0] * w - 0.5
            v = (1.0 - uv[..., 1]) * h - 0.5
            u0 = jnp.floor(u)
            v0 = jnp.floor(v)
            fu = (u - u0)[..., None]
            fv = (v - v0)[..., None]
            u0i = jnp.mod(u0.astype(jnp.int32), w)
            v0i = jnp.mod(v0.astype(jnp.int32), h)
            u1i = jnp.mod(u0i + 1, w)
            v1i = jnp.mod(v0i + 1, h)
            c00 = img[v0i, u0i]
            c01 = img[v0i, u1i]
            c10 = img[v1i, u0i]
            c11 = img[v1i, u1i]
            bmap = (
                c00 * (1 - fu) * (1 - fv)
                + c01 * fu * (1 - fv)
                + c10 * (1 - fu) * fv
                + c11 * fu * fv
            )
        else:
            bmap = const_val
        su = uv[..., 0] * table.uv_scale[k, 0]
        sv = uv[..., 1] * table.uv_scale[k, 1]
        checker = (
            jnp.floor(jnp.mod(su, 1.0) * 2).astype(jnp.int32)
            ^ jnp.floor(jnp.mod(sv, 1.0) * 2).astype(jnp.int32)
        ) & 1
        cval = jnp.where(
            (checker == 1)[..., None],
            jnp.broadcast_to(table.values2[k], out.shape),
            const_val,
        )
        val = jnp.where(kind == 0, const_val, jnp.where(kind == 1, bmap, cval))
        out = jnp.where(sel[..., None], val, out)
    return out
