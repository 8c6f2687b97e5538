"""Texture evaluation: constant / bitmap / checkerboard.

Compiled scenes hold a static list of texture tables; lookups are masked
per-lane gathers (the texture count per scene is tiny, <= 4 in the corpus),
so evaluation python-loops over textures at trace time — fully unrolled and
fused by XLA.

Hot path (``eval_channel``): 8-bit bitmaps live in ONE combined
(rows, 4)-uint32 table — each row packs a 2x2 sRGB-u8 texel neighborhood
(12 bytes + pad), so a full bilinear tap is ONE narrow u32 row gather.
Measured on TPU (tools/profile_gather_shapes.py): a u32[R,4] row gather
costs the same as a single 1-D gather, while the old per-texture
f32[R,16] row gathers cost ~28 ms EACH per bounce at 1M lanes (the
{0,1}-layout row slice is 16 strided reads + a 59 MB relayout) — they
were ~half of the whole unguided pass on veach-ajar.
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
    # (fallback path for float/HDR bitmaps)
    packed_images: tuple = ()
    # ALL u8 bitmaps in one (rows, 4) uint32 table: row = 2x2 sRGB-u8
    # neighborhood [c00.rgb c01.rgb c10.rgb c11.rgb] packed into 3 words
    # (+1 pad); row 0 is a reserved dummy so offset 0 == "not u8"
    combined_u8: jnp.ndarray = None   # (R_total, 4) uint32
    meta: jnp.ndarray = None          # (K, 3) f32 [w, h, row_offset]
    # static flags so scenes without checkers/float-bitmaps compile none
    # of that code
    has_checker: bool = struct.field(pytree_node=False, default=True)
    float_bitmaps: tuple = struct.field(pytree_node=False, default=())
    # static per-texture row offset into combined_u8 (0 = not a u8 bitmap)
    u8_offsets: tuple = struct.field(pytree_node=False, default=())
    # static per-texture (w, h); u8 bitmaps keep only a dummy in `images`
    sizes: tuple = struct.field(pytree_node=False, default=())


def _pack_u8_rows(img8: np.ndarray) -> np.ndarray:
    """(H,W,3) u8 -> (H*W, 4) u32 rows holding the 2x2 repeat-wrapped
    neighborhood [c00 c01 c10 c11] as 12 sRGB bytes in 3 words (+pad)."""
    h, w = img8.shape[:2]
    c00 = img8.reshape(-1, 3).astype(np.uint32)
    c01 = np.roll(img8, -1, axis=1).reshape(-1, 3).astype(np.uint32)
    c10 = np.roll(img8, -1, axis=0).reshape(-1, 3).astype(np.uint32)
    c11 = np.roll(np.roll(img8, -1, axis=0), -1, axis=1).reshape(-1, 3).astype(np.uint32)
    rows = np.zeros((h * w, 4), np.uint32)
    rows[:, 0] = c00[:, 0] | (c00[:, 1] << 8) | (c00[:, 2] << 16) | (c01[:, 0] << 24)
    rows[:, 1] = c01[:, 1] | (c01[:, 2] << 8) | (c10[:, 0] << 16) | (c10[:, 1] << 24)
    rows[:, 2] = c10[:, 2] | (c11[:, 0] << 8) | (c11[:, 1] << 16) | (c11[:, 2] << 24)
    return rows


def build_textures(tex_descs, scene_path) -> TextureTable:
    from ..io.image import read_texture, read_texture_u8

    images, kinds, values, values2, uv_scale = [], [], [], [], []
    images_u8 = []
    for t in tex_descs:
        if t.kind == "constant":
            kinds.append(0)
            values.append(t.value)
            values2.append((0, 0, 0))
            uv_scale.append((1, 1))
            images.append(jnp.zeros((1, 1, 3), jnp.float32))
            images_u8.append(None)
        elif t.kind == "bitmap":
            kinds.append(1)
            values.append((1, 1, 1))
            values2.append((0, 0, 0))
            uv_scale.append((1, 1))
            img8 = read_texture_u8(scene_path / t.filename)
            images_u8.append(img8)
            if img8 is None:
                img = read_texture(scene_path / t.filename)
                images.append(jnp.asarray(img, jnp.float32))
            else:
                # u8 source: only the packed-u32 table goes to the device
                images.append(jnp.zeros((1, 1, 3), jnp.float32))
        elif t.kind == "checkerboard":
            kinds.append(2)
            values.append(t.color0)
            values2.append(t.color1)
            m = t.to_uv if t.to_uv is not None else np.eye(4)
            uv_scale.append((m[0, 0], m[1, 1]))
            images.append(jnp.zeros((1, 1, 3), jnp.float32))
            images_u8.append(None)
        else:
            raise NotImplementedError(t.kind)
    # float/HDR bitmaps keep the f32 packed-row fallback; u8 bitmaps go
    # into the combined u32 table
    packed = []
    float_bitmaps = []
    for k, img in enumerate(images):
        img_np = np.asarray(img)
        if img_np.size <= 3 or images_u8[k] is not None:
            packed.append(jnp.zeros((1, 16), jnp.float32))
            continue
        float_bitmaps.append(k)
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
    combined = [np.zeros((1, 4), np.uint32)]  # row 0 = dummy (offset 0)
    meta = np.zeros((max(len(tex_descs), 1), 3), np.float32)
    u8_offsets = [0] * len(tex_descs)
    offset = 1
    for k, img8 in enumerate(images_u8):
        if img8 is None:
            continue
        h, w = img8.shape[:2]
        meta[k] = (w, h, offset)
        u8_offsets[k] = offset
        combined.append(_pack_u8_rows(img8))
        offset += h * w
    assert offset < (1 << 24), "u8 texture table too large for f32 meta"
    sizes = []
    for k in range(len(tex_descs)):
        if images_u8[k] is not None:
            sizes.append((images_u8[k].shape[1], images_u8[k].shape[0]))
        else:
            img_np = np.asarray(images[k])
            sizes.append((img_np.shape[1], img_np.shape[0]))
    return TextureTable(
        images=tuple(images),
        kinds=jnp.asarray(kinds, jnp.int32),
        values=jnp.asarray(np.asarray(values, np.float32)),
        values2=jnp.asarray(np.asarray(values2, np.float32)),
        uv_scale=jnp.asarray(np.asarray(uv_scale, np.float32)),
        packed_images=tuple(packed),
        combined_u8=jnp.asarray(np.concatenate(combined, axis=0)),
        meta=jnp.asarray(meta),
        has_checker=bool(any(k == 2 for k in kinds)),
        float_bitmaps=tuple(float_bitmaps),
        u8_offsets=tuple(u8_offsets),
        sizes=tuple(sizes),
    )


def _is_bitmap(table: TextureTable, k: int) -> bool:
    if k < len(table.u8_offsets) and table.u8_offsets[k] > 0:
        return True
    return table.images[k].size > 3


def bilinear_tap(table: TextureTable, k: int, uv):
    """Bilinear sample of STATIC texture ``k`` (bitmap) at ``uv`` — one
    packed row gather (u8 combined table for 8-bit sources, f32 packed
    rows for float sources); repeat wrap, v flipped."""
    if table.sizes:
        w, h = table.sizes[k]
    else:
        img = table.images[k]
        h, w = img.shape[0], img.shape[1]
    u = uv[..., 0] * w - 0.5
    v = (1.0 - uv[..., 1]) * h - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    u0i = jnp.mod(u0.astype(jnp.int32), w)
    v0i = jnp.mod(v0.astype(jnp.int32), h)
    off = table.u8_offsets[k] if k < len(table.u8_offsets) else 0
    if off > 0:
        rows = table.combined_u8[off + v0i * w + u0i]  # (..., 4) u32
        c00 = _unpack_u8_texel(rows, 0)
        c01 = _unpack_u8_texel(rows, 24)
        c10 = _unpack_u8_texel(rows, 48)
        c11 = _unpack_u8_texel(rows, 72)
    else:
        row = table.packed_images[k][v0i * w + u0i]  # (..., 16)
        c00, c01, c10, c11 = (
            row[..., 0:3], row[..., 3:6], row[..., 6:9], row[..., 9:12]
        )
    return (
        c00 * (1 - fu) * (1 - fv)
        + c01 * fu * (1 - fv)
        + c10 * (1 - fu) * fv
        + c11 * fu * fv
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
        if _is_bitmap(table, k):
            out.append(bilinear_tap(table, k, uv))
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


# degree-5 fit of t^0.4 (t = (x+0.055)/1.055) minimaxed at the 256
# discrete u8 byte values — the only inputs the u8 texel path produces.
# Max abs error of the full x^2.4 curve at those points: 5.3e-5, 40x
# below half a u8 quantization step (1/510), so it is exact for 8-bit
# sources while replacing the pow (exp+log transcendentals, 12 calls
# per lane in the 2x2 unpack) with 5 FMAs.
_SRGB_P = (0.6205311682, -2.3336295297, 3.5921562755,
           -3.0213375816, 1.9032723779, 0.2390586593)


def _srgb_to_linear_jnp(x, exact: bool = False):
    """sRGB->linear, elementwise (matches core.spectrum.srgb_to_linear).

    ``exact=False`` (the u8 texel path) uses the polynomial EOTF above;
    ``exact=True`` keeps the pow form for float/HDR inputs that are not
    quantized to byte values."""
    if exact:
        return jnp.where(
            x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4
        )
    t = (x + jnp.float32(0.055)) * jnp.float32(1.0 / 1.055)
    p = jnp.float32(_SRGB_P[0])
    for c in _SRGB_P[1:]:
        p = p * t + jnp.float32(c)
    return jnp.where(x <= 0.04045, x * jnp.float32(1.0 / 12.92), t * t * p)


def _unpack_u8_texel(words, lo: int):
    """3 consecutive sRGB bytes starting at bit offset ``lo`` within the
    (..., 4)-u32 row -> linear-f32 (..., 3)."""
    w0 = words[..., lo // 32]
    w1 = words[..., (lo + 16) // 32]
    b0 = (w0 >> np.uint32(lo % 32)) & np.uint32(0xFF)
    b1 = (w0 >> np.uint32((lo + 8) % 32)) & np.uint32(0xFF) if (lo + 8) // 32 == lo // 32 \
        else (w1 >> np.uint32((lo + 8) % 32)) & np.uint32(0xFF)
    b2 = (w1 >> np.uint32((lo + 16) % 32)) & np.uint32(0xFF)
    srgb = jnp.stack([b0, b1, b2], axis=-1).astype(jnp.float32) * np.float32(1.0 / 255.0)
    return _srgb_to_linear_jnp(srgb)


def eval_channel(table: TextureTable, tex_id, uv, need_bitmap: bool = True,
                 lane_ok=None):
    """Per-lane texture value for one material channel in ONE u32 row
    gather (plus cheap one-hot selects for constants/checkers).

    ``need_bitmap`` is a STATIC flag (whether any material routes this
    channel to a bitmap) so constant-only channels compile zero gathers.
    ``lane_ok`` (optional bool mask): lanes that don't need a texture
    (ray misses, dead-but-uncompacted lanes with STALE uv) read the dummy
    row 0 instead of issuing a random HBM access — the gather is
    latency-bound, so pruning reads is a direct win.
    Float/HDR bitmaps fall back to the per-texture f32 packed rows.
    """
    from ..core.math import small_table_gather

    vals = small_table_gather(table.values, tex_id)  # (N,3) constants
    if table.has_checker:
        sc = small_table_gather(table.uv_scale, tex_id)  # (N,2)
        kind = small_table_gather(
            table.kinds[:, None].astype(jnp.float32), tex_id
        )[..., 0]
        su = uv[..., 0] * sc[..., 0]
        sv = uv[..., 1] * sc[..., 1]
        checker = (
            jnp.floor(jnp.mod(su, 1.0) * 2).astype(jnp.int32)
            ^ jnp.floor(jnp.mod(sv, 1.0) * 2).astype(jnp.int32)
        ) & 1
        v2 = small_table_gather(table.values2, tex_id)
        vals = jnp.where(
            ((kind == 2) & (checker == 1))[..., None], v2, vals
        )
    if need_bitmap and table.combined_u8 is not None \
            and table.combined_u8.shape[0] > 1:
        meta = small_table_gather(table.meta, tex_id)  # (N,3) [w,h,offset]
        w = meta[..., 0]
        h = meta[..., 1]
        off = meta[..., 2].astype(jnp.int32)
        is_u8 = off > 0
        if lane_ok is not None:
            is_u8 = is_u8 & lane_ok
        u = uv[..., 0] * w - 0.5
        v = (1.0 - uv[..., 1]) * h - 0.5
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        fu = (u - u0)[..., None]
        fv = (v - v0)[..., None]
        wi = jnp.maximum(w.astype(jnp.int32), 1)
        hi = jnp.maximum(h.astype(jnp.int32), 1)
        u0i = jnp.mod(u0.astype(jnp.int32), wi)
        v0i = jnp.mod(v0.astype(jnp.int32), hi)
        idx = jnp.where(is_u8, off + v0i * wi + u0i, 0)
        rows = table.combined_u8[idx]  # (N,4) u32 — THE one gather
        c00 = _unpack_u8_texel(rows, 0)
        c01 = _unpack_u8_texel(rows, 24)
        c10 = _unpack_u8_texel(rows, 48)
        c11 = _unpack_u8_texel(rows, 72)
        bmap = (
            c00 * (1 - fu) * (1 - fv)
            + c01 * fu * (1 - fv)
            + c10 * (1 - fu) * fv
            + c11 * fu * fv
        )
        vals = jnp.where(is_u8[..., None], bmap, vals)
    if need_bitmap and table.float_bitmaps:
        # rare float/HDR bitmaps: per-texture f32 packed-row fallback
        for k in table.float_bitmaps:
            img = table.images[k]
            hk, wk = img.shape[0], img.shape[1]
            u = uv[..., 0] * wk - 0.5
            v = (1.0 - uv[..., 1]) * hk - 0.5
            u0 = jnp.floor(u)
            v0 = jnp.floor(v)
            fu = (u - u0)[..., None]
            fv = (v - v0)[..., None]
            u0i = jnp.mod(u0.astype(jnp.int32), wk)
            v0i = jnp.mod(v0.astype(jnp.int32), hk)
            row = table.packed_images[k][v0i * wk + u0i]
            bmap = (
                row[..., 0:3] * (1 - fu) * (1 - fv)
                + row[..., 3:6] * fu * (1 - fv)
                + row[..., 6:9] * (1 - fu) * fv
                + row[..., 9:12] * fu * fv
            )
            vals = jnp.where((tex_id == k)[..., None], bmap, vals)
    return vals


def eval_texture(table: TextureTable, tex_id, uv):
    """Evaluate texture ``tex_id`` (per-lane int32) at ``uv`` (..., 2)."""
    out = jnp.zeros(uv.shape[:-1] + (3,), jnp.float32)
    n = len(table.images)
    for k in range(n):
        sel = tex_id == k
        kind = table.kinds[k]
        const_val = jnp.broadcast_to(table.values[k], out.shape)
        if _is_bitmap(table, k):
            bmap = bilinear_tap(table, k, uv)
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
