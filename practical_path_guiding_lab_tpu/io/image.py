"""PNG/JPG IO and tonemapping (mi.Bitmap / mi.util.write_bitmap parity)."""
from __future__ import annotations

import numpy as np
from PIL import Image

from ..core.spectrum import linear_to_srgb, srgb_to_linear


def write_png(path, img: np.ndarray):
    """Write linear HDR (H, W, 3) as tonemapped sRGB PNG
    (reference: mi.util.write_bitmap, main.py:398-401)."""
    srgb = (linear_to_srgb(np.asarray(img)) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(srgb, mode="RGB").save(path)


def read_png_linear(path) -> np.ndarray:
    """Read an 8-bit image and convert sRGB -> linear (texture loading)."""
    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    return srgb_to_linear(img).astype(np.float32)


def read_texture_u8(path):
    """Raw 8-bit sRGB texels of a PNG/JPG texture, or None for float
    formats (EXR/HDR). ``srgb_to_linear(u8/255)`` reproduces
    ``read_texture`` exactly — used to build the packed-u32 texture table
    (4 bytes/texel instead of 12) for the hot bilinear gather."""
    p = str(path).lower()
    if p.endswith(".exr") or p.endswith(".hdr"):
        return None
    return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)


def read_texture(path) -> np.ndarray:
    """Load a bitmap texture as linear float32 RGB (PNG/JPG via PIL,
    HDR/EXR via the native codecs)."""
    p = str(path).lower()
    if p.endswith(".exr"):
        from . import exr

        return exr.read(path)
    if p.endswith(".hdr"):
        from . import hdr

        return hdr.read(path)
    return read_png_linear(path)
