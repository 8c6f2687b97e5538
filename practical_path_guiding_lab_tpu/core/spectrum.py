"""RGB spectrum helpers (luminance, sRGB transfer)."""
from __future__ import annotations

import numpy as np

from .math import luminance  # noqa: F401  (re-export)


def linear_to_srgb(x):
    """Linear RGB -> sRGB (for PNG previews; mirrors mi.Bitmap conversion)."""
    x = np.clip(np.asarray(x), 0.0, 1.0)
    return np.where(x <= 0.0031308, 12.92 * x, 1.055 * np.power(x, 1 / 2.4) - 0.055)


def srgb_to_linear(x):
    x = np.asarray(x, dtype=np.float32)
    return np.where(x <= 0.04045, x / 12.92, np.power((x + 0.055) / 1.055, 2.4))
