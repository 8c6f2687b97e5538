"""Radiance RGBE (.hdr) reader — used for environment maps
(e.g. scenes/teapot/textures/envmap.hdr in the reference corpus)."""
from __future__ import annotations

import numpy as np


def read(path) -> np.ndarray:
    """Read a Radiance .hdr file -> (H, W, 3) float32."""
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(b"#?"):
        raise ValueError("not a Radiance HDR file")
    pos = 0
    # header: lines until empty line
    while True:
        end = data.index(b"\n", pos)
        line = data[pos:end]
        pos = end + 1
        if line == b"":
            break
    end = data.index(b"\n", pos)
    res = data[pos:end].decode().split()
    pos = end + 1
    if res[0] != "-Y" or res[2] != "+X":
        raise NotImplementedError(f"HDR orientation {res} not supported")
    h, w = int(res[1]), int(res[3])

    rgbe = np.zeros((h, w, 4), dtype=np.uint8)
    buf = np.frombuffer(data, dtype=np.uint8)
    for y in range(h):
        if (
            pos + 4 <= len(data)
            and buf[pos] == 2
            and buf[pos + 1] == 2
            and ((int(buf[pos + 2]) << 8) | int(buf[pos + 3])) == w
        ):
            pos += 4
            for c in range(4):
                x = 0
                while x < w:
                    count = int(buf[pos])
                    pos += 1
                    if count > 128:  # run
                        rgbe[y, x : x + count - 128, c] = buf[pos]
                        pos += 1
                        x += count - 128
                    else:  # literal
                        rgbe[y, x : x + count, c] = buf[pos : pos + count]
                        pos += count
                        x += count
        else:  # flat (old) scanline
            row = buf[pos : pos + 4 * w].reshape(w, 4)
            rgbe[y] = row
            pos += 4 * w

    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, np.ldexp(1.0, e - 136), 0.0)  # 2^(e-128) / 256
    return (rgbe[..., :3].astype(np.float32) * scale[..., None]).astype(
        np.float32
    )
