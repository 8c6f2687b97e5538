"""Mitsuba ``.serialized`` mesh loader (torus scene: meshes.serialized).

Format (reverse-engineered from the bundled file, little endian):
  per mesh: u16 magic 0x041C, u16 version (3 or 4), zlib stream of
    u32 flags, [name\\0 if version >= 4], u64 vertex_count, u64 tri_count,
    positions f32/f64 (flag 0x2000 double in v4), [normals if flag 0x1],
    [uvs if flag 0x2], [colors if flag 0x8], triangle indices u32.
  footer: per-mesh offsets (u32 for v3 files, u64 for v4) then u32 count.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = 0x041C

FLAG_NORMALS = 0x0001
FLAG_UVS = 0x0002
FLAG_COLORS = 0x0008
FLAG_FACE_NORMALS = 0x0010
FLAG_SINGLE = 0x1000
FLAG_DOUBLE = 0x2000


def read(path, shape_index: int):
    """Load mesh ``shape_index`` -> dict(positions, normals, uvs, triangles)."""
    data = open(path, "rb").read()
    count = struct.unpack("<I", data[-4:])[0]
    # Try u64 offset table (v4), fall back to u32 (v3): valid offsets are
    # strictly increasing, start at 0, stay within the file.
    for fmt, width in (("Q", 8), ("I", 4)):
        table = data[-4 - width * count : -4]
        offs = struct.unpack(f"<{count}{fmt}", table)
        if (
            offs[0] == 0
            and all(a < b for a, b in zip(offs, offs[1:]))
            and offs[-1] < len(data)
            and struct.unpack("<H", data[offs[1] if count > 1 else 0 : (offs[1] if count > 1 else 0) + 2])[0] == MAGIC
        ):
            break
    else:
        raise ValueError("cannot locate serialized offset table")

    if not 0 <= shape_index < count:
        raise IndexError(f"shape_index {shape_index} out of range ({count})")
    off = offs[shape_index]
    magic, version = struct.unpack("<HH", data[off : off + 4])
    if magic != MAGIC:
        raise ValueError("bad mesh magic")
    end = offs[shape_index + 1] if shape_index + 1 < count else len(data) - 4 - width * count
    dec = zlib.decompress(data[off + 4 : end])

    pos = 0
    (flags,) = struct.unpack_from("<I", dec, pos)
    pos += 4
    if version >= 4:
        nul = dec.index(b"\0", pos)
        pos = nul + 1
    vc, tc = struct.unpack_from("<QQ", dec, pos)
    pos += 16
    dt = np.float64 if flags & FLAG_DOUBLE else np.float32

    def take(n, d, s):
        nonlocal pos
        a = np.frombuffer(dec, dtype=d, count=n, offset=pos).reshape(-1, s)
        pos += n * np.dtype(d).itemsize
        return a

    positions = take(vc * 3, dt, 3).astype(np.float32)
    normals = take(vc * 3, dt, 3).astype(np.float32) if flags & FLAG_NORMALS else None
    uvs = take(vc * 2, dt, 2).astype(np.float32) if flags & FLAG_UVS else None
    if flags & FLAG_COLORS:
        take(vc * 3, dt, 3)
    triangles = take(tc * 3, np.uint32, 3).astype(np.int32)
    return {
        "positions": positions,
        "normals": normals,
        "uvs": uvs,
        "triangles": triangles,
    }
