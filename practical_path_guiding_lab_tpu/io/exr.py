"""Minimal OpenEXR scanline reader/writer (no external EXR library needed).

Read: single-part scanline images, compression NONE / ZIPS / ZIP / PIZ,
pixel types HALF and FLOAT. Write: ZIP-compressed FLOAT or HALF RGB.

The bundled ground truths (``TungstenRender.exr``) are PIZ HALF; decoding a
full 1024x1024 image with the pure-Python Huffman path takes tens of
seconds, so ``read`` transparently caches decoded pixels as ``.exr.npy``
next to the file when the directory is writable (falls back to a cache dir).
Reference usage: main.py:38-41 loads the GT via mi.Bitmap; main.py:400-401
writes per-iteration EXRs.
"""
from __future__ import annotations

import os
import struct
import zlib
from pathlib import Path

import numpy as np

from . import native as _native
from . import piz as _piz
from .. import knobs

MAGIC = 20000630

_PT_UINT, _PT_HALF, _PT_FLOAT = 0, 1, 2
_COMP_NONE, _COMP_RLE, _COMP_ZIPS, _COMP_ZIP, _COMP_PIZ = 0, 1, 2, 3, 4
_LINES_PER_BLOCK = {_COMP_NONE: 1, _COMP_ZIPS: 1, _COMP_ZIP: 16, _COMP_PIZ: 32}

_CACHE_DIR = Path(knobs.get("PPG_TPU_CACHE"))


def _parse_header(data: bytes):
    if struct.unpack("<I", data[:4])[0] != MAGIC:
        raise ValueError("not an EXR file")
    version = struct.unpack("<I", data[4:8])[0]
    if version & 0x200:
        raise NotImplementedError("multi-part EXR not supported")
    if version & 0x800:
        raise NotImplementedError("deep EXR not supported")
    attrs = {}
    off = 8
    while True:
        end = data.index(b"\0", off)
        name = data[off:end].decode()
        off = end + 1
        if name == "":
            break
        end = data.index(b"\0", off)
        typ = data[off:end].decode()
        off = end + 1
        size = struct.unpack("<i", data[off : off + 4])[0]
        off += 4
        attrs[name] = (typ, data[off : off + size])
        off += size
    return attrs, off


def _parse_chlist(raw: bytes):
    chans = []
    off = 0
    while raw[off] != 0:
        end = raw.index(b"\0", off)
        name = raw[off:end].decode()
        off = end + 1
        ptype = struct.unpack("<i", raw[off : off + 4])[0]
        xs, ys = struct.unpack("<ii", raw[off + 8 : off + 16])
        off += 16
        chans.append((name, ptype, xs, ys))
    return chans


def _undo_zip_predictor(raw: bytes) -> np.ndarray:
    d = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
    d[1:] -= 128
    d = np.cumsum(d) & 0xFF
    d = d.astype(np.uint8)
    # de-interleave: first half -> even positions, second half -> odd
    n = len(d)
    out = np.empty(n, dtype=np.uint8)
    half = (n + 1) // 2
    out[0::2] = d[:half]
    out[1::2] = d[half:]
    return out


def _apply_zip_predictor(raw: np.ndarray) -> bytes:
    n = len(raw)
    half = (n + 1) // 2
    inter = np.empty(n, dtype=np.uint8)
    inter[:half] = raw[0::2]
    inter[half:] = raw[1::2]
    d = inter.astype(np.int16)
    d[1:] = d[1:] - d[:-1] + 128
    return (d & 0xFF).astype(np.uint8).tobytes()


def read(path, channels=("R", "G", "B"), use_cache: bool = True) -> np.ndarray:
    """Read an EXR -> (H, W, len(channels)) float32 array."""
    path = Path(path)
    cache = None
    if use_cache:
        for base in (path.parent, _CACHE_DIR):
            c = base / (path.name + f".{'-'.join(channels)}.npy")
            if c.exists() and c.stat().st_mtime >= path.stat().st_mtime:
                return np.load(c)
            if cache is None and os.access(base if base.exists() else base.parent, os.W_OK):
                cache = c
    data = path.read_bytes()
    attrs, off = _parse_header(data)
    chans = _parse_chlist(attrs["channels"][1])
    comp = attrs["compression"][1][0]
    x0, y0, x1, y1 = struct.unpack("<4i", attrs["dataWindow"][1])
    width, height = x1 - x0 + 1, y1 - y0 + 1
    if comp not in _LINES_PER_BLOCK:
        raise NotImplementedError(f"EXR compression {comp} not supported")
    lpb = _LINES_PER_BLOCK[comp]
    n_blocks = (height + lpb - 1) // lpb
    offsets = struct.unpack(f"<{n_blocks}Q", data[off : off + 8 * n_blocks])

    names = [c[0] for c in chans]
    ptypes = {c[0]: c[1] for c in chans}
    out = {n: np.zeros((height, width), np.float32) for n in names}

    for bi, boff in enumerate(offsets):
        y, size = struct.unpack("<iI", data[boff : boff + 8])
        raw = data[boff + 8 : boff + 8 + size]
        row0 = y - y0
        n_lines = min(lpb, height - row0)
        bytes_per_line = sum(
            width * (2 if ptypes[n] == _PT_HALF else 4) for n in names
        )
        expected = bytes_per_line * n_lines
        if comp == _COMP_PIZ:
            if size >= expected:
                dec = np.frombuffer(raw[:expected], np.uint8)
                _scatter_uncompressed(dec, out, names, ptypes, row0, n_lines, width)
                continue
            if any(ptypes[n] != _PT_HALF for n in names):
                raise NotImplementedError("PIZ with non-HALF channels")
            planes = _native.piz_decompress(raw, width, n_lines, len(names))
            if planes is None:  # pure-Python fallback
                planes = _piz.piz_decompress(raw, width, n_lines, len(names))
            for ci, n in enumerate(names):
                out[n][row0 : row0 + n_lines] = (
                    planes[ci].view(np.float16).astype(np.float32)
                )
            continue
        if comp in (_COMP_ZIP, _COMP_ZIPS) and size < expected:
            dec = _undo_zip_predictor(zlib.decompress(raw))
        else:
            dec = np.frombuffer(raw[:expected], np.uint8)
        _scatter_uncompressed(dec, out, names, ptypes, row0, n_lines, width)

    img = np.stack([out[c] for c in channels], axis=-1)
    if cache is not None:
        cache.parent.mkdir(parents=True, exist_ok=True)
        np.save(cache, img)
    return img


def _scatter_uncompressed(dec, out, names, ptypes, row0, n_lines, width):
    """Scanline layout: per line, per channel (alphabetical), nx*psize bytes."""
    pos = 0
    for li in range(n_lines):
        for n in names:
            if ptypes[n] == _PT_HALF:
                nb = width * 2
                vals = dec[pos : pos + nb].view(np.float16).astype(np.float32)
            else:
                nb = width * 4
                vals = dec[pos : pos + nb].view(np.float32).copy()
            out[n][row0 + li] = vals
            pos += nb


def write(path, img: np.ndarray, half: bool = True, compression: str = "zip"):
    """Write (H, W, 3) float array as an RGB EXR.

    compression: "zip" (16-line deflate blocks), "piz" (32-line
    wavelet+Huffman blocks, HALF only — full mi.Bitmap IO parity,
    main.py:400-401), or "none".
    """
    img = np.asarray(img, dtype=np.float32)
    h, w = img.shape[:2]
    names = ["B", "G", "R"]  # alphabetical channel order
    src = {"R": img[..., 0], "G": img[..., 1], "B": img[..., 2]}
    comp_id = {"zip": _COMP_ZIP, "piz": _COMP_PIZ, "none": _COMP_NONE}[
        compression
    ]
    if compression == "piz" and not half:
        raise NotImplementedError("PIZ write supports HALF only")
    ptype = _PT_HALF if half else _PT_FLOAT
    psize = 2 if half else 4

    hdr = bytearray()
    hdr += struct.pack("<I", MAGIC) + struct.pack("<I", 2)

    def attr(name, typ, val):
        hdr.extend(name.encode() + b"\0" + typ.encode() + b"\0")
        hdr.extend(struct.pack("<i", len(val)) + val)

    chl = bytearray()
    for n in names:
        chl += n.encode() + b"\0" + struct.pack("<iiii", ptype, 0, 1, 1)
    chl += b"\0"
    attr("channels", "chlist", bytes(chl))
    attr("compression", "compression", bytes([comp_id]))
    attr("dataWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    attr("displayWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    attr("lineOrder", "lineOrder", b"\0")
    attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    attr("screenWindowCenter", "v2f", struct.pack("<2f", 0.0, 0.0))
    attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    hdr += b"\0"

    lpb = _LINES_PER_BLOCK[comp_id]
    n_blocks = (h + lpb - 1) // lpb
    chunks = []
    for bi in range(n_blocks):
        row0 = bi * lpb
        n_lines = min(lpb, h - row0)
        if compression == "piz":
            planes = np.stack(
                [
                    src[n][row0 : row0 + n_lines]
                    .astype(np.float16)
                    .view(np.uint16)
                    for n in names
                ]
            )
            comp = _piz.piz_compress(planes)
            raw_len = planes.size * 2
            if len(comp) >= raw_len:
                comp = planes.reshape(
                    len(names), n_lines, w
                ).transpose(1, 0, 2).tobytes()
            chunks.append((row0, comp))
            continue
        lines = []
        for li in range(n_lines):
            for n in names:
                v = src[n][row0 + li]
                v = v.astype(np.float16) if half else v.astype(np.float32)
                lines.append(v.tobytes())
        rawb = b"".join(lines)
        if compression == "none":
            chunks.append((row0, rawb))
            continue
        comp = zlib.compress(_apply_zip_predictor(np.frombuffer(rawb, np.uint8)))
        if len(comp) >= len(rawb):
            comp = rawb
        chunks.append((row0, comp))

    table_off = len(hdr)
    data_off = table_off + 8 * n_blocks
    offsets = []
    pos = data_off
    for row0, comp in chunks:
        offsets.append(pos)
        pos += 8 + len(comp)

    with open(path, "wb") as f:
        f.write(hdr)
        f.write(struct.pack(f"<{n_blocks}Q", *offsets))
        for row0, comp in chunks:
            f.write(struct.pack("<iI", row0, len(comp)))
            f.write(comp)
