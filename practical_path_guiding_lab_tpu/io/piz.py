"""PIZ (wavelet + Huffman) decoder for OpenEXR scanline blocks.

Implemented from the OpenEXR file-format specification. The bundled
ground-truth images (``scenes/*/TungstenRender.exr``) are PIZ-compressed
HALF images, and no EXR-capable library ships in this environment, so the
framework carries its own codec. A C++ fast path (``_native.so``) is used
when built; this module is the reference/fallback implementation.

Pipeline per 32-scanline chunk (decode order):
  1. bitmap of used u16 values -> reverse LUT (index -> value)
  2. Huffman decode (canonical codes, 6-bit lengths, RLE zero-runs in the
     code-length table, run-length symbol = iM in the data stream)
  3. 2D wavelet reconstruction per channel (14-bit or 16-bit mode)
  4. LUT mapping back to half bits
"""
from __future__ import annotations

import numpy as np

HUF_ENCBITS = 16
HUF_ENCSIZE = (1 << HUF_ENCBITS) + 1  # 65537
HUF_DECBITS = 14
HUF_DECSIZE = 1 << HUF_DECBITS
HUF_DECMASK = HUF_DECSIZE - 1

SHORT_ZEROCODE_RUN = 59
LONG_ZEROCODE_RUN = 63
SHORTEST_LONG_RUN = 2 + LONG_ZEROCODE_RUN - SHORT_ZEROCODE_RUN  # 6

NBITS16 = 16
A_OFFSET = 1 << (NBITS16 - 1)
MOD_MASK = (1 << NBITS16) - 1


def reverse_lut_from_bitmap(bitmap: np.ndarray):
    """bitmap: (8192,) uint8. Returns (lut (65536,) uint16, max_value)."""
    bits = np.unpackbits(bitmap, bitorder="little")  # bit v of value v
    bits = bits.astype(bool)
    bits[0] = True  # value 0 always present
    values = np.nonzero(bits)[0].astype(np.uint16)
    lut = np.zeros(1 << 16, dtype=np.uint16)
    lut[: len(values)] = values
    return lut, len(values) - 1


class _BitReader:
    __slots__ = ("data", "pos", "c", "lc")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.c = 0   # bit accumulator
        self.lc = 0  # bits in accumulator

    def read(self, nbits: int) -> int:
        while self.lc < nbits:
            self.c = (self.c << 8) | self.data[self.pos]
            self.pos += 1
            self.lc += 8
        self.lc -= nbits
        return (self.c >> self.lc) & ((1 << nbits) - 1)


def _unpack_enc_table(reader: _BitReader, im: int, iM: int) -> np.ndarray:
    """Decode the 6-bit-packed canonical code-length table."""
    lengths = np.zeros(HUF_ENCSIZE, dtype=np.int64)
    i = im
    while i <= iM:
        l = reader.read(6)
        if l == LONG_ZEROCODE_RUN:
            run = reader.read(8) + SHORTEST_LONG_RUN
            i += run
        elif l >= SHORT_ZEROCODE_RUN:
            i += l - SHORT_ZEROCODE_RUN + 2
        else:
            lengths[i] = l
            i += 1
    return lengths


def _canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """Assign canonical Huffman codes given code lengths (OpenEXR order)."""
    n = np.zeros(59, dtype=np.int64)
    counts = np.bincount(lengths[lengths > 0], minlength=59)
    n[: len(counts)] = counts[:59] if len(counts) >= 59 else np.pad(
        counts, (0, 59 - len(counts))
    )[:59]
    c = 0
    first = np.zeros(59, dtype=np.int64)
    for i in range(58, 0, -1):
        nc = (c + n[i]) >> 1
        first[i] = c
        c = nc
    codes = np.zeros_like(lengths)
    next_code = first.copy()
    nz = np.nonzero(lengths)[0]
    for i in nz:
        l = lengths[i]
        codes[i] = next_code[l]
        next_code[l] += 1
    return codes


def huf_decompress(data: bytes, n_out: int) -> np.ndarray:
    """Decode an OpenEXR Huffman stream -> (n_out,) uint16 symbol indices."""
    im = int.from_bytes(data[0:4], "little")
    iM = int.from_bytes(data[4:8], "little")
    # data[8:12] tableLength, data[12:16] nBits, data[16:20] reserved (the
    # decoder stops after n_out symbols, so nBits is not needed)
    reader = _BitReader(data[20:])
    lengths = _unpack_enc_table(reader, im, iM)
    codes = _canonical_codes(lengths)

    # Fast decode table for codes of length <= HUF_DECBITS.
    dec_len = np.zeros(HUF_DECSIZE, dtype=np.int32)
    dec_sym = np.zeros(HUF_DECSIZE, dtype=np.int32)
    long_codes = []  # (code, len, symbol) for length > DECBITS
    nz = np.nonzero(lengths)[0]
    for sym in nz:
        l = int(lengths[sym])
        code = int(codes[sym])
        if l <= HUF_DECBITS:
            start = code << (HUF_DECBITS - l)
            cnt = 1 << (HUF_DECBITS - l)
            dec_len[start : start + cnt] = l
            dec_sym[start : start + cnt] = sym
        else:
            long_codes.append((code, l, sym))
    long_codes.sort(key=lambda t: (t[1], t[0]))

    out = np.zeros(n_out, dtype=np.uint16)
    # Bit-serial decode; the data stream restarts at the byte boundary after
    # the packed table (the encoder pads the table to whole bytes).
    buf = reader.data
    pos = reader.pos
    c = 0
    lc = 0
    # Recompute bits consumed so far by the table: we track via reader state.
    # Simpler: decode until n_out symbols produced.
    oi = 0
    n_data = len(buf)
    while oi < n_out:
        while lc < HUF_DECBITS and pos < n_data:
            c = (c << 8) | buf[pos]
            pos += 1
            lc += 8
        if lc < HUF_DECBITS:
            # pad with zero bits at end of stream
            c <<= HUF_DECBITS - lc
            lc = HUF_DECBITS
        idx = (c >> (lc - HUF_DECBITS)) & HUF_DECMASK
        l = int(dec_len[idx])
        if l > 0:
            sym = int(dec_sym[idx])
            lc -= l
        else:
            sym = -1
            for code, ll, s in long_codes:
                while lc < ll and pos < n_data:
                    c = (c << 8) | buf[pos]
                    pos += 1
                    lc += 8
                if lc >= ll and ((c >> (lc - ll)) & ((1 << ll) - 1)) == code:
                    sym = s
                    lc -= ll
                    break
            if sym < 0:
                raise ValueError("PIZ: invalid Huffman code")
        if sym == iM:
            # run-length: repeat previous symbol (next 8 bits) times
            while lc < 8 and pos < n_data:
                c = (c << 8) | buf[pos]
                pos += 1
                lc += 8
            run = (c >> (lc - 8)) & 0xFF
            lc -= 8
            out[oi : oi + run] = out[oi - 1]
            oi += run
        else:
            out[oi] = sym
            oi += 1
    return out


def wav2_decode(a: np.ndarray, nx: int, ox: int, ny: int, oy: int, mx: int):
    """In-place 2D wavelet reconstruction on flat int array ``a``.

    Mirrors the OpenEXR wav2Decode traversal; ``mx`` selects 14-bit
    (exact integer lifting) vs 16-bit (mod-2^16) arithmetic.
    """
    w14 = mx < (1 << 14)
    n = min(nx, ny)
    p = 1
    while p <= n:
        p <<= 1
    p >>= 1
    p2 = p
    p >>= 1

    def wdec14(l, h):
        # OpenEXR reinterprets the stored uint16 bits as SIGNED int16
        # (ImfWav.cpp wdec14) — wavelet differences are negative half the
        # time. (The bundled GTs all take the 16-bit mod path, so this
        # branch is exercised by the compressor round-trip tests.)
        s16 = lambda v: ((v + 0x8000) & 0xFFFF) - 0x8000
        ls = s16(l.astype(np.int64))
        hi = s16(h.astype(np.int64))
        ai = ls + (hi & 1) + (hi >> 1)
        return s16(ai), s16(ai - hi)

    def wdec16(l, h):
        m = l.astype(np.int64)
        d = h.astype(np.int64)
        bb = (m - (d >> 1)) & MOD_MASK
        aa = (d + bb - A_OFFSET) & MOD_MASK
        return aa, bb

    wdec = wdec14 if w14 else wdec16

    while p >= 1:
        # Vectorized over the grid of (py, px) positions at this scale.
        ys = np.arange(0, ny - p2 + 1, p2)
        xs = np.arange(0, nx - p2 + 1, p2)
        # Positions of the leftover odd row/column at this scale: one full
        # stride past the last processed pair (matches the OpenEXR pointer
        # walk; NOT simply ny - p).
        y_odd = (ys[-1] + p2) if len(ys) else 0
        x_odd = (xs[-1] + p2) if len(xs) else 0
        if len(ys) and len(xs):
            base = (ys[:, None] * oy + xs[None, :] * ox).ravel()
            i00 = base
            i01 = base + ox * p
            i10 = base + oy * p
            i11 = base + oy * p + ox * p
            t00, t10 = wdec(a[i00], a[i10])
            t01, t11 = wdec(a[i01], a[i11])
            r00, r01 = wdec(t00, t01)
            r10, r11 = wdec(t10, t11)
            a[i00] = r00
            a[i01] = r01
            a[i10] = r10
            a[i11] = r11
        if (nx & p) and len(ys):
            # odd extra column: vertical pairs down that column
            base = ys * oy + x_odd * ox
            t0, t1 = wdec(a[base], a[base + oy * p])
            a[base] = t0
            a[base + oy * p] = t1
        if (ny & p) and len(xs):
            # odd extra row: horizontal pairs along that row
            base = y_odd * oy + xs * ox
            t0, t1 = wdec(a[base], a[base + ox * p])
            a[base] = t0
            a[base + ox * p] = t1
        p2 = p
        p >>= 1
    return a


def piz_decompress(chunk: bytes, width: int, n_lines: int, n_channels: int):
    """Decode one PIZ chunk -> (n_channels, n_lines, width) uint16 (half bits).

    Assumes all channels are HALF with sampling 1 (true for the bundled
    ground truths).
    """
    min_nz = int.from_bytes(chunk[0:2], "little")
    max_nz = int.from_bytes(chunk[2:4], "little")
    off = 4
    bitmap = np.zeros(8192, dtype=np.uint8)
    if min_nz <= max_nz:
        nb = max_nz - min_nz + 1
        bitmap[min_nz : max_nz + 1] = np.frombuffer(
            chunk[off : off + nb], dtype=np.uint8
        )
        off += nb
    lut, max_value = reverse_lut_from_bitmap(bitmap)
    length = int.from_bytes(chunk[off : off + 4], "little")
    off += 4
    n_shorts = n_channels * n_lines * width
    data = huf_decompress(chunk[off : off + length], n_shorts)
    data = data.astype(np.int64)
    out = np.zeros((n_channels, n_lines * width), dtype=np.uint16)
    for ci in range(n_channels):
        plane = data[ci * n_lines * width : (ci + 1) * n_lines * width].copy()
        wav2_decode(plane, width, 1, n_lines, width, max_value)
        # OpenEXR applies the LUT through an (unsigned short) cast
        out[ci] = lut[plane & 0xFFFF]
    return out.reshape(n_channels, n_lines, width)


# ===========================================================================
# Encoder (write path) — inverse of the pipeline above
# ===========================================================================


def forward_lut_from_data(values: np.ndarray):
    """Build bitmap (8192 uint8), forward LUT (value -> index) and
    max_value from the half-bit values present (value 0 is never marked in
    the bitmap, mirroring OpenEXR bitmapFromData)."""
    present = np.zeros(1 << 16, bool)
    present[values.reshape(-1)] = True
    present[0] = True
    idx_of = np.cumsum(present).astype(np.uint16) - 1  # value -> index
    max_value = int(idx_of[-1])
    mark = present.copy()
    mark[0] = False
    bitmap = np.packbits(mark.view(np.uint8), bitorder="little")
    return bitmap, idx_of, max_value


def wav2_encode(a: np.ndarray, nx: int, ox: int, ny: int, oy: int, mx: int):
    """In-place 2D forward wavelet on flat int64 array ``a`` (inverse of
    wav2_decode; mirrors OpenEXR wav2Encode)."""
    w14 = mx < (1 << 14)
    s16 = lambda v: ((v + 0x8000) & 0xFFFF) - 0x8000

    def wenc14(av, bv):
        a_s = s16(av)
        b_s = s16(bv)
        m = (a_s + b_s) >> 1
        d = a_s - b_s
        return s16(m), s16(d)

    def wenc16(av, bv):
        ao = (av + A_OFFSET) & MOD_MASK
        m = (ao + bv) >> 1
        d = ao - bv
        m = np.where(d < 0, (m + A_OFFSET) & MOD_MASK, m)
        return m, d & MOD_MASK

    wenc = wenc14 if w14 else wenc16
    n = min(nx, ny)
    p = 1
    p2 = 2
    while p2 <= n:
        ys = np.arange(0, ny - p2 + 1, p2)
        xs = np.arange(0, nx - p2 + 1, p2)
        y_odd = (ys[-1] + p2) if len(ys) else 0
        x_odd = (xs[-1] + p2) if len(xs) else 0
        if len(ys) and len(xs):
            base = (ys[:, None] * oy + xs[None, :] * ox).ravel()
            i00 = base
            i01 = base + ox * p
            i10 = base + oy * p
            i11 = base + oy * p + ox * p
            t00, t01 = wenc(a[i00], a[i01])
            t10, t11 = wenc(a[i10], a[i11])
            r00, r10 = wenc(t00, t10)
            r01, r11 = wenc(t01, t11)
            a[i00] = r00
            a[i01] = r01
            a[i10] = r10
            a[i11] = r11
        if (nx & p) and len(ys):
            base = ys * oy + x_odd * ox
            l, h = wenc(a[base], a[base + oy * p])
            a[base] = l
            a[base + oy * p] = h
        if (ny & p) and len(xs):
            base = y_odd * oy + xs * ox
            l, h = wenc(a[base], a[base + ox * p])
            a[base] = l
            a[base + ox * p] = h
        p = p2
        p2 <<= 1
    return a


class _BitWriter:
    __slots__ = ("out", "c", "lc")

    def __init__(self):
        self.out = bytearray()
        self.c = 0
        self.lc = 0

    def write(self, nbits: int, value: int):
        self.c = (self.c << nbits) | (value & ((1 << nbits) - 1))
        self.lc += nbits
        while self.lc >= 8:
            self.lc -= 8
            self.out.append((self.c >> self.lc) & 0xFF)
        self.c &= (1 << self.lc) - 1

    def pad_to_byte(self):
        if self.lc:
            self.write(8 - self.lc, 0)

    @property
    def bits_written(self):
        return len(self.out) * 8 + self.lc


def _build_code_lengths(freq: np.ndarray) -> np.ndarray:
    """Huffman code lengths (<= 58) for symbols with freq > 0."""
    import heapq

    syms = np.nonzero(freq)[0]
    lengths = np.zeros(HUF_ENCSIZE, np.int64)
    if len(syms) == 1:
        lengths[syms[0]] = 1
        return lengths
    heap = [(int(freq[s]), int(s), None, None) for s in syms]
    counter = HUF_ENCSIZE
    heapq.heapify(heap)
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        counter += 1
        heapq.heappush(heap, (a[0] + b[0], counter, a, b))

    stack = [(heap[0], 0)]
    while stack:
        node, depth = stack.pop()
        if node[2] is None:
            lengths[node[1]] = max(depth, 1)
        else:
            stack.append((node[2], depth + 1))
            stack.append((node[3], depth + 1))
    if lengths.max() > 58:
        raise ValueError("PIZ: Huffman code length > 58 (pathological input)")
    return lengths


def _pack_enc_table(writer: _BitWriter, lengths: np.ndarray, im: int, iM: int):
    """6-bit lengths with zero-run codes (OpenEXR hufPackEncTable)."""
    i = im
    while i <= iM:
        l = int(lengths[i])
        if l == 0:
            zr = 1
            while i + zr <= iM and zr < 255 + SHORTEST_LONG_RUN and lengths[i + zr] == 0:
                zr += 1
            if zr >= SHORTEST_LONG_RUN:
                writer.write(6, LONG_ZEROCODE_RUN)
                writer.write(8, zr - SHORTEST_LONG_RUN)
                i += zr
            elif zr >= 2:
                writer.write(6, SHORT_ZEROCODE_RUN + zr - 2)
                i += zr
            else:
                writer.write(6, 0)
                i += 1
        else:
            writer.write(6, l)
            i += 1


def huf_compress(symbols: np.ndarray) -> bytes:
    """Encode uint16 symbols -> OpenEXR Huffman stream (20-byte header +
    byte-padded packed code-length table + data bits)."""
    symbols = symbols.astype(np.int64)
    freq = np.bincount(symbols, minlength=HUF_ENCSIZE).astype(np.int64)
    nz = np.nonzero(freq)[0]
    im = int(nz[0])
    iM = int(nz[-1]) + 1  # run-length pseudo-symbol (HUF_ENCSIZE has the +1)
    freq[iM] = 1
    lengths = _build_code_lengths(freq)
    codes = _canonical_codes(lengths)

    tw = _BitWriter()
    _pack_enc_table(tw, lengths, im, iM)
    tw.pad_to_byte()
    table = bytes(tw.out)

    # RLE-group the symbol stream (runs capped at 255 extra repeats)
    dw = _BitWriter()
    rl_len = int(lengths[iM])
    rl_code = int(codes[iM])
    n = len(symbols)
    # group boundaries
    change = np.nonzero(np.diff(symbols))[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [n]])
    for s0, e0 in zip(starts, ends):
        sym = int(symbols[s0])
        l = int(lengths[sym])
        code = int(codes[sym])
        count = e0 - s0
        while count > 0:
            run = min(count, 256)  # 1 symbol + up to 255 repeats
            extra = run - 1
            if extra > 1 and l * extra > l + rl_len + 8:
                dw.write(l, code)
                dw.write(rl_len, rl_code)
                dw.write(8, extra)
            else:
                for _ in range(run):
                    dw.write(l, code)
            count -= run
    n_bits = dw.bits_written
    dw.pad_to_byte()

    hdr = (
        im.to_bytes(4, "little")
        + iM.to_bytes(4, "little")
        + len(table).to_bytes(4, "little")
        + n_bits.to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )
    return hdr + table + bytes(dw.out)


def piz_compress(planes: np.ndarray) -> bytes:
    """Encode (n_channels, n_lines, width) uint16 half-bit planes into one
    PIZ chunk (inverse of piz_decompress)."""
    c, ny, nx = planes.shape
    bitmap, idx_of, max_value = forward_lut_from_data(planes)
    data = idx_of[planes.reshape(c, -1)].astype(np.int64)
    for ci in range(c):
        wav2_encode(data[ci], nx, 1, ny, nx, max_value)
    syms = (data & 0xFFFF).astype(np.uint16).reshape(-1)
    huf = huf_compress(syms)

    nzb = np.nonzero(bitmap)[0]
    if len(nzb):
        min_nz, max_nz = int(nzb[0]), int(nzb[-1])
        bm = bitmap[min_nz : max_nz + 1].tobytes()
    else:
        min_nz, max_nz = 8191, 0  # empty bitmap convention (minNonZero > max)
        bm = b""
    return (
        min_nz.to_bytes(2, "little")
        + max_nz.to_bytes(2, "little")
        + bm
        + len(huf).to_bytes(4, "little")
        + huf
    )
