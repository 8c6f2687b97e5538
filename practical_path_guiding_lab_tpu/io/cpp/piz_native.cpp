// Native PIZ (wavelet + Huffman) chunk decoder for the EXR reader.
//
// Implements the OpenEXR PIZ scanline-chunk decode pipeline from the file
// format specification: used-value bitmap -> reverse LUT, canonical Huffman
// decode (6-bit packed code lengths with zero-run RLE, run-length symbol in
// the data stream), 2D wavelet reconstruction (14-bit exact or 16-bit
// mod-2^16 arithmetic), LUT mapping back to half bits.
//
// Exposed via ctypes (see ../native.py). Built with:
//   g++ -O2 -shared -fPIC -o _piz_native.so piz_native.cpp
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int HUF_ENCBITS = 16;
constexpr int HUF_ENCSIZE = (1 << HUF_ENCBITS) + 1;
constexpr int HUF_DECBITS = 14;
constexpr int HUF_DECSIZE = 1 << HUF_DECBITS;
constexpr int HUF_DECMASK = HUF_DECSIZE - 1;

constexpr int SHORT_ZEROCODE_RUN = 59;
constexpr int LONG_ZEROCODE_RUN = 63;
constexpr int SHORTEST_LONG_RUN = 2 + LONG_ZEROCODE_RUN - SHORT_ZEROCODE_RUN;

constexpr int64_t A_OFFSET = 1 << 15;
constexpr int64_t MOD_MASK = (1 << 16) - 1;

struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint64_t c = 0;
  int lc = 0;
  bool fill(int nbits) {
    while (lc < nbits) {
      if (p >= end) {
        // zero-pad at end of stream
        c <<= 8;
        lc += 8;
      } else {
        c = (c << 8) | *p++;
        lc += 8;
      }
    }
    return true;
  }
  uint64_t read(int nbits) {
    fill(nbits);
    lc -= nbits;
    return (c >> lc) & ((1ull << nbits) - 1);
  }
};

struct LongCode {
  uint64_t code;
  int len;
  int sym;
};

int huf_decompress(const uint8_t* data, size_t size, uint16_t* out,
                   size_t n_out) {
  if (size < 20) return -1;
  uint32_t im, iM, nBits;
  std::memcpy(&im, data, 4);
  std::memcpy(&iM, data + 4, 4);
  std::memcpy(&nBits, data + 12, 4);
  if (im >= HUF_ENCSIZE || iM >= HUF_ENCSIZE) return -2;

  // --- unpack the 6-bit packed code-length table ---
  std::vector<int> lengths(HUF_ENCSIZE, 0);
  BitReader tr{data + 20, data + size};
  for (uint32_t i = im; i <= iM;) {
    int l = (int)tr.read(6);
    if (l == LONG_ZEROCODE_RUN) {
      int run = (int)tr.read(8) + SHORTEST_LONG_RUN;
      i += run;
    } else if (l >= SHORT_ZEROCODE_RUN) {
      i += l - SHORT_ZEROCODE_RUN + 2;
    } else {
      lengths[i] = l;
      ++i;
    }
  }

  // --- canonical codes (OpenEXR ordering: longest codes first) ---
  int64_t n[59] = {0};
  for (int i = 0; i < HUF_ENCSIZE; ++i)
    if (lengths[i] > 0) n[lengths[i]]++;
  int64_t c = 0;
  for (int i = 58; i > 0; --i) {
    int64_t nc = (c + n[i]) >> 1;
    n[i] = c;
    c = nc;
  }
  std::vector<uint64_t> codes(HUF_ENCSIZE, 0);
  for (int i = 0; i < HUF_ENCSIZE; ++i) {
    int l = lengths[i];
    if (l > 0) codes[i] = (uint64_t)n[l]++;
  }

  // --- fast decode table + long-code list ---
  std::vector<int32_t> dec_len(HUF_DECSIZE, 0), dec_sym(HUF_DECSIZE, 0);
  std::vector<LongCode> longs;
  for (int i = 0; i < HUF_ENCSIZE; ++i) {
    int l = lengths[i];
    if (l == 0) continue;
    if (l <= HUF_DECBITS) {
      uint64_t start = codes[i] << (HUF_DECBITS - l);
      uint64_t cnt = 1ull << (HUF_DECBITS - l);
      for (uint64_t k = 0; k < cnt; ++k) {
        dec_len[start + k] = l;
        dec_sym[start + k] = i;
      }
    } else {
      longs.push_back({codes[i], l, i});
    }
  }

  // --- data decode: restarts at the byte after the (byte-padded) table ---
  BitReader br{tr.p, data + size};
  size_t oi = 0;
  const uint32_t rlc = iM;
  while (oi < n_out) {
    br.fill(HUF_DECBITS);
    uint64_t idx = (br.c >> (br.lc - HUF_DECBITS)) & HUF_DECMASK;
    int sym;
    int l = dec_len[idx];
    if (l > 0) {
      sym = dec_sym[idx];
      br.lc -= l;
    } else {
      sym = -1;
      for (const auto& lcd : longs) {
        br.fill(lcd.len);
        uint64_t code =
            (br.c >> (br.lc - lcd.len)) & ((1ull << lcd.len) - 1);
        if (code == lcd.code) {
          sym = lcd.sym;
          br.lc -= lcd.len;
          break;
        }
      }
      if (sym < 0) return -3;
    }
    if ((uint32_t)sym == rlc) {
      int run = (int)br.read(8);
      if (oi == 0 || oi + run > n_out) return -4;
      uint16_t prev = out[oi - 1];
      for (int k = 0; k < run; ++k) out[oi++] = prev;
    } else {
      out[oi++] = (uint16_t)sym;
    }
  }
  return 0;
}

inline void wdec14(uint16_t l, uint16_t h, uint16_t& a, uint16_t& b) {
  int16_t ls = (int16_t)l;
  int16_t hs = (int16_t)h;
  int hi = hs;
  int ai = ls + (hi & 1) + (hi >> 1);
  int16_t as = (int16_t)ai;
  int16_t bs = (int16_t)(ai - hi);
  a = (uint16_t)as;
  b = (uint16_t)bs;
}

inline void wdec16(uint16_t l, uint16_t h, uint16_t& a, uint16_t& b) {
  int64_t m = l;
  int64_t d = h;
  int64_t bb = (m - (d >> 1)) & MOD_MASK;
  int64_t aa = (d + bb - A_OFFSET) & MOD_MASK;
  b = (uint16_t)bb;
  a = (uint16_t)aa;
}

void wav2_decode(uint16_t* in, int nx, int ox, int ny, int oy, int mx) {
  bool w14 = mx < (1 << 14);
  int n = nx > ny ? ny : nx;
  int p = 1;
  int p2;
  while (p <= n) p <<= 1;
  p >>= 1;
  p2 = p;
  p >>= 1;

  while (p >= 1) {
    uint16_t* py = in;
    uint16_t* ey = in + oy * (ny - p2);
    int oy1 = oy * p;
    int oy2 = oy * p2;
    int ox1 = ox * p;
    int ox2 = ox * p2;
    uint16_t i00, i01, i10, i11;

    for (; py <= ey; py += oy2) {
      uint16_t* px = py;
      uint16_t* ex = py + ox * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t* p01 = px + ox1;
        uint16_t* p10 = px + oy1;
        uint16_t* p11 = p10 + ox1;
        if (w14) {
          wdec14(*px, *p10, i00, i10);
          wdec14(*p01, *p11, i01, i11);
          wdec14(i00, i01, *px, *p01);
          wdec14(i10, i11, *p10, *p11);
        } else {
          wdec16(*px, *p10, i00, i10);
          wdec16(*p01, *p11, i01, i11);
          wdec16(i00, i01, *px, *p01);
          wdec16(i10, i11, *p10, *p11);
        }
      }
      if (nx & p) {
        uint16_t* p10 = px + oy1;
        if (w14)
          wdec14(*px, *p10, i00, *p10), *px = i00;
        else
          wdec16(*px, *p10, i00, *p10), *px = i00;
      }
    }
    if (ny & p) {
      uint16_t* px = py;
      uint16_t* ex = py + ox * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t* p01 = px + ox1;
        if (w14)
          wdec14(*px, *p01, i00, *p01), *px = i00;
        else
          wdec16(*px, *p01, i00, *p01), *px = i00;
      }
    }
    p2 = p;
    p >>= 1;
  }
}

}  // namespace

extern "C" {

// Decode one PIZ chunk into planar u16 half bits:
// out has n_channels * n_lines * width entries.
int piz_decompress(const uint8_t* chunk, size_t chunk_size, int width,
                   int n_lines, int n_channels, uint16_t* out) {
  if (chunk_size < 4) return -10;
  uint16_t min_nz, max_nz;
  std::memcpy(&min_nz, chunk, 2);
  std::memcpy(&max_nz, chunk + 2, 2);
  size_t off = 4;
  std::vector<uint8_t> bitmap(8192, 0);
  if (min_nz <= max_nz) {
    size_t nb = max_nz - min_nz + 1;
    if (off + nb > chunk_size) return -11;
    std::memcpy(bitmap.data() + min_nz, chunk + off, nb);
    off += nb;
  }
  // reverse LUT
  std::vector<uint16_t> lut(1 << 16, 0);
  int k = 0;
  for (int i = 0; i < (1 << 16); ++i) {
    if (i == 0 || (bitmap[i >> 3] & (1 << (i & 7)))) lut[k++] = (uint16_t)i;
  }
  int max_value = k - 1;

  if (off + 4 > chunk_size) return -12;
  uint32_t length;
  std::memcpy(&length, chunk + off, 4);
  off += 4;
  if (off + length > chunk_size) return -13;

  size_t n_shorts = (size_t)n_channels * n_lines * width;
  int rc = huf_decompress(chunk + off, length, out, n_shorts);
  if (rc != 0) return rc;

  for (int ci = 0; ci < n_channels; ++ci) {
    uint16_t* plane = out + (size_t)ci * n_lines * width;
    wav2_decode(plane, width, 1, n_lines, width, max_value);
    for (size_t i = 0; i < (size_t)n_lines * width; ++i)
      plane[i] = lut[plane[i]];
  }
  return 0;
}
}
