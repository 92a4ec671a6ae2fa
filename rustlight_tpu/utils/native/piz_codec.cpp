// PIZ block codec (wavelet + Huffman) for the pure-Python EXR reader/writer.
//
// Implements the OpenEXR PIZ compression scheme from its public format
// specification (the ImfPizCompressor / ImfHuf / ImfWav semantics:
// used-value bitmap -> LUT compaction, per-channel 2D Haar-style wavelet,
// canonical length-limited Huffman with a run-length pseudo-symbol).
// The reference renderer reads/writes EXR through the native OpenEXR C++
// library (reference src/structure.rs:490-642); this file is this repo's
// native analog so externally-produced PIZ images (OpenEXR's bundled
// default in many DCC tools) load without that dependency.
//
// Exposed via ctypes (see rustlight_tpu/utils/piz.py). A pure-Python
// fallback implements the same format; the two are cross-validated in
// tests/test_foundations.py (plus hand-computed spec vectors).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int USHORT_RANGE = 1 << 16;
constexpr int BITMAP_SIZE = USHORT_RANGE >> 3;

constexpr int HUF_ENCBITS = 16;
constexpr int HUF_DECBITS = 14;
constexpr int HUF_ENCSIZE = (1 << HUF_ENCBITS) + 1;  // 65537
constexpr int HUF_DECSIZE = 1 << HUF_DECBITS;
constexpr int HUF_DECMASK = HUF_DECSIZE - 1;

inline long long huf_length(long long code) { return code & 63; }
inline long long huf_code(long long code) { return code >> 6; }

// ------------------------------------------------------------------ wavelet

constexpr int NBITS16 = 16;
constexpr int A_OFFSET = 1 << (NBITS16 - 1);
constexpr int M_OFFSET = 1 << (NBITS16 - 1);
constexpr int MOD_MASK = (1 << NBITS16) - 1;

inline void wenc14(uint16_t a, uint16_t b, uint16_t &l, uint16_t &h) {
  int16_t as = static_cast<int16_t>(a);
  int16_t bs = static_cast<int16_t>(b);
  int16_t ms = static_cast<int16_t>((as + bs) >> 1);
  int16_t ds = static_cast<int16_t>(as - bs);
  l = static_cast<uint16_t>(ms);
  h = static_cast<uint16_t>(ds);
}

inline void wdec14(uint16_t l, uint16_t h, uint16_t &a, uint16_t &b) {
  int16_t ls = static_cast<int16_t>(l);
  int16_t hs = static_cast<int16_t>(h);
  int hi = hs;
  int ai = ls + (hi & 1) + (hi >> 1);
  int16_t as = static_cast<int16_t>(ai);
  int16_t bs = static_cast<int16_t>(ai - hi);
  a = static_cast<uint16_t>(as);
  b = static_cast<uint16_t>(bs);
}

inline void wenc16(uint16_t a, uint16_t b, uint16_t &l, uint16_t &h) {
  int ao = (static_cast<int>(a) + A_OFFSET) & MOD_MASK;
  int m = (ao + static_cast<int>(b)) >> 1;
  int d = ao - static_cast<int>(b);
  if (d < 0) m = (m + M_OFFSET) & MOD_MASK;
  d &= MOD_MASK;
  l = static_cast<uint16_t>(m);
  h = static_cast<uint16_t>(d);
}

inline void wdec16(uint16_t l, uint16_t h, uint16_t &a, uint16_t &b) {
  int m = static_cast<int>(l);
  int d = static_cast<int>(h);
  int bb = (m - (d >> 1)) & MOD_MASK;
  int aa = (d + bb - A_OFFSET) & MOD_MASK;
  b = static_cast<uint16_t>(bb);
  a = static_cast<uint16_t>(aa);
}

// 2D wavelet over an ny x nx grid embedded with strides ox (element) and
// oy (row), multi-level with leftover row/column pairing at each level.
void wav2_encode(uint16_t *in, int nx, int ox, int ny, int oy, uint16_t mx) {
  bool w14 = mx < (1 << 14);
  int n = (nx > ny) ? ny : nx;
  int p = 1, p2 = 2;
  while (p2 <= n) {
    uint16_t *py = in;
    uint16_t *ey = in + static_cast<long long>(oy) * (ny - p2);
    int oy1 = oy * p, oy2 = oy * p2;
    int ox1 = ox * p, ox2 = ox * p2;
    uint16_t i00, i01, i10, i11;
    for (; py <= ey; py += oy2) {
      uint16_t *px = py;
      uint16_t *ex = py + static_cast<long long>(ox) * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t *p01 = px + ox1;
        uint16_t *p10 = px + oy1;
        uint16_t *p11 = p10 + ox1;
        if (w14) {
          wenc14(*px, *p01, i00, i01);
          wenc14(*p10, *p11, i10, i11);
          wenc14(i00, i10, *px, *p10);
          wenc14(i01, i11, *p01, *p11);
        } else {
          wenc16(*px, *p01, i00, i01);
          wenc16(*p10, *p11, i10, i11);
          wenc16(i00, i10, *px, *p10);
          wenc16(i01, i11, *p01, *p11);
        }
      }
      if (nx & p) {
        uint16_t *p10 = px + oy1;
        if (w14)
          wenc14(*px, *p10, i00, *p10);
        else
          wenc16(*px, *p10, i00, *p10);
        *px = i00;
      }
    }
    if (ny & p) {
      uint16_t *px = py;
      uint16_t *ex = py + static_cast<long long>(ox) * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t *p01 = px + ox1;
        if (w14)
          wenc14(*px, *p01, i00, *p01);
        else
          wenc16(*px, *p01, i00, *p01);
        *px = i00;
      }
    }
    p = p2;
    p2 <<= 1;
  }
}

void wav2_decode(uint16_t *in, int nx, int ox, int ny, int oy, uint16_t mx) {
  bool w14 = mx < (1 << 14);
  int n = (nx > ny) ? ny : nx;
  int p = 1, p2;
  while (p <= n) p <<= 1;
  p >>= 1;
  p2 = p;
  p >>= 1;
  while (p >= 1) {
    uint16_t *py = in;
    uint16_t *ey = in + static_cast<long long>(oy) * (ny - p2);
    int oy1 = oy * p, oy2 = oy * p2;
    int ox1 = ox * p, ox2 = ox * p2;
    uint16_t i00, i01, i10, i11;
    for (; py <= ey; py += oy2) {
      uint16_t *px = py;
      uint16_t *ex = py + static_cast<long long>(ox) * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t *p01 = px + ox1;
        uint16_t *p10 = px + oy1;
        uint16_t *p11 = p10 + ox1;
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
        uint16_t *p10 = px + oy1;
        if (w14)
          wdec14(*px, *p10, i00, *p10);
        else
          wdec16(*px, *p10, i00, *p10);
        *px = i00;
      }
    }
    if (ny & p) {
      uint16_t *px = py;
      uint16_t *ex = py + static_cast<long long>(ox) * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t *p01 = px + ox1;
        if (w14)
          wdec14(*px, *p01, i00, *p01);
        else
          wdec16(*px, *p01, i00, *p01);
        *px = i00;
      }
    }
    p2 = p;
    p >>= 1;
  }
}

// ------------------------------------------------------------------ bitmap / LUT

void bitmap_from_data(const uint16_t *data, long long n, uint8_t *bitmap,
                      uint16_t &min_nz, uint16_t &max_nz) {
  std::memset(bitmap, 0, BITMAP_SIZE);
  for (long long i = 0; i < n; ++i)
    bitmap[data[i] >> 3] |= static_cast<uint8_t>(1 << (data[i] & 7));
  bitmap[0] &= ~1u;  // zero is implicit, never stored
  min_nz = BITMAP_SIZE - 1;
  max_nz = 0;
  for (int i = 0; i < BITMAP_SIZE; ++i) {
    if (bitmap[i]) {
      if (static_cast<uint16_t>(i) < min_nz) min_nz = static_cast<uint16_t>(i);
      if (static_cast<uint16_t>(i) > max_nz) max_nz = static_cast<uint16_t>(i);
    }
  }
}

uint16_t forward_lut_from_bitmap(const uint8_t *bitmap, uint16_t *lut) {
  int k = 0;
  for (int i = 0; i < USHORT_RANGE; ++i) {
    if (i == 0 || (bitmap[i >> 3] & (1 << (i & 7))))
      lut[i] = static_cast<uint16_t>(k++);
    else
      lut[i] = 0;
  }
  return static_cast<uint16_t>(k - 1);  // maximum LUT value
}

uint16_t reverse_lut_from_bitmap(const uint8_t *bitmap, uint16_t *lut) {
  int k = 0;
  for (int i = 0; i < USHORT_RANGE; ++i) {
    if (i == 0 || (bitmap[i >> 3] & (1 << (i & 7))))
      lut[k++] = static_cast<uint16_t>(i);
  }
  return static_cast<uint16_t>(k - 1);
}

// ------------------------------------------------------------------ Huffman

// Build optimal code lengths (<= 58 bits) with the two-list heap merge,
// then assign canonical codes. frq[] is replaced by packed (code<<6)|len.
struct FreqGreater {
  const long long *frq;
  bool operator()(int a, int b) const { return frq[a] > frq[b]; }
};

void push_heap_idx(std::vector<int> &h, const long long *frq, int v) {
  h.push_back(v);
  size_t i = h.size() - 1;
  while (i > 0) {
    size_t par = (i - 1) / 2;
    if (frq[h[par]] <= frq[h[i]]) break;
    std::swap(h[par], h[i]);
    i = par;
  }
}

int pop_heap_idx(std::vector<int> &h, const long long *frq) {
  int top = h[0];
  h[0] = h.back();
  h.pop_back();
  size_t i = 0, n = h.size();
  while (true) {
    size_t l = 2 * i + 1, r = 2 * i + 2, m = i;
    if (l < n && frq[h[l]] < frq[h[m]]) m = l;
    if (r < n && frq[h[r]] < frq[h[m]]) m = r;
    if (m == i) break;
    std::swap(h[m], h[i]);
    i = m;
  }
  return top;
}

void huf_canonical_code_table(long long *hcode) {
  long long n[59];
  for (int i = 0; i <= 58; ++i) n[i] = 0;
  for (int i = 0; i < HUF_ENCSIZE; ++i) n[hcode[i]] += 1;
  long long c = 0;
  for (int i = 58; i > 0; --i) {
    long long nc = (c + n[i]) >> 1;
    n[i] = c;
    c = nc;
  }
  for (int i = 0; i < HUF_ENCSIZE; ++i) {
    long long l = hcode[i];
    if (l > 0) hcode[i] = l | (n[l]++ << 6);
  }
}

void huf_build_enc_table(long long *frq, int *im, int *iM) {
  std::vector<int> hlink(HUF_ENCSIZE);
  std::vector<int> heap;
  heap.reserve(HUF_ENCSIZE);

  *im = 0;
  while (!frq[*im]) (*im)++;
  *iM = 0;
  for (int i = *im; i < HUF_ENCSIZE; ++i) {
    hlink[i] = i;
    if (frq[i]) {
      push_heap_idx(heap, frq, i);
      *iM = i;
    }
  }
  // run-length pseudo-symbol, one past the last real symbol
  (*iM)++;
  frq[*iM] = 1;
  push_heap_idx(heap, frq, *iM);

  std::vector<long long> scode(HUF_ENCSIZE, 0);
  while (heap.size() > 1) {
    int mm = pop_heap_idx(heap, frq);
    int m = pop_heap_idx(heap, frq);
    frq[m] += frq[mm];
    push_heap_idx(heap, frq, m);
    for (int j = m;; j = hlink[j]) {
      scode[j]++;
      if (hlink[j] == j) {
        hlink[j] = mm;
        break;
      }
    }
    for (int j = mm;; j = hlink[j]) {
      scode[j]++;
      if (hlink[j] == j) break;
    }
  }
  huf_canonical_code_table(scode.data());
  std::memcpy(frq, scode.data(), HUF_ENCSIZE * sizeof(long long));
}

// bit writer: MSB-first
struct BitWriter {
  uint8_t *out;
  uint8_t *end;
  uint64_t c = 0;
  int lc = 0;
  bool overflow = false;

  void bits(int n, uint64_t v) {
    c = (c << n) | v;
    lc += n;
    while (lc >= 8) {
      lc -= 8;
      if (out >= end) {
        overflow = true;
        return;
      }
      *out++ = static_cast<uint8_t>(c >> lc);
    }
  }
  void code(long long packed) { bits(static_cast<int>(huf_length(packed)), huf_code(packed)); }
  void flush() {
    if (lc > 0) {
      if (out >= end) {
        overflow = true;
        return;
      }
      *out++ = static_cast<uint8_t>(c << (8 - lc));
    }
  }
};

constexpr int SHORT_ZEROCODE_RUN = 59;
constexpr int LONG_ZEROCODE_RUN = 63;
constexpr int SHORTEST_LONG_RUN = 2 + LONG_ZEROCODE_RUN - SHORT_ZEROCODE_RUN;
constexpr int LONGEST_LONG_RUN = 255 + SHORTEST_LONG_RUN;

bool huf_pack_enc_table(const long long *hcode, int im, int iM, BitWriter &w) {
  for (; im <= iM; im++) {
    int l = static_cast<int>(huf_length(hcode[im]));
    if (l == 0) {
      int zerun = 1;
      while (im < iM && zerun < LONGEST_LONG_RUN) {
        if (huf_length(hcode[im + 1]) > 0) break;
        im++;
        zerun++;
      }
      if (zerun >= 2) {
        if (zerun >= SHORTEST_LONG_RUN) {
          w.bits(6, LONG_ZEROCODE_RUN);
          w.bits(8, zerun - SHORTEST_LONG_RUN);
        } else {
          w.bits(6, SHORT_ZEROCODE_RUN + zerun - 2);
        }
        continue;
      }
    }
    w.bits(6, l);
  }
  w.flush();
  return !w.overflow;
}

struct BitReader {
  const uint8_t *in;
  const uint8_t *end;
  uint64_t c = 0;
  int lc = 0;

  bool getbyte() {
    if (in >= end) return false;
    c = (c << 8) | *in++;
    lc += 8;
    return true;
  }
  // read n bits (n <= 32); returns -1 on underrun
  long long bits(int n) {
    while (lc < n)
      if (!getbyte()) return -1;
    lc -= n;
    return static_cast<long long>((c >> lc) & ((1ull << n) - 1));
  }
};

bool huf_unpack_enc_table(BitReader &r, int im, int iM, long long *hcode) {
  std::memset(hcode, 0, HUF_ENCSIZE * sizeof(long long));
  for (; im <= iM; im++) {
    long long l = r.bits(6);
    if (l < 0) return false;
    hcode[im] = l;
    if (l == LONG_ZEROCODE_RUN) {
      long long zerun = r.bits(8);
      if (zerun < 0) return false;
      zerun += SHORTEST_LONG_RUN;
      if (im + zerun > iM + 1) return false;
      while (zerun--) hcode[im++] = 0;
      im--;
    } else if (l >= SHORT_ZEROCODE_RUN) {
      long long zerun = l - SHORT_ZEROCODE_RUN + 2;
      if (im + zerun > iM + 1) return false;
      while (zerun--) hcode[im++] = 0;
      im--;
    }
  }
  huf_canonical_code_table(hcode);
  return true;
}

struct HufDec {
  int len = 0;      // length of short code, or 0
  int lit = 0;      // literal for short code / count of long codes
  std::vector<int> p;  // long-code symbols sharing this prefix
};

bool huf_build_dec_table(const long long *hcode, int im, int iM,
                         std::vector<HufDec> &hdecod) {
  hdecod.assign(HUF_DECSIZE, HufDec());
  for (; im <= iM; im++) {
    long long c = huf_code(hcode[im]);
    int l = static_cast<int>(huf_length(hcode[im]));
    if (c >> l) return false;  // code longer than its length
    if (l > HUF_DECBITS) {
      HufDec &pl = hdecod[c >> (l - HUF_DECBITS)];
      if (pl.len) return false;
      pl.lit++;
      pl.p.push_back(im);
    } else if (l) {
      long long base = c << (HUF_DECBITS - l);
      long long cnt = 1ll << (HUF_DECBITS - l);
      for (long long i = 0; i < cnt; ++i) {
        HufDec &pl = hdecod[base + i];
        if (pl.len || !pl.p.empty()) return false;
        pl.len = l;
        pl.lit = im;
      }
    }
  }
  return true;
}

// encode: run-length fold identical symbols, escape with the rlc code
void send_code(long long scode, int run_count, long long run_code, BitWriter &w) {
  if (huf_length(scode) + huf_length(run_code) + 8 <
      huf_length(scode) * run_count) {
    w.code(scode);
    w.code(run_code);
    w.bits(8, static_cast<uint64_t>(run_count));
  } else {
    while (run_count-- >= 0) w.code(scode);
  }
}

// returns number of bits, or -1 on overflow
long long huf_encode(const long long *hcode, const uint16_t *in, long long ni,
                     int rlc, BitWriter &w) {
  const uint8_t *start = w.out;
  int s = in[0];
  int cs = 0;
  for (long long i = 1; i < ni; ++i) {
    if (in[i] == s && cs < 255) {
      cs++;
    } else {
      send_code(hcode[s], cs, hcode[rlc], w);
      cs = 0;
      s = in[i];
    }
    if (w.overflow) return -1;
  }
  send_code(hcode[s], cs, hcode[rlc], w);
  long long nbits = (w.out - start) * 8 + w.lc;
  w.flush();
  if (w.overflow) return -1;
  return nbits;
}

struct StreamDec {
  const uint8_t *in;
  const uint8_t *ie;
  uint64_t c = 0;
  int lc = 0;

  bool take(int n, long long &v) {
    while (lc < n) {
      if (in >= ie) return false;
      c = (c << 8) | *in++;
      lc += 8;
    }
    lc -= n;
    v = static_cast<long long>((c >> lc) & ((1ull << n) - 1));
    return true;
  }
};

bool get_code(int po, int rlc, StreamDec &sd, uint16_t *&out, uint16_t *os,
              uint16_t *oe) {
  if (po == rlc) {
    long long cs;
    if (!sd.take(8, cs)) return false;
    if (out == os) return false;  // no previous symbol to repeat
    if (oe - out < cs) return false;
    uint16_t prev = out[-1];
    while (cs--) *out++ = prev;
  } else {
    if (out >= oe) return false;
    *out++ = static_cast<uint16_t>(po);
  }
  return true;
}

bool huf_decode(const long long *hcode, const std::vector<HufDec> &hdecod,
                 const uint8_t *in, long long ni /*bits*/, int rlc,
                 long long no, uint16_t *out) {
  StreamDec sd;
  sd.in = in;
  sd.ie = in + (ni + 7) / 8;
  uint16_t *os = out;
  uint16_t *oe = out + no;

  while (sd.in < sd.ie) {
    sd.c = (sd.c << 8) | *sd.in++;
    sd.lc += 8;
    while (sd.lc >= HUF_DECBITS) {
      const HufDec &pl =
          hdecod[(sd.c >> (sd.lc - HUF_DECBITS)) & HUF_DECMASK];
      if (pl.len) {
        sd.lc -= pl.len;
        if (!get_code(pl.lit, rlc, sd, out, os, oe)) return false;
      } else {
        // long code: search the candidate list
        bool found = false;
        for (int j = 0; j < static_cast<int>(pl.p.size()); ++j) {
          int sym = pl.p[j];
          int l = static_cast<int>(huf_length(hcode[sym]));
          while (sd.lc < l && sd.in < sd.ie) {
            sd.c = (sd.c << 8) | *sd.in++;
            sd.lc += 8;
          }
          if (sd.lc >= l &&
              huf_code(hcode[sym]) ==
                  static_cast<long long>((sd.c >> (sd.lc - l)) &
                                         ((1ull << l) - 1))) {
            sd.lc -= l;
            if (!get_code(sym, rlc, sd, out, os, oe)) return false;
            found = true;
            break;
          }
        }
        if (!found) return false;
      }
    }
  }

  // drain remaining bits (the tail shorter than HUF_DECBITS)
  int count = static_cast<int>((8 - ni) & 7);
  sd.c >>= count;
  sd.lc -= count;
  while (sd.lc > 0) {
    const HufDec &pl =
        hdecod[(sd.c << (HUF_DECBITS - sd.lc)) & HUF_DECMASK];
    if (pl.len && pl.len <= sd.lc) {
      sd.lc -= pl.len;
      if (!get_code(pl.lit, rlc, sd, out, os, oe)) return false;
    } else {
      break;
    }
  }
  return out == oe;
}

inline uint32_t rd_u32(const uint8_t *p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}

inline void wr_u32(uint8_t *p, uint32_t v) {
  p[0] = v & 0xff;
  p[1] = (v >> 8) & 0xff;
  p[2] = (v >> 16) & 0xff;
  p[3] = (v >> 24) & 0xff;
}

// hufCompress: [im:4][iM:4][tableLength:4][nBits:4][0:4][packed table][data]
long long huf_compress(const uint16_t *raw, long long n_raw, uint8_t *out,
                       long long cap) {
  if (n_raw == 0) return 0;
  std::vector<long long> freq(HUF_ENCSIZE, 0);
  for (long long i = 0; i < n_raw; ++i) freq[raw[i]]++;
  int im = 0, iM = 0;
  huf_build_enc_table(freq.data(), &im, &iM);

  if (cap < 20) return -1;
  BitWriter tw{out + 20, out + cap};
  if (!huf_pack_enc_table(freq.data(), im, iM, tw)) return -1;
  long long table_len = tw.out - (out + 20);

  BitWriter dw{tw.out, out + cap};
  long long nbits = huf_encode(freq.data(), raw, n_raw, iM, dw);
  if (nbits < 0) return -1;
  long long data_len = (nbits + 7) / 8;

  wr_u32(out, static_cast<uint32_t>(im));
  wr_u32(out + 4, static_cast<uint32_t>(iM));
  wr_u32(out + 8, static_cast<uint32_t>(table_len));
  wr_u32(out + 12, static_cast<uint32_t>(nbits));
  wr_u32(out + 16, 0);
  return 20 + table_len + data_len;
}

bool huf_uncompress(const uint8_t *in, long long n_in, uint16_t *out,
                    long long n_out) {
  if (n_out == 0) return true;
  if (n_in < 20) return false;
  int im = static_cast<int>(rd_u32(in));
  int iM = static_cast<int>(rd_u32(in + 4));
  long long nbits = static_cast<long long>(rd_u32(in + 12));
  if (im < 0 || im >= HUF_ENCSIZE || iM < 0 || iM >= HUF_ENCSIZE) return false;
  const uint8_t *ptr = in + 20;

  std::vector<long long> hcode(HUF_ENCSIZE);
  BitReader tr{ptr, in + n_in};
  if (!huf_unpack_enc_table(tr, im, iM, hcode.data())) return false;
  // table reader consumed whole bytes; data starts at the next byte
  const uint8_t *data = tr.in;
  if (nbits > 8ll * (in + n_in - data)) return false;

  std::vector<HufDec> hdecod;
  if (!huf_build_dec_table(hcode.data(), im, iM, hdecod)) return false;
  return huf_decode(hcode.data(), hdecod, data, nbits, iM, n_out, out);
}

}  // namespace

// ------------------------------------------------------------------ exports

extern "C" {

// Compress one PIZ block. `planar` is the per-channel planar u16 buffer
// (channel 0 rows, then channel 1 rows, ...); per channel i the row is
// ch_nx[i]*ch_size[i] u16 wide and there are ch_ny[i] rows. Returns the
// compressed byte count written to `out`, or -1 (caller falls back to raw).
long long rl_piz_compress(const uint16_t *planar, long long n_u16,
                          const int *ch_nx, const int *ch_ny,
                          const int *ch_size, int n_ch, uint8_t *out,
                          long long cap) {
  std::vector<uint16_t> tmp(planar, planar + n_u16);

  std::vector<uint8_t> bitmap(BITMAP_SIZE);
  uint16_t min_nz, max_nz;
  bitmap_from_data(tmp.data(), n_u16, bitmap.data(), min_nz, max_nz);

  std::vector<uint16_t> lut(USHORT_RANGE);
  uint16_t max_value = forward_lut_from_bitmap(bitmap.data(), lut.data());
  for (long long i = 0; i < n_u16; ++i) tmp[i] = lut[tmp[i]];

  uint16_t *ch = tmp.data();
  for (int c = 0; c < n_ch; ++c) {
    for (int j = 0; j < ch_size[c]; ++j)
      wav2_encode(ch + j, ch_nx[c], ch_size[c], ch_ny[c],
                  ch_nx[c] * ch_size[c], max_value);
    ch += static_cast<long long>(ch_nx[c]) * ch_size[c] * ch_ny[c];
  }

  long long pos = 0;
  if (cap < 8) return -1;
  out[pos++] = min_nz & 0xff;
  out[pos++] = (min_nz >> 8) & 0xff;
  out[pos++] = max_nz & 0xff;
  out[pos++] = (max_nz >> 8) & 0xff;
  if (min_nz <= max_nz) {
    long long nb = max_nz - min_nz + 1;
    if (cap < pos + nb + 4) return -1;
    std::memcpy(out + pos, bitmap.data() + min_nz, nb);
    pos += nb;
  }
  long long len = huf_compress(tmp.data(), n_u16, out + pos + 4, cap - pos - 4);
  if (len < 0) return -1;
  wr_u32(out + pos, static_cast<uint32_t>(len));
  return pos + 4 + len;
}

// Uncompress one PIZ block into the planar u16 layout described by the
// channel descriptors. Returns 0 on success.
int rl_piz_uncompress(const uint8_t *in, long long n_in, const int *ch_nx,
                      const int *ch_ny, const int *ch_size, int n_ch,
                      uint16_t *out, long long n_u16) {
  if (n_in < 4) return 1;
  long long pos = 0;
  uint16_t min_nz = static_cast<uint16_t>(in[0] | (in[1] << 8));
  uint16_t max_nz = static_cast<uint16_t>(in[2] | (in[3] << 8));
  pos = 4;
  if (max_nz >= BITMAP_SIZE) return 2;
  std::vector<uint8_t> bitmap(BITMAP_SIZE, 0);
  if (min_nz <= max_nz) {
    long long nb = max_nz - min_nz + 1;
    if (n_in < pos + nb) return 3;
    std::memcpy(bitmap.data() + min_nz, in + pos, nb);
    pos += nb;
  }
  std::vector<uint16_t> lut(USHORT_RANGE, 0);
  uint16_t max_value = reverse_lut_from_bitmap(bitmap.data(), lut.data());

  if (n_in < pos + 4) return 4;
  long long len = static_cast<long long>(rd_u32(in + pos));
  pos += 4;
  if (n_in < pos + len) return 5;
  if (!huf_uncompress(in + pos, len, out, n_u16)) return 6;

  uint16_t *ch = out;
  for (int c = 0; c < n_ch; ++c) {
    for (int j = 0; j < ch_size[c]; ++j)
      wav2_decode(ch + j, ch_nx[c], ch_size[c], ch_ny[c],
                  ch_nx[c] * ch_size[c], max_value);
    ch += static_cast<long long>(ch_nx[c]) * ch_size[c] * ch_ny[c];
  }
  for (long long i = 0; i < n_u16; ++i) out[i] = lut[out[i]];
  return 0;
}

}  // extern "C"
