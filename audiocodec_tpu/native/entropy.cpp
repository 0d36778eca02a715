// Rice/Golomb entropy coder for quantized spectral codes.
//
// The masking-driven quantizer produces near-geometric, zero-heavy code
// distributions — exactly what Rice coding models. Codes are zigzag-mapped
// to unsigned, grouped, and each group gets its own 4-bit Rice parameter k
// chosen to minimize its bit cost; quotients are capped with a raw-value
// escape so adversarial values cannot blow up the stream.
//
// C ABI:
//   acx_rice_encode(codes, n, group, out, cap)  -> bytes written (or <0)
//   acx_rice_decode(in, len, codes, n, group)   -> 0 on success
//   acx_rice_bound(n, group)                    -> worst-case output bytes
//   acx_rrice_encode/decode/bound               -> run-length variant
//
// The run-length variant (rrice): tonal spectra quantize to >99% zeros,
// and plain Rice pays one unary bit per zero. Each group carries a mode
// bit after its 4-bit k: mode 0 is plain Rice (identical to above);
// mode 1 alternates Elias-gamma zero-run lengths with Rice-coded
// nonzero magnitudes (u-1). The encoder costs both and picks per group,
// so rrice is never meaningfully larger than rice and is ~2-6x smaller
// pre-deflate on sparse content (measured).

#include <cstdint>
#include <cstring>

namespace {

constexpr int kMaxQuotient = 47;  // cap; larger quotients escape to raw
constexpr int kEscape = kMaxQuotient + 1;

struct BitWriter {
  uint8_t* buf;
  int64_t cap;
  int64_t byte_pos = 0;
  int bit_pos = 0;  // next bit to fill in buf[byte_pos], MSB-first
  bool overflow = false;

  void put_bit(uint32_t b) {
    if (byte_pos >= cap) {
      overflow = true;
      return;
    }
    if (bit_pos == 0) buf[byte_pos] = 0;
    buf[byte_pos] |= static_cast<uint8_t>((b & 1u) << (7 - bit_pos));
    if (++bit_pos == 8) {
      bit_pos = 0;
      ++byte_pos;
    }
  }
  void put_bits(uint64_t v, int nbits) {  // MSB-first
    for (int i = nbits - 1; i >= 0; --i) put_bit((v >> i) & 1u);
  }
  int64_t finish() {
    if (overflow) return -1;
    return byte_pos + (bit_pos ? 1 : 0);
  }
};

struct BitReader {
  const uint8_t* buf;
  int64_t len;
  int64_t byte_pos = 0;
  int bit_pos = 0;
  bool underflow = false;

  uint32_t get_bit() {
    if (byte_pos >= len) {
      underflow = true;
      return 0;
    }
    uint32_t b = (buf[byte_pos] >> (7 - bit_pos)) & 1u;
    if (++bit_pos == 8) {
      bit_pos = 0;
      ++byte_pos;
    }
    return b;
  }
  uint64_t get_bits(int nbits) {
    uint64_t v = 0;
    for (int i = 0; i < nbits; ++i) v = (v << 1) | get_bit();
    return v;
  }
};

inline uint32_t zigzag(int32_t v) {
  return (static_cast<uint32_t>(v) << 1) ^ static_cast<uint32_t>(v >> 31);
}
inline int32_t unzigzag(uint32_t u) {
  return static_cast<int32_t>((u >> 1) ^ (~(u & 1) + 1));
}

// bit cost of value u at parameter k (with escape)
inline int64_t rice_cost(uint32_t u, int k) {
  uint32_t q = u >> k;
  if (q >= static_cast<uint32_t>(kMaxQuotient)) return kEscape + 1 + 32;
  return static_cast<int64_t>(q) + 1 + k;
}

// Elias gamma of x >= 1: floor(log2 x) zeros, then x's bits MSB-first.
inline int gamma_bits(uint32_t x) {
  int n = 31 - __builtin_clz(x);
  return 2 * n + 1;
}

inline void put_gamma(BitWriter& w, uint32_t x) {
  int n = 31 - __builtin_clz(x);
  for (int i = 0; i < n; ++i) w.put_bit(0);
  w.put_bits(x, n + 1);
}

inline uint32_t get_gamma(BitReader& r, bool* bad) {
  int n = 0;
  while (r.get_bit() == 0u) {
    if (++n > 31 || r.underflow) {
      *bad = true;
      return 0;
    }
  }
  uint32_t x = 1;
  for (int i = 0; i < n; ++i) x = (x << 1) | r.get_bit();
  return x;
}

// Rice code one value at parameter k (shared by both modes).
inline void put_rice(BitWriter& w, uint32_t u, int k) {
  uint32_t q = u >> k;
  if (q >= static_cast<uint32_t>(kMaxQuotient)) {
    for (int b = 0; b < kEscape; ++b) w.put_bit(1);
    w.put_bit(0);
    w.put_bits(u, 32);
  } else {
    for (uint32_t b = 0; b < q; ++b) w.put_bit(1);
    w.put_bit(0);
    w.put_bits(u & ((1u << k) - 1u), k);
  }
}

inline uint32_t get_rice(BitReader& r, int k, bool* bad) {
  uint32_t q = 0;
  while (r.get_bit() == 1u) {
    if (++q > static_cast<uint32_t>(kEscape) || r.underflow) {
      *bad = true;
      return 0;
    }
  }
  if (q == static_cast<uint32_t>(kEscape))
    return static_cast<uint32_t>(r.get_bits(32));
  return (q << k) | static_cast<uint32_t>(r.get_bits(k));
}

}  // namespace

extern "C" {

int64_t acx_rice_bound(int64_t n, int64_t group) {
  int64_t groups = (n + group - 1) / group;
  // per value worst case: escape = 48 ones + stop bit + 32 raw bits
  int64_t bits = groups * 4 + n * (kEscape + 1 + 32);
  return bits / 8 + 16;
}

int64_t acx_rice_encode(const int32_t* codes, int64_t n, int64_t group,
                        uint8_t* out, int64_t cap) {
  BitWriter w{out, cap};
  for (int64_t g = 0; g < n; g += group) {
    int64_t end = g + group < n ? g + group : n;
    // choose k minimizing the group's cost
    int best_k = 0;
    int64_t best_cost = INT64_MAX;
    for (int k = 0; k < 16; ++k) {
      int64_t cost = 0;
      for (int64_t i = g; i < end; ++i) cost += rice_cost(zigzag(codes[i]), k);
      if (cost < best_cost) {
        best_cost = cost;
        best_k = k;
      }
    }
    w.put_bits(static_cast<uint64_t>(best_k), 4);
    for (int64_t i = g; i < end; ++i) {
      uint32_t u = zigzag(codes[i]);
      uint32_t q = u >> best_k;
      if (q >= static_cast<uint32_t>(kMaxQuotient)) {
        for (int b = 0; b < kEscape; ++b) w.put_bit(1);
        w.put_bit(0);
        w.put_bits(u, 32);
      } else {
        for (uint32_t b = 0; b < q; ++b) w.put_bit(1);
        w.put_bit(0);
        w.put_bits(u & ((1u << best_k) - 1u), best_k);
      }
    }
  }
  return w.finish();
}

int32_t acx_rice_decode(const uint8_t* in, int64_t len, int32_t* codes,
                        int64_t n, int64_t group) {
  BitReader r{in, len};
  for (int64_t g = 0; g < n; g += group) {
    int64_t end = g + group < n ? g + group : n;
    int k = static_cast<int>(r.get_bits(4));
    for (int64_t i = g; i < end; ++i) {
      uint32_t q = 0;
      while (r.get_bit() == 1u) {
        if (++q > static_cast<uint32_t>(kEscape) || r.underflow) return -2;
      }
      uint32_t u;
      if (q == static_cast<uint32_t>(kEscape)) {
        u = static_cast<uint32_t>(r.get_bits(32));
      } else {
        u = (q << k) | static_cast<uint32_t>(r.get_bits(k));
      }
      codes[i] = unzigzag(u);
    }
    if (r.underflow) return -2;
  }
  return 0;
}

int64_t acx_rrice_bound(int64_t n, int64_t group) {
  // plain mode is always available per group, so the bound is the rice
  // bound plus one mode bit per group
  int64_t groups = (n + group - 1) / group;
  return acx_rice_bound(n, group) + groups / 8 + 16;
}

int64_t acx_rrice_encode(const int32_t* codes, int64_t n, int64_t group,
                         uint8_t* out, int64_t cap) {
  BitWriter w{out, cap};
  for (int64_t g = 0; g < n; g += group) {
    int64_t end = g + group < n ? g + group : n;

    // plain cost: best k over every value
    int plain_k = 0;
    int64_t plain_cost = INT64_MAX;
    for (int k = 0; k < 16; ++k) {
      int64_t cost = 0;
      for (int64_t i = g; i < end; ++i) cost += rice_cost(zigzag(codes[i]), k);
      if (cost < plain_cost) {
        plain_cost = cost;
        plain_k = k;
      }
    }

    // rle cost: gamma runs are k-independent; best k over nonzeros only
    int64_t run_cost = 0;
    int64_t run = 0;
    int64_t nz = 0;
    int64_t nz_cost[16] = {0};
    for (int64_t i = g; i < end; ++i) {
      if (codes[i] == 0) {
        ++run;
        continue;
      }
      run_cost += gamma_bits(static_cast<uint32_t>(run) + 1u);
      run = 0;
      ++nz;
      uint32_t um1 = zigzag(codes[i]) - 1u;
      for (int k = 0; k < 16; ++k) nz_cost[k] += rice_cost(um1, k);
    }
    if (run > 0) run_cost += gamma_bits(static_cast<uint32_t>(run) + 1u);
    int rle_k = 0;
    int64_t rle_best = INT64_MAX;
    for (int k = 0; k < 16; ++k) {
      if (nz_cost[k] < rle_best) {
        rle_best = nz_cost[k];
        rle_k = k;
      }
    }
    int64_t rle_cost = run_cost + (nz ? rle_best : 0);

    if (rle_cost < plain_cost) {
      w.put_bits(static_cast<uint64_t>(rle_k), 4);
      w.put_bit(1);
      int64_t i = g;
      while (i < end) {
        int64_t r0 = i;
        while (i < end && codes[i] == 0) ++i;
        put_gamma(w, static_cast<uint32_t>(i - r0) + 1u);
        if (i < end) {
          put_rice(w, zigzag(codes[i]) - 1u, rle_k);
          ++i;
        }
      }
      // alternation invariant: a (possibly zero-length) run token
      // precedes EVERY value and one final run token covers trailing
      // zeros; the decoder stops at the group boundary, so a group
      // ending in a nonzero needs no trailing token
    } else {
      w.put_bits(static_cast<uint64_t>(plain_k), 4);
      w.put_bit(0);
      for (int64_t i = g; i < end; ++i) put_rice(w, zigzag(codes[i]), plain_k);
    }
  }
  return w.finish();
}

int32_t acx_rrice_decode(const uint8_t* in, int64_t len, int32_t* codes,
                         int64_t n, int64_t group) {
  BitReader r{in, len};
  bool bad = false;
  for (int64_t g = 0; g < n; g += group) {
    int64_t end = g + group < n ? g + group : n;
    int k = static_cast<int>(r.get_bits(4));
    uint32_t mode = r.get_bit();
    if (r.underflow) return -2;
    if (mode == 0u) {
      for (int64_t i = g; i < end; ++i) {
        uint32_t u = get_rice(r, k, &bad);
        if (bad) return -2;
        codes[i] = unzigzag(u);
      }
    } else {
      int64_t i = g;
      while (i < end) {
        uint32_t runp1 = get_gamma(r, &bad);
        if (bad || runp1 == 0u) return -2;
        int64_t run = static_cast<int64_t>(runp1) - 1;
        if (run > end - i) return -2;
        for (int64_t z = 0; z < run; ++z) codes[i++] = 0;
        if (i < end) {
          uint32_t um1 = get_rice(r, k, &bad);
          if (bad) return -2;
          codes[i++] = unzigzag(um1 + 1u);
        }
      }
    }
    if (r.underflow) return -2;
  }
  return 0;
}

}  // extern "C"
