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

}  // extern "C"
