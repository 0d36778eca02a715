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
//
// Performance notes (the wire format is unchanged from the original
// bit-at-a-time version — MSB-first bits, 4-bit k headers, identical
// escape rule; committed golden containers keep decoding):
// * Bit I/O runs through 64-bit accumulators: the writer emits each
//   Rice symbol (unary + stop + remainder, <= 63 bits) in at most three
//   shift-or-flush calls; the reader counts unary runs with one CLZ on
//   the refilled window instead of a per-bit loop.
// * The per-group Rice parameter uses the FLAC-style closed form
//   argmin_k n*(k+1) + sum(u)/2^k from ONE pass over the group
//   (the original looped 16 candidate k's over every value). The
//   estimate ignores escape overflow, which only ever costs a fraction
//   of a percent on heavy-tailed groups; any k decodes identically.
// Measured on this rig: ~6x encode, ~4x decode vs the per-bit version.

#include <cstdint>
#include <cstring>

namespace {

constexpr int kMaxQuotient = 47;  // cap; larger quotients escape to raw
constexpr int kEscape = kMaxQuotient + 1;

struct BitWriter {
  uint8_t* buf;
  int64_t cap;
  int64_t byte_pos = 0;
  uint64_t acc = 0;  // pending bits, LSB-aligned; nbits < 8 between calls
  int nbits = 0;
  bool overflow = false;

  // n <= 56 (with nbits < 8 the shift never drops pending bits)
  inline void put_bits(uint64_t v, int n) {
    if (overflow) return;
    acc = (acc << n) | (v & ((1ull << n) - 1ull));
    nbits += n;
    while (nbits >= 8) {
      nbits -= 8;
      if (byte_pos >= cap) {
        overflow = true;
        nbits &= 7;
        return;
      }
      buf[byte_pos++] = static_cast<uint8_t>(acc >> nbits);
    }
  }
  inline void put_ones(int q) {  // q one-bits (no stop bit)
    while (q > 32) {
      put_bits(0xFFFFFFFFull, 32);
      q -= 32;
    }
    if (q > 0) put_bits((1ull << q) - 1ull, q);
  }
  int64_t finish() {
    if (nbits) {
      if (byte_pos >= cap) {
        overflow = true;
      } else {
        buf[byte_pos++] = static_cast<uint8_t>(
            (acc & ((1ull << nbits) - 1ull)) << (8 - nbits));
      }
      nbits = 0;
    }
    if (overflow) return -1;
    return byte_pos;
  }
};

struct BitReader {
  const uint8_t* buf;
  int64_t len;
  int64_t byte_pos = 0;
  uint64_t acc = 0;  // low nbits hold unread bits (stale bits above them)
  int nbits = 0;
  bool underflow = false;

  inline void refill() {
    while (nbits <= 56 && byte_pos < len) {
      acc = (acc << 8) | buf[byte_pos++];
      nbits += 8;
    }
  }
  inline uint64_t get_bits(int n) {  // n <= 56
    if (nbits < n) refill();
    if (nbits < n) {
      underflow = true;
      int have = nbits;
      uint64_t v = have ? (acc & ((1ull << have) - 1ull)) << (n - have) : 0;
      nbits = 0;
      return v;  // zero-padded, matching the per-bit reader's behavior
    }
    nbits -= n;
    return (acc >> nbits) & ((1ull << n) - 1ull);
  }
  // Count leading one-bits up to a stop 0 (consumed); *bad on underflow
  // or a run past `limit` (corrupt stream guard).
  inline uint32_t get_unary_ones(uint32_t limit, bool* bad) {
    uint32_t q = 0;
    for (;;) {
      if (nbits == 0) refill();
      if (nbits == 0) {
        underflow = true;
        *bad = true;
        return 0;
      }
      // valid bits MSB-aligned; below them the window is zero, so a
      // stop bit is always found within the window when present
      uint64_t window = acc << (64 - nbits);
      int ones = ~window ? __builtin_clzll(~window) : 64;
      if (ones >= nbits) {
        q += static_cast<uint32_t>(nbits);
        nbits = 0;
      } else {
        q += static_cast<uint32_t>(ones);
        nbits -= ones + 1;  // consume the run and the stop bit
        if (q > limit) {
          *bad = true;
          return 0;
        }
        return q;
      }
      if (q > limit) {
        *bad = true;
        return 0;
      }
    }
  }
  // Count leading zero-bits up to a stop 1 (consumed) — Elias gamma.
  inline uint32_t get_unary_zeros(uint32_t limit, bool* bad) {
    uint32_t z = 0;
    for (;;) {
      if (nbits == 0) refill();
      if (nbits == 0) {
        underflow = true;
        *bad = true;
        return 0;
      }
      uint64_t window = acc << (64 - nbits);
      int zeros = window ? __builtin_clzll(window) : 64;
      if (zeros >= nbits) {
        z += static_cast<uint32_t>(nbits);
        nbits = 0;
      } else {
        z += static_cast<uint32_t>(zeros);
        nbits -= zeros + 1;  // consume the zeros and the stop 1
        if (z > limit) {
          *bad = true;
          return 0;
        }
        return z;
      }
      if (z > limit) {
        *bad = true;
        return 0;
      }
    }
  }
};

inline uint32_t zigzag(int32_t v) {
  return (static_cast<uint32_t>(v) << 1) ^ static_cast<uint32_t>(v >> 31);
}
inline int32_t unzigzag(uint32_t u) {
  return static_cast<int32_t>((u >> 1) ^ (~(u & 1) + 1));
}

// FLAC-style closed-form parameter choice: one pass gave sum(u); pick
// argmin_k count*(k+1) + sum/2^k. Escape overflow is ignored (rare,
// bounded); any k decodes identically.
inline int best_k_from_sum(uint64_t sum, int64_t count) {
  int best_k = 0;
  int64_t best_cost = INT64_MAX;
  for (int k = 0; k < 16; ++k) {
    int64_t cost = count * (k + 1) + static_cast<int64_t>(sum >> k);
    if (cost < best_cost) {
      best_cost = cost;
      best_k = k;
    }
  }
  return best_k;
}

// Estimated group bits at parameter k (same model as best_k_from_sum).
inline int64_t est_cost(uint64_t sum, int64_t count, int k) {
  return count * (k + 1) + static_cast<int64_t>(sum >> k);
}

// Elias gamma bit length of x >= 1.
inline int gamma_bits(uint32_t x) {
  int n = 31 - __builtin_clz(x);
  return 2 * n + 1;
}

inline void put_gamma(BitWriter& w, uint32_t x) {
  int n = 31 - __builtin_clz(x);
  // n zeros then x's n+1 bits MSB-first == x written as 2n+1 bits
  if (2 * n + 1 <= 56) {
    w.put_bits(x, 2 * n + 1);
  } else {
    w.put_bits(0, n);
    w.put_bits(x, n + 1);
  }
}

inline uint32_t get_gamma(BitReader& r, bool* bad) {
  uint32_t n = r.get_unary_zeros(31, bad);
  if (*bad) return 0;
  uint32_t x = 1;
  if (n) x = (1u << n) | static_cast<uint32_t>(r.get_bits(static_cast<int>(n)));
  return x;
}

// Rice code one value at parameter k (shared by both modes).
inline void put_rice(BitWriter& w, uint32_t u, int k) {
  uint32_t q = u >> k;
  if (q >= static_cast<uint32_t>(kMaxQuotient)) {
    w.put_ones(kEscape);
    w.put_bits(static_cast<uint64_t>(u), 33);  // stop 0 + 32 raw bits
  } else {
    w.put_ones(static_cast<int>(q));
    // stop 0 + k remainder bits
    w.put_bits(static_cast<uint64_t>(u) & ((1ull << k) - 1ull), k + 1);
  }
}

inline uint32_t get_rice(BitReader& r, int k, bool* bad) {
  uint32_t q = r.get_unary_ones(static_cast<uint32_t>(kEscape), bad);
  if (*bad) return 0;
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
    uint64_t sum = 0;
    for (int64_t i = g; i < end; ++i) sum += zigzag(codes[i]);
    int best_k = best_k_from_sum(sum, end - g);
    w.put_bits(static_cast<uint64_t>(best_k), 4);
    for (int64_t i = g; i < end; ++i) put_rice(w, zigzag(codes[i]), best_k);
  }
  return w.finish();
}

int32_t acx_rice_decode(const uint8_t* in, int64_t len, int32_t* codes,
                        int64_t n, int64_t group) {
  BitReader r{in, len};
  bool bad = false;
  for (int64_t g = 0; g < n; g += group) {
    int64_t end = g + group < n ? g + group : n;
    int k = static_cast<int>(r.get_bits(4));
    for (int64_t i = g; i < end; ++i) {
      uint32_t u = get_rice(r, k, &bad);
      if (bad) return -2;
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

    // ONE pass: plain-mode zigzag sum, rle-mode gamma run bits + the
    // nonzero magnitudes' (u-1) sum
    uint64_t plain_sum = 0;
    int64_t run_cost = 0;
    int64_t run = 0;
    int64_t nz = 0;
    uint64_t nz_sum = 0;
    for (int64_t i = g; i < end; ++i) {
      uint32_t u = zigzag(codes[i]);
      plain_sum += u;
      if (u == 0) {
        ++run;
        continue;
      }
      run_cost += gamma_bits(static_cast<uint32_t>(run) + 1u);
      run = 0;
      ++nz;
      nz_sum += u - 1u;
    }
    if (run > 0) run_cost += gamma_bits(static_cast<uint32_t>(run) + 1u);

    int plain_k = best_k_from_sum(plain_sum, end - g);
    int rle_k = nz ? best_k_from_sum(nz_sum, nz) : 0;
    int64_t plain_cost = est_cost(plain_sum, end - g, plain_k);
    int64_t rle_cost = run_cost + (nz ? est_cost(nz_sum, nz, rle_k) : 0);

    if (rle_cost < plain_cost) {
      w.put_bits(static_cast<uint64_t>(rle_k), 4);
      w.put_bits(1, 1);
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
      w.put_bits(0, 1);
      for (int64_t i = g; i < end; ++i) put_rice(w, zigzag(codes[i]), plain_k);
    }
  }
  return w.finish();
}

// ---- LPC predictor filters (lossless.py level-2 "max" tier) ----------------
//
// FLAC-style quantized-LPC prediction: pred[t] = (sum_j qcoef[j] *
// x[t-1-j]) >> shift with an int64 accumulator (a 15-bit coefficient
// times a 25-bit mid/side sample times order 32 needs ~45 bits — the
// reason this runs in C++ and not in the no-x64 JAX default). The
// first `p` warmup slots store x[0] raw and first differences, so every
// frame remains self-contained (no neighbor context), matching the
// fixed-predictor frames' decode independence.
//
// Batched over frames*channels: x/res are [frames, n, channels] in
// C-order sample-major per frame; qcoef is [frames, p, channels].
// Returns 0, or -1 on invalid args.

static inline int64_t sar64(int64_t v, int s) {
  // arithmetic shift right, defined for negative v
  return v >> s;
}

int32_t acx_lpc_residual(const int32_t* x, int64_t frames, int64_t n,
                         int64_t channels, const int32_t* qcoef, int64_t p,
                         int32_t shift, int32_t* res) {
  if (p < 1 || p > 32 || shift < 0 || shift > 31 || n <= p) return -1;
  for (int64_t f = 0; f < frames; ++f) {
    for (int64_t c = 0; c < channels; ++c) {
      const int32_t* xf = x + (f * n) * channels + c;
      const int32_t* cf = qcoef + (f * p) * channels + c;
      int32_t* rf = res + (f * n) * channels + c;
      rf[0] = xf[0];
      for (int64_t t = 1; t < p; ++t)
        rf[t * channels] = xf[t * channels] - xf[(t - 1) * channels];
      for (int64_t t = p; t < n; ++t) {
        int64_t acc = 0;
        for (int64_t j = 0; j < p; ++j)
          acc += static_cast<int64_t>(cf[j * channels]) *
                 static_cast<int64_t>(xf[(t - 1 - j) * channels]);
        rf[t * channels] = static_cast<int32_t>(
            static_cast<int64_t>(xf[t * channels]) - sar64(acc, shift));
      }
    }
  }
  return 0;
}

int32_t acx_lpc_reconstruct(const int32_t* res, int64_t frames, int64_t n,
                            int64_t channels, const int32_t* qcoef, int64_t p,
                            int32_t shift, int32_t* x) {
  if (p < 1 || p > 32 || shift < 0 || shift > 31 || n <= p) return -1;
  for (int64_t f = 0; f < frames; ++f) {
    for (int64_t c = 0; c < channels; ++c) {
      const int32_t* rf = res + (f * n) * channels + c;
      const int32_t* cf = qcoef + (f * p) * channels + c;
      int32_t* xf = x + (f * n) * channels + c;
      xf[0] = rf[0];
      for (int64_t t = 1; t < p; ++t)
        xf[t * channels] = xf[(t - 1) * channels] + rf[t * channels];
      for (int64_t t = p; t < n; ++t) {
        int64_t acc = 0;
        for (int64_t j = 0; j < p; ++j)
          acc += static_cast<int64_t>(cf[j * channels]) *
                 static_cast<int64_t>(xf[(t - 1 - j) * channels]);
        // int64 sum then cast: tampered coefficients can push the
        // prediction past int32 and a plain int32 add would be UB; the
        // cast wraps and the caller's bit-depth bounds check rejects it
        xf[t * channels] = static_cast<int32_t>(
            static_cast<int64_t>(rf[t * channels]) + sar64(acc, shift));
      }
    }
  }
  return 0;
}

int32_t acx_rrice_decode(const uint8_t* in, int64_t len, int32_t* codes,
                         int64_t n, int64_t group) {
  BitReader r{in, len};
  bool bad = false;
  for (int64_t g = 0; g < n; g += group) {
    int64_t end = g + group < n ? g + group : n;
    int k = static_cast<int>(r.get_bits(4));
    uint32_t mode = static_cast<uint32_t>(r.get_bits(1));
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
