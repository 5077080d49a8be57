// IFMA-accelerated vartime Pippenger MSM and scalar-mul (see fe_ifma.h).
// Exposed as rist_*_ifma with a runtime CPU gate: callers (ristretto.cpp)
// try these first and fall back to the scalar u64 path.
#include "fe255.h"

#if defined(__AVX512IFMA__) && defined(__AVX512VL__)
#include "fe_ifma.h"

#include <vector>

using namespace fe255;
using namespace fe_ifma;

static bool cpu_ok() {
  static const bool ok = __builtin_cpu_supports("avx512ifma") &&
                         __builtin_cpu_supports("avx512vl");
  return ok;
}

extern "C" {

// returns 1 if handled, 0 if the CPU lacks IFMA (caller falls back)
int rist_msm_ifma(size_t n, const uint8_t* scalars, const uint8_t* points,
                  uint8_t out[128]) {
  if (!cpu_ok()) return 0;
  if (n == 0) {
    ge_to_ext_bytes(out, GE_IDENTITY);
    return 1;
  }
  std::vector<P4> pts;
  std::vector<const uint8_t*> scs;
  pts.reserve(n);
  scs.reserve(n);
  for (size_t i = 0; i < n; ++i) {
    const uint8_t* s = scalars + 32 * i;
    bool zero = true;
    for (int j = 0; j < 32; ++j)
      if (s[j]) { zero = false; break; }
    if (zero) continue;
    Ge g;
    ge_from_ext_bytes(g, points + 128 * i);
    pts.push_back(p4_from_ge(g));
    scs.push_back(s);
  }
  n = pts.size();
  if (n == 0) {
    ge_to_ext_bytes(out, GE_IDENTITY);
    return 1;
  }

  const int c = n < 32 ? 4 : (n < 1024 ? 6 : (n < 8192 ? 8 : (n < 32768 ? 10 : 12)));
  const int nwin = (253 + c - 1) / c;
  const size_t nbuckets = (size_t)1 << c;
  std::vector<P4> buckets(nbuckets);
  std::vector<bool> used(nbuckets);

  P4 acc = p4_identity();
  bool acc_started = false;
  for (int w = nwin - 1; w >= 0; --w) {
    if (acc_started)
      for (int d = 0; d < c; ++d) p4_add(acc, acc, acc);
    std::fill(used.begin(), used.end(), false);
    size_t hi = 0;
    const int bit0 = w * c;
    for (size_t i = 0; i < n; ++i) {
      const uint8_t* s = scs[i];
      const int byte0 = bit0 >> 3, shift = bit0 & 7;
      uint32_t window = s[byte0] >> shift;
      if (byte0 + 1 < 32) window |= (uint32_t)s[byte0 + 1] << (8 - shift);
      if (shift > 0 && byte0 + 2 < 32) window |= (uint32_t)s[byte0 + 2] << (16 - shift);
      const size_t digit = window & (nbuckets - 1);
      if (!digit) continue;
      if (used[digit]) p4_add(buckets[digit], buckets[digit], pts[i]);
      else { buckets[digit] = pts[i]; used[digit] = true; }
      if (digit > hi) hi = digit;
    }
    if (!hi) continue;
    P4 running, windowsum;
    bool run_started = false, win_started = false;
    for (size_t b = hi; b >= 1; --b) {
      if (used[b]) {
        if (run_started) p4_add(running, running, buckets[b]);
        else { running = buckets[b]; run_started = true; }
      }
      if (run_started) {
        if (win_started) p4_add(windowsum, windowsum, running);
        else { windowsum = running; win_started = true; }
      }
    }
    if (win_started) {
      if (acc_started) p4_add(acc, acc, windowsum);
      else { acc = windowsum; acc_started = true; }
    }
  }
  Ge res;
  p4_to_ge(res, acc);
  ge_to_ext_bytes(out, res);
  return 1;
}

int rist_scalar_mul_ifma(const uint8_t pt[128], const uint8_t sc[32],
                         uint8_t out[128]) {
  if (!cpu_ok()) return 0;
  Ge g;
  ge_from_ext_bytes(g, pt);
  P4 base = p4_from_ge(g);
  P4 table[16];
  table[0] = p4_identity();
  table[1] = base;
  for (int i = 2; i < 16; ++i) p4_add(table[i], table[i - 1], base);
  P4 r = p4_identity();
  bool started = false;
  for (int i = 63; i >= 0; --i) {
    const int digit = (sc[i >> 1] >> ((i & 1) * 4)) & 0xF;
    if (started) {
      p4_add(r, r, r); p4_add(r, r, r); p4_add(r, r, r); p4_add(r, r, r);
    }
    if (digit) {
      if (!started) { r = table[digit]; started = true; }
      else p4_add(r, r, table[digit]);
    }
  }
  Ge res;
  p4_to_ge(res, r);
  ge_to_ext_bytes(out, res);
  return 1;
}

// out[i] = a[i] + x * b[i]
int rist_fold_ifma(size_t n, const uint8_t* a_pts, const uint8_t* b_pts,
                   const uint8_t sc[32], uint8_t* out) {
  if (!cpu_ok()) return 0;
  for (size_t i = 0; i < n; ++i) {
    uint8_t xb[128];
    rist_scalar_mul_ifma(b_pts + 128 * i, sc, xb);
    Ge a, x, r;
    ge_from_ext_bytes(a, a_pts + 128 * i);
    ge_from_ext_bytes(x, xb);
    ge_add(r, a, x);
    ge_to_ext_bytes(out + 128 * i, r);
  }
  return 1;
}

}  // extern "C"

#else  // no IFMA at compile time: stubs that force the scalar fallback

extern "C" {
int rist_msm_ifma(size_t, const uint8_t*, const uint8_t*, uint8_t*) { return 0; }
int rist_scalar_mul_ifma(const uint8_t*, const uint8_t*, uint8_t*) { return 0; }
int rist_fold_ifma(size_t, const uint8_t*, const uint8_t*, const uint8_t*,
                   uint8_t*) { return 0; }
}

#endif
