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


static inline void p4_cmov(P4& r, const P4& a, __mmask8 m) {
  for (int i = 0; i < 5; ++i)
    r.c.v[i] = _mm256_mask_mov_epi64(r.c.v[i], m, a.c.v[i]);
}

// negate lanes X (0) and T (3): 16p - v, then carry back to mul-safe
static inline void p4_neg(P4& r, const P4& p) {
  for (int i = 0; i < 5; ++i) {
    const __m256i negv = _mm256_sub_epi64(bias_limb(i), p.c.v[i]);
    r.c.v[i] = _mm256_mask_mov_epi64(p.c.v[i], 0x9, negv);
  }
  fe4_carry(r.c);
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
  if (n < 32) return 0;  // small effective size: the scalar backend's
                         // joint-Straus wNAF path beats paired Pippenger

  const int c = n < 32 ? 4 : (n < 256 ? 6 : (n < 1024 ? 7 : (n < 8192 ? 9 : (n < 32768 ? 11 : 13))));
  const int nwin = (253 + c - 1) / c + 1;
  const size_t nbuckets = ((size_t)1 << (c - 1)) + 1;  // signed digits: |d|
  std::vector<int32_t> digits((size_t)nwin * n);
  for (size_t i = 0; i < n; ++i)
    sc_signed_windows(scs[i], c, nwin, &digits[(size_t)nwin * i]);
  // Paired-window accumulation: windows (w1, w0) run in the two 512-bit
  // half-lanes end to end.  Point i's stream adds target DIFFERENT bucket
  // arrays, so P8 pairs never conflict; the two suffix-sum reductions are
  // independent chains and pair as well.  Buckets start at identity
  // (complete formulas), so there is no first-touch case.  The final
  // combine is the usual Horner walk acc = (acc*2^c + W_w1)*2^c + W_w0.
  std::vector<P4> bucketsA(nbuckets), bucketsB(nbuckets);
  const P4 id4 = p4_identity();
  std::vector<P4> wsum(nwin, id4);

  int w = nwin - 1;
  if (nwin & 1) {
    // odd window count: top window runs unpaired (its digits are the
    // scalar's top bits -- mostly tiny)
    std::fill(bucketsA.begin(), bucketsA.end(), id4);
    size_t hi = 0;
    for (size_t i = 0; i < n; ++i) {
      const int32_t dg = digits[(size_t)nwin * i + w];
      if (!dg) continue;
      const size_t digit = (size_t)(dg > 0 ? dg : -dg);
      P4 pv;
      if (dg < 0) p4_neg(pv, pts[i]); else pv = pts[i];
      p4_add(bucketsA[digit], bucketsA[digit], pv);
      if (digit > hi) hi = digit;
    }
    P4 running = id4, windowsum = id4;
    for (size_t b = hi; b >= 1; --b) {
      p4_add(running, running, bucketsA[b]);
      p4_add(windowsum, windowsum, running);
    }
    wsum[w] = windowsum;
    --w;
  }
  for (; w >= 1; w -= 2) {
    const int w1 = w, w0 = w - 1;
    std::fill(bucketsA.begin(), bucketsA.end(), id4);
    std::fill(bucketsB.begin(), bucketsB.end(), id4);
    size_t hiA = 0, hiB = 0;
    for (size_t i = 0; i < n; ++i) {
      const int32_t d1 = digits[(size_t)nwin * i + w1];
      const int32_t d0 = digits[(size_t)nwin * i + w0];
      if (d1 && d0) {
        const size_t m1 = (size_t)(d1 > 0 ? d1 : -d1);
        const size_t m0 = (size_t)(d0 > 0 ? d0 : -d0);
        P4 pa, pb;
        if (d1 < 0) p4_neg(pa, pts[i]); else pa = pts[i];
        if (d0 < 0) p4_neg(pb, pts[i]); else pb = pts[i];
        P8 B = p8_pack(bucketsA[m1], bucketsB[m0]);
        const P8 P = p8_pack(pa, pb);
        p8_add(B, B, P);
        p8_unpack(B, bucketsA[m1], bucketsB[m0]);
        if (m1 > hiA) hiA = m1;
        if (m0 > hiB) hiB = m0;
      } else if (d1) {
        const size_t m1 = (size_t)(d1 > 0 ? d1 : -d1);
        P4 pv;
        if (d1 < 0) p4_neg(pv, pts[i]); else pv = pts[i];
        p4_add(bucketsA[m1], bucketsA[m1], pv);
        if (m1 > hiA) hiA = m1;
      } else if (d0) {
        const size_t m0 = (size_t)(d0 > 0 ? d0 : -d0);
        P4 pv;
        if (d0 < 0) p4_neg(pv, pts[i]); else pv = pts[i];
        p4_add(bucketsB[m0], bucketsB[m0], pv);
        if (m0 > hiB) hiB = m0;
      }
    }
    // paired suffix-sum reduction over b = max(hiA, hiB) .. 1; identity
    // buckets are value-neutral under the complete formulas
    const size_t hi = hiA > hiB ? hiA : hiB;
    if (!hi) continue;
    P8 running = p8_pack(id4, id4), windowsum = running;
    for (size_t b = hi; b >= 1; --b) {
      const P8 bk = p8_pack(bucketsA[b], bucketsB[b]);
      p8_add(running, running, bk);
      p8_add(windowsum, windowsum, running);
    }
    p8_unpack(windowsum, wsum[w1], wsum[w0]);
  }
  // Horner combine: acc = (acc * 2^c + W_k) walking down.  Doubling or
  // adding identity is correct under the complete formulas, so no
  // started-flag bookkeeping is needed (the top window is the only one
  // likely empty, costing c no-op doublings).
  P4 acc = id4;
  for (int k = nwin - 1; k >= 0; --k) {
    for (int d = 0; d < c; ++d) p4_add(acc, acc, acc);
    p4_add(acc, acc, wsum[k]);
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

// --- constant-time paths (see ristretto.cpp for the scalar versions) -------
// Same signed radix-16 Straus, but every point op runs on the 4-lane
// parallel formulas.  Selection is kmask blends on computed masks; no
// branch or load address depends on scalar data.

// r = [d]P from table [P..8P], scanning every entry
static inline void p4_select_signed(P4& r, const P4 table[8], int8_t d) {
  const uint8_t ud = (uint8_t)d;
  const uint8_t neg = ud >> 7;
  const uint8_t mag = (uint8_t)((ud ^ (uint8_t)(0 - neg)) + neg);
  r = p4_identity();
  for (uint32_t j = 1; j <= 8; ++j) {
    const uint32_t x = j ^ (uint32_t)mag;
    const __mmask8 m = (__mmask8)(0 - (uint8_t)((x - 1) >> 31));
    p4_cmov(r, table[j - 1], m);
  }
  P4 negp;
  p4_neg(negp, r);
  p4_cmov(r, negp, (__mmask8)(0 - neg));
}

// negate lanes X/T of BOTH halves (the P8 analog of p4_neg)
static inline void p8_neg_both(P8& r, const P8& p) {
  for (int i = 0; i < 5; ++i) {
    const __m512i negv = _mm512_sub_epi64(bias_limb8(i), p.c.v[i]);
    r.c.v[i] = _mm512_mask_mov_epi64(p.c.v[i], 0x99, negv);
  }
  fe8_carry(r.c);
}

static inline void p8_cmov(P8& r, const P8& a, __mmask8 m) {
  for (int i = 0; i < 5; ++i)
    r.c.v[i] = _mm512_mask_mov_epi64(r.c.v[i], m, a.c.v[i]);
}

// paired table select: half a gets [da]*P_a, half b gets [db]*P_b, from a
// pre-paired table [P_pair, 2P_pair, .., 8P_pair]; branchless in both
// digits (per-half kmask blends)
static inline void p8_select_signed2(P8& r, const P8 table[8], const P8& id8,
                                     int8_t da, int8_t db) {
  const uint8_t uda = (uint8_t)da, udb = (uint8_t)db;
  const uint8_t nega = uda >> 7, negb = udb >> 7;
  const uint8_t maga = (uint8_t)((uda ^ (uint8_t)(0 - nega)) + nega);
  const uint8_t magb = (uint8_t)((udb ^ (uint8_t)(0 - negb)) + negb);
  r = id8;
  for (uint32_t j = 1; j <= 8; ++j) {
    const uint32_t xa = j ^ (uint32_t)maga;
    const uint32_t xb = j ^ (uint32_t)magb;
    const uint8_t ma = (uint8_t)(0 - (uint8_t)((xa - 1) >> 31)) & 0x0F;
    const uint8_t mb = (uint8_t)(0 - (uint8_t)((xb - 1) >> 31)) & 0xF0;
    p8_cmov(r, table[j - 1], (__mmask8)(ma | mb));
  }
  P8 negp;
  p8_neg_both(negp, r);
  const __mmask8 mn = (__mmask8)(
      (0x0F & (uint8_t)(0 - nega)) | (0xF0 & (uint8_t)(0 - negb)));
  p8_cmov(r, negp, mn);
}

// Consttime Straus with point pairs in the two 512-bit half-lanes: two
// accumulators (even/odd points) run the same doubling schedule and merge
// at the end -- sum_i [s_i]P_i = sum_even + sum_odd.  Table build, digit
// selection, and accumulation all pair; an odd tail point rides half a
// with identity in half b.
static void msm_ct_core_ifma(size_t n, const uint8_t* scalars, const P4* pts,
                             P4& out) {
  const size_t np = n / 2;
  const bool odd = (n & 1) != 0;
  const P4 id4 = p4_identity();
  const P8 id8 = p8_pack(id4, id4);
  std::vector<P8> table(np * 8);
  P4 tail_table[8];
  std::vector<int8_t> digits(n * 64);
  for (size_t k = 0; k < np; ++k) {
    P8* t = &table[8 * k];
    const P8 base = p8_pack(pts[2 * k], pts[2 * k + 1]);
    t[0] = base;
    for (int j = 1; j < 8; ++j) p8_add(t[j], t[j - 1], base);
  }
  if (odd) {
    tail_table[0] = pts[n - 1];
    for (int j = 1; j < 8; ++j)
      p4_add(tail_table[j], tail_table[j - 1], pts[n - 1]);
  }
  for (size_t i = 0; i < n; ++i)
    sc_radix16_signed(&digits[64 * i], scalars + 32 * i);

  P8 acc = id8;
  P8 sel;
  P4 sel4;
  for (int d = 63; d >= 0; --d) {
    p8_add(acc, acc, acc);
    p8_add(acc, acc, acc);
    p8_add(acc, acc, acc);
    p8_add(acc, acc, acc);
    for (size_t k = 0; k < np; ++k) {
      p8_select_signed2(sel, &table[8 * k], id8,
                        digits[64 * (2 * k) + d],
                        digits[64 * (2 * k + 1) + d]);
      p8_add(acc, acc, sel);
    }
    if (odd) {
      p4_select_signed(sel4, tail_table, digits[64 * (n - 1) + d]);
      p8_add(acc, acc, p8_pack(sel4, id4));
    }
  }
  P4 a, b;
  p8_unpack(acc, a, b);
  p4_add(out, a, b);
}

int rist_msm_ct_ifma(size_t n, const uint8_t* scalars, const uint8_t* points,
                     uint8_t out[128]) {
  if (!cpu_ok()) return 0;
  if (n == 0) {
    ge_to_ext_bytes(out, GE_IDENTITY);
    return 1;
  }
  std::vector<P4> pts(n);
  Ge g;
  for (size_t i = 0; i < n; ++i) {
    ge_from_ext_bytes(g, points + 128 * i);
    pts[i] = p4_from_ge(g);
  }
  P4 acc;
  msm_ct_core_ifma(n, scalars, pts.data(), acc);
  Ge res;
  p4_to_ge(res, acc);
  ge_to_ext_bytes(out, res);
  return 1;
}

int rist_bit_commit_ifma(size_t n, uint64_t v, const uint8_t* Gs,
                         const uint8_t* Hs, const uint8_t blind[32],
                         const uint8_t Bb[128], uint8_t out[128]) {
  if (!cpu_ok()) return 0;
  Ge g;
  ge_from_ext_bytes(g, Bb);
  P4 bpt = p4_from_ge(g);
  P4 acc;
  msm_ct_core_ifma(1, blind, &bpt, acc);
  // pair the bit-selected terms: lanes a/b carry bits i and i+1
  const P4 id4 = p4_identity();
  P8 acc8 = p8_pack(acc, id4);
  P4 sela, selb, negh;
  auto select_term = [&](size_t i, P4& sel) {
    ge_from_ext_bytes(g, Hs + 128 * i);
    p4_neg(negh, p4_from_ge(g));
    ge_from_ext_bytes(g, Gs + 128 * i);
    const P4 gp = p4_from_ge(g);
    sel = negh;
    p4_cmov(sel, gp, (__mmask8)(0 - (uint8_t)((v >> i) & 1)));
  };
  size_t i = 0;
  for (; i + 1 < n; i += 2) {
    select_term(i, sela);
    select_term(i + 1, selb);
    p8_add(acc8, acc8, p8_pack(sela, selb));
  }
  if (i < n) {
    select_term(i, sela);
    p8_add(acc8, acc8, p8_pack(sela, id4));
  }
  P4 lo, hi;
  p8_unpack(acc8, lo, hi);
  p4_add(acc, lo, hi);
  Ge res;
  p4_to_ge(res, acc);
  ge_to_ext_bytes(out, res);
  return 1;
}

// Batched ristretto decode with the invsqrt exponentiation running four
// points per vector op (element-parallel Fe4 lanes); prep and finish stay
// scalar (fe255::rist_decode_prep/finish).  Returns the number of valid
// encodings, or -1 when the CPU lacks IFMA (caller falls back).
int rist_batch_decompress_ifma(size_t n, const uint8_t* in, uint8_t* out,
                               uint8_t* ok) {
  if (!cpu_ok()) return -1;
  int good = 0;
  Ge g;
  size_t i = 0;
  for (; i + 8 <= n; i += 8) {
    Fe s[8], u1[8], u2[8], v[8], vu[8];
    bool pre[8];
    for (int k = 0; k < 8; ++k) {
      pre[k] = rist_decode_prep(in + 32 * (i + k), s[k], u1[k], u2[k],
                                v[k], vu[k]);
      if (!pre[k]) vu[k] = FE_ONE;  // keep the lane harmless
    }
    const Fe8 vu8 = fe8_from8(vu);
    Fe8 v3, v7, t, r8;
    fe8_sq(v3, vu8);
    fe8_mul(v3, v3, vu8);
    fe8_sq(v7, v3);
    fe8_mul(v7, v7, vu8);
    fe8_pow22523(t, v7);
    fe8_mul(r8, t, v3);
    Fe rr[8];
    fe8_to8(r8, rr);
    for (int k = 0; k < 8; ++k) {
      bool okk = pre[k] && rist_decode_finish(s[k], u1[k], u2[k], v[k],
                                              vu[k], rr[k], g);
      if (okk) {
        ge_to_ext_bytes(out + 128 * (i + k), g);
        ok[i + k] = 1;
        ++good;
      } else {
        ge_to_ext_bytes(out + 128 * (i + k), GE_IDENTITY);
        ok[i + k] = 0;
      }
    }
  }
  for (; i < n; ++i) {
    if (rist_decode(g, in + 32 * i)) {
      ge_to_ext_bytes(out + 128 * i, g);
      ok[i] = 1;
      ++good;
    } else {
      ge_to_ext_bytes(out + 128 * i, GE_IDENTITY);
      ok[i] = 0;
    }
  }
  return good;
}

}  // extern "C"

#else  // no IFMA at compile time: stubs that force the scalar fallback

extern "C" {
int rist_msm_ifma(size_t, const uint8_t*, const uint8_t*, uint8_t*) { return 0; }
int rist_scalar_mul_ifma(const uint8_t*, const uint8_t*, uint8_t*) { return 0; }
int rist_fold_ifma(size_t, const uint8_t*, const uint8_t*, const uint8_t*,
                   uint8_t*) { return 0; }
int rist_msm_ct_ifma(size_t, const uint8_t*, const uint8_t*, uint8_t*) {
  return 0;
}
int rist_bit_commit_ifma(size_t, uint64_t, const uint8_t*, const uint8_t*,
                         const uint8_t*, const uint8_t*, uint8_t*) {
  return 0;
}
int rist_batch_decompress_ifma(size_t, const uint8_t*, uint8_t*, uint8_t*) {
  return -1;
}
}

#endif
