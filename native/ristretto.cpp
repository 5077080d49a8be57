// C ABI for the host-tier ristretto255 backend (fe255.h): point codecs,
// scalar mul, vartime Pippenger MSM, and the batch helpers used by the
// protocol layers.  This replaces pure-Python big-int point math on the
// sequential host paths (single-proof provers/verifiers, MPC parties,
// generator derivation) -- the role curve25519-dalek plays for the
// reference (SURVEY.md §2b).
//
// Boundary formats:
//   point  = 128 bytes: X, Y, Z, T as 32-byte little-endian field elements
//   scalar = 32 bytes little-endian (already reduced mod l by the caller;
//            reduction mod l only moves the result within its ristretto
//            coset, which encode/equality quotient out)
#include "fe255.h"

#include <vector>

using namespace fe255;

extern "C" {

// IFMA fast paths (ristretto_ifma.cpp); return 0 when unsupported.
int rist_msm_ifma(size_t n, const uint8_t* scalars, const uint8_t* points,
                  uint8_t out[128]);
int rist_scalar_mul_ifma(const uint8_t pt[128], const uint8_t sc[32],
                         uint8_t out[128]);
int rist_fold_ifma(size_t n, const uint8_t* a_pts, const uint8_t* b_pts,
                   const uint8_t sc[32], uint8_t* out);
int rist_msm_ct_ifma(size_t n, const uint8_t* scalars, const uint8_t* points,
                     uint8_t out[128]);
int rist_bit_commit_ifma(size_t n, uint64_t v, const uint8_t* Gs,
                         const uint8_t* Hs, const uint8_t blind[32],
                         const uint8_t Bb[128], uint8_t out[128]);
int rist_batch_decompress_ifma(size_t n, const uint8_t* in, uint8_t* out,
                               uint8_t* ok);

// width-5 NAF recode (vartime): digits odd in [-15, 15]; returns length.
// Scalars are < l < 2^253, so <= 255 digits (+1 carry slot).
static int sc_wnaf5(const uint8_t s[32], int8_t naf[256]) {
  uint64_t x[4];
  memcpy(x, s, 32);
  memset(naf, 0, 256);
  int i = 0, len = 0;
  while (x[0] | x[1] | x[2] | x[3]) {
    if (x[0] & 1) {
      int d = (int)(x[0] & 31);
      if (d > 16) d -= 32;
      naf[i] = (int8_t)d;
      len = i + 1;
      // x -= d (d odd, |d| <= 15; when d < 0 this is x += |d|)
      if (d > 0) {
        uint64_t b = (uint64_t)d;
        for (int k = 0; k < 4; ++k) {
          uint64_t nv = x[k] - b;
          b = nv > x[k] ? 1 : 0;
          x[k] = nv;
        }
      } else {
        uint64_t cst = (uint64_t)(-d);
        for (int k = 0; k < 4 && cst; ++k) {
          uint64_t nv = x[k] + cst;
          cst = nv < x[k] ? 1 : 0;
          x[k] = nv;
        }
      }
    }
    // x >>= 1
    x[0] = (x[0] >> 1) | (x[1] << 63);
    x[1] = (x[1] >> 1) | (x[2] << 63);
    x[2] = (x[2] >> 1) | (x[3] << 63);
    x[3] >>= 1;
    ++i;
  }
  return len;
}

// Joint Straus over wNAF digits: one shared doubling chain, per-point odd
// multiple tables {P, 3P, .., 15P}.  For small n this beats Pippenger,
// whose per-window bucket reduction has an n-independent floor (the
// reference's dalek backend likewise switches Straus <-> Pippenger on
// size).  Callers pass compacted (nonzero-scalar) inputs.
static void rist_msm_straus(size_t n, const std::vector<Ge>& pts,
                            const std::vector<const uint8_t*>& scs, Ge& acc) {
  std::vector<Ge> table(n * 8);
  std::vector<int8_t> naf(n * 256);
  int maxlen = 0;
  for (size_t i = 0; i < n; ++i) {
    int len = sc_wnaf5(scs[i], &naf[256 * i]);
    if (len > maxlen) maxlen = len;
    Ge p2;
    ge_dbl(p2, pts[i]);
    table[8 * i] = pts[i];
    for (int k = 1; k < 8; ++k) ge_add(table[8 * i + k], table[8 * i + k - 1], p2);
  }
  acc = GE_IDENTITY;
  for (int j = maxlen - 1; j >= 0; --j) {
    ge_dbl(acc, acc);
    for (size_t i = 0; i < n; ++i) {
      int d = naf[256 * i + j];
      if (d > 0) {
        ge_add(acc, acc, table[8 * i + (d >> 1)]);
      } else if (d < 0) {
        Ge nn;
        ge_neg(nn, table[8 * i + ((-d) >> 1)]);
        ge_add(acc, acc, nn);
      }
    }
  }
}

// out = sum_i scalars[i] * points[i]; vartime bucketed Pippenger.
void rist_msm(size_t n, const uint8_t* scalars, const uint8_t* points,
              uint8_t out[128]) {
  if (rist_msm_ifma(n, scalars, points, out)) return;
  if (n == 0) {
    ge_to_ext_bytes(out, GE_IDENTITY);
    return;
  }
  // Compact away zero scalars: masked-basis callers (the IPP round loop)
  // pass half-zero coefficient vectors, and the window size must reflect
  // the EFFECTIVE point count or bucket reduction dominates.
  std::vector<Ge> pts;
  std::vector<const uint8_t*> scs;
  pts.reserve(n);
  scs.reserve(n);
  for (size_t i = 0; i < n; ++i) {
    const uint8_t* s = scalars + 32 * i;
    bool zero = true;
    for (int j = 0; j < 32; ++j)
      if (s[j]) { zero = false; break; }
    if (zero) continue;
    pts.emplace_back();
    ge_from_ext_bytes(pts.back(), points + 128 * i);
    scs.push_back(s);
  }
  n = pts.size();
  if (n == 0) {
    ge_to_ext_bytes(out, GE_IDENTITY);
    return;
  }
  if (n < 48) {
    Ge acc;
    rist_msm_straus(n, pts, scs, acc);
    ge_to_ext_bytes(out, acc);
    return;
  }

  // signed-digit windows: bucket by |d| (half the buckets of unsigned),
  // add P or -P by sign.  Window size balances stream adds (nwin*n)
  // against bucket reduction (nwin*2^c after halving).
  const int c = n < 32 ? 4 : (n < 256 ? 6 : (n < 1024 ? 7 : (n < 8192 ? 9 : (n < 32768 ? 11 : 13))));
  const int nwin = (253 + c - 1) / c + 1;
  const size_t nbuckets = ((size_t)1 << (c - 1)) + 1;  // |d| in 0..2^(c-1)
  std::vector<int32_t> digits((size_t)nwin * n);
  for (size_t i = 0; i < n; ++i)
    sc_signed_windows(scs[i], c, nwin, &digits[(size_t)nwin * i]);
  std::vector<Ge> buckets(nbuckets);
  std::vector<bool> used(nbuckets);

  Ge acc = GE_IDENTITY;
  bool acc_started = false;
  for (int w = nwin - 1; w >= 0; --w) {
    if (acc_started)
      for (int d = 0; d < c; ++d) ge_dbl(acc, acc);
    std::fill(used.begin(), used.end(), false);
    size_t hi = 0;
    for (size_t i = 0; i < n; ++i) {
      const int32_t dg = digits[(size_t)nwin * i + w];
      if (!dg) continue;
      const size_t digit = (size_t)(dg > 0 ? dg : -dg);
      Ge p;
      if (dg < 0) ge_neg(p, pts[i]); else p = pts[i];
      if (used[digit]) ge_add(buckets[digit], buckets[digit], p);
      else { buckets[digit] = p; used[digit] = true; }
      if (digit > hi) hi = digit;
    }
    if (!hi) continue;
    // windowsum = sum_b b * bucket[b] via running suffix sums
    Ge running, windowsum;
    bool run_started = false, win_started = false;
    for (size_t b = hi; b >= 1; --b) {
      if (used[b]) {
        if (run_started) ge_add(running, running, buckets[b]);
        else { running = buckets[b]; run_started = true; }
      }
      if (run_started) {
        if (win_started) ge_add(windowsum, windowsum, running);
        else { windowsum = running; win_started = true; }
      }
    }
    if (win_started) {
      if (acc_started) ge_add(acc, acc, windowsum);
      else { acc = windowsum; acc_started = true; }
    }
  }
  ge_to_ext_bytes(out, acc);
}

void rist_scalar_mul(const uint8_t pt[128], const uint8_t sc[32],
                     uint8_t out[128]) {
  if (rist_scalar_mul_ifma(pt, sc, out)) return;
  Ge p, r;
  ge_from_ext_bytes(p, pt);
  ge_scalar_mul(r, p, sc);
  ge_to_ext_bytes(out, r);
}

void rist_add(const uint8_t a[128], const uint8_t b[128], uint8_t out[128]) {
  Ge p, q, r;
  ge_from_ext_bytes(p, a);
  ge_from_ext_bytes(q, b);
  ge_add(r, p, q);
  ge_to_ext_bytes(out, r);
}

// out = sum of n points (dealer commitment sums)
void rist_sum(size_t n, const uint8_t* pts, uint8_t out[128]) {
  Ge acc = GE_IDENTITY;
  Ge p;
  for (size_t i = 0; i < n; ++i) {
    ge_from_ext_bytes(p, pts + 128 * i);
    ge_add(acc, acc, p);
  }
  ge_to_ext_bytes(out, acc);
}

// out[i] = a[i] + x * b[i]  (generator folds)
void rist_fold(size_t n, const uint8_t* a_pts, const uint8_t* b_pts,
               const uint8_t sc[32], uint8_t* out) {
  if (rist_fold_ifma(n, a_pts, b_pts, sc, out)) return;
  Ge a, b, xb;
  for (size_t i = 0; i < n; ++i) {
    ge_from_ext_bytes(a, a_pts + 128 * i);
    ge_from_ext_bytes(b, b_pts + 128 * i);
    ge_scalar_mul(xb, b, sc);
    ge_add(xb, a, xb);
    ge_to_ext_bytes(out + 128 * i, xb);
  }
}

void rist_compress(const uint8_t pt[128], uint8_t out[32]) {
  Ge p;
  ge_from_ext_bytes(p, pt);
  rist_encode(out, p);
}

int rist_decompress(const uint8_t in[32], uint8_t out[128]) {
  Ge p;
  if (!rist_decode(p, in)) return 0;
  ge_to_ext_bytes(out, p);
  return 1;
}

void rist_from_uniform_bytes(const uint8_t in[64], uint8_t out[128]) {
  Ge p;
  rist_from_uniform(p, in);
  ge_to_ext_bytes(out, p);
}

int rist_eq(const uint8_t a[128], const uint8_t b[128]) {
  Ge p, q;
  ge_from_ext_bytes(p, a);
  ge_from_ext_bytes(q, b);
  return ge_rist_eq(p, q) ? 1 : 0;
}

int rist_is_identity(const uint8_t a[128]) {
  Ge p;
  ge_from_ext_bytes(p, a);
  return ge_rist_eq(p, GE_IDENTITY) ? 1 : 0;
}

// ---------------------------------------------------------------------------
// Constant-time paths for witness-dependent commitments.  The reference
// prover uses consttime Straus (`MultiscalarMul`) for the bit/blinding
// commitments (src/range_proof/party.rs:102-124, src/generators.rs:39-41,
// src/r1cs/prover.rs:433-459) and vartime Pippenger only on public or
// already-blinded data.  These mirror that split: signed radix-16 Straus
// with branchless table selection over complete additions; no memory
// access or branch depends on scalar bits.

static inline void fe_cmov(Fe& r, const Fe& a, uint64_t mask) {
  for (int i = 0; i < 5; ++i) r.v[i] ^= mask & (r.v[i] ^ a.v[i]);
}

static inline void ge_cmov(Ge& r, const Ge& a, uint64_t mask) {
  fe_cmov(r.X, a.X, mask);
  fe_cmov(r.Y, a.Y, mask);
  fe_cmov(r.Z, a.Z, mask);
  fe_cmov(r.T, a.T, mask);
}

// r = [d]P from the table [P, 2P, .., 8P], scanning every entry.
static inline void ge_select_signed(Ge& r, const Ge table[8], int8_t d) {
  const uint8_t ud = (uint8_t)d;
  const uint8_t neg = ud >> 7;
  const uint8_t mag = (uint8_t)((ud ^ (uint8_t)(0 - neg)) + neg);
  r = GE_IDENTITY;
  for (uint32_t j = 1; j <= 8; ++j) {
    const uint32_t x = j ^ (uint32_t)mag;
    const uint64_t m = 0 - (uint64_t)((x - 1) >> 31);
    ge_cmov(r, table[j - 1], m);
  }
  Ge negp;
  ge_neg(negp, r);
  ge_cmov(r, negp, 0 - (uint64_t)neg);
}

static void msm_ct_core(size_t n, const uint8_t* scalars, const Ge* pts,
                        Ge& acc) {
  std::vector<Ge> table(n * 8);
  std::vector<int8_t> digits(n * 64);
  for (size_t i = 0; i < n; ++i) {
    Ge* t = &table[8 * i];
    t[0] = pts[i];
    for (int j = 1; j < 8; ++j) ge_add(t[j], t[j - 1], pts[i]);
    sc_radix16_signed(&digits[64 * i], scalars + 32 * i);
  }
  acc = GE_IDENTITY;
  Ge sel;
  for (int d = 63; d >= 0; --d) {
    ge_dbl(acc, acc);
    ge_dbl(acc, acc);
    ge_dbl(acc, acc);
    ge_dbl(acc, acc);
    for (size_t i = 0; i < n; ++i) {
      ge_select_signed(sel, &table[8 * i], digits[64 * i + d]);
      ge_add(acc, acc, sel);
    }
  }
}

// Constant-time MSM: out = sum_i scalars[i] * points[i].
void rist_msm_ct(size_t n, const uint8_t* scalars, const uint8_t* points,
                 uint8_t out[128]) {
  if (rist_msm_ct_ifma(n, scalars, points, out)) return;
  if (n == 0) {
    ge_to_ext_bytes(out, GE_IDENTITY);
    return;
  }
  std::vector<Ge> pts(n);
  for (size_t i = 0; i < n; ++i) ge_from_ext_bytes(pts[i], points + 128 * i);
  Ge acc;
  msm_ct_core(n, scalars, pts.data(), acc);
  ge_to_ext_bytes(out, acc);
}

// A_j = blind*B_tilde + sum_i (bit_i(v) ? G_i : -H_i), branchless in the
// value bits (reference party.rs:102-112 via subtle::ConditionallySelectable).
void rist_bit_commit(size_t n, uint64_t v, const uint8_t* Gs,
                     const uint8_t* Hs, const uint8_t blind[32],
                     const uint8_t Bb[128], uint8_t out[128]) {
  if (rist_bit_commit_ifma(n, v, Gs, Hs, blind, Bb, out)) return;
  Ge bpt;
  ge_from_ext_bytes(bpt, Bb);
  Ge acc;
  msm_ct_core(1, blind, &bpt, acc);
  Ge g, h, sel;
  for (size_t i = 0; i < n; ++i) {
    ge_from_ext_bytes(g, Gs + 128 * i);
    ge_from_ext_bytes(h, Hs + 128 * i);
    ge_neg(sel, h);
    const uint64_t m = 0 - ((v >> i) & 1);
    ge_cmov(sel, g, m);
    ge_add(acc, acc, sel);
  }
  ge_to_ext_bytes(out, acc);
}

// Per-row MSMs over one shared packed basis (the batch-prover stages off
// TPU): q rows of n 32-byte scalars against the same n packed points.
// Each row routes through the signed-digit Pippenger (IFMA when present).
void rist_msm_rows(size_t q, size_t n, const uint8_t* scalars,
                   const uint8_t* points, uint8_t* out) {
  for (size_t r = 0; r < q; ++r)
    rist_msm(n, scalars + 32 * n * r, points, out + 128 * r);
}

// Consttime variant of rist_msm_rows: witness-bearing coefficient rows
// (the batch prover's V/A/S and T1/T2 stages; the reference uses
// MultiscalarMul for these) run the paired consttime Straus per row.
void rist_msm_rows_ct(size_t q, size_t n, const uint8_t* scalars,
                      const uint8_t* points, uint8_t* out) {
  for (size_t r = 0; r < q; ++r)
    rist_msm_ct(n, scalars + 32 * n * r, points, out + 128 * r);
}

void rist_batch_compress(size_t n, const uint8_t* pts, uint8_t* out) {
  Ge p;
  for (size_t i = 0; i < n; ++i) {
    ge_from_ext_bytes(p, pts + 128 * i);
    rist_encode(out + 32 * i, p);
  }
}

// returns the number of valid encodings; ok[i] in {0,1} per point
int rist_batch_decompress(size_t n, const uint8_t* in, uint8_t* out,
                          uint8_t* ok) {
  const int ifma = rist_batch_decompress_ifma(n, in, out, ok);
  if (ifma >= 0) return ifma;
  Ge p;
  int good = 0;
  for (size_t i = 0; i < n; ++i) {
    if (rist_decode(p, in + 32 * i)) {
      ge_to_ext_bytes(out + 128 * i, p);
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
