// GF(2^255-19) field + extended twisted Edwards / ristretto255 point ops for
// the host tier (5x51-bit limbs, __int128 accumulators).  This is the
// native-performance equivalent of the reference's curve25519-dalek u64
// backend (SURVEY.md §2b) for the *sequential* host paths: single-proof
// provers/verifiers, MPC parties, generator derivation.  The wide batched
// compute path stays on TPU (bulletproofs_tpu/ops).
//
// Header-only; all functions static/inline so each TU gets its own copy.
#ifndef BPTPU_FE255_H
#define BPTPU_FE255_H

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace fe255 {

using u64 = uint64_t;
using u128 = unsigned __int128;

static const u64 MASK51 = (1ULL << 51) - 1;

struct Fe {
  u64 v[5];
};

static const Fe FE_ZERO = {{0, 0, 0, 0, 0}};
static const Fe FE_ONE = {{1, 0, 0, 0, 0}};

// Constants below are emitted from bulletproofs_tpu/core/field.py (the
// Python oracle), 5x51-bit little-endian limbs.
static const Fe FE_D = {{0x34dca135978a3ULL, 0x1a8283b156ebdULL, 0x5e7a26001c029ULL, 0x739c663a03cbbULL, 0x52036cee2b6ffULL}};
static const Fe FE_D2 = {{0x69b9426b2f159ULL, 0x35050762add7aULL, 0x3cf44c0038052ULL, 0x6738cc7407977ULL, 0x2406d9dc56dffULL}};
static const Fe FE_SQRT_M1 = {{0x61b274a0ea0b0ULL, 0xd5a5fc8f189dULL, 0x7ef5e9cbd0c60ULL, 0x78595a6804c9eULL, 0x2b8324804fc1dULL}};
static const Fe FE_ONE_MINUS_D_SQ = {{0x409c1945fc176ULL, 0x719abc6a1fc4fULL, 0x1c37f90b20684ULL, 0x6bccca55eedfULL, 0x29072a8b2b3eULL}};
static const Fe FE_D_MINUS_ONE_SQ = {{0x55aaa44ed4d20ULL, 0x59603c3332635ULL, 0x26d3baf4a7928ULL, 0x120a66e6997a9ULL, 0x5968b37af66c2ULL}};
static const Fe FE_SQRT_AD_MINUS_ONE = {{0x7f6a0497b2e1bULL, 0x1836f0a97afd2ULL, 0x7d747f6be7638ULL, 0x456079e7e6498ULL, 0x376931bf2b834ULL}};
static const Fe FE_INVSQRT_A_MINUS_D = {{0xfdaa805d40eaULL, 0x2eb482e57d339ULL, 0x7610274bc58ULL, 0x6510b613dc8ffULL, 0x786c8905cfaffULL}};

static inline void fe_copy(Fe& r, const Fe& a) { r = a; }

static inline void fe_add(Fe& r, const Fe& a, const Fe& b) {
  for (int i = 0; i < 5; ++i) r.v[i] = a.v[i] + b.v[i];
}

// r = a - b, computed as a + 16p - b to stay nonnegative (dalek-style).
static inline void fe_sub(Fe& r, const Fe& a, const Fe& b) {
  r.v[0] = a.v[0] + 36028797018963664ULL - b.v[0];  // 16*(2^51-19)
  r.v[1] = a.v[1] + 36028797018963952ULL - b.v[1];  // 16*(2^51-1)
  r.v[2] = a.v[2] + 36028797018963952ULL - b.v[2];
  r.v[3] = a.v[3] + 36028797018963952ULL - b.v[3];
  r.v[4] = a.v[4] + 36028797018963952ULL - b.v[4];
}

// Weak reduce: bring limbs under ~2^52 (enough headroom for add chains
// before the next mul).
static inline void fe_carry(Fe& r) {
  u64 c;
  c = r.v[0] >> 51; r.v[0] &= MASK51; r.v[1] += c;
  c = r.v[1] >> 51; r.v[1] &= MASK51; r.v[2] += c;
  c = r.v[2] >> 51; r.v[2] &= MASK51; r.v[3] += c;
  c = r.v[3] >> 51; r.v[3] &= MASK51; r.v[4] += c;
  c = r.v[4] >> 51; r.v[4] &= MASK51; r.v[0] += c * 19;
  c = r.v[0] >> 51; r.v[0] &= MASK51; r.v[1] += c;
}

static inline void fe_mul(Fe& r, const Fe& a, const Fe& b) {
  const u64 a0 = a.v[0], a1 = a.v[1], a2 = a.v[2], a3 = a.v[3], a4 = a.v[4];
  const u64 b0 = b.v[0], b1 = b.v[1], b2 = b.v[2], b3 = b.v[3], b4 = b.v[4];
  const u64 b1_19 = b1 * 19, b2_19 = b2 * 19, b3_19 = b3 * 19, b4_19 = b4 * 19;

  u128 c0 = (u128)a0 * b0 + (u128)a1 * b4_19 + (u128)a2 * b3_19 + (u128)a3 * b2_19 + (u128)a4 * b1_19;
  u128 c1 = (u128)a0 * b1 + (u128)a1 * b0 + (u128)a2 * b4_19 + (u128)a3 * b3_19 + (u128)a4 * b2_19;
  u128 c2 = (u128)a0 * b2 + (u128)a1 * b1 + (u128)a2 * b0 + (u128)a3 * b4_19 + (u128)a4 * b3_19;
  u128 c3 = (u128)a0 * b3 + (u128)a1 * b2 + (u128)a2 * b1 + (u128)a3 * b0 + (u128)a4 * b4_19;
  u128 c4 = (u128)a0 * b4 + (u128)a1 * b3 + (u128)a2 * b2 + (u128)a3 * b1 + (u128)a4 * b0;

  // inter-limb carries stay u128: with ~2^55 un-carried operands the
  // carry can exceed 64 bits
  c1 += c0 >> 51; r.v[0] = (u64)c0 & MASK51;
  c2 += c1 >> 51; r.v[1] = (u64)c1 & MASK51;
  c3 += c2 >> 51; r.v[2] = (u64)c2 & MASK51;
  c4 += c3 >> 51; r.v[3] = (u64)c3 & MASK51;
  u128 t = (u128)r.v[0] + (c4 >> 51) * 19; r.v[4] = (u64)c4 & MASK51;
  r.v[0] = (u64)t & MASK51;
  r.v[1] += (u64)(t >> 51);
}

static inline void fe_sq(Fe& r, const Fe& a) { fe_mul(r, a, a); }

static inline void fe_neg(Fe& r, const Fe& a) {
  Fe z = FE_ZERO;
  fe_sub(r, z, a);
  fe_carry(r);
}

// Full canonical reduction + 32-byte little-endian encoding.
static inline void fe_tobytes(uint8_t out[32], const Fe& a) {
  Fe t = a;
  fe_carry(t);
  fe_carry(t);
  // compute q = floor((t + 19) / 2^255) (0 or 1), then t -= q*p
  u64 q = (t.v[0] + 19) >> 51;
  q = (t.v[1] + q) >> 51;
  q = (t.v[2] + q) >> 51;
  q = (t.v[3] + q) >> 51;
  q = (t.v[4] + q) >> 51;
  t.v[0] += 19 * q;
  u64 c;
  c = t.v[0] >> 51; t.v[0] &= MASK51; t.v[1] += c;
  c = t.v[1] >> 51; t.v[1] &= MASK51; t.v[2] += c;
  c = t.v[2] >> 51; t.v[2] &= MASK51; t.v[3] += c;
  c = t.v[3] >> 51; t.v[3] &= MASK51; t.v[4] += c;
  t.v[4] &= MASK51;  // drop the 2^255 bit (subtracts q*2^255; with +19q this is -q*p)
  u64 w[4];
  w[0] = t.v[0] | (t.v[1] << 51);
  w[1] = (t.v[1] >> 13) | (t.v[2] << 38);
  w[2] = (t.v[2] >> 26) | (t.v[3] << 25);
  w[3] = (t.v[3] >> 39) | (t.v[4] << 12);
  memcpy(out, w, 32);
}

static inline void fe_frombytes(Fe& r, const uint8_t in[32]) {
  u64 w[4];
  memcpy(w, in, 32);
  r.v[0] = w[0] & MASK51;
  r.v[1] = ((w[0] >> 51) | (w[1] << 13)) & MASK51;
  r.v[2] = ((w[1] >> 38) | (w[2] << 26)) & MASK51;
  r.v[3] = ((w[2] >> 25) | (w[3] << 39)) & MASK51;
  r.v[4] = (w[3] >> 12) & MASK51;  // masks bit 255
}

static inline bool fe_is_negative(const Fe& a) {
  uint8_t b[32];
  fe_tobytes(b, a);
  return b[0] & 1;
}

static inline bool fe_is_zero(const Fe& a) {
  uint8_t b[32];
  fe_tobytes(b, a);
  for (int i = 0; i < 32; ++i)
    if (b[i]) return false;
  return true;
}

static inline bool fe_eq(const Fe& a, const Fe& b) {
  uint8_t ba[32], bb[32];
  fe_tobytes(ba, a);
  fe_tobytes(bb, b);
  return memcmp(ba, bb, 32) == 0;
}

static inline void fe_abs(Fe& r, const Fe& a) {
  if (fe_is_negative(a)) fe_neg(r, a); else r = a;
}

// z^(2^252 - 3) == z^((p-5)/8)  (ref10-style addition chain)
static inline void fe_pow22523(Fe& out, const Fe& z) {
  Fe t0, t1, t2;
  fe_sq(t0, z);                                        // 2
  fe_sq(t1, t0); fe_sq(t1, t1);                        // 8
  fe_mul(t1, z, t1);                                   // 9
  fe_mul(t0, t0, t1);                                  // 11
  fe_sq(t0, t0);                                       // 22
  fe_mul(t0, t1, t0);                                  // 31 = 2^5-1
  fe_sq(t1, t0); for (int i = 1; i < 5; ++i) fe_sq(t1, t1);
  fe_mul(t0, t1, t0);                                  // 2^10-1
  fe_sq(t1, t0); for (int i = 1; i < 10; ++i) fe_sq(t1, t1);
  fe_mul(t1, t1, t0);                                  // 2^20-1
  fe_sq(t2, t1); for (int i = 1; i < 20; ++i) fe_sq(t2, t2);
  fe_mul(t1, t2, t1);                                  // 2^40-1
  fe_sq(t1, t1); for (int i = 1; i < 10; ++i) fe_sq(t1, t1);
  fe_mul(t0, t1, t0);                                  // 2^50-1
  fe_sq(t1, t0); for (int i = 1; i < 50; ++i) fe_sq(t1, t1);
  fe_mul(t1, t1, t0);                                  // 2^100-1
  fe_sq(t2, t1); for (int i = 1; i < 100; ++i) fe_sq(t2, t2);
  fe_mul(t1, t2, t1);                                  // 2^200-1
  fe_sq(t1, t1); for (int i = 1; i < 50; ++i) fe_sq(t1, t1);
  fe_mul(t0, t1, t0);                                  // 2^250-1
  fe_sq(t0, t0); fe_sq(t0, t0);                        // 2^252-4
  fe_mul(out, t0, z);                                  // 2^252-3
}

// z^(p-2) = z^(2^255-21)
static inline void fe_invert(Fe& out, const Fe& z) {
  Fe t0, t1, t2, t3;
  fe_sq(t0, z);                                        // 2
  fe_sq(t1, t0); fe_sq(t1, t1);                        // 8
  fe_mul(t1, z, t1);                                   // 9
  fe_mul(t0, t0, t1);                                  // 11
  fe_sq(t2, t0);                                       // 22
  fe_mul(t1, t1, t2);                                  // 31 = 2^5-1
  fe_sq(t2, t1); for (int i = 1; i < 5; ++i) fe_sq(t2, t2);
  fe_mul(t1, t2, t1);                                  // 2^10-1
  fe_sq(t2, t1); for (int i = 1; i < 10; ++i) fe_sq(t2, t2);
  fe_mul(t2, t2, t1);                                  // 2^20-1
  fe_sq(t3, t2); for (int i = 1; i < 20; ++i) fe_sq(t3, t3);
  fe_mul(t2, t3, t2);                                  // 2^40-1
  fe_sq(t2, t2); for (int i = 1; i < 10; ++i) fe_sq(t2, t2);
  fe_mul(t1, t2, t1);                                  // 2^50-1
  fe_sq(t2, t1); for (int i = 1; i < 50; ++i) fe_sq(t2, t2);
  fe_mul(t2, t2, t1);                                  // 2^100-1
  fe_sq(t3, t2); for (int i = 1; i < 100; ++i) fe_sq(t3, t3);
  fe_mul(t2, t3, t2);                                  // 2^200-1
  fe_sq(t2, t2); for (int i = 1; i < 50; ++i) fe_sq(t2, t2);
  fe_mul(t1, t2, t1);                                  // 2^250-1
  for (int i = 0; i < 5; ++i) fe_sq(t1, t1);           // 2^255-2^5
  fe_mul(out, t1, t0);                                 // 2^255-21
}

// (was_square, r) = sqrt_ratio_m1(u, v): r = sqrt(u/v) or sqrt(i*u/v),
// nonnegative; mirrors core/field.py sqrt_ratio_m1 (RFC 9496 SQRT_RATIO_M1).
static inline bool fe_sqrt_ratio_m1(Fe& r, const Fe& u, const Fe& v) {
  Fe v3, v7, t, check, u_neg, u_neg_i, r_prime;
  fe_sq(v3, v); fe_mul(v3, v3, v);        // v^3
  fe_sq(v7, v3); fe_mul(v7, v7, v);       // v^7
  fe_mul(t, u, v7);
  fe_pow22523(t, t);                      // (u v^7)^((p-5)/8)
  fe_mul(t, t, u);
  fe_mul(r, t, v3);                       // u v^3 (u v^7)^((p-5)/8)
  fe_sq(check, r); fe_mul(check, check, v);  // v r^2
  fe_neg(u_neg, u);
  fe_mul(u_neg_i, u_neg, FE_SQRT_M1);
  const bool correct = fe_eq(check, u);
  const bool flipped = fe_eq(check, u_neg);
  const bool flipped_i = fe_eq(check, u_neg_i);
  fe_mul(r_prime, r, FE_SQRT_M1);
  if (flipped || flipped_i) r = r_prime;
  Fe ra; fe_abs(ra, r); r = ra;
  return correct || flipped;
}

// ---------------------------------------------------------------------------
// extended twisted Edwards points (X : Y : Z : T), x*y = T/Z, a = -1
// ---------------------------------------------------------------------------

struct Ge {
  Fe X, Y, Z, T;
};

static const Ge GE_IDENTITY = {FE_ZERO, FE_ONE, FE_ONE, FE_ZERO};

// add-2008-hwcd-3 (complete for a = -1); matches core/ristretto.py __add__
static inline void ge_add(Ge& r, const Ge& p, const Ge& q) {
  Fe A, B, C, Dv, E, F, G, H, t0, t1;
  fe_sub(t0, p.Y, p.X); fe_carry(t0);
  fe_sub(t1, q.Y, q.X); fe_carry(t1);
  fe_mul(A, t0, t1);
  fe_add(t0, p.Y, p.X);
  fe_add(t1, q.Y, q.X);
  fe_mul(B, t0, t1);
  fe_mul(C, p.T, FE_D2); fe_mul(C, C, q.T);
  fe_mul(Dv, p.Z, q.Z); fe_add(Dv, Dv, Dv); fe_carry(Dv);
  fe_sub(E, B, A);
  fe_sub(F, Dv, C);
  fe_add(G, Dv, C);
  fe_add(H, B, A);
  fe_mul(r.X, E, F);
  fe_mul(r.Y, G, H);
  fe_mul(r.Z, F, G);
  fe_mul(r.T, E, H);
}

// dbl-2008-hwcd; matches core/ristretto.py double()
static inline void ge_dbl(Ge& r, const Ge& p) {
  Fe A, B, C, H, E, G, F, t0;
  fe_sq(A, p.X);
  fe_sq(B, p.Y);
  fe_sq(C, p.Z); fe_add(C, C, C); fe_carry(C);
  fe_add(H, A, B);
  fe_add(t0, p.X, p.Y); fe_carry(t0); fe_sq(t0, t0);
  fe_sub(E, H, t0);
  fe_sub(G, A, B);
  fe_add(F, C, G); fe_carry(F);
  fe_mul(r.X, E, F);
  fe_mul(r.Y, G, H);
  fe_mul(r.Z, F, G);
  fe_mul(r.T, E, H);
}

static inline void ge_neg(Ge& r, const Ge& p) {
  fe_neg(r.X, p.X);
  r.Y = p.Y;
  r.Z = p.Z;
  fe_neg(r.T, p.T);
}

// ristretto equality: X1*Y2 == Y1*X2 or X1*X2 == Y1*Y2
static inline bool ge_rist_eq(const Ge& p, const Ge& q) {
  Fe a, b;
  fe_mul(a, p.X, q.Y);
  fe_mul(b, p.Y, q.X);
  if (fe_eq(a, b)) return true;
  fe_mul(a, p.X, q.X);
  fe_mul(b, p.Y, q.Y);
  return fe_eq(a, b);
}

// vartime scalar mul, 4-bit fixed window; scalar = 32 LE bytes (< l)
static inline void ge_scalar_mul(Ge& r, const Ge& p, const uint8_t sc[32]) {
  Ge table[16];
  table[0] = GE_IDENTITY;
  table[1] = p;
  for (int i = 2; i < 16; ++i) ge_add(table[i], table[i - 1], p);
  r = GE_IDENTITY;
  bool started = false;
  for (int i = 63; i >= 0; --i) {
    const int digit = (sc[i >> 1] >> ((i & 1) * 4)) & 0xF;
    if (started) {
      ge_dbl(r, r); ge_dbl(r, r); ge_dbl(r, r); ge_dbl(r, r);
    }
    if (digit) {
      if (!started) { r = table[digit]; started = true; }
      else ge_add(r, r, table[digit]);
    }
  }
}

// ---------------------------------------------------------------------------
// ristretto255 codecs (RFC 9496; mirror core/ristretto.py)
// ---------------------------------------------------------------------------

static inline void rist_encode(uint8_t out[32], const Ge& p) {
  Fe u1, u2, t0, invsqrt, den1, den2, z_inv, ix0, iy0, enchanted;
  fe_add(t0, p.Z, p.Y); fe_carry(t0);
  Fe zmy; fe_sub(zmy, p.Z, p.Y); fe_carry(zmy);
  fe_mul(u1, t0, zmy);
  fe_mul(u2, p.X, p.Y);
  fe_sq(t0, u2); fe_mul(t0, t0, u1);
  fe_sqrt_ratio_m1(invsqrt, FE_ONE, t0);
  fe_mul(den1, invsqrt, u1);
  fe_mul(den2, invsqrt, u2);
  fe_mul(z_inv, den1, den2); fe_mul(z_inv, z_inv, p.T);
  fe_mul(ix0, p.X, FE_SQRT_M1);
  fe_mul(iy0, p.Y, FE_SQRT_M1);
  fe_mul(enchanted, den1, FE_INVSQRT_A_MINUS_D);
  Fe tz; fe_mul(tz, p.T, z_inv);
  Fe x, y, den_inv;
  if (fe_is_negative(tz)) {
    x = iy0; y = ix0; den_inv = enchanted;
  } else {
    x = p.X; y = p.Y; den_inv = den2;
  }
  Fe xz; fe_mul(xz, x, z_inv);
  if (fe_is_negative(xz)) fe_neg(y, y);
  Fe s, zy;
  fe_sub(zy, p.Z, y); fe_carry(zy);
  fe_mul(s, den_inv, zy);
  Fe sa; fe_abs(sa, s);
  fe_tobytes(out, sa);
}

// returns true on success; false on non-canonical / invalid encodings
// Decode phase 1: canonicality + algebraic setup.  The expensive part of
// the decode is the invsqrt chain sqrt_ratio_m1(1, vu) with vu = v*u2^2 --
// split out so a 4-lane backend can batch the exponentiation
// (ristretto_ifma.cpp) while prep/finish stay scalar.
static inline bool rist_decode_prep(const uint8_t in[32], Fe& s, Fe& u1,
                                    Fe& u2, Fe& v, Fe& vu) {
  // canonical check: value < p and nonnegative (even)
  static const uint8_t P_BYTES[32] = {
      0xed, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
      0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
      0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
      0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x7f};
  if (in[0] & 1) return false;
  bool lt = false;
  for (int i = 31; i >= 0; --i) {
    if (in[i] < P_BYTES[i]) { lt = true; break; }
    if (in[i] > P_BYTES[i]) return false;
  }
  if (!lt) return false;
  fe_frombytes(s, in);
  Fe ss, u2_sqr, t0;
  fe_sq(ss, s);
  fe_sub(u1, FE_ONE, ss); fe_carry(u1);
  fe_add(u2, FE_ONE, ss); fe_carry(u2);
  fe_sq(u2_sqr, u2);
  fe_sq(t0, u1); fe_mul(t0, t0, FE_D);
  fe_neg(v, t0);
  fe_sub(v, v, u2_sqr); fe_carry(v);
  fe_mul(vu, v, u2_sqr);
  return true;
}

// Decode phase 2: given rr = vu^3 * (vu^7)^((p-5)/8) (the pre-adjustment
// sqrt_ratio_m1(1, vu) candidate), apply the i-flips/abs and assemble the
// point.  Mirrors fe_sqrt_ratio_m1 with u = 1.
static inline bool rist_decode_finish(const Fe& s, const Fe& u1, const Fe& u2,
                                      const Fe& v, const Fe& vu,
                                      const Fe& rr, Ge& g) {
  Fe r = rr, check, one_neg, one_neg_i, r_prime;
  fe_sq(check, r); fe_mul(check, check, vu);
  fe_neg(one_neg, FE_ONE);
  fe_mul(one_neg_i, one_neg, FE_SQRT_M1);
  const bool correct = fe_eq(check, FE_ONE);
  const bool flipped = fe_eq(check, one_neg);
  const bool flipped_i = fe_eq(check, one_neg_i);
  fe_mul(r_prime, r, FE_SQRT_M1);
  if (flipped || flipped_i) r = r_prime;
  Fe ra; fe_abs(ra, r); r = ra;                       // r = invsqrt
  const bool was_square = correct || flipped;
  Fe den_x, den_y, x, y, t0, t;
  fe_mul(den_x, r, u2);
  fe_mul(den_y, r, den_x); fe_mul(den_y, den_y, v);
  fe_add(t0, s, s); fe_carry(t0);
  fe_mul(x, t0, den_x);
  Fe xa; fe_abs(xa, x); x = xa;
  fe_mul(y, u1, den_y);
  fe_mul(t, x, y);
  if (!was_square || fe_is_negative(t) || fe_is_zero(y)) return false;
  g.X = x; g.Y = y; g.Z = FE_ONE; g.T = t;
  return true;
}

static inline bool rist_decode(Ge& r, const uint8_t in[32]) {
  Fe s, u1, u2, v, vu;
  if (!rist_decode_prep(in, s, u1, u2, v, vu)) return false;
  Fe v3, v7, t, rr;
  fe_sq(v3, vu); fe_mul(v3, v3, vu);
  fe_sq(v7, v3); fe_mul(v7, v7, vu);
  fe_pow22523(t, v7);
  fe_mul(rr, t, v3);
  return rist_decode_finish(s, u1, u2, v, vu, rr, r);
}

// RFC 9496 MAP (one Elligator2 evaluation); mirrors _elligator_map
static inline void rist_elligator(Ge& out, const Fe& t) {
  Fe r, u, v, s, t0, t1;
  fe_sq(r, t); fe_mul(r, r, FE_SQRT_M1);
  fe_add(t0, r, FE_ONE); fe_carry(t0);
  fe_mul(u, t0, FE_ONE_MINUS_D_SQ);
  fe_mul(t0, r, FE_D);
  fe_add(t0, t0, FE_ONE); fe_carry(t0);
  fe_neg(t0, t0);                         // -1 - r*D
  fe_add(t1, r, FE_D); fe_carry(t1);
  fe_mul(v, t0, t1);
  const bool was_square = fe_sqrt_ratio_m1(s, u, v);
  Fe c;
  if (was_square) {
    fe_neg(c, FE_ONE);
  } else {
    fe_mul(t0, s, t);
    Fe t0a; fe_abs(t0a, t0);
    fe_neg(s, t0a);
    c = r;
  }
  Fe n;
  fe_sub(t0, r, FE_ONE); fe_carry(t0);
  fe_mul(n, c, t0); fe_mul(n, n, FE_D_MINUS_ONE_SQ);
  fe_sub(n, n, v); fe_carry(n);
  Fe w0, w1, w2, w3, ss;
  fe_mul(w0, s, v); fe_add(w0, w0, w0); fe_carry(w0);
  fe_mul(w1, n, FE_SQRT_AD_MINUS_ONE);
  fe_sq(ss, s);
  fe_sub(w2, FE_ONE, ss); fe_carry(w2);
  fe_add(w3, FE_ONE, ss); fe_carry(w3);
  fe_mul(out.X, w0, w3);
  fe_mul(out.Y, w2, w1);
  fe_mul(out.Z, w1, w3);
  fe_mul(out.T, w0, w2);
}

static inline void rist_from_uniform(Ge& out, const uint8_t in[64]) {
  Fe t1, t2;
  fe_frombytes(t1, in);
  fe_frombytes(t2, in + 32);
  Ge p1, p2;
  rist_elligator(p1, t1);
  rist_elligator(p2, t2);
  ge_add(out, p1, p2);
}

// ---------------------------------------------------------------------------
// boundary codecs: Python passes points as 4x32-byte LE field elements
// (X, Y, Z, T), 128 bytes per point; values already reduced mod p.
// ---------------------------------------------------------------------------

static inline void ge_from_ext_bytes(Ge& r, const uint8_t in[128]) {
  fe_frombytes(r.X, in);
  fe_frombytes(r.Y, in + 32);
  fe_frombytes(r.Z, in + 64);
  fe_frombytes(r.T, in + 96);
}

static inline void ge_to_ext_bytes(uint8_t out[128], const Ge& p) {
  fe_tobytes(out, p.X);
  fe_tobytes(out + 32, p.Y);
  fe_tobytes(out + 64, p.Z);
  fe_tobytes(out + 96, p.T);
}

// 64 signed digits in [-8, 8]: s = sum d_i * 16^i.  Scalars are < l < 2^253
// so the final carry keeps d_63 <= 8.  Branchless; shared by the consttime
// Straus paths (ristretto.cpp, ristretto_ifma.cpp).
static inline void sc_radix16_signed(int8_t out[64], const uint8_t s[32]) {
  for (int i = 0; i < 32; ++i) {
    out[2 * i] = (int8_t)(s[i] & 15);
    out[2 * i + 1] = (int8_t)((s[i] >> 4) & 15);
  }
  int8_t carry = 0;
  for (int i = 0; i < 63; ++i) {
    out[i] = (int8_t)(out[i] + carry);
    carry = (int8_t)((out[i] + 8) >> 4);
    out[i] = (int8_t)(out[i] - (int8_t)(carry << 4));
  }
  out[63] = (int8_t)(out[63] + carry);
}

// Signed c-bit window digits for vartime Pippenger: s = sum d_w * 2^(c*w)
// with d_w in [-2^(c-1), 2^(c-1)].  Halves the bucket count vs unsigned
// windows (bucket by |d|, add P or -P by sign).  nwin must be
// ceil(253/c) + 1 so the final carry has somewhere to land.
static inline void sc_signed_windows(const uint8_t s[32], int c, int nwin,
                                     int32_t* out) {
  uint32_t carry = 0;
  const uint32_t full = (uint32_t)1 << c;
  const uint32_t half = full >> 1;
  for (int w = 0; w < nwin; ++w) {
    const int bit0 = w * c;
    uint32_t window = 0;
    if (bit0 < 256) {
      const int byte0 = bit0 >> 3, shift = bit0 & 7;
      window = s[byte0] >> shift;
      if (byte0 + 1 < 32) window |= (uint32_t)s[byte0 + 1] << (8 - shift);
      if (shift > 0 && byte0 + 2 < 32)
        window |= (uint32_t)s[byte0 + 2] << (16 - shift);
    }
    window = (window & (full - 1)) + carry;
    if (window > half) {
      out[w] = (int32_t)window - (int32_t)full;
      carry = 1;
    } else {
      out[w] = (int32_t)window;
      carry = 0;
    }
  }
}

}  // namespace fe255

#endif  // BPTPU_FE255_H
