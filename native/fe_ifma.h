// 4-lane parallel GF(2^255-19) arithmetic with AVX-512 IFMA (vpmadd52 on
// 256-bit vectors): one extended-Edwards point keeps its four coordinates
// (X, Y, Z, T) in the four 64-bit lanes, and the HWCD parallel addition
// evaluates each formula stage as ONE lane-parallel field multiply.  This
// is the role curve25519-dalek's avx2/ifma "parallel formulas" backend
// plays for the reference (SURVEY.md §2b) -- ~3x over the scalar u64
// path on the MSM bucket chains.
//
// Layout: Fe4.v[i] lane j = limb i (radix 2^51) of field element j.
// madd52 reads only the low 52 bits of its operands, so every value
// entering a multiply must be < 2^52 ("mul-safe"); fe4_carry restores
// that after add/sub chains.
//
// Only compiled into TUs built with -mavx512ifma -mavx512vl; callers
// gate on __builtin_cpu_supports at runtime.
#ifndef BPTPU_FE_IFMA_H
#define BPTPU_FE_IFMA_H

#include <immintrin.h>

#include "fe255.h"

namespace fe_ifma {

using fe255::Fe;
using fe255::Ge;
using fe255::MASK51;
using u64 = fe255::u64;

struct Fe4 {
  __m256i v[5];
};

static inline __m256i bcast(u64 x) { return _mm256_set1_epi64x((long long)x); }

// 16p limb biases (see fe255::fe_sub)
static const u64 BIAS0 = 36028797018963664ULL;   // 16*(2^51-19)
static const u64 BIASI = 36028797018963952ULL;   // 16*(2^51-1)

static inline __m256i bias_limb(int i) { return bcast(i == 0 ? BIAS0 : BIASI); }

// weak reduce: limbs -> < 2^51 + eps (mul-safe)
static inline void fe4_carry(Fe4& r) {
  const __m256i mask = bcast(MASK51);
  __m256i c;
  c = _mm256_srli_epi64(r.v[0], 51); r.v[0] = _mm256_and_si256(r.v[0], mask);
  r.v[1] = _mm256_add_epi64(r.v[1], c);
  c = _mm256_srli_epi64(r.v[1], 51); r.v[1] = _mm256_and_si256(r.v[1], mask);
  r.v[2] = _mm256_add_epi64(r.v[2], c);
  c = _mm256_srli_epi64(r.v[2], 51); r.v[2] = _mm256_and_si256(r.v[2], mask);
  r.v[3] = _mm256_add_epi64(r.v[3], c);
  c = _mm256_srli_epi64(r.v[3], 51); r.v[3] = _mm256_and_si256(r.v[3], mask);
  r.v[4] = _mm256_add_epi64(r.v[4], c);
  c = _mm256_srli_epi64(r.v[4], 51); r.v[4] = _mm256_and_si256(r.v[4], mask);
  // *19 via shifts: 19 = 16 + 2 + 1
  __m256i c19 = _mm256_add_epi64(
      _mm256_add_epi64(_mm256_slli_epi64(c, 4), _mm256_slli_epi64(c, 1)), c);
  r.v[0] = _mm256_add_epi64(r.v[0], c19);
  c = _mm256_srli_epi64(r.v[0], 51); r.v[0] = _mm256_and_si256(r.v[0], mask);
  r.v[1] = _mm256_add_epi64(r.v[1], c);
}

// lane-parallel schoolbook mul; operands must be mul-safe (< 2^52).
static inline void fe4_mul(Fe4& r, const Fe4& a, const Fe4& b) {
  const __m256i zero = _mm256_setzero_si256();
  __m256i lo[9], hi[10];
  for (int k = 0; k < 9; ++k) lo[k] = zero;
  for (int k = 0; k < 10; ++k) hi[k] = zero;
  for (int i = 0; i < 5; ++i) {
    for (int j = 0; j < 5; ++j) {
      lo[i + j] = _mm256_madd52lo_epu64(lo[i + j], a.v[i], b.v[j]);
      hi[i + j + 1] = _mm256_madd52hi_epu64(hi[i + j + 1], a.v[i], b.v[j]);
    }
  }
  // limb t total = lo[t] + 2*hi[t] (radix 2^51: the 2^52-scaled high part
  // carries one extra factor of 2); fold limbs 5..9 with *19
  __m256i L[10];
  for (int t = 0; t < 10; ++t) {
    __m256i lot = t < 9 ? lo[t] : zero;
    L[t] = _mm256_add_epi64(lot, _mm256_slli_epi64(hi[t], 1));
  }
  for (int k = 0; k < 5; ++k) {
    __m256i w = L[k + 5];
    __m256i w19 = _mm256_add_epi64(
        _mm256_add_epi64(_mm256_slli_epi64(w, 4), _mm256_slli_epi64(w, 1)), w);
    r.v[k] = _mm256_add_epi64(L[k], w19);
  }
  fe4_carry(r);
}

static inline void fe4_add(Fe4& r, const Fe4& a, const Fe4& b) {
  for (int i = 0; i < 5; ++i) r.v[i] = _mm256_add_epi64(a.v[i], b.v[i]);
}

// -- point layout ------------------------------------------------------------

// one extended point, coords in lanes [X, Y, Z, T]
struct P4 {
  Fe4 c;  // c.v[i] lanes = (X_i, Y_i, Z_i, T_i)
};

static inline P4 p4_from_ge(const Ge& p) {
  P4 r;
  for (int i = 0; i < 5; ++i)
    r.c.v[i] = _mm256_set_epi64x((long long)p.T.v[i], (long long)p.Z.v[i],
                                 (long long)p.Y.v[i], (long long)p.X.v[i]);
  return r;
}

static inline void p4_to_ge(Ge& out, const P4& p) {
  alignas(32) u64 buf[5][4];
  for (int i = 0; i < 5; ++i)
    _mm256_store_si256((__m256i*)buf[i], p.c.v[i]);
  for (int i = 0; i < 5; ++i) {
    out.X.v[i] = buf[i][0];
    out.Y.v[i] = buf[i][1];
    out.Z.v[i] = buf[i][2];
    out.T.v[i] = buf[i][3];
  }
  fe255::fe_carry(out.X);
  fe255::fe_carry(out.Y);
  fe255::fe_carry(out.Z);
  fe255::fe_carry(out.T);
}

// constant lane vector (1, 1, 2, 2d) for the C/D scaling stage
static inline Fe4 k_1_1_2_2d() {
  Fe4 k;
  for (int i = 0; i < 5; ++i) {
    const u64 one = i == 0 ? 1 : 0;
    const u64 two = i == 0 ? 2 : 0;
    k.v[i] = _mm256_set_epi64x((long long)fe255::FE_D2.v[i], (long long)two,
                               (long long)one, (long long)one);
  }
  return k;
}

// (Y-X, Y+X, Z, T) from a point vector: the pre-multiply shuffle of the
// parallel addition (mirrors fe255::ge_add's A/B/C/D operand prep)
static inline Fe4 addsub_shuffle(const Fe4& p) {
  Fe4 r;
  for (int i = 0; i < 5; ++i) {
    // u = (Y, Y, Z, T)
    __m256i u = _mm256_permute4x64_epi64(p.v[i], 0xE5);  // lanes 1,1,2,3
    // x = (X, X, X, X)
    __m256i x = _mm256_permute4x64_epi64(p.v[i], 0x00);
    // t = (16p - X, X, 0, 0)
    __m256i t = _mm256_mask_sub_epi64(x, 0x1, bias_limb(i), x);
    t = _mm256_maskz_mov_epi64(0x3, t);
    r.v[i] = _mm256_add_epi64(u, t);
  }
  fe4_carry(r);
  return r;
}

// complete unified addition (add-2008-hwcd-3 for a = -1, parallel form);
// also used for doubling (the formula is strongly unified)
static inline void p4_add(P4& out, const P4& p, const P4& q) {
  const Fe4 sp = addsub_shuffle(p.c);
  const Fe4 sq = addsub_shuffle(q.c);
  Fe4 m;
  fe4_mul(m, sp, sq);                 // (A, B, Z1Z2, T1T2)
  Fe4 k = k_1_1_2_2d();
  Fe4 m2;
  fe4_mul(m2, m, k);                  // (A, B, D=2Z1Z2, C=2dT1T2)
  // EFGH = (B-A, D-C, D+C, B+A)
  Fe4 efgh;
  for (int i = 0; i < 5; ++i) {
    __m256i u = _mm256_permute4x64_epi64(m2.v[i], 0x69);  // (B, D, D, B)
    __m256i v = _mm256_permute4x64_epi64(m2.v[i], 0x3C);  // (A, C, C, A)
    __m256i t = _mm256_mask_sub_epi64(v, 0x3, bias_limb(i), v);
    efgh.v[i] = _mm256_add_epi64(u, t);
  }
  fe4_carry(efgh);
  // (X3, Y3, Z3, T3) = (E*F, G*H, F*G, E*H)
  Fe4 u4, v4;
  for (int i = 0; i < 5; ++i) {
    u4.v[i] = _mm256_permute4x64_epi64(efgh.v[i], 0x18);  // (E, G, F, E)
    v4.v[i] = _mm256_permute4x64_epi64(efgh.v[i], 0xED);  // (F, H, G, H)
  }
  fe4_mul(out.c, u4, v4);
}

static inline P4 p4_identity() { return p4_from_ge(fe255::GE_IDENTITY); }

// -- two-point layout (512-bit vectors) --------------------------------------
// Lanes = (X_a, Y_a, Z_a, T_a, X_b, Y_b, Z_b, T_b): TWO independent point
// additions per instruction stream.  The P4 shuffles map 1:1 because
// _mm512_permutex_epi64 permutes within each 256-bit half independently
// with the same immediate; the lane masks just duplicate (0x1 -> 0x11).
// Used for the Pippenger bucket-accumulation stream, where consecutive
// stream adds hit independent buckets almost always.

struct Fe8 {
  __m512i v[5];
};

struct P8 {
  Fe8 c;
};

static inline __m512i bcast8(u64 x) { return _mm512_set1_epi64((long long)x); }

static inline __m512i bias_limb8(int i) { return bcast8(i == 0 ? BIAS0 : BIASI); }

static inline void fe8_carry(Fe8& r) {
  const __m512i mask = bcast8(MASK51);
  __m512i c;
  c = _mm512_srli_epi64(r.v[0], 51); r.v[0] = _mm512_and_si512(r.v[0], mask);
  r.v[1] = _mm512_add_epi64(r.v[1], c);
  c = _mm512_srli_epi64(r.v[1], 51); r.v[1] = _mm512_and_si512(r.v[1], mask);
  r.v[2] = _mm512_add_epi64(r.v[2], c);
  c = _mm512_srli_epi64(r.v[2], 51); r.v[2] = _mm512_and_si512(r.v[2], mask);
  r.v[3] = _mm512_add_epi64(r.v[3], c);
  c = _mm512_srli_epi64(r.v[3], 51); r.v[3] = _mm512_and_si512(r.v[3], mask);
  r.v[4] = _mm512_add_epi64(r.v[4], c);
  c = _mm512_srli_epi64(r.v[4], 51); r.v[4] = _mm512_and_si512(r.v[4], mask);
  __m512i c19 = _mm512_add_epi64(
      _mm512_add_epi64(_mm512_slli_epi64(c, 4), _mm512_slli_epi64(c, 1)), c);
  r.v[0] = _mm512_add_epi64(r.v[0], c19);
  c = _mm512_srli_epi64(r.v[0], 51); r.v[0] = _mm512_and_si512(r.v[0], mask);
  r.v[1] = _mm512_add_epi64(r.v[1], c);
}

static inline void fe8_mul(Fe8& r, const Fe8& a, const Fe8& b) {
  const __m512i zero = _mm512_setzero_si512();
  __m512i lo[9], hi[10];
  for (int k = 0; k < 9; ++k) lo[k] = zero;
  for (int k = 0; k < 10; ++k) hi[k] = zero;
  for (int i = 0; i < 5; ++i) {
    for (int j = 0; j < 5; ++j) {
      lo[i + j] = _mm512_madd52lo_epu64(lo[i + j], a.v[i], b.v[j]);
      hi[i + j + 1] = _mm512_madd52hi_epu64(hi[i + j + 1], a.v[i], b.v[j]);
    }
  }
  __m512i L[10];
  for (int t = 0; t < 10; ++t) {
    __m512i lot = t < 9 ? lo[t] : zero;
    L[t] = _mm512_add_epi64(lot, _mm512_slli_epi64(hi[t], 1));
  }
  for (int k = 0; k < 5; ++k) {
    __m512i w = L[k + 5];
    __m512i w19 = _mm512_add_epi64(
        _mm512_add_epi64(_mm512_slli_epi64(w, 4), _mm512_slli_epi64(w, 1)), w);
    r.v[k] = _mm512_add_epi64(L[k], w19);
  }
  fe8_carry(r);
}

static inline Fe8 k8_1_1_2_2d() {
  const Fe4 k4 = k_1_1_2_2d();
  Fe8 k;
  for (int i = 0; i < 5; ++i)
    k.v[i] = _mm512_broadcast_i64x4(k4.v[i]);
  return k;
}

static inline Fe8 addsub_shuffle8(const Fe8& p) {
  Fe8 r;
  for (int i = 0; i < 5; ++i) {
    __m512i u = _mm512_permutex_epi64(p.v[i], 0xE5);  // per-half (Y,Y,Z,T)
    __m512i x = _mm512_permutex_epi64(p.v[i], 0x00);  // per-half (X,X,X,X)
    __m512i t = _mm512_mask_sub_epi64(x, 0x11, bias_limb8(i), x);
    t = _mm512_maskz_mov_epi64(0x33, t);
    r.v[i] = _mm512_add_epi64(u, t);
  }
  fe8_carry(r);
  return r;
}

// two independent complete additions (same formula as p4_add per half)
static inline void p8_add(P8& out, const P8& p, const P8& q) {
  const Fe8 sp = addsub_shuffle8(p.c);
  const Fe8 sq = addsub_shuffle8(q.c);
  Fe8 m;
  fe8_mul(m, sp, sq);
  const Fe8 k = k8_1_1_2_2d();
  Fe8 m2;
  fe8_mul(m2, m, k);
  Fe8 efgh;
  for (int i = 0; i < 5; ++i) {
    __m512i u = _mm512_permutex_epi64(m2.v[i], 0x69);  // per-half (B,D,D,B)
    __m512i v = _mm512_permutex_epi64(m2.v[i], 0x3C);  // per-half (A,C,C,A)
    __m512i t = _mm512_mask_sub_epi64(v, 0x33, bias_limb8(i), v);
    efgh.v[i] = _mm512_add_epi64(u, t);
  }
  fe8_carry(efgh);
  Fe8 u8, v8;
  for (int i = 0; i < 5; ++i) {
    u8.v[i] = _mm512_permutex_epi64(efgh.v[i], 0x18);  // per-half (E,G,F,E)
    v8.v[i] = _mm512_permutex_epi64(efgh.v[i], 0xED);  // per-half (F,H,G,H)
  }
  fe8_mul(out.c, u8, v8);
}

// -- element-parallel helpers (4 DIFFERENT field elements in the lanes,
// as opposed to the coordinate-parallel point layout above).  Used to
// batch the decode invsqrt exponentiation 4 points at a time.

static inline Fe4 fe4_from4(const Fe& a, const Fe& b, const Fe& c,
                            const Fe& d) {
  Fe4 r;
  for (int i = 0; i < 5; ++i)
    r.v[i] = _mm256_set_epi64x((long long)d.v[i], (long long)c.v[i],
                               (long long)b.v[i], (long long)a.v[i]);
  return r;
}

static inline void fe4_to4(const Fe4& x, Fe& a, Fe& b, Fe& c, Fe& d) {
  alignas(32) u64 buf[5][4];
  for (int i = 0; i < 5; ++i)
    _mm256_store_si256((__m256i*)buf[i], x.v[i]);
  for (int i = 0; i < 5; ++i) {
    a.v[i] = buf[i][0];
    b.v[i] = buf[i][1];
    c.v[i] = buf[i][2];
    d.v[i] = buf[i][3];
  }
  fe255::fe_carry(a);
  fe255::fe_carry(b);
  fe255::fe_carry(c);
  fe255::fe_carry(d);
}

static inline void fe4_sq(Fe4& r, const Fe4& a) { fe4_mul(r, a, a); }

// lane-parallel z^(2^252 - 3); mirrors fe255::fe_pow22523
static inline void fe4_pow22523(Fe4& out, const Fe4& z) {
  Fe4 t0, t1, t2;
  fe4_sq(t0, z);
  fe4_sq(t1, t0); fe4_sq(t1, t1);
  fe4_mul(t1, z, t1);
  fe4_mul(t0, t0, t1);
  fe4_sq(t0, t0);
  fe4_mul(t0, t1, t0);
  fe4_sq(t1, t0); for (int i = 1; i < 5; ++i) fe4_sq(t1, t1);
  fe4_mul(t0, t1, t0);
  fe4_sq(t1, t0); for (int i = 1; i < 10; ++i) fe4_sq(t1, t1);
  fe4_mul(t1, t1, t0);
  fe4_sq(t2, t1); for (int i = 1; i < 20; ++i) fe4_sq(t2, t2);
  fe4_mul(t1, t2, t1);
  fe4_sq(t1, t1); for (int i = 1; i < 10; ++i) fe4_sq(t1, t1);
  fe4_mul(t0, t1, t0);
  fe4_sq(t1, t0); for (int i = 1; i < 50; ++i) fe4_sq(t1, t1);
  fe4_mul(t1, t1, t0);
  fe4_sq(t2, t1); for (int i = 1; i < 100; ++i) fe4_sq(t2, t2);
  fe4_mul(t1, t2, t1);
  fe4_sq(t1, t1); for (int i = 1; i < 50; ++i) fe4_sq(t1, t1);
  fe4_mul(t0, t1, t0);
  fe4_sq(t0, t0); fe4_sq(t0, t0);
  fe4_mul(out, t0, z);
}

// 8-element variants (512-bit lanes) for the decode invsqrt batch
static inline Fe8 fe8_from8(const Fe* e) {
  Fe8 r;
  for (int i = 0; i < 5; ++i)
    r.v[i] = _mm512_set_epi64(
        (long long)e[7].v[i], (long long)e[6].v[i], (long long)e[5].v[i],
        (long long)e[4].v[i], (long long)e[3].v[i], (long long)e[2].v[i],
        (long long)e[1].v[i], (long long)e[0].v[i]);
  return r;
}

static inline void fe8_to8(const Fe8& x, Fe* e) {
  alignas(64) u64 buf[5][8];
  for (int i = 0; i < 5; ++i)
    _mm512_store_si512((__m512i*)buf[i], x.v[i]);
  for (int k = 0; k < 8; ++k) {
    for (int i = 0; i < 5; ++i) e[k].v[i] = buf[i][k];
    fe255::fe_carry(e[k]);
  }
}

static inline void fe8_sq(Fe8& r, const Fe8& a) { fe8_mul(r, a, a); }

// lane-parallel z^(2^252 - 3); mirrors fe255::fe_pow22523
static inline void fe8_pow22523(Fe8& out, const Fe8& z) {
  Fe8 t0, t1, t2;
  fe8_sq(t0, z);
  fe8_sq(t1, t0); fe8_sq(t1, t1);
  fe8_mul(t1, z, t1);
  fe8_mul(t0, t0, t1);
  fe8_sq(t0, t0);
  fe8_mul(t0, t1, t0);
  fe8_sq(t1, t0); for (int i = 1; i < 5; ++i) fe8_sq(t1, t1);
  fe8_mul(t0, t1, t0);
  fe8_sq(t1, t0); for (int i = 1; i < 10; ++i) fe8_sq(t1, t1);
  fe8_mul(t1, t1, t0);
  fe8_sq(t2, t1); for (int i = 1; i < 20; ++i) fe8_sq(t2, t2);
  fe8_mul(t1, t2, t1);
  fe8_sq(t1, t1); for (int i = 1; i < 10; ++i) fe8_sq(t1, t1);
  fe8_mul(t0, t1, t0);
  fe8_sq(t1, t0); for (int i = 1; i < 50; ++i) fe8_sq(t1, t1);
  fe8_mul(t1, t1, t0);
  fe8_sq(t2, t1); for (int i = 1; i < 100; ++i) fe8_sq(t2, t2);
  fe8_mul(t1, t2, t1);
  fe8_sq(t1, t1); for (int i = 1; i < 50; ++i) fe8_sq(t1, t1);
  fe8_mul(t0, t1, t0);
  fe8_sq(t0, t0); fe8_sq(t0, t0);
  fe8_mul(out, t0, z);
}

static inline P8 p8_pack(const P4& a, const P4& b) {
  P8 r;
  for (int i = 0; i < 5; ++i)
    r.c.v[i] = _mm512_inserti64x4(_mm512_castsi256_si512(a.c.v[i]),
                                  b.c.v[i], 1);
  return r;
}

static inline void p8_unpack(const P8& p, P4& a, P4& b) {
  for (int i = 0; i < 5; ++i) {
    a.c.v[i] = _mm512_castsi512_si256(p.c.v[i]);
    b.c.v[i] = _mm512_extracti64x4_epi64(p.c.v[i], 1);
  }
}

}  // namespace fe_ifma

#endif  // BPTPU_FE_IFMA_H
