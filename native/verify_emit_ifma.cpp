// 8-proof-lockstep emission of the O(nm) g/h verification-scalar loops of
// batched range-proof verification (the per-proof hot loop of
// rangeproof_verify_prep_batch; scalar reference: vprep_emit in
// verify_prep.cpp, reference math: /root/reference/src/range_proof/mod.rs:406-445).
//
// Eight proofs sharing (n, m) run the identical loop schedule, so every
// per-index scalar value becomes one 8-lane AVX-512 vector: lane l = proof l.
// Arithmetic is Montgomery mod l (R = 2^260) over 5x52-bit limbs driven by
// VPMADD52{L,H}UQ, mirroring the role fe_ifma.h plays for GF(2^255-19).
//
// Lazy-residue invariants:
//   * every limb entering a multiply is < 2^52 ("mul-safe"; mont8_carry
//     restores this), and the represented value is < 2^258
//   * montgomery products of such inputs are < 2^255 before carrying
//   * subtraction adds the 32L bias (limbwise >= 2^55 below the top limb),
//     so lanes whose inputs are all zero contribute exactly a multiple of L
//     -- ragged final groups just zero their unused lanes
//   * the per-index accumulator adds one carried residue (< 2^52 per limb)
//     per group; callers must fold at least every kGhMaxGroups groups to
//     stay below 2^63 per limb
//
// Only this TU is built with -mavx512ifma; callers gate on
// bp_gh_ifma_available() at runtime.

#include <immintrin.h>

#include "sc255.h"

namespace {

using Vu = __m512i;

constexpr u64 M52 = (1ULL << 52) - 1;

// l = 2^252 + 27742... in radix 2^52 (limb 3 is zero)
static const u64 L52[5] = {0x2631a5cf5d3edULL, 0xdea2f79cd6581ULL,
                           0x14def9ULL, 0x0ULL, 0x100000000000ULL};
// -l^-1 mod 2^52
static const u64 MU52 = 0x51da312547e1bULL;
// 32*l, redistributed so limbs 0..3 are >= 2^55 (subtraction bias)
static const u64 BIAS52[5] = {0x10c634b9eba7da0ULL, 0x10d45ef39acb014ULL,
                              0x1000000029bdf2bULL, 0xfffffffffffff0ULL,
                              0x1fffffffffff0ULL};
// R mod l and 2R mod l in radix 2^52 (montgomery 1 and 2)
static const u64 ONE_M52[5] = {0xf48bd6721e6edULL, 0x3bab5ac67e45aULL,
                               0xfffffeb35e51bULL, 0xfffffffffffffULL,
                               0xfffffffffffULL};
static const u64 TWO_M52[5] = {0xc2e60714df9edULL, 0x98b3bdf026334ULL,
                               0xfffffd656eb3cULL, 0xfffffffffffffULL,
                               0xfffffffffffULL};
// R mod l and R^-1 mod l as 4x64 scalars (host-side montgomery conversion)
static const Sc RMODL_SC = {{0x45af48bd6721e6edULL, 0x35e51b3bab5ac67eULL,
                             0xffffffffffffffebULL, 0x0fffffffffffffffULL}};
static const Sc RINV_SC = {{0x8e84371e098e4fc4ULL, 0xfb2697cda3adacf5ULL,
                            0x3614e75438ffa36bULL, 0x0c9db6c6f26fe918ULL}};

struct Sc8 {
  Vu v[5];  // v[i] lane l = limb i (radix 2^52) of proof l's residue
};

__attribute__((target("avx512f,avx512ifma")))
static inline Vu bc(u64 x) { return _mm512_set1_epi64((long long)x); }

// restore mul-safety: limbs 0..3 < 2^52; limb 4 uncarried (value < 2^261
// keeps it < 2^53, fine for adds; < 2^52 whenever the value is < 2^260)
__attribute__((target("avx512f,avx512ifma")))
static inline void carry8(Sc8& r) {
  const Vu mask = bc(M52);
  Vu c;
  c = _mm512_srli_epi64(r.v[0], 52); r.v[0] = _mm512_and_si512(r.v[0], mask);
  r.v[1] = _mm512_add_epi64(r.v[1], c);
  c = _mm512_srli_epi64(r.v[1], 52); r.v[1] = _mm512_and_si512(r.v[1], mask);
  r.v[2] = _mm512_add_epi64(r.v[2], c);
  c = _mm512_srli_epi64(r.v[2], 52); r.v[2] = _mm512_and_si512(r.v[2], mask);
  r.v[3] = _mm512_add_epi64(r.v[3], c);
  c = _mm512_srli_epi64(r.v[3], 52); r.v[3] = _mm512_and_si512(r.v[3], mask);
  r.v[4] = _mm512_add_epi64(r.v[4], c);
}

// lane-parallel CIOS montgomery multiply: r = a * b * R^-1 (mod l, lazy).
// inputs mul-safe with value < 2^258; output value < 2^255, carried.
__attribute__((target("avx512f,avx512ifma")))
static inline void mul8(Sc8& r, const Sc8& a, const Sc8& b) {
  const Vu zero = _mm512_setzero_si512();
  const Vu mu = bc(MU52);
  const Vu l0 = bc(L52[0]), l1 = bc(L52[1]), l2 = bc(L52[2]), l4 = bc(L52[4]);
  Vu t0 = zero, t1 = zero, t2 = zero, t3 = zero, t4 = zero, t5 = zero;
  for (int i = 0; i < 5; ++i) {
    const Vu ai = a.v[i];
    t0 = _mm512_madd52lo_epu64(t0, ai, b.v[0]);
    t1 = _mm512_madd52lo_epu64(t1, ai, b.v[1]);
    t2 = _mm512_madd52lo_epu64(t2, ai, b.v[2]);
    t3 = _mm512_madd52lo_epu64(t3, ai, b.v[3]);
    t4 = _mm512_madd52lo_epu64(t4, ai, b.v[4]);
    t1 = _mm512_madd52hi_epu64(t1, ai, b.v[0]);
    t2 = _mm512_madd52hi_epu64(t2, ai, b.v[1]);
    t3 = _mm512_madd52hi_epu64(t3, ai, b.v[2]);
    t4 = _mm512_madd52hi_epu64(t4, ai, b.v[3]);
    t5 = _mm512_madd52hi_epu64(t5, ai, b.v[4]);
    // montgomery step: q = t0 * mu mod 2^52; t += q*l; t >>= 52
    const Vu q = _mm512_madd52lo_epu64(zero, t0, mu);
    t0 = _mm512_madd52lo_epu64(t0, q, l0);
    const Vu c = _mm512_srli_epi64(t0, 52);
    t1 = _mm512_madd52lo_epu64(t1, q, l1);
    t2 = _mm512_madd52lo_epu64(t2, q, l2);
    t4 = _mm512_madd52lo_epu64(t4, q, l4);  // L52[3] == 0
    t1 = _mm512_madd52hi_epu64(t1, q, l0);
    t2 = _mm512_madd52hi_epu64(t2, q, l1);
    t3 = _mm512_madd52hi_epu64(t3, q, l2);
    t5 = _mm512_madd52hi_epu64(t5, q, l4);
    t0 = _mm512_add_epi64(t1, c);
    t1 = t2; t2 = t3; t3 = t4; t4 = t5; t5 = zero;
  }
  r.v[0] = t0; r.v[1] = t1; r.v[2] = t2; r.v[3] = t3; r.v[4] = t4;
  carry8(r);
}

// r = a - b + 32L (biased subtract; carry before any further use)
__attribute__((target("avx512f,avx512ifma")))
static inline void sub8_bias(Sc8& r, const Sc8& a, const Sc8& b) {
  for (int i = 0; i < 5; ++i)
    r.v[i] = _mm512_sub_epi64(_mm512_add_epi64(a.v[i], bc(BIAS52[i])), b.v[i]);
}

__attribute__((target("avx512f,avx512ifma")))
static inline void add8(Sc8& r, const Sc8& a, const Sc8& b) {
  for (int i = 0; i < 5; ++i) r.v[i] = _mm512_add_epi64(a.v[i], b.v[i]);
}

// per-group staging buffer: b[limb][lane], zero lanes stay zero
struct Pack8 {
  alignas(64) u64 b[5][8];
};

static inline void pack_set(Pack8& p, int lane, const Sc& s) {
  p.b[0][lane] = s.v[0] & M52;
  p.b[1][lane] = ((s.v[0] >> 52) | (s.v[1] << 12)) & M52;
  p.b[2][lane] = ((s.v[1] >> 40) | (s.v[2] << 24)) & M52;
  p.b[3][lane] = ((s.v[2] >> 28) | (s.v[3] << 36)) & M52;
  p.b[4][lane] = s.v[3] >> 16;
}

__attribute__((target("avx512f,avx512ifma")))
static inline void pack_load(Sc8& r, const Pack8& p) {
  for (int i = 0; i < 5; ++i) r.v[i] = _mm512_load_si512((const Vu*)p.b[i]);
}

// canonical scalar -> montgomery form (x*R mod l), still 4x64
static inline void mont_in(Sc& r, const Sc& x) { sc_mul(r, x, RMODL_SC); }

// fold one 8-lane lazy montgomery accumulator entry into the canonical
// 32-byte accumulator: sum lanes as one <=2^261 integer, barrett-reduce,
// leave montgomery form via *R^-1, add mod l.
static void fold_one(const u64 buf[5][8], uint8_t* out32) {
  u64 t[8] = {0, 0, 0, 0, 0, 0, 0, 0};
  for (int lane = 0; lane < 8; ++lane) {
    for (int i = 0; i < 5; ++i) {
      const int bit = 52 * i;
      const int w = bit >> 6, s = bit & 63;
      const u128 x = (u128)buf[i][lane] << s;
      u128 cur = (u128)t[w] + (u64)x;
      t[w] = (u64)cur;
      u128 cur2 = (u128)t[w + 1] + (u64)(x >> 64) + (u64)(cur >> 64);
      t[w + 1] = (u64)cur2;
      u64 c = (u64)(cur2 >> 64);
      for (int k = w + 2; c && k < 8; ++k) {
        u128 s2 = (u128)t[k] + c;
        t[k] = (u64)s2;
        c = (u64)(s2 >> 64);
      }
    }
  }
  Sc r;
  sc_barrett512(r, t);
  sc_mul(r, r, RINV_SC);
  Sc cur;
  std::memcpy(cur.v, out32, 32);
  sc_add(cur, cur, r);
  std::memcpy(out32, cur.v, 32);
}

}  // namespace

extern "C" {

int bp_gh_ifma_available() {
  return __builtin_cpu_supports("avx512f") &&
         __builtin_cpu_supports("avx512ifma");
}

// accumulator layout: per index j, 10 vectors: g limbs 0..4, h limbs 0..4
size_t bp_gh_acc_bytes(u64 nm) { return (size_t)nm * 10 * 64; }

// Accumulate the weighted g/h scalar contributions of k (<=8) proofs into
// acc (64-byte aligned, zero-initialized by the caller).  Scalar reference:
// the g/h loop of vprep_emit.  Derivation per index j in [0, nm):
//   g_w[j] = -rw*z - rw*a*s[j]
//   h_w[j] =  rw*z + y^-j * (rw*z^2 * z_and_2[j] - rw*b*s[nm-1-j])
// with s[j] built over u_sq and the REVERSED weighted s-vector built over
// u_inv_sq (the bits of nm-1-j complement those of j).
__attribute__((target("avx512f,avx512ifma")))
void bp_gh_accumulate_x8(const VPrepState* sts, const VEmitDerived* ders,
                         int k, u64 n, u64 m, int lg, void* acc) {
  const u64 nm = n * m;
  Vu* A = (Vu*)acc;

  // per-lane montgomery constants (zero lanes contribute multiples of l)
  Pack8 p_sa0 = {}, p_sb0 = {}, p_rwz = {}, p_w2 = {}, p_z = {}, p_yinv = {};
  Pack8* p_usq = new Pack8[lg]();
  Pack8* p_uinvsq = new Pack8[lg]();
  for (int l = 0; l < k; ++l) {
    const VPrepState& st = sts[l];
    const VEmitDerived& d = ders[l];
    Sc t, tm;
    sc_mul(t, d.rwa, d.allinv);   // seed of rw*a*s[j]
    mont_in(tm, t);
    pack_set(p_sa0, l, tm);
    sc_mul(t, d.rwb, st.prod);    // seed of rw*b*s[nm-1-j]
    mont_in(tm, t);
    pack_set(p_sb0, l, tm);
    mont_in(tm, d.rwz);
    pack_set(p_rwz, l, tm);
    mont_in(tm, d.rwzz);          // w2 seed: rw*z^2 * 2^0 * z^0
    pack_set(p_w2, l, tm);
    mont_in(tm, st.z);
    pack_set(p_z, l, tm);
    mont_in(tm, d.y_inv);
    pack_set(p_yinv, l, tm);
    for (int i = 0; i < lg; ++i) {
      mont_in(tm, d.u_sq[i]);
      pack_set(p_usq[i], l, tm);
      mont_in(tm, d.u_inv_sq[i]);
      pack_set(p_uinvsq[i], l, tm);
    }
  }

  Sc8 rwz, z_m, yinv_m, w2, w2base;
  pack_load(rwz, p_rwz);
  pack_load(z_m, p_z);
  pack_load(yinv_m, p_yinv);
  pack_load(w2, p_w2);
  w2base = w2;
  Sc8* usq = new Sc8[lg];
  Sc8* uinvsq = new Sc8[lg];
  for (int i = 0; i < lg; ++i) {
    pack_load(usq[i], p_usq[i]);
    pack_load(uinvsq[i], p_uinvsq[i]);
  }
  delete[] p_usq;
  delete[] p_uinvsq;

  Sc8 nrwz;  // 32L - rw*z, carried
  {
    Sc8 zero8;
    for (int i = 0; i < 5; ++i) zero8.v[i] = _mm512_setzero_si512();
    sub8_bias(nrwz, zero8, rwz);
    carry8(nrwz);
  }
  Sc8 two_m, yi;
  for (int i = 0; i < 5; ++i) {
    two_m.v[i] = bc(TWO_M52[i]);
    yi.v[i] = bc(ONE_M52[i]);
  }

  Sc8* sa = new Sc8[nm];  // rw*a*s[j]
  Sc8* sb = new Sc8[nm];  // rw*b*s[nm-1-j]
  pack_load(sa[0], p_sa0);
  pack_load(sb[0], p_sb0);

  for (u64 j = 0; j < nm; ++j) {
    if (j) {
      const int lgj = 63 - __builtin_clzll(j);
      const u64 prev = j - (1ULL << lgj);
      mul8(sa[j], sa[prev], usq[(lg - 1) - lgj]);
      mul8(sb[j], sb[prev], uinvsq[(lg - 1) - lgj]);
      if (j % n == 0) {
        mul8(w2base, w2base, z_m);  // z_and_2 block boundary: *z, 2^bit reset
        w2 = w2base;
      } else {
        mul8(w2, w2, two_m);
      }
    }
    Vu* Ag = A + j * 10;
    Vu* Ah = Ag + 5;
    Sc8 g;
    sub8_bias(g, nrwz, sa[j]);
    carry8(g);
    for (int i = 0; i < 5; ++i) Ag[i] = _mm512_add_epi64(Ag[i], g.v[i]);
    Sc8 inner, h;
    sub8_bias(inner, w2, sb[j]);
    carry8(inner);
    mul8(h, yi, inner);
    add8(h, h, rwz);
    carry8(h);
    for (int i = 0; i < 5; ++i) Ah[i] = _mm512_add_epi64(Ah[i], h.v[i]);
    mul8(yi, yi, yinv_m);
  }

  delete[] sa;
  delete[] sb;
  delete[] usq;
  delete[] uinvsq;
}

// Fold the lane accumulator into the canonical byte accumulator:
// static_gh[j]    += sum over lanes of acc.g[j]   (mod l)
// static_gh[nm+j] += sum over lanes of acc.h[j]   (mod l)
__attribute__((target("avx512f,avx512ifma")))
void bp_gh_fold(const void* acc, u64 nm, uint8_t* static_gh) {
  const Vu* A = (const Vu*)acc;
  alignas(64) u64 buf[5][8];
  for (u64 j = 0; j < nm; ++j) {
    for (int i = 0; i < 5; ++i)
      _mm512_store_si512((Vu*)buf[i], A[j * 10 + i]);
    fold_one(buf, static_gh + 32 * j);
    for (int i = 0; i < 5; ++i)
      _mm512_store_si512((Vu*)buf[i], A[j * 10 + 5 + i]);
    fold_one(buf, static_gh + 32 * (nm + j));
  }
}

}  // extern "C"
