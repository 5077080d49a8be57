// Shared host-side scalar (mod l) arithmetic + Merlin/STROBE transcript
// helpers for the native prep engines (verify_prep.cpp, prove_prep.cpp).
// All functions are static/inline: each translation unit gets its own copy.
#ifndef BPTPU_SC255_H
#define BPTPU_SC255_H

#include <cstdint>
#include <cstring>
#include <cstddef>

using u64 = uint64_t;
using u128 = unsigned __int128;

// ---------------------------------------------------------------------------
// scalars mod l (4x64 little-endian limbs)
// ---------------------------------------------------------------------------

struct Sc {
  u64 v[4];
};

static const Sc L_ORDER = {{0x5812631a5cf5d3edULL, 0x14def9dea2f79cd6ULL,
                            0x0000000000000000ULL, 0x1000000000000000ULL}};
// mu = floor(2^512 / L), 5 limbs (for Barrett)
// computed offline: 2^512 / L
static const u64 BARRETT_MU[5] = {0xed9ce5a30a2c131bULL, 0x2106215d086329a7ULL,
                                  0xffffffffffffffebULL, 0xffffffffffffffffULL,
                                  0x000000000000000fULL};

static inline int sc_cmp(const Sc& a, const Sc& b) {
  for (int i = 3; i >= 0; --i) {
    if (a.v[i] < b.v[i]) return -1;
    if (a.v[i] > b.v[i]) return 1;
  }
  return 0;
}

static inline void sc_sub_raw(Sc& r, const Sc& a, const Sc& b) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    r.v[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

static inline void sc_cond_reduce(Sc& a) {
  if (sc_cmp(a, L_ORDER) >= 0) {
    Sc t;
    sc_sub_raw(t, a, L_ORDER);
    a = t;
  }
}

static void sc_add(Sc& r, const Sc& a, const Sc& b) {
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    r.v[i] = (u64)s;
    carry = s >> 64;
  }
  sc_cond_reduce(r);
}

static void sc_sub(Sc& r, const Sc& a, const Sc& b) {
  if (sc_cmp(a, b) >= 0) {
    sc_sub_raw(r, a, b);
  } else {
    Sc t;
    sc_sub_raw(t, b, a);        // t = b - a
    sc_sub_raw(r, L_ORDER, t);  // r = L - t
  }
}

static void sc_neg(Sc& r, const Sc& a) {
  Sc zero = {{0, 0, 0, 0}};
  if (a.v[0] == 0 && a.v[1] == 0 && a.v[2] == 0 && a.v[3] == 0) {
    r = zero;
  } else {
    sc_sub_raw(r, L_ORDER, a);
  }
}

// Barrett reduction of a 512-bit little-endian value mod L.
static void sc_barrett512(Sc& r, const u64 t[8]) {
  // Barrett: q = floor( floor(t / 2^192) * mu / 2^320 )  (mu = 2^512/L)
  // then r = t - q*L, with <= 2 conditional subtracts.
  // q1 = t >> 192 -> 5 limbs
  u64 q1[5] = {t[3], t[4], t[5], t[6], t[7]};
  // q2 = q1 * mu (10 limbs), keep q3 = q2 >> 320 -> limbs 5.. (5 limbs used)
  u64 q2[10] = {0};
  for (int i = 0; i < 5; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 5; ++j) {
      u128 cur = (u128)q1[i] * BARRETT_MU[j] + q2[i + j] + carry;
      q2[i + j] = (u64)cur;
      carry = cur >> 64;
    }
    q2[i + 5] += (u64)carry;
  }
  u64 q3[5] = {q2[5], q2[6], q2[7], q2[8], q2[9]};
  // r = t - q3 * L  (low 5 limbs suffice)
  u64 ql[5] = {0};
  for (int i = 0; i < 5; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4 && i + j < 5; ++j) {
      u128 cur = (u128)q3[i] * L_ORDER.v[j] + ql[i + j] + carry;
      ql[i + j] = (u64)cur;
      carry = cur >> 64;
    }
    if (i + 4 < 5) ql[i + 4] += (u64)carry;
  }
  u64 rem[5];
  u128 borrow = 0;
  for (int i = 0; i < 5; ++i) {
    u128 d = (u128)t[i] - ql[i] - borrow;
    rem[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  // rem < 3L fits in 5 limbs (top limb tiny); conditional subtracts
  for (int k = 0; k < 3; ++k) {
    // compare rem (5 limbs) with L (4 limbs)
    bool ge = rem[4] > 0;
    if (!ge) {
      Sc cur = {{rem[0], rem[1], rem[2], rem[3]}};
      ge = sc_cmp(cur, L_ORDER) >= 0;
    }
    if (!ge) break;
    u128 bor = 0;
    for (int i = 0; i < 5; ++i) {
      u64 li = i < 4 ? L_ORDER.v[i] : 0;
      u128 d = (u128)rem[i] - li - bor;
      rem[i] = (u64)d;
      bor = (d >> 64) ? 1 : 0;
    }
  }
  r.v[0] = rem[0]; r.v[1] = rem[1]; r.v[2] = rem[2]; r.v[3] = rem[3];
}

// 512-bit product then Barrett reduction mod L
static void sc_mul(Sc& r, const Sc& a, const Sc& b) {
  u64 t[8] = {0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)a.v[i] * b.v[j] + t[i + j] + carry;
      t[i + j] = (u64)cur;
      carry = cur >> 64;
    }
    t[i + 4] = (u64)carry;
  }
  sc_barrett512(r, t);
}

static void sc_from_wide(Sc& r, const uint8_t wide[64]) {
  // 64 bytes LE mod L: split into lo (32B) + hi (32B)*2^256
  Sc lo, hi;
  std::memcpy(lo.v, wide, 32);
  std::memcpy(hi.v, wide + 32, 32);
  // 2^256 mod L precomputed
  static const Sc R256 = {{0xd6ec31748d98951dULL, 0xc6ef5bf4737dcf70ULL,
                           0xfffffffffffffffeULL, 0x0fffffffffffffffULL}};
  Sc lo_red = lo;
  // lo may exceed L: Barrett via mul by 1? simpler: cond-subtract up to 15 times
  // (lo < 2^256 < 16L)
  for (int i = 0; i < 16; ++i) sc_cond_reduce(lo_red);
  Sc hi_red = hi;
  for (int i = 0; i < 16; ++i) sc_cond_reduce(hi_red);
  Sc t;
  sc_mul(t, hi_red, R256);
  sc_add(r, lo_red, t);
}

static void sc_invert(Sc& r, const Sc& a) {
  // a^(L-2) by square-and-multiply (vartime ok: public verification scalars)
  Sc exp;
  Sc two = {{2, 0, 0, 0}};
  sc_sub_raw(exp, L_ORDER, two);
  Sc base = a;
  Sc acc = {{1, 0, 0, 0}};
  for (int i = 0; i < 4; ++i) {
    u64 e = exp.v[i];
    for (int b = 0; b < 64; ++b) {
      if (e & 1) sc_mul(acc, acc, base);
      sc_mul(base, base, base);
      e >>= 1;
    }
  }
  r = acc;
}

// ---------------------------------------------------------------------------
// STROBE (reuse from transcript.cpp via extern decls)
// ---------------------------------------------------------------------------

struct Strobe {
  uint8_t state[200];
  uint8_t pos;
  uint8_t pos_begin;
  uint8_t cur_flags;
};

extern "C" {
void strobe_meta_ad(Strobe* s, const uint8_t* data, size_t len, int more);
void strobe_ad(Strobe* s, const uint8_t* data, size_t len, int more);
void strobe_prf(Strobe* s, uint8_t* out, size_t len, int more);
// lane-pooled batched variants (transcript.cpp): k <= 8 transcripts run
// the same op; permutations pool into one 8-way Keccak pass
void strobe_meta_ad_x(int k, Strobe* const* ss, const uint8_t* const* data,
                      size_t len, int more);
void strobe_ad_x(int k, Strobe* const* ss, const uint8_t* const* data,
                 size_t len, int more);
void strobe_prf_x(int k, Strobe* const* ss, uint8_t* const* out, size_t len,
                  int more);
}

static void t_append(Strobe* s, const char* label, size_t label_len,
                     const uint8_t* msg, size_t msg_len) {
  uint8_t len_le[4] = {(uint8_t)(msg_len), (uint8_t)(msg_len >> 8),
                       (uint8_t)(msg_len >> 16), (uint8_t)(msg_len >> 24)};
  strobe_meta_ad(s, (const uint8_t*)label, label_len, 0);
  strobe_meta_ad(s, len_le, 4, 1);
  strobe_ad(s, msg, msg_len, 0);
}

static void t_append_u64(Strobe* s, const char* label, size_t label_len, u64 x) {
  uint8_t le[8];
  for (int i = 0; i < 8; ++i) le[i] = (uint8_t)(x >> (8 * i));
  t_append(s, label, label_len, le, 8);
}

static void t_challenge(Strobe* s, const char* label, size_t label_len, Sc* out) {
  uint8_t len_le[4] = {64, 0, 0, 0};
  strobe_meta_ad(s, (const uint8_t*)label, label_len, 0);
  strobe_meta_ad(s, len_le, 4, 1);
  uint8_t buf[64];
  strobe_prf(s, buf, 64, 0);
  sc_from_wide(*out, buf);
}

// batched t_* helpers: shared label/length, per-lane message pointers
static void t_append_x(int k, Strobe* const* ss, const char* label,
                       size_t label_len, const uint8_t* const* msgs,
                       size_t msg_len) {
  uint8_t len_le[4] = {(uint8_t)(msg_len), (uint8_t)(msg_len >> 8),
                       (uint8_t)(msg_len >> 16), (uint8_t)(msg_len >> 24)};
  const uint8_t* shared[8];
  for (int l = 0; l < k; ++l) shared[l] = (const uint8_t*)label;
  strobe_meta_ad_x(k, ss, shared, label_len, 0);
  for (int l = 0; l < k; ++l) shared[l] = len_le;
  strobe_meta_ad_x(k, ss, shared, 4, 1);
  strobe_ad_x(k, ss, msgs, msg_len, 0);
}

static void t_append_u64_x(int k, Strobe* const* ss, const char* label,
                           size_t label_len, u64 x) {
  uint8_t le[8];
  for (int i = 0; i < 8; ++i) le[i] = (uint8_t)(x >> (8 * i));
  const uint8_t* msgs[8];
  for (int l = 0; l < k; ++l) msgs[l] = le;
  t_append_x(k, ss, label, label_len, msgs, 8);
}

static void t_challenge_x(int k, Strobe* const* ss, const char* label,
                          size_t label_len, Sc* const* outs) {
  uint8_t len_le[4] = {64, 0, 0, 0};
  const uint8_t* shared[8];
  for (int l = 0; l < k; ++l) shared[l] = (const uint8_t*)label;
  strobe_meta_ad_x(k, ss, shared, label_len, 0);
  for (int l = 0; l < k; ++l) shared[l] = len_le;
  strobe_meta_ad_x(k, ss, shared, 4, 1);
  uint8_t bufs[8][64];
  uint8_t* outs_b[8];
  for (int l = 0; l < k; ++l) outs_b[l] = bufs[l];
  strobe_prf_x(k, ss, outs_b, 64, 0);
  for (int l = 0; l < k; ++l) sc_from_wide(*outs[l], bufs[l]);
}

// Shared replay state for the batched verification preps (verify_prep.cpp
// and the vectorized emit TU verify_emit_ifma.cpp).
constexpr int kMaxLg = 40;  // nm <= 2^40; far beyond practical proof sizes

struct VPrepState {
  Sc y, z, x, w, c, rw;
  Sc t_x, t_x_blinding, e_blinding, a, b;
  Sc u[kMaxLg];
  Sc prod;        // prod_i u_i
  Sc prod_y;      // prod * y  (the single value needing inversion)
  Sc prod_y_inv;  // filled by the caller (shared batch inversion)
};

// Per-proof values derived from VPrepState once the shared batch inversion
// has filled prod_y_inv; consumed by both the dyn/static-pair head emit and
// the O(nm) g/h loops (scalar in verify_prep.cpp, 8-proof-lockstep AVX-512
// IFMA in verify_emit_ifma.cpp).
struct VEmitDerived {
  Sc allinv;             // prod(u)^-1
  Sc y_inv;              // y^-1
  Sc u_sq[kMaxLg];       // u_i^2
  Sc u_inv_sq[kMaxLg];   // u_i^-2
  Sc rwa, rwb, rwz, rwzz;  // batch weight r times a, b, z, z^2
};

static bool is_zero32(const uint8_t* p) {
  for (int i = 0; i < 32; ++i)
    if (p[i]) return false;
  return true;
}

// 8-proof-lockstep g/h scalar accumulation (verify_emit_ifma.cpp; gated on
// AVX-512 IFMA at runtime).  The accumulator is an opaque 64-byte-aligned
// buffer holding the 2nm static g/h scalar sums in 8-lane Montgomery form;
// bp_gh_fold converts it out and adds into the canonical byte accumulator.
extern "C" {
int bp_gh_ifma_available();
size_t bp_gh_acc_bytes(u64 nm);
void bp_gh_accumulate_x8(const VPrepState* sts, const VEmitDerived* ders,
                         int k, u64 n, u64 m, int lg, void* acc);
void bp_gh_fold(const void* acc, u64 nm, uint8_t* static_gh);
}


#endif  // BPTPU_SC255_H
