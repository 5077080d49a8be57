// Native transcript core: Keccak-f[1600] + STROBE-128 operations.
//
// Host-side replacement for the reference's merlin/keccak Rust dependencies
// (SURVEY.md §2b): transcript replay is on the critical path of batched
// verification (one replay per proof), so the byte-oriented sponge runs in
// C++ while all wide arithmetic runs on TPU.  Exposed via ctypes
// (bulletproofs_tpu/utils/strobe.py selects this backend when built).
//
// Build: native/build.sh -> native/libbptranscript.so

#include <cstdint>
#include <cstring>
#include <cstddef>

#if defined(__AVX512F__)
#include <immintrin.h>
#endif

namespace {

constexpr uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

// rotation offsets for lane (x, y), lane index = x + 5y
constexpr int ROT[5][5] = {
    {0, 36, 3, 41, 18},
    {1, 44, 10, 45, 2},
    {62, 6, 43, 15, 61},
    {28, 55, 25, 21, 56},
    {27, 20, 39, 8, 14},
};

inline uint64_t rol(uint64_t v, int n) {
  n &= 63;
  return n ? (v << n) | (v >> (64 - n)) : v;
}

void f1600_lanes(uint64_t a[25]) {
  for (int rnd = 0; rnd < 24; ++rnd) {
    // theta
    uint64_t c[5], d[5];
    for (int x = 0; x < 5; ++x)
      c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
    for (int x = 0; x < 5; ++x)
      d[x] = c[(x + 4) % 5] ^ rol(c[(x + 1) % 5], 1);
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y) a[x + 5 * y] ^= d[x];
    // rho + pi
    uint64_t b[25];
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rol(a[x + 5 * y], ROT[x][y]);
    // chi
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        a[x + 5 * y] = b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y]);
    // iota
    a[0] ^= RC[rnd];
  }
}

constexpr int STROBE_R = 166;
constexpr uint8_t FLAG_I = 1, FLAG_A = 2, FLAG_C = 4, FLAG_T = 8,
                  FLAG_M = 16, FLAG_K = 32;

struct Strobe {
  uint8_t state[200];
  uint8_t pos;
  uint8_t pos_begin;
  uint8_t cur_flags;
};

void run_f(Strobe* s) {
  s->state[s->pos] ^= s->pos_begin;
  s->state[s->pos + 1] ^= 0x04;
  s->state[STROBE_R + 1] ^= 0x80;
  uint64_t lanes[25];
  std::memcpy(lanes, s->state, 200);
  f1600_lanes(lanes);
  std::memcpy(s->state, lanes, 200);
  s->pos = 0;
  s->pos_begin = 0;
}

void absorb(Strobe* s, const uint8_t* data, size_t len) {
  for (size_t i = 0; i < len; ++i) {
    s->state[s->pos] ^= data[i];
    if (++s->pos == STROBE_R) run_f(s);
  }
}

void overwrite(Strobe* s, const uint8_t* data, size_t len) {
  for (size_t i = 0; i < len; ++i) {
    s->state[s->pos] = data[i];
    if (++s->pos == STROBE_R) run_f(s);
  }
}

void squeeze(Strobe* s, uint8_t* out, size_t len) {
  for (size_t i = 0; i < len; ++i) {
    out[i] = s->state[s->pos];
    s->state[s->pos] = 0;
    if (++s->pos == STROBE_R) run_f(s);
  }
}

void begin_op(Strobe* s, uint8_t flags, int more) {
  if (more) return;  // flag consistency is the caller's contract
  uint8_t hdr[2] = {s->pos_begin, flags};
  s->pos_begin = s->pos + 1;
  s->cur_flags = flags;
  absorb(s, hdr, 2);
  if ((flags & (FLAG_C | FLAG_K)) && s->pos != 0) run_f(s);
}

// ---- lane-pooled batched ops ------------------------------------------
// Batched verification/proving replays many independent transcripts
// through an IDENTICAL op schedule, so their permutations mostly align;
// per-byte sponge work stays scalar (cheap) and the Keccak-f permutations
// pool into one 8-way AVX-512 pass when available.

#if defined(__AVX512F__)
bool avx512_ok() {
  static const bool ok = __builtin_cpu_supports("avx512f");
  return ok;
}

// 8 independent Keccak-f[1600] states: st[word][lane]
void f1600_x8(uint64_t st[25][8]) {
  __m512i a[25];
  for (int i = 0; i < 25; ++i)
    a[i] = _mm512_loadu_si512((const void*)st[i]);
  const __m512i one = _mm512_set1_epi64(1);
  for (int rnd = 0; rnd < 24; ++rnd) {
    __m512i c[5], d[5];
    for (int x = 0; x < 5; ++x)
      c[x] = _mm512_xor_si512(
          _mm512_xor_si512(_mm512_xor_si512(a[x], a[x + 5]), a[x + 10]),
          _mm512_xor_si512(a[x + 15], a[x + 20]));
    for (int x = 0; x < 5; ++x)
      d[x] = _mm512_xor_si512(c[(x + 4) % 5],
                              _mm512_rolv_epi64(c[(x + 1) % 5], one));
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        a[x + 5 * y] = _mm512_xor_si512(a[x + 5 * y], d[x]);
    __m512i b[25];
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        b[y + 5 * ((2 * x + 3 * y) % 5)] =
            _mm512_rolv_epi64(a[x + 5 * y], _mm512_set1_epi64(ROT[x][y]));
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        a[x + 5 * y] = _mm512_xor_si512(
            b[x + 5 * y],
            _mm512_andnot_si512(b[(x + 1) % 5 + 5 * y],
                                b[(x + 2) % 5 + 5 * y]));
    a[0] = _mm512_xor_si512(a[0], _mm512_set1_epi64((long long)RC[rnd]));
  }
  for (int i = 0; i < 25; ++i)
    _mm512_storeu_si512((void*)st[i], a[i]);
}
#endif

// permute np pending lanes together (np <= 8); replicates run_f per lane
void pool_run_f(Strobe* const* pend, int np) {
#if defined(__AVX512F__)
  if (np >= 2 && avx512_ok()) {
    uint64_t st[25][8];
    uint64_t lanes[25];
    for (int l = 0; l < np; ++l) {
      Strobe* s = pend[l];
      s->state[s->pos] ^= s->pos_begin;
      s->state[s->pos + 1] ^= 0x04;
      s->state[STROBE_R + 1] ^= 0x80;
      std::memcpy(lanes, s->state, 200);
      for (int i = 0; i < 25; ++i) st[i][l] = lanes[i];
    }
    for (int l = np; l < 8; ++l)
      for (int i = 0; i < 25; ++i) st[i][l] = 0;
    f1600_x8(st);
    for (int l = 0; l < np; ++l) {
      for (int i = 0; i < 25; ++i) lanes[i] = st[i][l];
      std::memcpy(pend[l]->state, lanes, 200);
      pend[l]->pos = 0;
      pend[l]->pos_begin = 0;
    }
    return;
  }
#endif
  for (int l = 0; l < np; ++l) run_f(pend[l]);
}

// absorb the same-length message into k lanes, pooling permutations;
// handles divergent lane positions (e.g. different-length labels)
void absorb_x(int k, Strobe* const* ss, const uint8_t* const* data,
              size_t len) {
  size_t done[8] = {0, 0, 0, 0, 0, 0, 0, 0};
  for (;;) {
    Strobe* pend[8];
    int np = 0;
    bool all_done = true;
    for (int l = 0; l < k; ++l) {
      Strobe* s = ss[l];
      size_t d = done[l];
      while (d < len && s->pos < STROBE_R) {
        s->state[s->pos] ^= data[l][d];
        ++s->pos;
        ++d;
      }
      done[l] = d;
      if (s->pos == STROBE_R) pend[np++] = s;
      if (d < len) all_done = false;
    }
    if (np) pool_run_f(pend, np);
    else if (all_done) break;
  }
}

void squeeze_x(int k, Strobe* const* ss, uint8_t* const* out, size_t len) {
  size_t done[8] = {0, 0, 0, 0, 0, 0, 0, 0};
  for (;;) {
    Strobe* pend[8];
    int np = 0;
    bool all_done = true;
    for (int l = 0; l < k; ++l) {
      Strobe* s = ss[l];
      size_t d = done[l];
      while (d < len && s->pos < STROBE_R) {
        out[l][d] = s->state[s->pos];
        s->state[s->pos] = 0;
        ++s->pos;
        ++d;
      }
      done[l] = d;
      if (s->pos == STROBE_R) pend[np++] = s;
      if (d < len) all_done = false;
    }
    if (np) pool_run_f(pend, np);
    else if (all_done) break;
  }
}

void begin_op_x(int k, Strobe* const* ss, uint8_t flags) {
  uint8_t hdrs[8][2];
  const uint8_t* ptrs[8];
  for (int l = 0; l < k; ++l) {
    hdrs[l][0] = ss[l]->pos_begin;
    hdrs[l][1] = flags;
    ss[l]->pos_begin = ss[l]->pos + 1;
    ss[l]->cur_flags = flags;
    ptrs[l] = hdrs[l];
  }
  absorb_x(k, ss, ptrs, 2);
  if (flags & (FLAG_C | FLAG_K)) {
    Strobe* pend[8];
    int np = 0;
    for (int l = 0; l < k; ++l)
      if (ss[l]->pos != 0) pend[np++] = ss[l];
    if (np) pool_run_f(pend, np);
  }
}

}  // namespace

extern "C" {

void strobe_meta_ad_x(int k, Strobe* const* ss, const uint8_t* const* data,
                      size_t len, int more) {
  if (!more) begin_op_x(k, ss, FLAG_M | FLAG_A);
  absorb_x(k, ss, data, len);
}

void strobe_ad_x(int k, Strobe* const* ss, const uint8_t* const* data,
                 size_t len, int more) {
  if (!more) begin_op_x(k, ss, FLAG_A);
  absorb_x(k, ss, data, len);
}

void strobe_prf_x(int k, Strobe* const* ss, uint8_t* const* out, size_t len,
                  int more) {
  if (!more) begin_op_x(k, ss, FLAG_I | FLAG_A | FLAG_C);
  squeeze_x(k, ss, out, len);
}

void keccak_f1600(uint8_t* state200) {
  uint64_t lanes[25];
  std::memcpy(lanes, state200, 200);
  f1600_lanes(lanes);
  std::memcpy(state200, lanes, 200);
}

// Strobe state blob layout: 200 bytes state + pos + pos_begin + cur_flags.
const int strobe_sizeof = sizeof(Strobe);

void strobe_init(Strobe* s, const uint8_t* label, size_t len) {
  std::memset(s, 0, sizeof(Strobe));
  const uint8_t init[6] = {1, STROBE_R + 2, 1, 0, 1, 96};
  std::memcpy(s->state, init, 6);
  std::memcpy(s->state + 6, "STROBEv1.0.2", 12);
  uint64_t lanes[25];
  std::memcpy(lanes, s->state, 200);
  f1600_lanes(lanes);
  std::memcpy(s->state, lanes, 200);
  begin_op(s, FLAG_M | FLAG_A, 0);
  absorb(s, label, len);
}

void strobe_meta_ad(Strobe* s, const uint8_t* data, size_t len, int more) {
  begin_op(s, FLAG_M | FLAG_A, more);
  absorb(s, data, len);
}

void strobe_ad(Strobe* s, const uint8_t* data, size_t len, int more) {
  begin_op(s, FLAG_A, more);
  absorb(s, data, len);
}

void strobe_prf(Strobe* s, uint8_t* out, size_t len, int more) {
  begin_op(s, FLAG_I | FLAG_A | FLAG_C, more);
  squeeze(s, out, len);
}

void strobe_key(Strobe* s, const uint8_t* data, size_t len, int more) {
  begin_op(s, FLAG_A | FLAG_C, more);
  overwrite(s, data, len);
}

// Batched Merlin append_message: `count` messages of `msg_len` bytes each
// (concatenated in `msgs`), every one framed with the same label --
// byte-identical to `count` single appends, one library call instead of
// 3*count (the R1CS verifier absorbs one V point per committed input;
// 2^16-commitment circuits pay ~200k ctypes crossings without this).
void strobe_append_many(Strobe* s, const uint8_t* label, size_t label_len,
                        const uint8_t* msgs, size_t msg_len,
                        uint64_t count) {
  const uint8_t len_le[4] = {
      (uint8_t)(msg_len), (uint8_t)(msg_len >> 8),
      (uint8_t)(msg_len >> 16), (uint8_t)(msg_len >> 24)};
  for (uint64_t i = 0; i < count; ++i) {
    begin_op(s, FLAG_M | FLAG_A, 0);
    absorb(s, label, label_len);
    begin_op(s, FLAG_M | FLAG_A, 1);
    absorb(s, len_le, 4);
    begin_op(s, FLAG_A, 0);
    absorb(s, msgs + i * msg_len, msg_len);
  }
}

}  // extern "C"
