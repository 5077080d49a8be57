// Vectorized mod-l scalar helpers + fused IPP-round kernels for the host
// tier.  The inner-product prover's per-round scalar work (cross inner
// products, masked coefficient vectors over the fixed basis, a/b and
// coefficient folds) runs here so the Python layer only orchestrates the
// lg(n) transcript interactions (reference src/inner_product_proof.rs:38-196).
//
// Boundary format: scalars are 32-byte little-endian, reduced mod l,
// packed contiguously.  Buffers are caller-allocated.
#include "sc255.h"

extern "C" {

void sc_vec_mul(size_t n, const uint8_t* a, const uint8_t* b, uint8_t* out) {
  Sc x, y, r;
  for (size_t i = 0; i < n; ++i) {
    std::memcpy(x.v, a + 32 * i, 32);
    std::memcpy(y.v, b + 32 * i, 32);
    sc_mul(r, x, y);
    std::memcpy(out + 32 * i, r.v, 32);
  }
}

void sc_vec_add(size_t n, const uint8_t* a, const uint8_t* b, uint8_t* out) {
  Sc x, y, r;
  for (size_t i = 0; i < n; ++i) {
    std::memcpy(x.v, a + 32 * i, 32);
    std::memcpy(y.v, b + 32 * i, 32);
    sc_add(r, x, y);
    std::memcpy(out + 32 * i, r.v, 32);
  }
}

void sc_vec_scale(size_t n, const uint8_t* a, const uint8_t s[32],
                  uint8_t* out) {
  Sc x, k, r;
  std::memcpy(k.v, s, 32);
  for (size_t i = 0; i < n; ++i) {
    std::memcpy(x.v, a + 32 * i, 32);
    sc_mul(r, x, k);
    std::memcpy(out + 32 * i, r.v, 32);
  }
}

void sc_vec_inner(size_t n, const uint8_t* a, const uint8_t* b,
                  uint8_t out[32]) {
  Sc x, y, p, acc = {{0, 0, 0, 0}};
  for (size_t i = 0; i < n; ++i) {
    std::memcpy(x.v, a + 32 * i, 32);
    std::memcpy(y.v, b + 32 * i, 32);
    sc_mul(p, x, y);
    sc_add(acc, acc, p);
  }
  std::memcpy(out, acc.v, 32);
}

// out[i] = x^i for i in 0..n-1 (exp_iter, reference src/util.rs:44-67)
void sc_powers(size_t n, const uint8_t x[32], uint8_t* out) {
  Sc k, acc = {{1, 0, 0, 0}};
  std::memcpy(k.v, x, 32);
  for (size_t i = 0; i < n; ++i) {
    std::memcpy(out + 32 * i, acc.v, 32);
    sc_mul(acc, acc, k);
  }
}

// single Fermat inversion (used by Scalar.invert on the host path)
void sc_invert1(const uint8_t in[32], uint8_t out[32]) {
  Sc x, r;
  std::memcpy(x.v, in, 32);
  sc_invert(r, x);
  std::memcpy(out, r.v, 32);
}

// in-place Montgomery batch inversion (reference Scalar::batch_invert)
void sc_vec_batch_invert(size_t n, uint8_t* a) {
  if (n == 0) return;
  Sc* prefix = new Sc[n];
  Sc x, acc = {{1, 0, 0, 0}};
  for (size_t i = 0; i < n; ++i) {
    prefix[i] = acc;
    std::memcpy(x.v, a + 32 * i, 32);
    sc_mul(acc, acc, x);
  }
  Sc inv_all;
  sc_invert(inv_all, acc);
  for (size_t i = n; i-- > 0;) {
    std::memcpy(x.v, a + 32 * i, 32);
    Sc r, tail;
    sc_mul(r, inv_all, prefix[i]);      // = 1/x_i * (suffix product inverse)
    std::memcpy(a + 32 * i, r.v, 32);
    sc_mul(inv_all, inv_all, x);        // peel x_i off the running inverse
  }
  delete[] prefix;
}

// One IPP round's scalar prep.  Current vectors a, b have length 2n; the
// fixed basis is [G(0..n_full) | H(0..n_full) | Q].  Emits the two masked
// coefficient vectors (2*n_full+1 scalars each, zero for the inactive
// half) and the cross inner products c_L = <a_L, b_R>, c_R = <a_R, b_L>.
void ipp_round_scalars(size_t n_full, size_t n,
                       const uint8_t* a, const uint8_t* b,
                       const uint8_t* g_coef, const uint8_t* h_coef,
                       uint8_t* scL, uint8_t* scR,
                       uint8_t cL[32], uint8_t cR[32]) {
  const size_t total = 2 * n_full + 1;
  std::memset(scL, 0, 32 * total);
  std::memset(scR, 0, 32 * total);
  const size_t period = 2 * n;
  Sc av, bv, cf, r;
  for (size_t k = 0; k < n_full; ++k) {
    const size_t rk = k % period;
    if (rk >= n) {  // k sits in the current G_R / H_R half
      std::memcpy(av.v, a + 32 * (rk - n), 32);          // a_L[rk-n]
      std::memcpy(cf.v, g_coef + 32 * k, 32);
      sc_mul(r, av, cf);
      std::memcpy(scL + 32 * k, r.v, 32);
      std::memcpy(bv.v, b + 32 * (rk - n), 32);          // b_L[rk-n]
      std::memcpy(cf.v, h_coef + 32 * k, 32);
      sc_mul(r, bv, cf);
      std::memcpy(scR + 32 * (n_full + k), r.v, 32);
    } else {        // current G_L / H_L half
      std::memcpy(av.v, a + 32 * (n + rk), 32);          // a_R[rk]
      std::memcpy(cf.v, g_coef + 32 * k, 32);
      sc_mul(r, av, cf);
      std::memcpy(scR + 32 * k, r.v, 32);
      std::memcpy(bv.v, b + 32 * (n + rk), 32);          // b_R[rk]
      std::memcpy(cf.v, h_coef + 32 * k, 32);
      sc_mul(r, bv, cf);
      std::memcpy(scL + 32 * (n_full + k), r.v, 32);
    }
  }
  // c_L = <a_L, b_R>, c_R = <a_R, b_L>
  Sc accL = {{0, 0, 0, 0}}, accR = {{0, 0, 0, 0}}, p;
  for (size_t i = 0; i < n; ++i) {
    std::memcpy(av.v, a + 32 * i, 32);
    std::memcpy(bv.v, b + 32 * (n + i), 32);
    sc_mul(p, av, bv);
    sc_add(accL, accL, p);
    std::memcpy(av.v, a + 32 * (n + i), 32);
    std::memcpy(bv.v, b + 32 * i, 32);
    sc_mul(p, av, bv);
    sc_add(accR, accR, p);
  }
  std::memcpy(cL, accL.v, 32);
  std::memcpy(cR, accR.v, 32);
}

// Post-challenge fold: a <- u a_L + u^-1 a_R, b <- u^-1 b_L + u b_R
// (first n entries; the tail is dead), and the coefficient updates
// g_coef[k] *= (R half ? u : u^-1), h_coef[k] *= (R half ? u^-1 : u).
void ipp_fold(size_t n_full, size_t n, uint8_t* a, uint8_t* b,
              uint8_t* g_coef, uint8_t* h_coef,
              const uint8_t u[32], const uint8_t u_inv[32]) {
  Sc uu, ui, x, y, t0, t1;
  std::memcpy(uu.v, u, 32);
  std::memcpy(ui.v, u_inv, 32);
  for (size_t i = 0; i < n; ++i) {
    std::memcpy(x.v, a + 32 * i, 32);
    std::memcpy(y.v, a + 32 * (n + i), 32);
    sc_mul(t0, x, uu);
    sc_mul(t1, y, ui);
    sc_add(t0, t0, t1);
    std::memcpy(a + 32 * i, t0.v, 32);
    std::memcpy(x.v, b + 32 * i, 32);
    std::memcpy(y.v, b + 32 * (n + i), 32);
    sc_mul(t0, x, ui);
    sc_mul(t1, y, uu);
    sc_add(t0, t0, t1);
    std::memcpy(b + 32 * i, t0.v, 32);
  }
  const size_t period = 2 * n;
  for (size_t k = 0; k < n_full; ++k) {
    const bool rhalf = (k % period) >= n;
    std::memcpy(x.v, g_coef + 32 * k, 32);
    sc_mul(x, x, rhalf ? uu : ui);
    std::memcpy(g_coef + 32 * k, x.v, 32);
    std::memcpy(y.v, h_coef + 32 * k, 32);
    sc_mul(y, y, rhalf ? ui : uu);
    std::memcpy(h_coef + 32 * k, y.v, 32);
  }
}

}  // extern "C"
