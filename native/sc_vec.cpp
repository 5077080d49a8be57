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



// ---------------------------------------------------------------------------
// R1CS vector stages: the n-length scalar math that dominates large-circuit
// host time (reference src/r1cs/prover.rs:549-637, verifier.rs:398-445).
// All arrays are packed 32-byte canonical scalars.
// ---------------------------------------------------------------------------

static inline void sc_ld(Sc& r, const uint8_t* p) { std::memcpy(r.v, p, 32); }
static inline void sc_st(uint8_t* p, const Sc& r) { std::memcpy(p, r.v, 32); }

// Build the degree-3 l/r polynomial coefficient vectors
// (prover.rs:549-577):
//   l1 = aL + y^-i o wR   l2 = aO   l3 = sL
//   r0 = wO - y^i         r1 = y^i o aR + wL   r3 = y^i o sR
// and accumulate the t-poly via the special inner product (l0 = r2 = 0,
// util.rs:122-146) in the same pass.  t_out = [t1..t6].
void r1cs_lr_polys(size_t n, const uint8_t y[32], const uint8_t y_inv[32],
                   const uint8_t* aL, const uint8_t* aR, const uint8_t* aO,
                   const uint8_t* sL, const uint8_t* sR,
                   const uint8_t* wL, const uint8_t* wR, const uint8_t* wO,
                   uint8_t* l1o, uint8_t* l2o, uint8_t* l3o,
                   uint8_t* r0o, uint8_t* r1o, uint8_t* r3o,
                   uint8_t* t_out) {
  Sc yy, yi, ey = {{1, 0, 0, 0}}, eyi = {{1, 0, 0, 0}};
  sc_ld(yy, y);
  sc_ld(yi, y_inv);
  Sc t[6];
  for (int k = 0; k < 6; ++k) t[k] = Sc{{0, 0, 0, 0}};
  Sc a, b, c, l1, l2, l3, r0, r1, r3, p;
  for (size_t i = 0; i < n; ++i) {
    // l1 = aL + y^-i * wR
    sc_ld(a, aL + 32 * i);
    sc_ld(b, wR + 32 * i);
    sc_mul(c, eyi, b);
    sc_add(l1, a, c);
    sc_ld(l2, aO + 32 * i);
    sc_ld(l3, sL + 32 * i);
    // r0 = wO - y^i
    sc_ld(a, wO + 32 * i);
    sc_sub(r0, a, ey);
    // r1 = y^i * aR + wL
    sc_ld(a, aR + 32 * i);
    sc_mul(c, ey, a);
    sc_ld(b, wL + 32 * i);
    sc_add(r1, c, b);
    // r3 = y^i * sR
    sc_ld(a, sR + 32 * i);
    sc_mul(r3, ey, a);
    sc_st(l1o + 32 * i, l1);
    sc_st(l2o + 32 * i, l2);
    sc_st(l3o + 32 * i, l3);
    sc_st(r0o + 32 * i, r0);
    sc_st(r1o + 32 * i, r1);
    sc_st(r3o + 32 * i, r3);
    // t1 += l1 r0; t2 += l1 r1 + l2 r0; t3 += l2 r1 + l3 r0;
    // t4 += l1 r3 + l3 r1; t5 += l2 r3; t6 += l3 r3
    sc_mul(p, l1, r0); sc_add(t[0], t[0], p);
    sc_mul(p, l1, r1); sc_add(t[1], t[1], p);
    sc_mul(p, l2, r0); sc_add(t[1], t[1], p);
    sc_mul(p, l2, r1); sc_add(t[2], t[2], p);
    sc_mul(p, l3, r0); sc_add(t[2], t[2], p);
    sc_mul(p, l1, r3); sc_add(t[3], t[3], p);
    sc_mul(p, l3, r1); sc_add(t[3], t[3], p);
    sc_mul(p, l2, r3); sc_add(t[4], t[4], p);
    sc_mul(p, l3, r3); sc_add(t[5], t[5], p);
    sc_mul(ey, ey, yy);
    sc_mul(eyi, eyi, yi);
  }
  for (int k = 0; k < 6; ++k) sc_st(t_out + 32 * k, t[k]);
}

// Evaluate l(x), r(x) (prover.rs:614-631): l = x l1 + x^2 l2 + x^3 l3;
// r = r0 + x r1 + x^3 r3; the pad region [n, padded_n) gets l = 0,
// r[i] = -y^i (y_n = y^n supplied by the caller).
void r1cs_lr_eval(size_t n, size_t padded_n, const uint8_t x[32],
                  const uint8_t y[32], const uint8_t y_n[32],
                  const uint8_t* l1, const uint8_t* l2, const uint8_t* l3,
                  const uint8_t* r0, const uint8_t* r1, const uint8_t* r3,
                  uint8_t* l_out, uint8_t* r_out) {
  Sc xx, x2, x3, a, b, c, acc;
  sc_ld(xx, x);
  sc_mul(x2, xx, xx);
  sc_mul(x3, x2, xx);
  for (size_t i = 0; i < n; ++i) {
    sc_ld(a, l1 + 32 * i); sc_mul(acc, a, xx);
    sc_ld(a, l2 + 32 * i); sc_mul(b, a, x2); sc_add(acc, acc, b);
    sc_ld(a, l3 + 32 * i); sc_mul(b, a, x3); sc_add(acc, acc, b);
    sc_st(l_out + 32 * i, acc);
    sc_ld(acc, r0 + 32 * i);
    sc_ld(a, r1 + 32 * i); sc_mul(b, a, xx); sc_add(acc, acc, b);
    sc_ld(a, r3 + 32 * i); sc_mul(b, a, x3); sc_add(acc, acc, b);
    sc_st(r_out + 32 * i, acc);
  }
  Sc ey, yy, zero = {{0, 0, 0, 0}};
  sc_ld(ey, y_n);
  sc_ld(yy, y);
  for (size_t i = n; i < padded_n; ++i) {
    sc_st(l_out + 32 * i, zero);
    sc_sub(c, zero, ey);
    sc_st(r_out + 32 * i, c);
    sc_mul(ey, ey, yy);
  }
}

// Verifier scalar streams (verifier.rs:398-445): recompute the IPP
// s-vector from the round challenges, then emit g/h scalars, delta, and
// the squared (inverse) challenges.  wL/wR/wO are zero-padded to padded_n.
void r1cs_verify_scalars(size_t padded_n, size_t n1, size_t lg_n,
                         const uint8_t* u_chals, const uint8_t x[32],
                         const uint8_t y_inv[32], const uint8_t u[32],
                         const uint8_t a[32], const uint8_t b[32],
                         const uint8_t* wL, const uint8_t* wR,
                         const uint8_t* wO,
                         uint8_t* g_out, uint8_t* h_out,
                         uint8_t delta_out[32],
                         uint8_t* u_sq_out, uint8_t* u_inv_sq_out) {
  Sc* uc = new Sc[lg_n];
  Sc* uinv = new Sc[lg_n];
  Sc* usq = new Sc[lg_n];
  Sc* uisq = new Sc[lg_n];
  Sc allinv = {{1, 0, 0, 0}};
  for (size_t k = 0; k < lg_n; ++k) {
    sc_ld(uc[k], u_chals + 32 * k);
    sc_invert(uinv[k], uc[k]);
    sc_mul(usq[k], uc[k], uc[k]);
    sc_mul(uisq[k], uinv[k], uinv[k]);
    sc_mul(allinv, allinv, uinv[k]);
    sc_st(u_sq_out + 32 * k, usq[k]);
    sc_st(u_inv_sq_out + 32 * k, uisq[k]);
  }
  // s[0] = prod u_inv; s[i] = s[i - 2^lg(i)] * u_{(lg_n-1)-lg(i)}^2
  Sc* s = new Sc[padded_n];
  s[0] = allinv;
  for (size_t i = 1; i < padded_n; ++i) {
    int lg_i = 63 - __builtin_clzll((unsigned long long)i);
    size_t k = (size_t)1 << lg_i;
    sc_mul(s[i], s[i - k], usq[(lg_n - 1) - lg_i]);
  }
  Sc yi, eyi = {{1, 0, 0, 0}}, uu, xx, aa, bb;
  sc_ld(yi, y_inv);
  sc_ld(uu, u);
  sc_ld(xx, x);
  sc_ld(aa, a);
  sc_ld(bb, b);
  Sc one = {{1, 0, 0, 0}}, delta = {{0, 0, 0, 0}};
  Sc wr, wl, wo, ywr, t0, t1, g, h;
  for (size_t i = 0; i < padded_n; ++i) {
    sc_ld(wr, wR + 32 * i);
    sc_ld(wl, wL + 32 * i);
    sc_ld(wo, wO + 32 * i);
    sc_mul(ywr, wr, eyi);                  // y^-i * wR_i
    sc_mul(t0, ywr, wl);
    sc_add(delta, delta, t0);              // delta = <y^-n o wR, wL>
    // g = u_or_1 * (x * ywr - a * s_i)
    sc_mul(t0, xx, ywr);
    sc_mul(t1, aa, s[i]);
    sc_sub(g, t0, t1);
    if (i >= n1) sc_mul(g, g, uu);
    sc_st(g_out + 32 * i, g);
    // h = u_or_1 * (y^-i * (x wL + wO - b s_rev) - 1)
    sc_mul(t0, xx, wl);
    sc_add(t0, t0, wo);
    sc_mul(t1, bb, s[padded_n - 1 - i]);
    sc_sub(t0, t0, t1);
    sc_mul(h, eyi, t0);
    sc_sub(h, h, one);
    if (i >= n1) sc_mul(h, h, uu);
    sc_st(h_out + 32 * i, h);
    sc_mul(eyi, eyi, yi);
  }
  sc_st(delta_out, delta);
  delete[] uc; delete[] uinv; delete[] usq; delete[] uisq; delete[] s;
}

// acc[i] += w * xs[i] (the batch verifier's per-proof generator-scalar
// accumulation, an extension of verifier.rs:447-449 across proofs)
void sc_vec_axpy(size_t n, uint8_t* acc, const uint8_t w[32],
                 const uint8_t* xs) {
  Sc ww, x, av, p;
  sc_ld(ww, w);
  for (size_t i = 0; i < n; ++i) {
    sc_ld(x, xs + 32 * i);
    sc_ld(av, acc + 32 * i);
    sc_mul(p, ww, x);
    sc_add(av, av, p);
    sc_st(acc + 32 * i, av);
  }
}

// H_factors for the IPP over u-modified generators: h[i] = y^-i * gf[i]
// (prover.rs:648-656); gf is 1 for i < n1 and u beyond.
void r1cs_hg_factors(size_t padded_n, size_t n1, const uint8_t y_inv[32],
                     const uint8_t u[32], uint8_t* g_out, uint8_t* h_out) {
  Sc yi, eyi = {{1, 0, 0, 0}}, uu, one = {{1, 0, 0, 0}}, h;
  sc_ld(yi, y_inv);
  sc_ld(uu, u);
  for (size_t i = 0; i < padded_n; ++i) {
    const Sc& g = i < n1 ? one : uu;
    sc_st(g_out + 32 * i, g);
    sc_mul(h, eyi, g);
    sc_st(h_out + 32 * i, h);
    sc_mul(eyi, eyi, yi);
  }
}

}  // extern "C"
