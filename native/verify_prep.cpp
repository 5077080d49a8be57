// Native batched-verification prep: per-proof transcript replay and
// verification-scalar computation for aggregated range proofs.
//
// This is the host-side critical path of fused batch verification (one call
// per proof); the Python implementation (RangeProof.verification_scalars_ints)
// remains the semantic reference and cross-validation oracle.  All scalar
// arithmetic is mod l = 2^252 + 27742... using 4x64-bit limbs with __int128.
//
// Exposed via ctypes from bulletproofs_tpu/parallel/batch_verify.py.

#include "sc255.h"

// ---------------------------------------------------------------------------
// rangeproof verification prep
// ---------------------------------------------------------------------------

extern "C" {

// Inputs:
//   strobe:     transcript state AFTER Transcript(label) init (mutated)
//   proof:      proof bytes laid out as [A,S,T1,T2 | t_x,t_x_b,e_b | L0,R0..| a,b]
//               (the canonical RangeProof wire format), proof_len bytes
//   vcs:        m * 32 bytes of value commitments
//   n, m:       bitsize and aggregation size (n*m a power of two)
//   c_wide:     64 uniform bytes for the equation-batching scalar c
//   r_wide:     64 uniform bytes for this proof's batch weight r
// Outputs (all little-endian 32-byte scalars):
//   dyn_scalars:    (4 + 2*lg(nm) + m) * 32 bytes   [A,S,T1,T2, L.., R.., V..],
//                   each already multiplied by r
//   static_acc:     (2 + 2*n*m) * 32 bytes          [B_blinding, B, g.., h..],
//                   ACCUMULATOR: acc[j] += r * scalar_j (mod L) in place
// Returns 0 on success, nonzero error code otherwise.
int rangeproof_verify_prep(Strobe* strobe, const uint8_t* proof,
                           size_t proof_len, const uint8_t* vcs, u64 n, u64 m,
                           const uint8_t* c_wide, const uint8_t* r_wide,
                           uint8_t* dyn_scalars, uint8_t* static_acc) {
  const u64 nm = n * m;
  // lg(nm)
  int lg = 0;
  while ((1ULL << lg) < nm) ++lg;
  if ((1ULL << lg) != nm) return 1;
  const size_t expect = 32 * (7 + 2 * (size_t)lg + 2);
  if (proof_len != expect) return 2;

  const uint8_t* A = proof;
  const uint8_t* S = proof + 32;
  const uint8_t* T1 = proof + 64;
  const uint8_t* T2 = proof + 96;
  const uint8_t* t_x_b = proof + 128;
  const uint8_t* t_x_blinding_b = proof + 160;
  const uint8_t* e_blinding_b = proof + 192;
  const uint8_t* LR = proof + 224;
  const uint8_t* ab = LR + 64 * (size_t)lg;

  // transcript replay
  t_append(strobe, "dom-sep", 7, (const uint8_t*)"rangeproof v1", 13);
  t_append_u64(strobe, "n", 1, n);
  t_append_u64(strobe, "m", 1, m);
  for (u64 j = 0; j < m; ++j) t_append(strobe, "V", 1, vcs + 32 * j, 32);
  if (is_zero32(A) || is_zero32(S)) return 3;
  t_append(strobe, "A", 1, A, 32);
  t_append(strobe, "S", 1, S, 32);
  Sc y, z, x, w;
  t_challenge(strobe, "y", 1, &y);
  t_challenge(strobe, "z", 1, &z);
  if (is_zero32(T1) || is_zero32(T2)) return 3;
  t_append(strobe, "T_1", 3, T1, 32);
  t_append(strobe, "T_2", 3, T2, 32);
  t_challenge(strobe, "x", 1, &x);
  t_append(strobe, "t_x", 3, t_x_b, 32);
  t_append(strobe, "t_x_blinding", 12, t_x_blinding_b, 32);
  t_append(strobe, "e_blinding", 10, e_blinding_b, 32);
  t_challenge(strobe, "w", 1, &w);

  Sc c, rw;
  sc_from_wide(c, c_wide);
  sc_from_wide(rw, r_wide);

  // ipp challenges
  t_append(strobe, "dom-sep", 7, (const uint8_t*)"ipp v1", 6);
  t_append_u64(strobe, "n", 1, nm);
  Sc* u = new Sc[lg];
  for (int i = 0; i < lg; ++i) {
    const uint8_t* Li = LR + 64 * (size_t)i;
    const uint8_t* Ri = Li + 32;
    if (is_zero32(Li) || is_zero32(Ri)) {
      delete[] u;
      return 3;
    }
    t_append(strobe, "L", 1, Li, 32);
    t_append(strobe, "R", 1, Ri, 32);
    t_challenge(strobe, "u", 1, &u[i]);
  }

  // canonical scalar loads (already validated at deserialization; trust here)
  Sc t_x, t_x_blinding, e_blinding, a, b;
  std::memcpy(t_x.v, t_x_b, 32);
  std::memcpy(t_x_blinding.v, t_x_blinding_b, 32);
  std::memcpy(e_blinding.v, e_blinding_b, 32);
  std::memcpy(a.v, ab, 32);
  std::memcpy(b.v, ab + 32, 32);

  // one shared Fermat inversion for (prod_u * y): allinv = prod_u^-1 and
  // y_inv = y^-1 both derive from it (sc_invert dominates host prep cost)
  Sc prod = {{1, 0, 0, 0}};
  for (int i = 0; i < lg; ++i) sc_mul(prod, prod, u[i]);
  Sc prod_y, prod_y_inv;
  sc_mul(prod_y, prod, y);
  sc_invert(prod_y_inv, prod_y);
  Sc allinv;
  sc_mul(allinv, prod_y_inv, y);
  Sc y_inv;
  sc_mul(y_inv, prod_y_inv, prod);
  Sc* uinv = new Sc[lg];
  {
    // suffix products
    Sc* suf = new Sc[lg + 1];
    suf[lg] = {{1, 0, 0, 0}};
    for (int i = lg - 1; i >= 0; --i) sc_mul(suf[i], suf[i + 1], u[i]);
    Sc pre = {{1, 0, 0, 0}};
    for (int i = 0; i < lg; ++i) {
      Sc t0;
      sc_mul(t0, allinv, pre);
      sc_mul(uinv[i], t0, suf[i + 1]);
      sc_mul(pre, pre, u[i]);
    }
    delete[] suf;
  }

  Sc* u_sq = new Sc[lg];
  Sc* u_inv_sq = new Sc[lg];
  for (int i = 0; i < lg; ++i) {
    sc_mul(u_sq[i], u[i], u[i]);
    sc_mul(u_inv_sq[i], uinv[i], uinv[i]);
  }

  // s vector
  Sc* s = new Sc[nm];
  s[0] = allinv;
  for (u64 i = 1; i < nm; ++i) {
    int lg_i = 63 - __builtin_clzll(i);
    u64 k = 1ULL << lg_i;
    sc_mul(s[i], s[i - k], u_sq[(lg - 1) - lg_i]);
  }

  Sc zz, minus_z;
  sc_mul(zz, z, z);
  sc_neg(minus_z, z);

  // dyn scalars: [1, x, c*x, c*x*x] + u_sq + u_inv_sq + vc_scalars
  Sc one = {{1, 0, 0, 0}};
  Sc cx, cxx;
  sc_mul(cx, c, x);
  sc_mul(cxx, cx, x);
  uint8_t* out = dyn_scalars;
  bool accumulate = false;
  auto emit = [&out, &rw, &accumulate](const Sc& v) {
    Sc weighted;
    sc_mul(weighted, rw, v);
    if (accumulate) {
      Sc cur;
      std::memcpy(cur.v, out, 32);
      sc_add(weighted, weighted, cur);
    }
    std::memcpy(out, weighted.v, 32);
    out += 32;
  };
  emit(one);
  emit(x);
  emit(cx);
  emit(cxx);
  for (int i = 0; i < lg; ++i) emit(u_sq[i]);
  for (int i = 0; i < lg; ++i) emit(u_inv_sq[i]);
  // vc scalars: c * zz * z^j
  {
    Sc czz;
    sc_mul(czz, c, zz);
    Sc zj = czz;
    for (u64 j = 0; j < m; ++j) {
      emit(zj);
      sc_mul(zj, zj, z);
    }
  }

  // static scalars: [-e_blinding - c*t_x_blinding, basepoint_scalar] + g + h
  out = static_acc;
  accumulate = true;
  {
    Sc t0, t1;
    sc_mul(t0, c, t_x_blinding);
    sc_add(t0, t0, e_blinding);
    sc_neg(t0, t0);
    emit(t0);
    // delta(n, m, y, z) = (z - z^2) * sum_y - z^3 * sum_2 * sum_z
    auto sum_powers = [](const Sc& xv, u64 cnt) {
      // cnt is a power of two
      Sc result, factor;
      if (cnt == 0) return Sc{{0, 0, 0, 0}};
      if (cnt == 1) return Sc{{1, 0, 0, 0}};
      Sc one_ = {{1, 0, 0, 0}};
      sc_add(result, one_, xv);
      factor = xv;
      u64 mm = cnt;
      while (mm > 2) {
        sc_mul(factor, factor, factor);
        Sc t2;
        sc_mul(t2, factor, result);
        sc_add(result, result, t2);
        mm /= 2;
      }
      return result;
    };
    Sc two = {{2, 0, 0, 0}};
    Sc sum_y = sum_powers(y, nm);
    Sc sum_2 = sum_powers(two, n);
    Sc sum_z = sum_powers(z, m);
    Sc zmzz, d0, z3, d1, delta;
    sc_sub(zmzz, z, zz);
    sc_mul(d0, zmzz, sum_y);
    sc_mul(z3, zz, z);
    sc_mul(d1, z3, sum_2);
    sc_mul(d1, d1, sum_z);
    sc_sub(delta, d0, d1);
    // basepoint = w*(t_x - a*b) + c*(delta - t_x)
    Sc abm, wterm, dterm, bp;
    sc_mul(abm, a, b);
    sc_sub(wterm, t_x, abm);
    sc_mul(wterm, w, wterm);
    sc_sub(dterm, delta, t_x);
    sc_mul(dterm, c, dterm);
    sc_add(bp, wterm, dterm);
    emit(bp);
  }
  // g[i] = -z - a*s[i];  h[i] = z + y^-i * (zz * z_and_2[i] - b * s[nm-1-i])
  {
    for (u64 i = 0; i < nm; ++i) {
      Sc as, g;
      sc_mul(as, a, s[i]);
      sc_sub(g, minus_z, as);
      emit(g);
    }
    Sc yi = {{1, 0, 0, 0}};
    Sc two = {{2, 0, 0, 0}};
    // z_and_2[i] = 2^(i mod n) * z^(i / n)
    Sc zj = {{1, 0, 0, 0}};
    Sc p2 = {{1, 0, 0, 0}};
    for (u64 i = 0; i < nm; ++i) {
      u64 bit = i % n;
      if (i > 0 && bit == 0) {
        sc_mul(zj, zj, z);
        p2 = {{1, 0, 0, 0}};
      }
      Sc z2;
      sc_mul(z2, p2, zj);
      Sc t0, t1, h;
      sc_mul(t0, zz, z2);
      sc_mul(t1, b, s[nm - 1 - i]);
      sc_sub(t0, t0, t1);
      sc_mul(t0, yi, t0);
      sc_add(h, z, t0);
      emit(h);
      sc_mul(yi, yi, y_inv);
      sc_mul(p2, p2, two);
    }
  }

  delete[] u;
  delete[] uinv;
  delete[] u_sq;
  delete[] u_inv_sq;
  delete[] s;
  return 0;
}

// Batched variant: `count` proofs sharing (n, m).  One call from Python
// replaces per-proof ctypes dispatch (the host-prep hot loop in
// parallel/batch_verify.py).
//   strobes:    count * sizeof(Strobe) transcript states (each already
//               initialized with its proof's label); mutated in place
//   proofs:     count * proof_len bytes
//   vcs:        count * m * 32 bytes
//   cr_wides:   count * 128 bytes: per proof 64B c-wide then 64B r-wide
//   dyn_out:    count * (4 + 2*lg(nm) + m) * 32 bytes
//   static_acc: (2 + 2*n*m) * 32 bytes, accumulated across all proofs
// Returns 0 on success, or 100 + index of the first failing proof.
int rangeproof_verify_prep_batch(uint8_t* strobes, size_t strobe_stride,
                                 const uint8_t* proofs,
                                 size_t proof_len, const uint8_t* vcs,
                                 u64 n, u64 m, u64 count,
                                 const uint8_t* cr_wides,
                                 uint8_t* dyn_out, uint8_t* static_acc) {
  u64 nm = n * m;
  int lg = 0;
  while ((1ULL << lg) < nm) ++lg;
  const size_t dyn_sz = 32 * (4 + 2 * (size_t)lg + m);
  for (u64 i = 0; i < count; ++i) {
    int rc = rangeproof_verify_prep(
        (Strobe*)(strobes + i * strobe_stride), proofs + i * proof_len,
        proof_len, vcs + i * 32 * m, n, m, cr_wides + i * 128,
        cr_wides + i * 128 + 64, dyn_out + i * dyn_sz, static_acc);
    if (rc != 0) return 100 + (int)i;
  }
  return 0;
}

}  // extern "C"
