// Native batched-verification prep: per-proof transcript replay and
// verification-scalar computation for aggregated range proofs.
//
// This is the host-side critical path of fused batch verification (one call
// per proof); the Python implementation (RangeProof.verification_scalars_ints)
// remains the semantic reference and cross-validation oracle.  All scalar
// arithmetic is mod l = 2^252 + 27742... using 4x64-bit limbs with __int128.
//
// Structured in two phases so the batch entry point can share ONE modular
// inversion across all proofs (Montgomery trick, mirroring dalek's
// Scalar::batch_invert used at reference src/inner_product_proof.rs:227):
//   phase 1 (replay):  strobe transcript replay -> challenges y,z,x,w,u_i
//   phase 2 (emit):    verification scalars, given (prod(u) * y)^-1
//
// Exposed via ctypes from bulletproofs_tpu/parallel/batch_verify.py.

#include <new>

#include "sc255.h"

namespace {

// Transcript replay + challenge extraction.  Returns 0 on success.
int vprep_replay(Strobe* strobe, const uint8_t* proof, size_t proof_len,
                 const uint8_t* vcs, u64 n, u64 m, const uint8_t* c_wide,
                 const uint8_t* r_wide, int lg, VPrepState& st) {
  const uint8_t* A = proof;
  const uint8_t* S = proof + 32;
  const uint8_t* T1 = proof + 64;
  const uint8_t* T2 = proof + 96;
  const uint8_t* t_x_b = proof + 128;
  const uint8_t* t_x_blinding_b = proof + 160;
  const uint8_t* e_blinding_b = proof + 192;
  const uint8_t* LR = proof + 224;
  const uint8_t* ab = LR + 64 * (size_t)lg;

  t_append(strobe, "dom-sep", 7, (const uint8_t*)"rangeproof v1", 13);
  t_append_u64(strobe, "n", 1, n);
  t_append_u64(strobe, "m", 1, m);
  for (u64 j = 0; j < m; ++j) t_append(strobe, "V", 1, vcs + 32 * j, 32);
  if (is_zero32(A) || is_zero32(S)) return 3;
  t_append(strobe, "A", 1, A, 32);
  t_append(strobe, "S", 1, S, 32);
  t_challenge(strobe, "y", 1, &st.y);
  t_challenge(strobe, "z", 1, &st.z);
  if (is_zero32(T1) || is_zero32(T2)) return 3;
  t_append(strobe, "T_1", 3, T1, 32);
  t_append(strobe, "T_2", 3, T2, 32);
  t_challenge(strobe, "x", 1, &st.x);
  t_append(strobe, "t_x", 3, t_x_b, 32);
  t_append(strobe, "t_x_blinding", 12, t_x_blinding_b, 32);
  t_append(strobe, "e_blinding", 10, e_blinding_b, 32);
  t_challenge(strobe, "w", 1, &st.w);

  sc_from_wide(st.c, c_wide);
  sc_from_wide(st.rw, r_wide);

  // ipp challenges
  t_append(strobe, "dom-sep", 7, (const uint8_t*)"ipp v1", 6);
  t_append_u64(strobe, "n", 1, n * m);
  for (int i = 0; i < lg; ++i) {
    const uint8_t* Li = LR + 64 * (size_t)i;
    const uint8_t* Ri = Li + 32;
    if (is_zero32(Li) || is_zero32(Ri)) return 3;
    t_append(strobe, "L", 1, Li, 32);
    t_append(strobe, "R", 1, Ri, 32);
    t_challenge(strobe, "u", 1, &st.u[i]);
  }

  // canonical scalar loads (already validated at deserialization; trust here)
  std::memcpy(st.t_x.v, t_x_b, 32);
  std::memcpy(st.t_x_blinding.v, t_x_blinding_b, 32);
  std::memcpy(st.e_blinding.v, e_blinding_b, 32);
  std::memcpy(st.a.v, ab, 32);
  std::memcpy(st.b.v, ab + 32, 32);

  st.prod = {{1, 0, 0, 0}};
  for (int i = 0; i < lg; ++i) sc_mul(st.prod, st.prod, st.u[i]);
  sc_mul(st.prod_y, st.prod, st.y);
  return 0;
}

// Lockstep replay of up to 8 proofs sharing (n, m): identical op schedule,
// so the Keccak permutations pool into 8-way passes (transcript.cpp).
// Point-validity (nonzero A/S/T1/T2/L/R) must be prechecked by the caller.
void vprep_replay_x(int k, Strobe* const* strobes, const uint8_t* proofs,
                    size_t proof_len, const uint8_t* vcs, u64 n, u64 m,
                    const uint8_t* cr_wides, int lg, VPrepState* sts) {
  const uint8_t* P[8];
  const uint8_t* msgs[8];
  Sc* outs[8];
  for (int l = 0; l < k; ++l) P[l] = proofs + proof_len * (size_t)l;

  for (int l = 0; l < k; ++l) msgs[l] = (const uint8_t*)"rangeproof v1";
  t_append_x(k, strobes, "dom-sep", 7, msgs, 13);
  t_append_u64_x(k, strobes, "n", 1, n);
  t_append_u64_x(k, strobes, "m", 1, m);
  for (u64 j = 0; j < m; ++j) {
    for (int l = 0; l < k; ++l) msgs[l] = vcs + 32 * (m * (u64)l + j);
    t_append_x(k, strobes, "V", 1, msgs, 32);
  }
  for (int l = 0; l < k; ++l) msgs[l] = P[l];
  t_append_x(k, strobes, "A", 1, msgs, 32);
  for (int l = 0; l < k; ++l) msgs[l] = P[l] + 32;
  t_append_x(k, strobes, "S", 1, msgs, 32);
  for (int l = 0; l < k; ++l) outs[l] = &sts[l].y;
  t_challenge_x(k, strobes, "y", 1, outs);
  for (int l = 0; l < k; ++l) outs[l] = &sts[l].z;
  t_challenge_x(k, strobes, "z", 1, outs);
  for (int l = 0; l < k; ++l) msgs[l] = P[l] + 64;
  t_append_x(k, strobes, "T_1", 3, msgs, 32);
  for (int l = 0; l < k; ++l) msgs[l] = P[l] + 96;
  t_append_x(k, strobes, "T_2", 3, msgs, 32);
  for (int l = 0; l < k; ++l) outs[l] = &sts[l].x;
  t_challenge_x(k, strobes, "x", 1, outs);
  for (int l = 0; l < k; ++l) msgs[l] = P[l] + 128;
  t_append_x(k, strobes, "t_x", 3, msgs, 32);
  for (int l = 0; l < k; ++l) msgs[l] = P[l] + 160;
  t_append_x(k, strobes, "t_x_blinding", 12, msgs, 32);
  for (int l = 0; l < k; ++l) msgs[l] = P[l] + 192;
  t_append_x(k, strobes, "e_blinding", 10, msgs, 32);
  for (int l = 0; l < k; ++l) outs[l] = &sts[l].w;
  t_challenge_x(k, strobes, "w", 1, outs);

  for (int l = 0; l < k; ++l) {
    sc_from_wide(sts[l].c, cr_wides + 128 * (size_t)l);
    sc_from_wide(sts[l].rw, cr_wides + 128 * (size_t)l + 64);
  }

  for (int l = 0; l < k; ++l) msgs[l] = (const uint8_t*)"ipp v1";
  t_append_x(k, strobes, "dom-sep", 7, msgs, 6);
  t_append_u64_x(k, strobes, "n", 1, n * m);
  for (int i = 0; i < lg; ++i) {
    for (int l = 0; l < k; ++l) msgs[l] = P[l] + 224 + 64 * (size_t)i;
    t_append_x(k, strobes, "L", 1, msgs, 32);
    for (int l = 0; l < k; ++l) msgs[l] = P[l] + 224 + 64 * (size_t)i + 32;
    t_append_x(k, strobes, "R", 1, msgs, 32);
    for (int l = 0; l < k; ++l) outs[l] = &sts[l].u[i];
    t_challenge_x(k, strobes, "u", 1, outs);
  }

  for (int l = 0; l < k; ++l) {
    const uint8_t* ab = P[l] + 224 + 64 * (size_t)lg;
    std::memcpy(sts[l].t_x.v, P[l] + 128, 32);
    std::memcpy(sts[l].t_x_blinding.v, P[l] + 160, 32);
    std::memcpy(sts[l].e_blinding.v, P[l] + 192, 32);
    std::memcpy(sts[l].a.v, ab, 32);
    std::memcpy(sts[l].b.v, ab + 32, 32);
    sts[l].prod = {{1, 0, 0, 0}};
    for (int i = 0; i < lg; ++i) sc_mul(sts[l].prod, sts[l].prod, sts[l].u[i]);
    sc_mul(sts[l].prod_y, sts[l].prod, sts[l].y);
  }
}

// validity precheck shared by the lockstep batch paths: nonzero
// A/S/T1/T2/L/R (the scalar replay's return-3 conditions)
static int vprep_precheck(const uint8_t* proof, int lg) {
  if (is_zero32(proof) || is_zero32(proof + 32)) return 3;
  if (is_zero32(proof + 64) || is_zero32(proof + 96)) return 3;
  for (int i = 0; i < lg; ++i) {
    const uint8_t* Li = proof + 224 + 64 * (size_t)i;
    if (is_zero32(Li) || is_zero32(Li + 32)) return 3;
  }
  return 0;
}

// Per-proof derived values from the replayed state, once the shared batch
// inversion has filled prod_y_inv.
void vprep_derive(const VPrepState& st, int lg, VEmitDerived& d) {
  sc_mul(d.allinv, st.prod_y_inv, st.y);    // prod(u)^-1
  sc_mul(d.y_inv, st.prod_y_inv, st.prod);  // y^-1

  Sc uinv[kMaxLg];
  {
    Sc suf[kMaxLg + 1];
    suf[lg] = {{1, 0, 0, 0}};
    for (int i = lg - 1; i >= 0; --i) sc_mul(suf[i], suf[i + 1], st.u[i]);
    Sc pre = {{1, 0, 0, 0}};
    for (int i = 0; i < lg; ++i) {
      Sc t0;
      sc_mul(t0, d.allinv, pre);
      sc_mul(uinv[i], t0, suf[i + 1]);
      sc_mul(pre, pre, st.u[i]);
    }
  }
  for (int i = 0; i < lg; ++i) {
    sc_mul(d.u_sq[i], st.u[i], st.u[i]);
    sc_mul(d.u_inv_sq[i], uinv[i], uinv[i]);
  }
  sc_mul(d.rwa, st.rw, st.a);
  sc_mul(d.rwb, st.rw, st.b);
  sc_mul(d.rwz, st.rw, st.z);
  Sc zz;
  sc_mul(zz, st.z, st.z);
  sc_mul(d.rwzz, st.rw, zz);
}

// Dyn scalars plus the two static head scalars (everything except the
// O(nm) g/h loops).
void vprep_emit_head(const VPrepState& st, const VEmitDerived& d, u64 n,
                     u64 m, int lg, uint8_t* dyn_scalars,
                     uint8_t* static_acc) {
  const u64 nm = n * m;
  Sc zz;
  sc_mul(zz, st.z, st.z);

  // dyn scalars: [1, x, c*x, c*x*x] + u_sq + u_inv_sq + vc_scalars
  Sc one = {{1, 0, 0, 0}};
  Sc cx, cxx;
  sc_mul(cx, st.c, st.x);
  sc_mul(cxx, cx, st.x);
  uint8_t* out = dyn_scalars;
  bool accumulate = false;
  const Sc& rw = st.rw;
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
  emit(st.x);
  emit(cx);
  emit(cxx);
  for (int i = 0; i < lg; ++i) emit(d.u_sq[i]);
  for (int i = 0; i < lg; ++i) emit(d.u_inv_sq[i]);
  // vc scalars: c * zz * z^j
  {
    Sc czz;
    sc_mul(czz, st.c, zz);
    Sc zj = czz;
    for (u64 j = 0; j < m; ++j) {
      emit(zj);
      sc_mul(zj, zj, st.z);
    }
  }

  // static head: [-e_blinding - c*t_x_blinding, basepoint_scalar]
  out = static_acc;
  accumulate = true;
  {
    Sc t0;
    sc_mul(t0, st.c, st.t_x_blinding);
    sc_add(t0, t0, st.e_blinding);
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
    Sc sum_y = sum_powers(st.y, nm);
    Sc sum_2 = sum_powers(two, n);
    Sc sum_z = sum_powers(st.z, m);
    Sc zmzz, d0, z3, d1, delta;
    sc_sub(zmzz, st.z, zz);
    sc_mul(d0, zmzz, sum_y);
    sc_mul(z3, zz, st.z);
    sc_mul(d1, z3, sum_2);
    sc_mul(d1, d1, sum_z);
    sc_sub(delta, d0, d1);
    // basepoint = w*(t_x - a*b) + c*(delta - t_x)
    Sc abm, wterm, dterm, bp;
    sc_mul(abm, st.a, st.b);
    sc_sub(wterm, st.t_x, abm);
    sc_mul(wterm, st.w, wterm);
    sc_sub(dterm, delta, st.t_x);
    sc_mul(dterm, st.c, dterm);
    sc_add(bp, wterm, dterm);
    emit(bp);
  }
}

// Scalar fallback for the O(nm) g/h loops (the IFMA lockstep path in
// verify_emit_ifma.cpp replaces this when available).  static_gh points at
// the g region of the static accumulator (static_acc + 64).
//   g[i] = -z - a*s[i];  h[i] = z + y^-i * (zz * z_and_2[i] - b * s[nm-1-i])
void vprep_emit_gh(const VPrepState& st, const VEmitDerived& d, u64 n, u64 m,
                   int lg, uint8_t* static_gh) {
  const u64 nm = n * m;

  Sc* s = new Sc[nm];
  s[0] = d.allinv;
  for (u64 i = 1; i < nm; ++i) {
    int lg_i = 63 - __builtin_clzll(i);
    u64 k = 1ULL << lg_i;
    sc_mul(s[i], s[i - k], d.u_sq[(lg - 1) - lg_i]);
  }

  Sc zz, minus_z;
  sc_mul(zz, st.z, st.z);
  sc_neg(minus_z, st.z);

  uint8_t* out = static_gh;
  const Sc& rw = st.rw;
  auto emit = [&out, &rw](const Sc& v) {
    Sc weighted;
    sc_mul(weighted, rw, v);
    Sc cur;
    std::memcpy(cur.v, out, 32);
    sc_add(weighted, weighted, cur);
    std::memcpy(out, weighted.v, 32);
    out += 32;
  };
  for (u64 i = 0; i < nm; ++i) {
    Sc as, g;
    sc_mul(as, st.a, s[i]);
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
      sc_mul(zj, zj, st.z);
      p2 = {{1, 0, 0, 0}};
    }
    Sc z2;
    sc_mul(z2, p2, zj);
    Sc t0, t1, h;
    sc_mul(t0, zz, z2);
    sc_mul(t1, st.b, s[nm - 1 - i]);
    sc_sub(t0, t0, t1);
    sc_mul(t0, yi, t0);
    sc_add(h, st.z, t0);
    emit(h);
    sc_mul(yi, yi, d.y_inv);
    sc_mul(p2, p2, two);
  }

  delete[] s;
}

// Full single-proof emit: dyn + static head + g/h.
void vprep_emit(const VPrepState& st, u64 n, u64 m, int lg,
                uint8_t* dyn_scalars, uint8_t* static_acc) {
  VEmitDerived d;
  vprep_derive(st, lg, d);
  vprep_emit_head(st, d, n, m, lg, dyn_scalars, static_acc);
  vprep_emit_gh(st, d, n, m, lg, static_acc + 64);
}

int lg_of(u64 nm) {
  int lg = 0;
  while ((1ULL << lg) < nm) ++lg;
  if ((1ULL << lg) != nm || lg > kMaxLg) return -1;
  return lg;
}

// static pair accumulation: [0] += rw * (-e_blinding - c*t_x_blinding)
// (B_blinding), [1] += rw * (w*(t_x - a*b) + c*(delta - t_x)) (B); shared
// by the full and compact replay-batch entry points.
void vprep_accum_static_pair(const VPrepState& st, u64 n, u64 m,
                             uint8_t* static_pair) {
  const u64 nm = n * m;
  Sc zz;
  sc_mul(zz, st.z, st.z);
  Sc t1;
  sc_mul(t1, st.c, st.t_x_blinding);
  sc_add(t1, t1, st.e_blinding);
  sc_neg(t1, t1);
  sc_mul(t1, st.rw, t1);
  Sc cur;
  std::memcpy(cur.v, static_pair, 32);
  sc_add(cur, cur, t1);
  std::memcpy(static_pair, cur.v, 32);

  auto sum_powers = [](const Sc& xv, u64 cnt) {
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
  Sc sum_y = sum_powers(st.y, nm);
  Sc sum_2 = sum_powers(two, n);
  Sc sum_z = sum_powers(st.z, m);
  Sc zmzz, d0, z3, d1, delta;
  sc_sub(zmzz, st.z, zz);
  sc_mul(d0, zmzz, sum_y);
  sc_mul(z3, zz, st.z);
  sc_mul(d1, z3, sum_2);
  sc_mul(d1, d1, sum_z);
  sc_sub(delta, d0, d1);
  Sc abm, wterm, dterm, bp;
  sc_mul(abm, st.a, st.b);
  sc_sub(wterm, st.t_x, abm);
  sc_mul(wterm, st.w, wterm);
  sc_sub(dterm, delta, st.t_x);
  sc_mul(dterm, st.c, dterm);
  sc_add(bp, wterm, dterm);
  sc_mul(bp, st.rw, bp);
  std::memcpy(cur.v, static_pair + 32, 32);
  sc_add(cur, cur, bp);
  std::memcpy(static_pair + 32, cur.v, 32);
}

// shared front half of the replay-batch entry points: prechecks, the
// 8-lockstep transcript replay, and the ONE Montgomery batch inversion of
// prod(u)*y across all proofs.  Returns 0 and a new[]'d sts array the
// caller owns, or 100 + index of the first failing proof.
int vprep_replay_invert(uint8_t* strobes, size_t strobe_stride,
                        const uint8_t* proofs, size_t proof_len,
                        const uint8_t* vcs, u64 n, u64 m, u64 count,
                        const uint8_t* cr_wides, int lg, VPrepState*& out) {
  VPrepState* sts = new VPrepState[count];
  for (u64 i = 0; i < count; ++i)
    if (vprep_precheck(proofs + i * proof_len, lg) != 0) {
      delete[] sts;
      return 100 + (int)i;
    }
  for (u64 i = 0; i < count; i += 8) {
    const int k = (int)(count - i < 8 ? count - i : 8);
    Strobe* ss[8];
    for (int l = 0; l < k; ++l)
      ss[l] = (Strobe*)(strobes + (i + l) * strobe_stride);
    vprep_replay_x(k, ss, proofs + i * proof_len, proof_len,
                   vcs + i * 32 * m, n, m, cr_wides + i * 128, lg, sts + i);
  }
  Sc* prefix = new Sc[count + 1];
  prefix[0] = {{1, 0, 0, 0}};
  for (u64 i = 0; i < count; ++i)
    sc_mul(prefix[i + 1], prefix[i], sts[i].prod_y);
  Sc inv_all;
  sc_invert(inv_all, prefix[count]);
  for (u64 i = count; i-- > 0;) {
    sc_mul(sts[i].prod_y_inv, inv_all, prefix[i]);
    sc_mul(inv_all, inv_all, sts[i].prod_y);
  }
  delete[] prefix;
  out = sts;
  return 0;
}

}  // namespace

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
  const int lg = lg_of(n * m);
  if (lg < 0) return 1;
  if (proof_len != 32 * (9 + 2 * (size_t)lg)) return 2;
  VPrepState st;
  int rc = vprep_replay(strobe, proof, proof_len, vcs, n, m, c_wide, r_wide,
                        lg, st);
  if (rc != 0) return rc;
  sc_invert(st.prod_y_inv, st.prod_y);
  vprep_emit(st, n, m, lg, dyn_scalars, static_acc);
  return 0;
}

// Batched variant: `count` proofs sharing (n, m).  One call from Python
// replaces per-proof ctypes dispatch (the host-prep hot loop in
// parallel/batch_verify.py), and ONE Montgomery-trick inversion replaces the
// per-proof Fermat chain (~380 muls -> ~3 muls per proof).
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
  const int lg = lg_of(n * m);
  if (lg < 0) return 1;
  if (proof_len != 32 * (9 + 2 * (size_t)lg)) return 2;
  const size_t dyn_sz = 32 * (4 + 2 * (size_t)lg + m);

  VPrepState* sts = new VPrepState[count];
  for (u64 i = 0; i < count; ++i)
    if (vprep_precheck(proofs + i * proof_len, lg) != 0) {
      delete[] sts;
      return 100 + (int)i;
    }
  for (u64 i = 0; i < count; i += 8) {
    const int k = (int)(count - i < 8 ? count - i : 8);
    Strobe* ss[8];
    for (int l = 0; l < k; ++l)
      ss[l] = (Strobe*)(strobes + (i + l) * strobe_stride);
    vprep_replay_x(k, ss, proofs + i * proof_len, proof_len,
                   vcs + i * 32 * m, n, m, cr_wides + i * 128, lg, sts + i);
  }

  // Montgomery batch inversion of all prod_y values: prefix products, one
  // Fermat inversion, unwind.
  Sc* prefix = new Sc[count + 1];
  prefix[0] = {{1, 0, 0, 0}};
  for (u64 i = 0; i < count; ++i)
    sc_mul(prefix[i + 1], prefix[i], sts[i].prod_y);
  Sc inv_all;
  sc_invert(inv_all, prefix[count]);
  for (u64 i = count; i-- > 0;) {
    sc_mul(sts[i].prod_y_inv, inv_all, prefix[i]);
    sc_mul(inv_all, inv_all, sts[i].prod_y);
  }
  delete[] prefix;

  VEmitDerived* ders = new VEmitDerived[count];
  for (u64 i = 0; i < count; ++i) {
    vprep_derive(sts[i], lg, ders[i]);
    vprep_emit_head(sts[i], ders[i], n, m, lg, dyn_out + i * dyn_sz,
                    static_acc);
  }

  // g/h loops: 8-proof-lockstep AVX-512 IFMA when the CPU has it, scalar
  // otherwise.  The lane accumulator tolerates <= 2048 group additions per
  // limb; fold and re-zero past that.
  if (bp_gh_ifma_available() && count >= 8) {
    const u64 nm = n * m;
    const size_t abytes = bp_gh_acc_bytes(nm);
    uint8_t* acc = new (std::align_val_t(64)) uint8_t[abytes];
    u64 i = 0;
    while (i < count) {
      std::memset(acc, 0, abytes);
      for (u64 groups = 0; i < count && groups < 2048; ++groups) {
        const int k = (int)(count - i < 8 ? count - i : 8);
        bp_gh_accumulate_x8(sts + i, ders + i, k, n, m, lg, acc);
        i += k;
      }
      bp_gh_fold(acc, nm, static_acc + 64);
    }
    operator delete[](acc, std::align_val_t(64));
  } else {
    for (u64 i = 0; i < count; ++i)
      vprep_emit_gh(sts[i], ders[i], n, m, lg, static_acc + 64);
  }
  delete[] ders;
  delete[] sts;
  return 0;
}

// COMPACT-block variant for the TPU path: (lg + 8) scalars per proof
// instead of (2*lg + 9).  The challenge-block upload is a large share of
// the tunnel-H2D bytes that floor batched-verification latency (448 B vs
// 672 B per proof at nm = 64); the device derives u_sq, the per-u inverse
// squares (from allinv via prefix/suffix products), t0 = rw*prod(u)^-1 and
// t0r = rw*prod(u) in-kernel (ops/verify_pallas.py _derive_block).
//
// Per-proof block layout ((lg + 8) canonical 32-byte scalars):
//   [0..lg)  u[i]
//   lg+0 rw | +1 x | +2 rc = rw*c | +3 z | +4 y_inv | +5 -a | +6 -b
//   | +7 allinv = prod(u)^-1
// static_pair semantics identical to rangeproof_verify_replay_batch.
int rangeproof_verify_replay_batch_c(uint8_t* strobes, size_t strobe_stride,
                                     const uint8_t* proofs, size_t proof_len,
                                     const uint8_t* vcs, u64 n, u64 m,
                                     u64 count, const uint8_t* cr_wides,
                                     uint8_t* blocks, uint8_t* static_pair) {
  const int lg = lg_of(n * m);
  if (lg < 0) return 1;
  if (proof_len != 32 * (9 + 2 * (size_t)lg)) return 2;
  const size_t blk_sz = 32 * ((size_t)lg + 8);

  VPrepState* sts = nullptr;
  int rc = vprep_replay_invert(strobes, strobe_stride, proofs, proof_len,
                               vcs, n, m, count, cr_wides, lg, sts);
  if (rc != 0) return rc;

  for (u64 i = 0; i < count; ++i) {
    const VPrepState& st = sts[i];
    uint8_t* blk = blocks + i * blk_sz;
    Sc allinv, y_inv;
    sc_mul(allinv, st.prod_y_inv, st.y);     // prod(u)^-1
    sc_mul(y_inv, st.prod_y_inv, st.prod);   // y^-1
    for (int k = 0; k < lg; ++k)
      std::memcpy(blk + 32 * k, st.u[k].v, 32);
    Sc rc_, neg_a, neg_b;
    sc_mul(rc_, st.rw, st.c);
    sc_neg(neg_a, st.a);
    sc_neg(neg_b, st.b);
    std::memcpy(blk + 32 * ((size_t)lg + 0), st.rw.v, 32);
    std::memcpy(blk + 32 * ((size_t)lg + 1), st.x.v, 32);
    std::memcpy(blk + 32 * ((size_t)lg + 2), rc_.v, 32);
    std::memcpy(blk + 32 * ((size_t)lg + 3), st.z.v, 32);
    std::memcpy(blk + 32 * ((size_t)lg + 4), y_inv.v, 32);
    std::memcpy(blk + 32 * ((size_t)lg + 5), neg_a.v, 32);
    std::memcpy(blk + 32 * ((size_t)lg + 6), neg_b.v, 32);
    std::memcpy(blk + 32 * ((size_t)lg + 7), allinv.v, 32);

    vprep_accum_static_pair(st, n, m, static_pair);
  }
  delete[] sts;
  return 0;
}

}  // extern "C"
