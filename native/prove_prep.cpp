// Native batched-proving prep: the host-side (sequential, Fiat-Shamir +
// scalar vector) half of the TPU batch range prover.
//
// The device half (bulletproofs_tpu/ops/fixed_msm.py) computes every point
// as a fixed-base MSM over [B, B_blinding, G.., H..]; this file produces the
// coefficient matrices per protocol stage and replays the transcripts.
// Protocol semantics mirror the reference single-party path
// (src/range_proof/party.rs, dealer.rs and src/inner_product_proof.rs): the
// IPP's L_k/R_k coefficients expand over the ORIGINAL generators using
// accumulated fold weights gw/hw instead of folding points.
//
// State per proof is a Python-owned flat buffer of 32-byte scalars; layout
// is defined by rp_state_size / the OFF_* constants below (m = 1 only --
// aggregated proving uses the MPC path).

#include "sc255.h"

extern "C" {

// state layout (units: 32-byte scalar slots); vectors of length n follow
// the fixed header
enum {
  OFF_V = 0,        // value as scalar
  OFF_VBLIND,
  OFF_ABLIND,
  OFF_SBLIND,
  OFF_Y,
  OFF_Z,
  OFF_X,
  OFF_W,
  OFF_T0,
  OFF_T1,
  OFF_T2,
  OFF_T1BLIND,
  OFF_T2BLIND,
  OFF_TX,
  OFF_TXBLIND,
  OFF_EBLIND,
  OFF_ZZ,           // z^2 (offset_zz with m = 1)
  OFF_HDR           // = 17
};
// vector slots (each length n): sL, sR, l0, l1, r0, r1, a, b, gw, hw
enum { V_SL = 0, V_SR, V_L0, V_L1, V_R0, V_R1, V_A, V_B, V_GW, V_HW, NVEC };

u64 rp_state_size(u64 n) { return 32 * (OFF_HDR + NVEC * n); }

static inline Sc* hdr(uint8_t* st, u64 n, u64 p, int off) {
  return (Sc*)(st + p * rp_state_size(n) + 32 * off);
}
static inline Sc* vec(uint8_t* st, u64 n, u64 p, int which) {
  return (Sc*)(st + p * rp_state_size(n) + 32 * (OFF_HDR + which * n));
}

static inline void emit32(uint8_t* dst, const Sc& v) { std::memcpy(dst, v.v, 32); }

// Montgomery-trick batch inversion: invs[i] = 1 / xs[i] (xs nonzero)
static void sc_batch_invert(Sc* xs, Sc* invs, u64 count) {
  Sc acc = {{1, 0, 0, 0}};
  Sc* prefix = new Sc[count];
  for (u64 i = 0; i < count; ++i) {
    prefix[i] = acc;
    sc_mul(acc, acc, xs[i]);
  }
  Sc inv_all;
  sc_invert(inv_all, acc);
  for (u64 i = count; i-- > 0;) {
    sc_mul(invs[i], inv_all, prefix[i]);
    sc_mul(inv_all, inv_all, xs[i]);
  }
  delete[] prefix;
}

// ---------------------------------------------------------------------------
// stage 0: blindings + coefficient rows for V, A, S
//   rand_blob per proof: a_blind(64) s_blind(64) sL(n*64) sR(n*64)
//   coef rows over NB = 2n + 2 bases [B, B~, G.., H..]:
//     row p          = V_p : [v, v~]
//     row count + p  = A_p : [0, a~, bits, bits - 1]
//     row 2count + p = S_p : [0, s~, sL, sR]
// ---------------------------------------------------------------------------
int rp_prove_stage0(u64 count, u64 n, const u64* values,
                    const uint8_t* vblind, const uint8_t* rand_blob,
                    uint8_t* state, uint8_t* coef_out) {
  const u64 nb = 2 * n + 2;
  const u64 per = (2 + 2 * n) * 64;
  const Sc one = {{1, 0, 0, 0}};
  Sc minus_one;
  sc_neg(minus_one, one);
  for (u64 p = 0; p < count; ++p) {
    Sc v = {{values[p], 0, 0, 0}};
    *hdr(state, n, p, OFF_V) = v;
    Sc vb;
    std::memcpy(vb.v, vblind + 32 * p, 32);
    *hdr(state, n, p, OFF_VBLIND) = vb;
    const uint8_t* rb = rand_blob + p * per;
    sc_from_wide(*hdr(state, n, p, OFF_ABLIND), rb);
    sc_from_wide(*hdr(state, n, p, OFF_SBLIND), rb + 64);
    Sc* sL = vec(state, n, p, V_SL);
    Sc* sR = vec(state, n, p, V_SR);
    for (u64 i = 0; i < n; ++i) {
      sc_from_wide(sL[i], rb + 128 + 64 * i);
      sc_from_wide(sR[i], rb + 128 + 64 * (n + i));
    }

    uint8_t* rowV = coef_out + p * nb * 32;
    uint8_t* rowA = coef_out + (count + p) * nb * 32;
    uint8_t* rowS = coef_out + (2 * count + p) * nb * 32;
    std::memset(rowV, 0, nb * 32);
    std::memset(rowA, 0, nb * 32);
    std::memset(rowS, 0, nb * 32);
    emit32(rowV, v);
    emit32(rowV + 32, vb);
    emit32(rowA + 32, *hdr(state, n, p, OFF_ABLIND));
    emit32(rowS + 32, *hdr(state, n, p, OFF_SBLIND));
    for (u64 i = 0; i < n; ++i) {
      int bit = (values[p] >> i) & 1;
      if (bit)
        emit32(rowA + 32 * (2 + i), one);
      else
        emit32(rowA + 32 * (2 + n + i), minus_one);
      emit32(rowS + 32 * (2 + i), sL[i]);
      emit32(rowS + 32 * (2 + n + i), sR[i]);
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// stage 1: transcript -> y, z; l/r polynomials; t-poly; T1/T2 coefficients
//   vas_bytes: 3*count*32 compressed [V rows, A rows, S rows]
//   rand_blob per proof: t1_blind(64) t2_blind(64)
//   coef rows over 2 bases [B, B~]: row p = T1_p [t1, t1b];
//   row count+p = T2_p [t2, t2b]
// ---------------------------------------------------------------------------
int rp_prove_stage1(u64 count, u64 n, uint8_t* strobes, u64 stride,
                    const uint8_t* vas_bytes, const uint8_t* rand_blob,
                    uint8_t* state, uint8_t* coef_out) {
  for (u64 p = 0; p < count; ++p) {
    Strobe* ts = (Strobe*)(strobes + p * stride);
    t_append(ts, "dom-sep", 7, (const uint8_t*)"rangeproof v1", 13);
    t_append_u64(ts, "n", 1, n);
    t_append_u64(ts, "m", 1, 1);
    t_append(ts, "V", 1, vas_bytes + 32 * p, 32);
    t_append(ts, "A", 1, vas_bytes + 32 * (count + p), 32);
    t_append(ts, "S", 1, vas_bytes + 32 * (2 * count + p), 32);
    Sc y, z;
    t_challenge(ts, "y", 1, &y);
    t_challenge(ts, "z", 1, &z);
    *hdr(state, n, p, OFF_Y) = y;
    *hdr(state, n, p, OFF_Z) = z;
    Sc zz;
    sc_mul(zz, z, z);
    *hdr(state, n, p, OFF_ZZ) = zz;

    const Sc one = {{1, 0, 0, 0}};
    u64 value = hdr(state, n, p, OFF_V)->v[0];
    Sc* sL = vec(state, n, p, V_SL);
    Sc* sR = vec(state, n, p, V_SR);
    Sc* l0 = vec(state, n, p, V_L0);
    Sc* l1 = vec(state, n, p, V_L1);
    Sc* r0 = vec(state, n, p, V_R0);
    Sc* r1 = vec(state, n, p, V_R1);
    Sc exp_y = one, exp_2 = one;
    for (u64 i = 0; i < n; ++i) {
      Sc aL = {{(value >> i) & 1, 0, 0, 0}};
      Sc aR;
      sc_sub(aR, aL, one);
      sc_sub(l0[i], aL, z);
      l1[i] = sL[i];
      Sc t0, t1v;
      sc_add(t0, aR, z);
      sc_mul(t0, exp_y, t0);
      sc_mul(t1v, zz, exp_2);
      sc_add(r0[i], t0, t1v);
      sc_mul(r1[i], exp_y, sR[i]);
      sc_mul(exp_y, exp_y, y);
      sc_add(exp_2, exp_2, exp_2);
    }
    // t-poly: t0 = <l0,r0>, t2 = <l1,r1>, t1 = <l0+l1, r0+r1> - t0 - t2
    Sc t0 = {{0}}, t2 = {{0}}, tm = {{0}};
    for (u64 i = 0; i < n; ++i) {
      Sc a, b, c;
      sc_mul(a, l0[i], r0[i]);
      sc_add(t0, t0, a);
      sc_mul(b, l1[i], r1[i]);
      sc_add(t2, t2, b);
      Sc ls, rs;
      sc_add(ls, l0[i], l1[i]);
      sc_add(rs, r0[i], r1[i]);
      sc_mul(c, ls, rs);
      sc_add(tm, tm, c);
    }
    Sc t1;
    sc_sub(t1, tm, t0);
    sc_sub(t1, t1, t2);
    *hdr(state, n, p, OFF_T0) = t0;
    *hdr(state, n, p, OFF_T1) = t1;
    *hdr(state, n, p, OFF_T2) = t2;
    sc_from_wide(*hdr(state, n, p, OFF_T1BLIND), rand_blob + p * 128);
    sc_from_wide(*hdr(state, n, p, OFF_T2BLIND), rand_blob + p * 128 + 64);

    uint8_t* rowT1 = coef_out + p * 2 * 32;
    uint8_t* rowT2 = coef_out + (count + p) * 2 * 32;
    emit32(rowT1, t1);
    emit32(rowT1 + 32, *hdr(state, n, p, OFF_T1BLIND));
    emit32(rowT2, t2);
    emit32(rowT2 + 32, *hdr(state, n, p, OFF_T2BLIND));
  }
  return 0;
}

// ---------------------------------------------------------------------------
// stage 2: transcript T1, T2 -> x; share scalars; challenge w; IPP init
//   t_bytes: 2*count*32 compressed [T1 rows, T2 rows]
// ---------------------------------------------------------------------------
int rp_prove_stage2(u64 count, u64 n, uint8_t* strobes, u64 stride,
                    const uint8_t* t_bytes, uint8_t* state) {
  Sc* ys = new Sc[count];
  Sc* yinvs = new Sc[count];
  for (u64 p = 0; p < count; ++p) {
    Strobe* ts = (Strobe*)(strobes + p * stride);
    t_append(ts, "T_1", 3, t_bytes + 32 * p, 32);
    t_append(ts, "T_2", 3, t_bytes + 32 * (count + p), 32);
    Sc x;
    t_challenge(ts, "x", 1, &x);
    *hdr(state, n, p, OFF_X) = x;

    Sc xx;
    sc_mul(xx, x, x);
    // t_x = t0 + t1 x + t2 x^2
    Sc tx, tmp;
    sc_mul(tmp, *hdr(state, n, p, OFF_T1), x);
    sc_add(tx, *hdr(state, n, p, OFF_T0), tmp);
    sc_mul(tmp, *hdr(state, n, p, OFF_T2), xx);
    sc_add(tx, tx, tmp);
    *hdr(state, n, p, OFF_TX) = tx;
    // t_x_blinding = zz * v_blind + t1b x + t2b x^2
    Sc txb;
    sc_mul(txb, *hdr(state, n, p, OFF_ZZ), *hdr(state, n, p, OFF_VBLIND));
    sc_mul(tmp, *hdr(state, n, p, OFF_T1BLIND), x);
    sc_add(txb, txb, tmp);
    sc_mul(tmp, *hdr(state, n, p, OFF_T2BLIND), xx);
    sc_add(txb, txb, tmp);
    *hdr(state, n, p, OFF_TXBLIND) = txb;
    // e_blinding = a_blind + s_blind x
    Sc eb;
    sc_mul(eb, *hdr(state, n, p, OFF_SBLIND), x);
    sc_add(eb, *hdr(state, n, p, OFF_ABLIND), eb);
    *hdr(state, n, p, OFF_EBLIND) = eb;

    t_append(ts, "t_x", 3, (const uint8_t*)tx.v, 32);
    t_append(ts, "t_x_blinding", 12, (const uint8_t*)txb.v, 32);
    t_append(ts, "e_blinding", 10, (const uint8_t*)eb.v, 32);
    Sc w;
    t_challenge(ts, "w", 1, &w);
    *hdr(state, n, p, OFF_W) = w;
    // ipp domain separator (dealer.rs:272 -> create() -> transcript.rs:50)
    t_append(ts, "dom-sep", 7, (const uint8_t*)"ipp v1", 6);
    t_append_u64(ts, "n", 1, n);

    // IPP working vectors a = l(x), b = r(x); fold weights gw = 1,
    // hw = y^-i (H_factors, dealer.rs:259)
    Sc* a = vec(state, n, p, V_A);
    Sc* b = vec(state, n, p, V_B);
    Sc* l0 = vec(state, n, p, V_L0);
    Sc* l1 = vec(state, n, p, V_L1);
    Sc* r0 = vec(state, n, p, V_R0);
    Sc* r1 = vec(state, n, p, V_R1);
    for (u64 i = 0; i < n; ++i) {
      sc_mul(a[i], l1[i], x);
      sc_add(a[i], l0[i], a[i]);
      sc_mul(b[i], r1[i], x);
      sc_add(b[i], r0[i], b[i]);
    }
    ys[p] = *hdr(state, n, p, OFF_Y);
  }
  sc_batch_invert(ys, yinvs, count);
  const Sc one = {{1, 0, 0, 0}};
  for (u64 p = 0; p < count; ++p) {
    Sc* gw = vec(state, n, p, V_GW);
    Sc* hw = vec(state, n, p, V_HW);
    Sc acc = one;
    for (u64 i = 0; i < n; ++i) {
      gw[i] = one;
      hw[i] = acc;
      sc_mul(acc, acc, yinvs[p]);
    }
  }
  delete[] ys;
  delete[] yinvs;
  return 0;
}

// ---------------------------------------------------------------------------
// round coefficients: L/R rows over NB = 2n + 2 bases for the current nk
//   row p = L_p, row count+p = R_p
//   L = <a_lo, G_hi'> + <b_hi, H_lo'> + c_L * w * B
//   R = <a_hi, G_lo'> + <b_lo, H_hi'> + c_R * w * B
//   where primes are the folded vectors expanded over original bases via
//   gw/hw and slot(j) = j mod nk.
// ---------------------------------------------------------------------------
int rp_prove_round_coefs(u64 count, u64 n, u64 nk,
                         uint8_t* state, uint8_t* coef_out) {
  const u64 nb = 2 * n + 2;
  const u64 h = nk / 2;
  for (u64 p = 0; p < count; ++p) {
    Sc* a = vec(state, n, p, V_A);
    Sc* b = vec(state, n, p, V_B);
    Sc* gw = vec(state, n, p, V_GW);
    Sc* hw = vec(state, n, p, V_HW);
    Sc w = *hdr(state, n, p, OFF_W);
    Sc cL = {{0}}, cR = {{0}}, tmp;
    for (u64 i = 0; i < h; ++i) {
      sc_mul(tmp, a[i], b[h + i]);
      sc_add(cL, cL, tmp);
      sc_mul(tmp, a[h + i], b[i]);
      sc_add(cR, cR, tmp);
    }
    uint8_t* rowL = coef_out + p * nb * 32;
    uint8_t* rowR = coef_out + (count + p) * nb * 32;
    std::memset(rowL, 0, nb * 32);
    std::memset(rowR, 0, nb * 32);
    sc_mul(tmp, cL, w);
    emit32(rowL, tmp);
    sc_mul(tmp, cR, w);
    emit32(rowR, tmp);
    for (u64 j = 0; j < n; ++j) {
      u64 s = j % nk;
      Sc c;
      if (s >= h) {                       // G_j lives in the hi half
        sc_mul(c, a[s - h], gw[j]);       // L: <a_lo, G_hi>
        emit32(rowL + 32 * (2 + j), c);
      } else {
        sc_mul(c, a[h + s], gw[j]);       // R: <a_hi, G_lo>
        emit32(rowR + 32 * (2 + j), c);
      }
      if (s < h) {                        // H_j lives in the lo half
        sc_mul(c, b[h + s], hw[j]);       // L: <b_hi, H_lo>
        emit32(rowL + 32 * (2 + n + j), c);
      } else {
        sc_mul(c, b[s - h], hw[j]);       // R: <b_lo, H_hi>
        emit32(rowR + 32 * (2 + n + j), c);
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// round absorb: append L, R; challenge u; fold a, b and the weights
//   lr_bytes: 2*count*32 compressed [L rows, R rows]
// ---------------------------------------------------------------------------
int rp_prove_round_absorb(u64 count, u64 n, u64 nk, uint8_t* strobes,
                          u64 stride, const uint8_t* lr_bytes, uint8_t* state) {
  const u64 h = nk / 2;
  Sc* us = new Sc[count];
  Sc* uinvs = new Sc[count];
  for (u64 p = 0; p < count; ++p) {
    Strobe* ts = (Strobe*)(strobes + p * stride);
    t_append(ts, "L", 1, lr_bytes + 32 * p, 32);
    t_append(ts, "R", 1, lr_bytes + 32 * (count + p), 32);
    t_challenge(ts, "u", 1, &us[p]);
  }
  sc_batch_invert(us, uinvs, count);
  for (u64 p = 0; p < count; ++p) {
    Sc* a = vec(state, n, p, V_A);
    Sc* b = vec(state, n, p, V_B);
    Sc* gw = vec(state, n, p, V_GW);
    Sc* hw = vec(state, n, p, V_HW);
    Sc u = us[p], ui = uinvs[p], tmp;
    for (u64 i = 0; i < h; ++i) {
      sc_mul(a[i], a[i], u);
      sc_mul(tmp, a[h + i], ui);
      sc_add(a[i], a[i], tmp);
      sc_mul(b[i], b[i], ui);
      sc_mul(tmp, b[h + i], u);
      sc_add(b[i], b[i], tmp);
    }
    for (u64 j = 0; j < n; ++j) {
      u64 s = j % nk;
      sc_mul(gw[j], gw[j], (s < h) ? ui : u);
      sc_mul(hw[j], hw[j], (s < h) ? u : ui);
    }
  }
  delete[] us;
  delete[] uinvs;
  return 0;
}

// ---------------------------------------------------------------------------
// finish: export the proof scalars [t_x, t_x_blinding, e_blinding, a0, b0]
// ---------------------------------------------------------------------------
int rp_prove_finish(u64 count, u64 n, uint8_t* state, uint8_t* scalars_out) {
  for (u64 p = 0; p < count; ++p) {
    uint8_t* out = scalars_out + p * 5 * 32;
    emit32(out, *hdr(state, n, p, OFF_TX));
    emit32(out + 32, *hdr(state, n, p, OFF_TXBLIND));
    emit32(out + 64, *hdr(state, n, p, OFF_EBLIND));
    emit32(out + 96, *vec(state, n, p, V_A));
    emit32(out + 128, *vec(state, n, p, V_B));
  }
  return 0;
}

// ---------------------------------------------------------------------------
// thin transcript helpers for the DEVICE prover path (all scalar vector
// math on-device, ops/prover_stages.py): the host only replays Fiat-Shamir
// ---------------------------------------------------------------------------

// count 64-byte wide draws -> canonical 32-byte scalars
int rp_reduce_wide(u64 count, const uint8_t* wide, uint8_t* out32) {
  for (u64 i = 0; i < count; ++i) {
    Sc s;
    sc_from_wide(s, wide + 64 * i);
    emit32(out32 + 32 * i, s);
  }
  return 0;
}

// domain sep + V_0..V_{m-1}, A, S -> y, z (and 1/y for the device
// H-factors).  vas layout: m*count V rows (party-major: row j*count + p),
// then count A rows, then count S rows (A/S are the dealer's party sums,
// reference dealer.rs:112-120).
int rp_ts_yz(u64 count, uint8_t* strobes, u64 stride, u64 n, u64 m,
             const uint8_t* vas, uint8_t* out) {
  Sc* ys = new Sc[count];
  Sc* yinvs = new Sc[count];
  for (u64 p = 0; p < count; ++p) {
    Strobe* ts = (Strobe*)(strobes + p * stride);
    t_append(ts, "dom-sep", 7, (const uint8_t*)"rangeproof v1", 13);
    t_append_u64(ts, "n", 1, n);
    t_append_u64(ts, "m", 1, m);
    for (u64 j = 0; j < m; ++j)
      t_append(ts, "V", 1, vas + 32 * (j * count + p), 32);
    t_append(ts, "A", 1, vas + 32 * (m * count + p), 32);
    t_append(ts, "S", 1, vas + 32 * ((m + 1) * count + p), 32);
    Sc z;
    t_challenge(ts, "y", 1, &ys[p]);
    t_challenge(ts, "z", 1, &z);
    emit32(out + 32 * (count + p), z);
  }
  sc_batch_invert(ys, yinvs, count);
  for (u64 p = 0; p < count; ++p) {
    emit32(out + 32 * p, ys[p]);
    emit32(out + 32 * (2 * count + p), yinvs[p]);
  }
  delete[] ys;
  delete[] yinvs;
  return 0;
}

// T_1, T_2 -> x
int rp_ts_x(u64 count, uint8_t* strobes, u64 stride, const uint8_t* t_bytes,
            uint8_t* x_out) {
  for (u64 p = 0; p < count; ++p) {
    Strobe* ts = (Strobe*)(strobes + p * stride);
    t_append(ts, "T_1", 3, t_bytes + 32 * p, 32);
    t_append(ts, "T_2", 3, t_bytes + 32 * (count + p), 32);
    Sc x;
    t_challenge(ts, "x", 1, &x);
    emit32(x_out + 32 * p, x);
  }
  return 0;
}

// t_x, t_x_blinding, e_blinding (canonical 32B each) -> w + ipp domain sep
int rp_ts_w(u64 count, uint8_t* strobes, u64 stride, u64 n,
            const uint8_t* txs, uint8_t* w_out) {
  for (u64 p = 0; p < count; ++p) {
    Strobe* ts = (Strobe*)(strobes + p * stride);
    const uint8_t* t = txs + 96 * p;
    t_append(ts, "t_x", 3, t, 32);
    t_append(ts, "t_x_blinding", 12, t + 32, 32);
    t_append(ts, "e_blinding", 10, t + 64, 32);
    Sc w;
    t_challenge(ts, "w", 1, &w);
    emit32(w_out + 32 * p, w);
    t_append(ts, "dom-sep", 7, (const uint8_t*)"ipp v1", 6);
    t_append_u64(ts, "n", 1, n);
  }
  return 0;
}

// L, R -> u (and 1/u, one shared inversion per batch)
int rp_ts_round(u64 count, uint8_t* strobes, u64 stride, const uint8_t* lr,
                uint8_t* u_out, uint8_t* uinv_out) {
  Sc* us = new Sc[count];
  Sc* uinvs = new Sc[count];
  for (u64 p = 0; p < count; ++p) {
    Strobe* ts = (Strobe*)(strobes + p * stride);
    t_append(ts, "L", 1, lr + 32 * p, 32);
    t_append(ts, "R", 1, lr + 32 * (count + p), 32);
    t_challenge(ts, "u", 1, &us[p]);
  }
  sc_batch_invert(us, uinvs, count);
  for (u64 p = 0; p < count; ++p) {
    emit32(u_out + 32 * p, us[p]);
    emit32(uinv_out + 32 * p, uinvs[p]);
  }
  delete[] us;
  delete[] uinvs;
  return 0;
}

}  // extern "C"
