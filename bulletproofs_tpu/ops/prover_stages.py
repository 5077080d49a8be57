"""Device-resident prover stages: all mod-l vector math of the batch range
prover as jitted lane-major kernels (ops/vec_scalar.py).

With these, the only host work left in proving is Fiat-Shamir (Keccak) and
the only device<->host traffic is one blinding upload plus per-stage
challenge/commitment exchanges of ~32 bytes per proof -- the design target
for a device tunnel with ~20 MB/s of host bandwidth.

Protocol math mirrors the reference party/dealer/IPP-prover
(src/range_proof/party.rs:182-237, dealer.rs:226-293,
src/inner_product_proof.rs:38-185); the IPP state is (a, b) folded scalar
vectors plus gw/hw fold-weight vectors over the ORIGINAL generators, as in
native/prove_prep.cpp (the host twin used on CPU backends).

Shapes: P proofs on lanes; per-proof scalars (L, P); length-n vectors
(L, n, P).  Coefficient digit streams feed ops/fixed_msm.py directly as
(nb * 64, Q) device arrays -- they never visit the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import vec_scalar as S
from .limbs import NLIMBS
from ..core.scalar import L as ELL

L = NLIMBS


def _zeros(nb_cols: int, p: int) -> jnp.ndarray:
    return jnp.zeros((L, nb_cols, p), jnp.int32)


def _col(x: jnp.ndarray) -> jnp.ndarray:
    """(L, P) -> (L, 1, P)."""
    return x[:, None, :]


def _coef_digits(coef: jnp.ndarray) -> jnp.ndarray:
    """(L, nb, Q) coefficient limbs -> (nb * 64, Q) digit stream
    (s = j * 64 + w, matching fixed_msm's table order)."""
    nb, q = coef.shape[1], coef.shape[2]
    from . import fold_pallas as FP
    if FP.usable(nb * q):
        d = FP.digits_lanes(coef.reshape(L, nb * q)).reshape(64, nb, q)
    else:
        d = S.digits64(coef.reshape(L, nb * q)).reshape(64, nb, q)
    return jnp.transpose(d, (1, 0, 2)).reshape(nb * 64, q)


_POW2 = None


def _pow2_const(n: int) -> np.ndarray:
    """(L, n, 1) limbs of [1, 2, 4, ..., 2^(n-1)]."""
    return np.stack([S.const(1 << i) for i in range(n)], axis=1)


def _bit_commit_coefs(n: int, bits: jnp.ndarray, ab, sb, sl, sr):
    """Shared A/S coefficient rows over [B, B~, G..(n), H..(n)]:
    A = [0, ab, aL, aR], S = [0, sb, sL, sR] with aL[i] = bit i,
    aR[i] = aL[i] - 1 (reference party.rs:102-124)."""
    p = bits.shape[-1]
    zero1 = _zeros(1, p)
    minus_one = jnp.asarray(S.const(ELL - 1))[:, None, :]
    bit_mask = (bits != 0)[None, :, :]
    one_limb = jnp.asarray(S.ONE)[:, None, :]
    aL = jnp.where(bit_mask, jnp.broadcast_to(one_limb, (L, n, p)), 0)
    aR = jnp.where(bit_mask, 0, jnp.broadcast_to(minus_one, (L, n, p)))
    coef_a = jnp.concatenate([zero1, _col(ab), aL, aR], axis=1)
    coef_s = jnp.concatenate([zero1, _col(sb), sl, sr], axis=1)
    return coef_a, coef_s


@jax.jit
def v_digits(v_sc: jnp.ndarray, vb: jnp.ndarray) -> jnp.ndarray:
    """Per-party value commitments V_j = v_j B + vb_j B~: v_sc, vb
    (L, Q) -> digit stream (2*64, Q) over [B, B~].  Q = m * P columns
    (party-major: column j*P + p)."""
    return _coef_digits(jnp.concatenate([_col(v_sc), _col(vb)], axis=1))


@functools.partial(jax.jit, static_argnums=(0,))
def stage0_agg(N: int, bits: jnp.ndarray, ab: jnp.ndarray, sb: jnp.ndarray,
               sl: jnp.ndarray, sr: jnp.ndarray) -> jnp.ndarray:
    """Aggregated bit commitments: one A row and one S row per proof over
    [B, B~, G..(N), H..(N)] (the trusted local dealer's sums A = sum A_j,
    S = sum S_j, reference dealer.rs:112-120 -- one blinding draw stands in
    for the sum of the m parties').  bits (N, P) -> ((2N+2)*64, 2P)."""
    coef_a, coef_s = _bit_commit_coefs(N, bits, ab, sb, sl, sr)
    return _coef_digits(jnp.concatenate([coef_a, coef_s], axis=2))


@functools.partial(jax.jit, static_argnums=(0, 1))
def stage1(n: int, m: int, bits: jnp.ndarray, y: jnp.ndarray,
           z: jnp.ndarray, sl: jnp.ndarray, sr: jnp.ndarray,
           t1b: jnp.ndarray, t2b: jnp.ndarray):
    """bits (n*m, P); vectors (L, n*m, P).  Aggregated statements place
    party j's bits at rows [j*n, (j+1)*n); position k = j*n + i carries the
    party offsets y^k and z^(2+j)*2^i (reference party.rs:182-237).

    -> (l0, l1, r0, r1 (L, N, P), t0, t1, t2 (L, P), zz_zpow (L, m, P)
    the per-party z^(2+j) factors, T digit stream (2*64, 2P) over [B, B~])."""
    N = n * m
    ypow = S.power_sequence(y, N)                  # (L, N, P)
    zz = S.smul(z, z)
    # z^(2+j) per party, then repeated n times to cover position k = j*n+i
    if m == 1:
        zz_zpow = zz[:, None, :]
    else:
        zz_zpow = _vmul(S.power_sequence(z, m), _bcast(zz, m))
    offset_zz = jnp.repeat(zz_zpow, n, axis=1)     # (L, N, P)
    neg_z = S.sneg(z)
    z_m1 = S.sadd(z, jnp.asarray(S.const(ELL - 1)))  # z - 1

    bit_mask = (bits != 0)[None, :, :]
    # l0 = aL - z; l1 = sL
    one_minus_z = S.sadd(neg_z, jnp.asarray(S.ONE))
    l0 = jnp.where(bit_mask, _bcast(one_minus_z, N), _bcast(neg_z, N))
    l1 = sl
    # r0 = y^k * (aR + z) + z^(2+j) * 2^i ; r1 = y^k * sR
    aRz = jnp.where(bit_mask, _bcast(z, N), _bcast(z_m1, N))
    pow2 = jnp.asarray(np.tile(_pow2_const(n), (1, m, 1)))
    # renormalize r0: it feeds further smuls (b = r0 + r1 x) whose inputs
    # must stay < 16l = 2^256
    r0 = _vreduce(_vadd(_vmul(ypow, aRz), _vmul(offset_zz, pow2)))
    r1 = _vmul(ypow, sr)

    t0 = S.tree_sum(_vmul(l0, r0))
    t2 = S.tree_sum(_vmul(l1, r1))
    tm = S.tree_sum(_vmul(_vadd(l0, l1), _vadd(r0, r1)))
    t1 = S.sadd(tm, S.sneg(S.sadd(t0, t2)))

    coef_t1 = jnp.concatenate([_col(t1), _col(t1b)], axis=1)
    coef_t2 = jnp.concatenate([_col(t2), _col(t2b)], axis=1)
    tdig = _coef_digits(jnp.concatenate([coef_t1, coef_t2], axis=2))
    return l0, l1, r0, r1, t0, t1, t2, zz_zpow, tdig


def _bcast(x: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.broadcast_to(x[:, None, :], (L, n, x.shape[-1]))


def _vmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(L, n, P) x (L, n, P) elementwise smul (flattened to lane-major)."""
    n, p = a.shape[1], a.shape[2]
    b = jnp.broadcast_to(b, (L, n, p))
    a = jnp.broadcast_to(a, (L, n, p))
    return S.smul(a.reshape(L, n * p), b.reshape(L, n * p)).reshape(L, n, p)


def _vadd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    n, p = a.shape[1], a.shape[2]
    return S.sadd(a.reshape(L, n * p), b.reshape(L, n * p)).reshape(L, n, p)


def _vreduce(a: jnp.ndarray) -> jnp.ndarray:
    n, p = a.shape[1], a.shape[2]
    return S.sreduce(a.reshape(L, n * p)).reshape(L, n, p)


@functools.partial(jax.jit, static_argnums=(0,))
def stage2(n: int, x: jnp.ndarray, l0, l1, r0, r1, t0, t1, t2,
           zz_zpow: jnp.ndarray, vb: jnp.ndarray, t1b: jnp.ndarray,
           t2b: jnp.ndarray, ab: jnp.ndarray, sb: jnp.ndarray,
           yinv: jnp.ndarray):
    """challenge x -> (a, b (L, N, P), gw, hw (L, N, P),
    t_x, t_x_blinding, e_blinding (L, P)).  n here is the TOTAL vector
    length N = bitsize * m; zz_zpow/vb are (L, m, P) per-party factors --
    t_x_blinding = sum_j z^(2+j) vb_j + t1b x + t2b x^2 (party shares of
    reference party.rs:292-296 summed by the trusted local dealer)."""
    xx = S.smul(x, x)
    t_x = S.sadd(t0, S.sadd(S.smul(t1, x), S.smul(t2, xx)))
    zvb = S.tree_sum(_vmul(zz_zpow, vb))
    t_xb = S.sadd(zvb, S.sadd(S.smul(t1b, x), S.smul(t2b, xx)))
    e_b = S.sadd(ab, S.smul(sb, x))
    a = _vadd(l0, _vmul(l1, _bcast(x, n)))
    b = _vadd(r0, _vmul(r1, _bcast(x, n)))
    gw = jnp.broadcast_to(jnp.asarray(S.ONE)[:, None, :], a.shape)
    hw = S.power_sequence(yinv, n)
    return a, b, gw, hw, t_x, t_xb, e_b


def _slot_maps(n: int, nk: int):
    h = nk // 2
    s = np.arange(n) % nk
    hi = (s >= h)                                  # G_j in the hi half
    a_lo_idx = np.where(hi, s - h, 0).astype(np.int32)   # L-row gather
    a_hi_idx = np.where(~hi, s + h, 0).astype(np.int32)  # R-row gather
    b_hi_idx = np.where(~hi, s + h, 0).astype(np.int32)  # L-row H gather
    b_lo_idx = np.where(hi, s - h, 0).astype(np.int32)   # R-row H gather
    return hi, a_lo_idx, a_hi_idx, b_hi_idx, b_lo_idx


@functools.partial(jax.jit, static_argnums=(0, 1))
def round_digits(n: int, nk: int, a, b, gw, hw, w):
    """-> digit stream ((2n+2)*64, 2P) for rows [L.., R..]."""
    p = a.shape[-1]
    h = nk // 2
    hi, a_lo_idx, a_hi_idx, b_hi_idx, b_lo_idx = _slot_maps(n, nk)
    hi_m = jnp.asarray(hi)[None, :, None]

    cL = S.tree_sum(_vmul(a[:, :h], b[:, h:nk]))
    cR = S.tree_sum(_vmul(a[:, h:nk], b[:, :h]))

    alphaL = jnp.where(hi_m, _vmul(a[:, a_lo_idx], gw), 0)
    betaL = jnp.where(hi_m, 0, _vmul(b[:, b_hi_idx], hw))
    alphaR = jnp.where(hi_m, 0, _vmul(a[:, a_hi_idx], gw))
    betaR = jnp.where(hi_m, _vmul(b[:, b_lo_idx], hw), 0)

    zero1 = _zeros(1, p)
    coef_l = jnp.concatenate([_col(S.smul(cL, w)), zero1, alphaL, betaL], axis=1)
    coef_r = jnp.concatenate([_col(S.smul(cR, w)), zero1, alphaR, betaR], axis=1)
    return _coef_digits(jnp.concatenate([coef_l, coef_r], axis=2))


@functools.partial(jax.jit, static_argnums=(0, 1))
def round_digits_compact(n: int, nk: int, a, b, gw, hw, w):
    """Compact digit streams over the round's ACTIVE bases only:
    (digits_L ((n+1)*64, P), digits_R) for base orders
    [B, G_hi.., H_lo..] and [B, G_lo.., H_hi..] (hi/lo by slot j mod nk)."""
    h = nk // 2
    hi, a_lo_idx, a_hi_idx, b_hi_idx, b_lo_idx = _slot_maps(n, nk)
    hi_sel = np.nonzero(hi)[0].astype(np.int32)
    lo_sel = np.nonzero(~hi)[0].astype(np.int32)

    cL = S.tree_sum(_vmul(a[:, :h], b[:, h:nk]))
    cR = S.tree_sum(_vmul(a[:, h:nk], b[:, :h]))

    alphaL = _vmul(a[:, a_lo_idx[hi_sel]], gw[:, hi_sel])
    betaL = _vmul(b[:, b_hi_idx[lo_sel]], hw[:, lo_sel])
    alphaR = _vmul(a[:, a_hi_idx[lo_sel]], gw[:, lo_sel])
    betaR = _vmul(b[:, b_lo_idx[hi_sel]], hw[:, hi_sel])

    coef_l = jnp.concatenate([_col(S.smul(cL, w)), alphaL, betaL], axis=1)
    coef_r = jnp.concatenate([_col(S.smul(cR, w)), alphaR, betaR], axis=1)
    return _coef_digits(coef_l), _coef_digits(coef_r)


def round_base_sets(n: int, nk: int):
    """Base-index lists (into [B, B~, G.., H..]) matching
    round_digits_compact's column order."""
    hi, *_ = _slot_maps(n, nk)
    hi_sel = np.nonzero(hi)[0]
    lo_sel = np.nonzero(~hi)[0]
    L_set = [0] + [2 + j for j in hi_sel] + [2 + n + j for j in lo_sel]
    R_set = [0] + [2 + j for j in lo_sel] + [2 + n + j for j in hi_sel]
    return L_set, R_set


@functools.partial(jax.jit, static_argnums=(0, 1))
def round_fold(n: int, nk: int, a, b, gw, hw, u, uinv):
    """fold a, b; update gw, hw.  Returns (a, b, gw, hw) with the folded
    halves in slots [0, nk/2); stale upper slots are never read."""
    h = nk // 2
    hi, *_ = _slot_maps(n, nk)
    lo_m = jnp.asarray(~hi)[None, :, None]
    p = a.shape[2]

    from . import fold_pallas as FP
    if FP.usable(h * p) and FP.usable(n * p):
        # fused VMEM kernels: one dispatch per compound op instead of a
        # ~40-op HBM-bound XLA chain per smul
        bu = jnp.broadcast_to(u[:, None, :], (L, h, p)).reshape(L, h * p)
        bui = jnp.broadcast_to(uinv[:, None, :], (L, h, p)).reshape(L, h * p)
        na = FP.fold_lanes(a[:, :h].reshape(L, h * p),
                           a[:, h:nk].reshape(L, h * p), bu, bui
                           ).reshape(L, h, p)
        nb = FP.fold_lanes(b[:, :h].reshape(L, h * p),
                           b[:, h:nk].reshape(L, h * p), bui, bu
                           ).reshape(L, h, p)
        a = jnp.concatenate([na, a[:, h:]], axis=1)
        b = jnp.concatenate([nb, b[:, h:]], axis=1)
        mul_g = jnp.where(lo_m, _bcast(uinv, n), _bcast(u, n))
        mul_h = jnp.where(lo_m, _bcast(u, n), _bcast(uinv, n))
        gw = FP.smul_lanes(gw.reshape(L, n * p),
                           mul_g.reshape(L, n * p)).reshape(L, n, p)
        hw = FP.smul_lanes(hw.reshape(L, n * p),
                           mul_h.reshape(L, n * p)).reshape(L, n, p)
        return a, b, gw, hw

    na = _vadd(_vmul(a[:, :h], _bcast(u, h)), _vmul(a[:, h:nk], _bcast(uinv, h)))
    nb = _vadd(_vmul(b[:, :h], _bcast(uinv, h)), _vmul(b[:, h:nk], _bcast(u, h)))
    a = jnp.concatenate([na, a[:, h:]], axis=1)
    b = jnp.concatenate([nb, b[:, h:]], axis=1)
    gw = _vmul(gw, jnp.where(lo_m, _bcast(uinv, n), _bcast(u, n)))
    hw = _vmul(hw, jnp.where(lo_m, _bcast(u, n), _bcast(uinv, n)))
    return a, b, gw, hw


@jax.jit
def final_scalars(a, b, t_x, t_xb, e_b):
    """-> (L, 5, P) stack [t_x, t_x_blinding, e_blinding, a0, b0] for one
    download."""
    return jnp.stack([t_x, t_xb, e_b, a[:, 0], b[:, 0]], axis=1)
