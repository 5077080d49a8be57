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
    """(L, nb, Q) coefficient limbs (lazy, < 2^260) -> (nb * 64, Q) SIGNED
    digit stream (s = j * 64 + w, matching fixed_msm's table order and its
    mag | 16*neg bucket encoding)."""
    nb, q = coef.shape[1], coef.shape[2]
    from . import fold_pallas as FP
    if FP.usable(nb * q):
        d = FP.digits_lanes(coef.reshape(L, nb * q)).reshape(64, nb, q)
    else:
        from .msm_pallas import to_signed_digits
        # renormalize to < ~5l first: the signed recode needs < 8 * 2^252
        red = S.sreduce(coef.reshape(L, nb * q))
        d = to_signed_digits(S.digits64(red)).reshape(64, nb, q)
    return jnp.transpose(d, (1, 0, 2)).reshape(nb * 64, q)


_POW2 = None


def _pow2_const(n: int) -> np.ndarray:
    """(L, n, 1) limbs of [1, 2, 4, ..., 2^(n-1)]."""
    return np.stack([S.const(1 << i) for i in range(n)], axis=1)


@jax.jit
def v_digits(v_sc: jnp.ndarray, vb: jnp.ndarray) -> jnp.ndarray:
    """Per-party value commitments V_j = v_j B + vb_j B~: v_sc, vb
    (L, Q) -> digit stream (2*64, Q) over [B, B~].  Q = m * P columns
    (party-major: column j*P + p)."""
    return _coef_digits(jnp.concatenate([_col(v_sc), _col(vb)], axis=1))


def _signed_digit_cols(x: jnp.ndarray) -> jnp.ndarray:
    """(L, P) lazy scalars -> (64, P) signed digit rows."""
    from . import fold_pallas as FP
    p = x.shape[-1]
    if FP.usable(p):
        return FP.digits_lanes(x)
    from .msm_pallas import to_signed_digits
    return to_signed_digits(S.digits64(S.sreduce(x)))


def a_stream_sel(N: int):
    """Stream row indices (into the [B, B~, G..(N), H..(N)] table, row
    s = j * 64 + w) for the compact A dispatch: [B~ all 64 windows,
    G_i window 0, H_i window 0].  A = ab B~ + sum aL_i G_i + sum aR_i H_i
    with aL in {0, 1}, aR in {0, -1} (reference party.rs:102-112): the
    single-window +-1 coefficients touch only window 0 of each table, so
    the stream is 64 + 2N rows instead of (2N + 2) * 64."""
    rows = [1 * 64 + w for w in range(64)]
    rows += [(2 + i) * 64 for i in range(N)]
    rows += [(2 + N + i) * 64 for i in range(N)]
    return rows


@functools.partial(jax.jit, static_argnums=(0,))
def a_digits(N: int, bits: jnp.ndarray, ab: jnp.ndarray) -> jnp.ndarray:
    """Signed digit stream (64 + 2N, P) for the compact A commitment over
    a_stream_sel's rows: ab's 64 windows, then aL_i = bit_i (digit 1/0),
    then aR_i = bit_i - 1 (digit 0 / -1 = mag 1 | 16)."""
    aL = (bits != 0).astype(jnp.int32)
    aR = jnp.where(bits != 0, 0, 17)
    return jnp.concatenate([_signed_digit_cols(ab), aL, aR], axis=0)


def s_base_sel(N: int):
    """Base indices for the S-commitment dispatch: every base except B
    (whose coefficient is identically zero)."""
    return list(range(1, 2 * N + 2))


@functools.partial(jax.jit, static_argnums=(0,))
def s_digits(N: int, sb: jnp.ndarray, sl: jnp.ndarray,
             sr: jnp.ndarray) -> jnp.ndarray:
    """S = sb B~ + <sL, G> + <sR, H> (reference party.rs:119-124):
    signed digit stream ((2N+1)*64, P) over s_base_sel's bases."""
    coef = jnp.concatenate([_col(sb), sl, sr], axis=1)
    return _coef_digits(coef)


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


# --------------------------------------------------------------------------
# fused phase launches (the m>1 aggregated pipeline + unit-test surfaces)
#
# Through the device tunnel every jit dispatch costs tens of milliseconds of
# single-core host time; the stage-by-stage driver issued ~40 launches per
# half-batch (digit builds, MSMs, compressions, byte codecs all separate)
# and the launch overhead dominated the prove wall-clock.  Each function
# below is ONE jit program covering a whole Fiat-Shamir phase: everything
# between two transcript challenges.  Table tensors (Niels streams) are
# passed as arguments, never closed over, so one compiled program serves
# any generator set of the same shape.  The m = 1 production path goes
# further still -- see the single-program prover section below.
# --------------------------------------------------------------------------


def _blind_slices(N: int, p: int, red: jnp.ndarray):
    """Split the (L, (4 + 2N) * P) blinding block into
    (ab, sb, t1b, t2b (L, P), sl, sr (L, N, P)); layout matches the
    batch prover's draw order [ab][sb][t1b][t2b][sl][sr], i-major."""
    o = p
    ab = red[:, :o]
    sb = red[:, o: 2 * o]
    t1b = red[:, 2 * o: 3 * o]
    t2b = red[:, 3 * o: 4 * o]
    sl = red[:, 4 * o: 4 * o + N * p].reshape(L, N, p)
    sr = red[:, 4 * o + N * p: 4 * o + 2 * N * p].reshape(L, N, p)
    return ab, sb, t1b, t2b, sl, sr


@functools.partial(jax.jit, static_argnums=(0, 1))
def stage0_fused(n: int, m: int, niels_bb, niels_a, niels_s, red,
                 v_bytes, vb_bytes, bits):
    """Stage 0 in one launch: value commitments V_j, the compact A
    commitment, and S, compressed to rows [V (mP) | A (P) | S (P)]
    (reference party.rs:87-124 summed by the local dealer)."""
    from . import fixed_msm as FM
    from . import vec_curve as C

    N, p = n * m, bits.shape[-1]
    ab, sb, _, _, sl, sr = _blind_slices(N, p, red)
    v_sc = S.from_bytes32(v_bytes)
    vb = S.from_bytes32(vb_bytes)
    vpts = FM.msm_digits_niels(niels_bb, v_digits(v_sc, vb))
    apts = FM.msm_digits_niels(niels_a, a_digits(N, bits, ab))
    spts = FM.msm_digits_niels(niels_s, s_digits(N, sb, sl, sr))
    return C.compress_device(jnp.concatenate([vpts, apts, spts], axis=-1))


@functools.partial(jax.jit, static_argnums=(0, 1))
def stage1_fused(n: int, m: int, niels_bb, bits, red, yz_bytes):
    """Stage 1 in one launch: l/r polynomial pieces, the t-polynomial, and
    compressed T_1/T_2 rows.  yz_bytes is the raw (3P, 32) block
    [y | z | y^-1] from the C++ transcript stage."""
    from . import fixed_msm as FM
    from . import vec_curve as C

    N, p = n * m, bits.shape[-1]
    _, _, t1b, t2b, sl, sr = _blind_slices(N, p, red)
    yzi = S.from_bytes32(yz_bytes)
    y, z, yinv = yzi[:, :p], yzi[:, p: 2 * p], yzi[:, 2 * p:]
    l0, l1, r0, r1, t0, t1, t2, zz_zpow, tdig = stage1(
        n, m, bits, y, z, sl, sr, t1b, t2b)
    tb = C.compress_device(FM.msm_digits_niels(niels_bb, tdig))
    return tb, l0, l1, r0, r1, t0, t1, t2, zz_zpow, yinv


@functools.partial(jax.jit, static_argnums=(0, 1))
def stage2_fused(n: int, m: int, x_bytes, l0, l1, r0, r1, t0, t1, t2,
                 zz_zpow, red, vb_bytes, yinv):
    """Stage 2 in one launch: evaluate the shares at x and initialize the
    IPP state; returns the (3P, 33) byte block [t_x | t_x_blinding |
    e_blinding] plus the device-resident IPP state."""
    N, p = n * m, l0.shape[-1]
    ab, sb, t1b, t2b, _, _ = _blind_slices(N, p, red)
    x = S.from_bytes32(x_bytes)
    vb = S.from_bytes32(vb_bytes).reshape(L, m, p)
    a, b, gw, hw, t_x, t_xb, e_b = stage2(
        N, x, l0, l1, r0, r1, t0, t1, t2, zz_zpow, vb, t1b, t2b, ab, sb, yinv)
    txs = S.limbs_to_bytes33(
        jnp.stack([t_x, t_xb, e_b], axis=1).reshape(L, 3 * p))
    return txs, a, b, gw, hw, t_x, t_xb, e_b


def _round_emit(N, nk, niels_l, niels_r, a, b, gw, hw, w_bytes):
    from . import fixed_msm as FM
    from . import vec_curve as C

    w = S.from_bytes32(w_bytes)
    dig_l, dig_r = round_digits_compact(N, nk, a, b, gw, hw, w)
    pts = jnp.concatenate([FM.msm_digits_niels(niels_l, dig_l),
                           FM.msm_digits_niels(niels_r, dig_r)], axis=-1)
    return C.compress_device(pts)


@functools.partial(jax.jit, static_argnums=(0,))
def round_first_fused(N: int, niels_l, niels_r, a, b, gw, hw, w_bytes):
    """First IPP round in one launch: compact L/R digit streams, both MSMs,
    compression -> (2P, 32) rows [L | R]."""
    return _round_emit(N, N, niels_l, niels_r, a, b, gw, hw, w_bytes)


@functools.partial(jax.jit, static_argnums=(0, 1))
def roundk_fused(N: int, nk: int, niels_l, niels_r, a, b, gw, hw,
                 u_bytes, ui_bytes, w_bytes):
    """Subsequent IPP round in one launch: fold the previous round
    (2*nk -> nk) with its challenge, then emit this round's L/R."""
    u = S.from_bytes32(u_bytes)
    uinv = S.from_bytes32(ui_bytes)
    a, b, gw, hw = round_fold(N, 2 * nk, a, b, gw, hw, u, uinv)
    lr = _round_emit(N, nk, niels_l, niels_r, a, b, gw, hw, w_bytes)
    return lr, a, b, gw, hw


@functools.partial(jax.jit, static_argnums=(0,))
def final_fused(N: int, a, b, gw, hw, u_bytes, ui_bytes, t_x, t_xb, e_b):
    """Last fold (2 -> 1) plus the final scalar download block
    (5P, 33) [t_x | t_x_blinding | e_blinding | a0 | b0]."""
    u = S.from_bytes32(u_bytes)
    uinv = S.from_bytes32(ui_bytes)
    a, b, _, _ = round_fold(N, 2, a, b, gw, hw, u, uinv)
    p = a.shape[-1]
    return S.limbs_to_bytes33(
        final_scalars(a, b, t_x, t_xb, e_b).reshape(L, 5 * p))


# --------------------------------------------------------------------------
# single-program prover
#
# The fused phase launches above still compile one executable per IPP round
# width nk (roundk_fused is specialized on its static slot maps), i.e.
# 3 + lg(nm) + 1 programs -- each costing ~90 s of first-execution time
# through the device tunnel.  The functions below make the round body
# SHAPE-UNIFORM by passing the slot maps as runtime gather indices, and put
# the Fiat-Shamir transcript itself on device
# (ops/transcript_device.DeviceStrobe over ops/keccak_device), so the whole
# batched prove -- blinding expansion, all commitments, every challenge,
# all lg(nm) rounds (a lax.scan), and the canonical output scalars -- is
# ONE XLA program with zero host round-trips.
# (Protocol twin: the host stage loop in native/prove_prep.cpp; reference
# call stack src/range_proof/mod.rs:234-288 + inner_product_proof.rs:38-185.)
# --------------------------------------------------------------------------


def _dyn_round_maps(N: int):
    """Per-round gather maps, stacked over the lg(N) rounds.

    Returns (emit, folds): emit[k] covers the L/R digit emission at width
    nk = N >> k; folds[k-1] covers the fold INTO width nk (rounds >= 1).
    All arrays are numpy; the scan passes rounds 1.. as stacked xs."""
    emit, folds = [], []
    j = np.arange(N)
    nk = N
    while nk > 1:
        h = nk // 2
        s = j % nk
        hi = s >= h
        hi_sel = np.nonzero(hi)[0].astype(np.int32)
        lo_sel = np.nonzero(~hi)[0].astype(np.int32)
        L_bases = np.concatenate([[0], 2 + hi_sel, 2 + N + lo_sel]).astype(np.int32)
        R_bases = np.concatenate([[0], 2 + lo_sel, 2 + N + hi_sel]).astype(np.int32)
        w64 = np.arange(64, dtype=np.int32)
        emit.append(dict(
            idx_partner=np.where(j < h, j + h, 0).astype(np.int32),
            mask_half=(j < h).astype(np.int32),
            hi_sel=hi_sel, lo_sel=lo_sel,
            al=(hi_sel % nk - h).astype(np.int32),
            bl=(lo_sel % nk + h).astype(np.int32),
            ar=(lo_sel % nk + h).astype(np.int32),
            br=(hi_sel % nk - h).astype(np.int32),
            sel_l=(L_bases[:, None] * 64 + w64[None, :]).reshape(-1),
            sel_r=(R_bases[:, None] * 64 + w64[None, :]).reshape(-1),
        ))
        if nk < N:
            folds.append(dict(
                mask_fold=(j < nk).astype(np.int32),
                idx_fold=np.where(j < nk, j + nk, 0).astype(np.int32),
                glo=((j % (2 * nk)) < nk).astype(np.int32),
            ))
        nk //= 2
    return emit, folds


def fold_dyn(a, b, gw, hw, u, uinv, mask_fold, idx_fold, glo):
    """Shape-uniform fold: new a[j] = u*a[j] + uinv*a[j+nk] for j < nk
    (runtime maps), b with u/uinv swapped; gw/hw pick up u or uinv by the
    lo/hi slot pattern.  Stale upper slots keep their old values (never
    read by later rounds)."""
    N, p = a.shape[1], a.shape[2]
    m = (mask_fold != 0)[None, :, None]
    g = (glo != 0)[None, :, None]
    ah = jnp.take(a, idx_fold, axis=1)
    bh = jnp.take(b, idx_fold, axis=1)
    from . import fold_pallas as FP
    if FP.usable(N * p):
        bu = jnp.broadcast_to(u[:, None, :], (L, N, p)).reshape(L, N * p)
        bui = jnp.broadcast_to(uinv[:, None, :], (L, N, p)).reshape(L, N * p)
        na = FP.fold_lanes(a.reshape(L, N * p), ah.reshape(L, N * p),
                           bu, bui).reshape(L, N, p)
        nb = FP.fold_lanes(b.reshape(L, N * p), bh.reshape(L, N * p),
                           bui, bu).reshape(L, N, p)
        mul_g = jnp.where(g, _bcast(uinv, N), _bcast(u, N))
        mul_h = jnp.where(g, _bcast(u, N), _bcast(uinv, N))
        gw = FP.smul_lanes(gw.reshape(L, N * p),
                           mul_g.reshape(L, N * p)).reshape(L, N, p)
        hw = FP.smul_lanes(hw.reshape(L, N * p),
                           mul_h.reshape(L, N * p)).reshape(L, N, p)
    else:
        na = _vadd(_vmul(a, _bcast(u, N)), _vmul(ah, _bcast(uinv, N)))
        nb = _vadd(_vmul(b, _bcast(uinv, N)), _vmul(bh, _bcast(u, N)))
        gw = _vmul(gw, jnp.where(g, _bcast(uinv, N), _bcast(u, N)))
        hw = _vmul(hw, jnp.where(g, _bcast(u, N), _bcast(uinv, N)))
    a = jnp.where(m, na, a)
    b = jnp.where(m, nb, b)
    return a, b, gw, hw


def round_emit_dyn(a, b, gw, hw, w, em):
    """round_digits_compact with runtime gather maps: -> (dig_l, dig_r)
    each ((N/2*2+1)*64, P) signed digit streams over the base orders of
    em['sel_l'] / em['sel_r']."""
    mh = (em["mask_half"] != 0)[None, :, None]
    bp = jnp.take(b, em["idx_partner"], axis=1)
    ap = jnp.take(a, em["idx_partner"], axis=1)
    cL = S.tree_sum(jnp.where(mh, _vmul(a, bp), 0))
    cR = S.tree_sum(jnp.where(mh, _vmul(ap, b), 0))
    alphaL = _vmul(jnp.take(a, em["al"], axis=1), jnp.take(gw, em["hi_sel"], axis=1))
    betaL = _vmul(jnp.take(b, em["bl"], axis=1), jnp.take(hw, em["lo_sel"], axis=1))
    alphaR = _vmul(jnp.take(a, em["ar"], axis=1), jnp.take(gw, em["lo_sel"], axis=1))
    betaR = _vmul(jnp.take(b, em["br"], axis=1), jnp.take(hw, em["hi_sel"], axis=1))
    coef_l = jnp.concatenate([_col(S.smul(cL, w)), alphaL, betaL], axis=1)
    coef_r = jnp.concatenate([_col(S.smul(cR, w)), alphaR, betaR], axis=1)
    return _coef_digits(coef_l), _coef_digits(coef_r)


# entry/exit counters of every IPP round body: the last op before and
# after each round is a 64-byte challenge PRF (forces a permutation, then
# squeezes 64 bytes from position 0)
_ROUND_COUNTERS = (64, 0, 7)   # pos, pos_begin, FLAG_I | FLAG_A | FLAG_C


def stage0_eager(n: int, m: int, niels, key_nonce, v_bytes, vb_bytes,
                 bits_u8):
    """Stage 0 of the two-program prove: blinding expansion and the
    V/A/S commitments.  Returns (vas ((m+2)P, 32) compressed rows for the
    host's Fiat-Shamir absorb, red (L, (4+2N)P) device-resident blinds
    consumed by prove_rest)."""
    from . import chacha
    from . import fixed_msm as FM
    from . import vec_curve as C

    N = n * m
    P = bits_u8.shape[-1]
    bits = bits_u8.astype(jnp.int32)
    red = S.from_wide_bytes(chacha._keystream_blocks(key_nonce,
                                                     P * (4 + 2 * N)))
    ab, sb, t1b, t2b, sl, sr = _blind_slices(N, P, red)

    w64 = np.arange(64, dtype=np.int32)
    niels_bb = niels[:, :, : 2 * 64, :]
    sel_a = np.asarray(a_stream_sel(N), np.int32)
    sel_s = (np.asarray(s_base_sel(N), np.int32)[:, None] * 64
             + w64[None, :]).reshape(-1)
    niels_a = jnp.take(niels, jnp.asarray(sel_a), axis=2)
    niels_s = jnp.take(niels, jnp.asarray(sel_s), axis=2)

    v_sc = S.from_bytes32(v_bytes)
    vb_limbs = S.from_bytes32(vb_bytes)
    vpts = FM.msm_digits_niels(niels_bb, v_digits(v_sc, vb_limbs))
    apts = FM.msm_digits_niels(niels_a, a_digits(N, bits, ab))
    spts = FM.msm_digits_niels(niels_s, s_digits(N, sb, sl, sr))
    vas = C.compress_device(jnp.concatenate([vpts, apts, spts], axis=-1))
    return vas, red


stage0_fused_v2 = functools.partial(jax.jit, static_argnums=(0, 1))(
    stage0_eager)


def prove_rest_eager(n: int, m: int, niels, states_z, red, bits_u8,
                     yz_bytes, vb_bytes, _scan: bool = False):
    """Everything after the y/z challenges, as one program.

    The host absorbs dom-sep + V/A/S and draws y, z with its C++ STROBE
    (native rp_ts_yz) -- that segment is the only one whose byte positions
    depend on the caller's prior transcript content.  After z's 64-byte
    PRF every transcript sits at the SAME counters (_ROUND_COUNTERS), so
    this program's static schedule holds for arbitrary input transcripts.

    states_z: (200, P) post-z STROBE states; yz_bytes: (3P, 32) rows
    [y | z | 1/y] from rp_ts_yz; red: stage0's device-resident blinds.

    Returns (tb (2P, 32), lr (lgN, 2P, 32), fin (5, P, 32) canonical
    [t_x, t_x_blinding, e_blinding, a0, b0], state_out (200, P)); final
    strobe counters are _ROUND_COUNTERS."""
    from . import fixed_msm as FM
    from . import vec_curve as C
    from .transcript_device import DeviceStrobe

    N = n * m
    P = bits_u8.shape[-1]
    R = N.bit_length() - 1
    bits = bits_u8.astype(jnp.int32)
    ab, sb, t1b, t2b, sl, sr = _blind_slices(N, P, red)
    niels_bb = niels[:, :, : 2 * 64, :]

    yzi = S.from_bytes32(yz_bytes)
    y, z, yinv = yzi[:, :P], yzi[:, P: 2 * P], yzi[:, 2 * P:]
    vb_limbs = S.from_bytes32(vb_bytes)
    ts = DeviceStrobe(states_z, *_ROUND_COUNTERS)

    # stage 1: l/r polys, T_1/T_2 -> x
    l0, l1, r0, r1, t0, t1, t2, zz_zpow, tdig = stage1(
        n, m, bits, y, z, sl, sr, t1b, t2b)
    tb = C.compress_device(FM.msm_digits_niels(niels_bb, tdig))
    ts.append_rows(b"T_1", tb[:P].T)
    ts.append_rows(b"T_2", tb[P:].T)
    x = ts.challenge_scalar(b"x")

    # stage 2: share scalars + IPP init -> w
    a, b, gw, hw, t_x, t_xb, e_b = stage2(
        N, x, l0, l1, r0, r1, t0, t1, t2, zz_zpow,
        vb_limbs.reshape(L, m, P), t1b, t2b, ab, sb, yinv)
    tx_by = S.canonical_bytes32(t_x)
    txb_by = S.canonical_bytes32(t_xb)
    eb_by = S.canonical_bytes32(e_b)
    ts.append_rows(b"t_x", tx_by.T)
    ts.append_rows(b"t_x_blinding", txb_by.T)
    ts.append_rows(b"e_blinding", eb_by.T)
    w = ts.challenge_scalar(b"w")
    ts.innerproduct_domain_sep(N)

    emit, folds = _dyn_round_maps(N)

    def _emit_round(em_np, a, b, gw, hw, sel_is_static):
        em = {k: (jnp.asarray(v) if sel_is_static else v)
              for k, v in em_np.items()}
        dig_l, dig_r = round_emit_dyn(a, b, gw, hw, w, em)
        nl = jnp.take(niels, em["sel_l"], axis=2)
        nr = jnp.take(niels, em["sel_r"], axis=2)
        pts = jnp.concatenate([FM.msm_digits_niels(nl, dig_l),
                               FM.msm_digits_niels(nr, dig_r)], axis=-1)
        return C.compress_device(pts)

    # round 0 (no fold)
    lr0 = _emit_round(emit[0], a, b, gw, hw, True)
    ts.append_rows(b"L", lr0[:P].T)
    ts.append_rows(b"R", lr0[P:].T)
    u = ts.challenge_scalar(b"u")
    uinv = S.sinv(u)
    assert ts.counters() == _ROUND_COUNTERS

    if R > 1:
        def body(carry, em):
            a, b, gw, hw, u, uinv, st = carry
            a, b, gw, hw = fold_dyn(a, b, gw, hw, u, uinv,
                                    em["mask_fold"], em["idx_fold"], em["glo"])
            lr = _emit_round(em, a, b, gw, hw, False)
            ts = DeviceStrobe(st, *_ROUND_COUNTERS)
            ts.append_rows(b"L", lr[:P].T)
            ts.append_rows(b"R", lr[P:].T)
            u = ts.challenge_scalar(b"u")
            uinv = S.sinv(u)
            assert ts.counters() == _ROUND_COUNTERS
            return (a, b, gw, hw, u, uinv, ts.st), lr

        carry = (a, b, gw, hw, u, uinv, ts.st)
        if _scan:
            xs = {k: jnp.asarray(np.stack([em[k] for em in emit[1:]]))
                  for k in emit[0]}
            for k in folds[0]:
                xs[k] = jnp.asarray(np.stack([f[k] for f in folds]))
            carry, lr_rest = jax.lax.scan(body, carry, xs)
            lr_all = jnp.concatenate([lr0[None], lr_rest], axis=0)
        else:
            # off-TPU (eager tests): a Python loop avoids handing the XLA
            # CPU compiler the whole scan body as one program
            lrs = [lr0]
            for k in range(1, R):
                em = dict(emit[k])
                em.update(folds[k - 1])
                em = {kk: jnp.asarray(vv) for kk, vv in em.items()}
                carry, lr = body(carry, em)
                lrs.append(lr)
            lr_all = jnp.stack(lrs)
        a, b, gw, hw, u, uinv, st = carry
    else:
        st = ts.st
        lr_all = lr0[None]

    # final fold 2 -> 1 and canonical proof scalars
    a0 = S.sadd(S.smul(a[:, 0], u), S.smul(a[:, 1], uinv))
    b0 = S.sadd(S.smul(b[:, 0], uinv), S.smul(b[:, 1], u))
    fin = jnp.stack([tx_by, txb_by, eb_by,
                     S.canonical_bytes32(a0), S.canonical_bytes32(b0)])
    return tb, lr_all, fin, st


# On TPU the prove is TWO jitted programs split at the y/z boundary
# (compile amortized by the persistent cache).  Off TPU (CPU tests) the
# eager variants run the same code path with only the small nested jits
# (f1600, the XLA MSM, sinv, stage1/2) compiled -- the fused graph is too
# large for the XLA-CPU compiler to digest in test time.
prove_rest_fused = functools.partial(
    jax.jit, static_argnums=(0, 1))(
        functools.partial(prove_rest_eager, _scan=True))


# --------------------------------------------------------------------------
# segmented prover (aggregated m > 1)
#
# prove_rest_fused compiles the whole post-y/z protocol -- including the
# lax.scan over all IPP rounds -- as ONE program; at N = n*m >= 256 that
# program exceeds what the remote Mosaic compiler reliably digests (the
# round-3 negative result that gated the fused path to m = 1).  The
# segmented variant splits at Fiat-Shamir round boundaries into THREE
# executables of bounded size for ANY m:
#   prove_mid_fused    stages 1-2 + IPP round 0 (everything between y/z and
#                      the first u challenge)
#   round_step_fused   ONE shape-uniform round body, reused for rounds
#                      1..R-1: the per-round gather maps are stacked
#                      device-resident tensors indexed by a TRACED round
#                      counter, so every round runs the same executable
#   prove_fin_fused    final 2 -> 1 fold + canonical output block
# The carry (a, b, gw, hw, u, 1/u, the 200-byte sponge states) never
# leaves the device, and all R+1 dispatches are issued asynchronously
# back-to-back -- wall-clock matches the scan form to within dispatch
# overhead (R extra launches of ~ms each).
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _dyn_round_xs_np(N: int):
    """numpy form of the stacked round-1.. maps (cached per N)."""
    emit, folds = _dyn_round_maps(N)
    xs = {k: np.stack([em[k] for em in emit[1:]]) for k in emit[0]}
    for k in folds[0]:
        xs[k] = np.stack([f[k] for f in folds])
    return xs


def dyn_round_xs(N: int):
    """Stacked (R-1, ...) gather maps for round_step_fused, as device
    arrays (upload once per process; ~0.5 MB at N = 1024)."""
    return {k: jnp.asarray(v) for k, v in _dyn_round_xs_np(N).items()}


@functools.partial(jax.jit, static_argnums=(0, 1))
def prove_mid_fused(n: int, m: int, niels, states_z, red, bits_u8,
                    yz_bytes, vb_bytes):
    """Stages 1-2 + IPP round 0 in one launch.  Same inputs as
    prove_rest_fused; returns (tb (2P, 32), lr0 (2P, 32), carry...) with
    the IPP state and transcript left ON DEVICE for round_step_fused."""
    from . import fixed_msm as FM
    from . import vec_curve as C
    from .transcript_device import DeviceStrobe

    N = n * m
    P = bits_u8.shape[-1]
    bits = bits_u8.astype(jnp.int32)
    ab, sb, t1b, t2b, sl, sr = _blind_slices(N, P, red)
    niels_bb = niels[:, :, : 2 * 64, :]

    yzi = S.from_bytes32(yz_bytes)
    y, z, yinv = yzi[:, :P], yzi[:, P: 2 * P], yzi[:, 2 * P:]
    vb_limbs = S.from_bytes32(vb_bytes)
    ts = DeviceStrobe(states_z, *_ROUND_COUNTERS)

    l0, l1, r0, r1, t0, t1, t2, zz_zpow, tdig = stage1(
        n, m, bits, y, z, sl, sr, t1b, t2b)
    tb = C.compress_device(FM.msm_digits_niels(niels_bb, tdig))
    ts.append_rows(b"T_1", tb[:P].T)
    ts.append_rows(b"T_2", tb[P:].T)
    x = ts.challenge_scalar(b"x")

    a, b, gw, hw, t_x, t_xb, e_b = stage2(
        N, x, l0, l1, r0, r1, t0, t1, t2, zz_zpow,
        vb_limbs.reshape(L, m, P), t1b, t2b, ab, sb, yinv)
    tx_by = S.canonical_bytes32(t_x)
    txb_by = S.canonical_bytes32(t_xb)
    eb_by = S.canonical_bytes32(e_b)
    ts.append_rows(b"t_x", tx_by.T)
    ts.append_rows(b"t_x_blinding", txb_by.T)
    ts.append_rows(b"e_blinding", eb_by.T)
    w = ts.challenge_scalar(b"w")
    ts.innerproduct_domain_sep(N)

    emit, _ = _dyn_round_maps(N)
    em = {k: jnp.asarray(v) for k, v in emit[0].items()}
    dig_l, dig_r = round_emit_dyn(a, b, gw, hw, w, em)
    nl = jnp.take(niels, em["sel_l"], axis=2)
    nr = jnp.take(niels, em["sel_r"], axis=2)
    pts = jnp.concatenate([FM.msm_digits_niels(nl, dig_l),
                           FM.msm_digits_niels(nr, dig_r)], axis=-1)
    lr0 = C.compress_device(pts)
    ts.append_rows(b"L", lr0[:P].T)
    ts.append_rows(b"R", lr0[P:].T)
    u = ts.challenge_scalar(b"u")
    uinv = S.sinv(u)
    assert ts.counters() == _ROUND_COUNTERS
    return tb, lr0, w, a, b, gw, hw, u, uinv, ts.st, tx_by, txb_by, eb_by


@jax.jit
def round_step_fused(niels, xs, k, w, a, b, gw, hw, u, uinv, st):
    """IPP round 1.. as ONE shape-uniform launch: fold with the previous
    round's challenge, emit this round's L/R, absorb, draw u.  `k` indexes
    the stacked maps (traced -> one executable serves every round)."""
    from . import fixed_msm as FM
    from . import vec_curve as C
    from .transcript_device import DeviceStrobe

    P = a.shape[-1]
    em = {key: jnp.take(xs[key], k, axis=0) for key in xs}
    a, b, gw, hw = fold_dyn(a, b, gw, hw, u, uinv,
                            em["mask_fold"], em["idx_fold"], em["glo"])
    dig_l, dig_r = round_emit_dyn(a, b, gw, hw, w, em)
    nl = jnp.take(niels, em["sel_l"], axis=2)
    nr = jnp.take(niels, em["sel_r"], axis=2)
    pts = jnp.concatenate([FM.msm_digits_niels(nl, dig_l),
                           FM.msm_digits_niels(nr, dig_r)], axis=-1)
    lr = C.compress_device(pts)
    ts = DeviceStrobe(st, *_ROUND_COUNTERS)
    ts.append_rows(b"L", lr[:P].T)
    ts.append_rows(b"R", lr[P:].T)
    u = ts.challenge_scalar(b"u")
    uinv = S.sinv(u)
    assert ts.counters() == _ROUND_COUNTERS
    return lr, a, b, gw, hw, u, uinv, ts.st


@jax.jit
def round_step2_fused(niels, xs, k, w, a, b, gw, hw, u, uinv, st):
    """TWO successive IPP rounds in one launch (rounds k+1 and k+2 of the
    protocol, i.e. stacked-map indices k and k+1).  Halves the per-round
    dispatch count of the segmented pipeline; the traced k keeps it
    shape-uniform like round_step_fused."""
    lr1, a, b, gw, hw, u, uinv, st = round_step_fused.__wrapped__(
        niels, xs, k, w, a, b, gw, hw, u, uinv, st)
    lr2, a, b, gw, hw, u, uinv, st = round_step_fused.__wrapped__(
        niels, xs, k + 1, w, a, b, gw, hw, u, uinv, st)
    return lr1, lr2, a, b, gw, hw, u, uinv, st


@jax.jit
def prove_fin_fused(lrs, a, b, u, uinv, tx_by, txb_by, eb_by):
    """Final 2 -> 1 fold; returns (lr_all (lgN, 2P, 32), fin (5, P, 32))."""
    a0 = S.sadd(S.smul(a[:, 0], u), S.smul(a[:, 1], uinv))
    b0 = S.sadd(S.smul(b[:, 0], uinv), S.smul(b[:, 1], u))
    fin = jnp.stack([tx_by, txb_by, eb_by,
                     S.canonical_bytes32(a0), S.canonical_bytes32(b0)])
    return jnp.stack(lrs), fin


def prove_rest_segmented(n: int, m: int, niels, states_z, red, bits_u8,
                         yz_bytes, vb_bytes):
    """Drop-in for prove_rest_fused built from the three segment programs
    (same return signature); used for aggregated m > 1 on TPU, where the
    one-scan program exceeds the remote compiler."""
    N = n * m
    R = N.bit_length() - 1
    (tb, lr0, w, a, b, gw, hw, u, uinv, st,
     tx_by, txb_by, eb_by) = prove_mid_fused(
        n, m, niels, states_z, red, bits_u8, yz_bytes, vb_bytes)
    lrs = [lr0]
    if R > 1:
        from ..config import settings
        xs = dyn_round_xs(N)
        k = 0
        # round pairing (opt-in): halves dispatch count for a measured
        # 10.26 -> 10.12 ms/proof at m=16 batch 512, at the price of one
        # extra ~2x-sized executable to stage cold (docs/kernels.md) --
        # worth it for long-lived processes, not for one-shot runs
        if settings.segmented_round_pairing:
            while k + 2 <= R - 1:
                lr1, lr2, a, b, gw, hw, u, uinv, st = round_step2_fused(
                    niels, xs, jnp.int32(k), w, a, b, gw, hw, u, uinv, st)
                lrs.extend([lr1, lr2])
                k += 2
        while k < R - 1:
            lr, a, b, gw, hw, u, uinv, st = round_step_fused(
                niels, xs, jnp.int32(k), w, a, b, gw, hw, u, uinv, st)
            lrs.append(lr)
            k += 1
    lr_all, fin = prove_fin_fused(lrs, a, b, u, uinv, tx_by, txb_by, eb_by)
    return tb, lr_all, fin, st
