"""Fused Pallas kernel for the batch-verification scalar emit.

The XLA form of ops/verify_stages.py round-trips every (nm, L, P)
intermediate through HBM (measured ~30x slower than its op count
justifies); this kernel keeps the whole per-tile computation -- the
weighted s-vector, y^-i powers, the g/h generator streams, the dynamic
MSM coefficients AND their 4-bit digit extraction -- in VMEM.

Design (same recipes as ops/msm_pallas.py):
* grid over proof tiles of BLKP = 128 lanes; the nm generator axis is
  vectorized ONTO LANES (width nm*BLKP per vector op), so there is no
  dynamic indexing anywhere: the s-vector doubling, the i-reversal, and
  the 2^(i mod n) * z^(i/n) table are all static lane slices/concats;
* mod-l Barrett in carry-save exactly as ops/vec_scalar.py, expressed with
  static slices + concatenate only (`.at[].add` does not lower);
* g/h are accumulated ACROSS grid tiles into the revisited output block,
  renormalized every 8 tiles to stay inside the 20-limb carry headroom
  (reference scalar formulas: src/range_proof/mod.rs:406-445);
* dynamic-point digits leave the kernel MSM-ready; the host reorders the
  compressed points to the kernel's [tile][slot][lane] order instead
  (a cheap numpy transpose of bytes).

Scalar-constant tensor rows: 0 MU, 1 NEGL (= b^21 - l), 2 l-1 (for
negation), each padded to 21 limbs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.scalar import L as ELL
from . import vec_scalar as S
from .limbs import NLIMBS, LIMB_BITS, LIMB_MASK

L = NLIMBS
MASK = LIMB_MASK
BLKP = 128                     # proofs per tile (one lane tile)
_POW2_LIMBS = 6                # 2^(i mod n) < 2^64 fits 6 x 13-bit limbs
_K = 20
_KQ = 21

_INTERPRET = False


def _to_limbs(v: int, n: int) -> np.ndarray:
    out = np.zeros(n, np.int64)
    for k in range(n):
        out[k] = v & MASK
        v >>= LIMB_BITS
    assert v == 0
    return out


_SCONSTS = np.stack([
    _to_limbs((1 << (LIMB_BITS * 2 * _K)) // ELL, _KQ),
    _to_limbs((1 << (LIMB_BITS * (_K + 1))) - ELL, _KQ),
    _to_limbs(ELL - 1, _KQ),
]).astype(np.int32)[:, :, None]                 # (3, 21, 1)


@functools.lru_cache(maxsize=None)
def _pow2_lanes(n: int, m: int) -> np.ndarray:
    """(_POW2_LIMBS, nm*BLKP) int32: limbs of 2^(i mod n) (< 2^64, so 6
    limbs suffice), constant over the proof lane and the aggregation index
    (z^(i/n) is applied separately)."""
    rows = np.zeros((_POW2_LIMBS, n * m * BLKP), np.int32)
    for i in range(n * m):
        rows[:, i * BLKP: (i + 1) * BLKP] = \
            _to_limbs(1 << (i % n), _POW2_LIMBS)[:, None]
    return rows


# -- in-kernel mod-l arithmetic (static slices + concat only) ---------------

def _kcarry(c, n):
    cr = c >> LIMB_BITS
    lo = c & MASK
    z1 = jnp.zeros_like(cr[..., :1, :])
    return lo + jnp.concatenate([z1, cr[..., :n - 1, :]], axis=-2)


def _mul_trunc(a, b, na, nb, out_limbs):
    """Schoolbook a (na limbs) x b (nb limbs) truncated to out_limbs,
    concat-accumulation (Mosaic-safe).  Both operands lane-wide."""
    lanes = a.shape[-1]
    c = jnp.zeros(a.shape[:-2] + (out_limbs, lanes), jnp.int32)
    for i in range(na):
        hi = min(nb, out_limbs - i)
        if hi <= 0:
            break
        seg = c[..., i: i + hi, :] + a[..., i: i + 1, :] * b[..., :hi, :]
        parts = ([c[..., :i, :]] if i else []) + [seg]
        if i + hi < out_limbs:
            parts.append(c[..., i + hi:, :])
        c = jnp.concatenate(parts, axis=-2) if len(parts) > 1 else parts[0]
    return c


def _mat(row, width):
    """Materialize a (n, 1) constant row at lane width.  The broadcast is
    done at one lane tile then replicated by concat: a lazy multi-tile
    broadcast folds into an unsupported two-axis vector.broadcast when the
    result is later sliced (as in _mul_trunc)."""
    base = row + jnp.zeros(row.shape[:-1] + (min(width, 128),), jnp.int32)
    if width <= 128:
        return base
    assert width % 128 == 0
    return jnp.concatenate([base] * (width // 128), axis=-1)


def _barrett(x, mu, negl):
    """40-limb carry-save x -> < ~5l (20 limbs); mirrors vec_scalar."""
    q1 = x[..., _K - 1:, :]
    q2 = _mul_trunc(q1, mu, _KQ, _KQ, 2 * _KQ)
    q2 = _kcarry(_kcarry(_kcarry(q2, 2 * _KQ), 2 * _KQ), 2 * _KQ)
    q3 = q2[..., _K + 1:, :]
    r = _mul_trunc(q3, negl, _KQ, _KQ, _K + 1)
    r = r + x[..., : _K + 1, :]
    r = _kcarry(_kcarry(_kcarry(r, _K + 1), _K + 1), _K + 1)
    return r[..., :L, :]


def _smul(a, b, mu, negl):
    x = _mul_trunc(a, b, L, L, 2 * L)
    x = _kcarry(_kcarry(_kcarry(x, 2 * L), 2 * L), 2 * L)
    return _barrett(x, mu, negl)


def _smul_pow2(a, b6, mu, negl):
    """a (L limbs, < 2^256) times a 6-limb value (< 2^78): the 26-limb
    product zero-pads to the Barrett input width."""
    nx = L + _POW2_LIMBS
    x = _mul_trunc(a, b6, L, _POW2_LIMBS, nx)
    x = _kcarry(_kcarry(_kcarry(x, nx), nx), nx)
    pad = jnp.zeros(x.shape[:-2] + (2 * L - nx,) + x.shape[-1:], jnp.int32)
    return _barrett(jnp.concatenate([x, pad], axis=-2), mu, negl)


def _sadd(a, b):
    return _kcarry(a + b, L)


def _renorm(v, mu, negl):
    """Lazy value < 2^260 -> < ~5l (pad to 40 limbs + Barrett)."""
    v = _kcarry(v, L)
    pad = jnp.zeros(v.shape[:-2] + (L,) + v.shape[-1:], jnp.int32)
    return _barrett(jnp.concatenate([v, pad], axis=-2), mu, negl)


def _exact(c):
    """Sequential carry -> exact 13-bit limbs (value < 2^260)."""
    for k in range(L - 1):
        cr = c[..., k: k + 1, :] >> LIMB_BITS
        parts = []
        if k > 0:
            parts.append(c[..., :k, :])
        parts.append(c[..., k: k + 1, :] & MASK)
        parts.append(c[..., k + 1: k + 2, :] + cr)
        if k + 2 < L:
            parts.append(c[..., k + 2:, :])
        c = jnp.concatenate(parts, axis=-2)
    return c


def _digits64(c):
    """(L, N) values < 2^256 -> (64, N) unsigned 4-bit digits."""
    c = _exact(c)
    padded = jnp.concatenate([c, jnp.zeros_like(c[..., :1, :])], axis=-2)
    rows = []
    for w in range(64):
        limb, off = (4 * w) // LIMB_BITS, (4 * w) % LIMB_BITS
        lo = padded[..., limb: limb + 1, :]
        hi = padded[..., limb + 1: limb + 2, :]
        rows.append(((lo >> off) | (hi << (LIMB_BITS - off))) & 15)
    return jnp.concatenate(rows, axis=-2)


def _tile(v, k):
    return jnp.concatenate([v] * k, axis=-1) if k > 1 else v


# -- the kernel --------------------------------------------------------------

def _emit_kernel(n, m, sconsts_ref, pow2_ref, blk_ref, dig_ref, gh_ref):
    nm = n * m
    lg = nm.bit_length() - 1
    tile = pl.program_id(0)

    mu_s = _mat(sconsts_ref[0], BLKP)
    negl_s = _mat(sconsts_ref[1], BLKP)
    minus_one = _mat(sconsts_ref[2], BLKP)[..., :L, :]

    def smul_s(a, b):
        return _smul(a, b, mu_s, negl_s)

    def smul_w(a, b):
        w = a.shape[-1]
        return _smul(a, b, _mat(sconsts_ref[0], w), _mat(sconsts_ref[1], w))

    # COMPACT challenge block [u.., r, x, rc, z, y_inv, -a, -b, allinv]
    # (native rangeproof_verify_replay_batch_c): derive u^2, u^-2 (from
    # allinv via prefix/suffix products), t0 = r*prod(u)^-1, t0r =
    # r*prod(u) in-kernel -- ~4*lg extra BLKP-wide smuls, negligible next
    # to the nm*BLKP-wide main work, in exchange for uploading lg+8
    # instead of 2*lg+9 scalars per proof through the tunnel.
    u = [blk_ref[k] for k in range(lg)]
    (r, x, rc, z, y_inv, neg_a, neg_b, allinv) = \
        (blk_ref[lg + j] for j in range(8))

    u_sq = [smul_s(uk, uk) for uk in u]
    ones = jnp.concatenate(
        [jnp.ones_like(r[..., :1, :]), jnp.zeros_like(r[..., 1:, :])],
        axis=-2)
    pres = [ones]                               # prod u[<k]
    for k in range(1, lg):
        pres.append(smul_s(pres[-1], u[k - 1]))
    sufs = [None] * lg + [ones]                 # prod u[>k]
    for k in range(lg - 1, -1, -1):
        sufs[k] = smul_s(sufs[k + 1], u[k])
    uinv = [smul_s(smul_s(allinv, pres[k]), sufs[k + 1]) for k in range(lg)]
    u_inv_sq = [smul_s(v, v) for v in uinv]
    prod = smul_s(pres[lg - 1], u[lg - 1])
    t0 = smul_s(r, allinv)
    t0r = smul_s(r, prod)

    rx = smul_s(r, x)
    rcx = smul_s(rc, x)
    rcxx = smul_s(rcx, x)
    rz = smul_s(r, z)
    rzz = smul_s(rz, z)
    rczz = smul_s(smul_s(rc, z), z)
    neg_rz = smul_s(rz, minus_one)

    # dynamic MSM coefficients -> digits, slot-major lane order
    vslots, zp = [], None
    for j in range(m):
        vslots.append(rczz if j == 0 else smul_s(rczz, zp))
        if j + 1 < m:
            zp = z if j == 0 else smul_s(zp, z)
    slots = ([r, rx, rcx, rcxx] + [smul_s(r, u) for u in u_sq]
             + [smul_s(r, u) for u in u_inv_sq] + vslots)
    dig_ref[:] = _digits64(jnp.concatenate(slots, axis=-1))

    # weighted s-vector t[i] = r*s[i] (L, nm*BLKP) by lane-doubling
    # (reference src/inner_product_proof.rs:241-250)
    t = t0
    for j in range(lg):
        t = jnp.concatenate(
            [t, smul_w(t, _tile(u_sq[lg - 1 - j], 1 << j))], axis=-1)

    # y^-i powers by lane-doubling
    yp, cur = jnp.concatenate(
        [jnp.ones_like(y_inv[..., :1, :]),
         jnp.zeros_like(y_inv[..., 1:, :])], axis=-2), y_inv
    for j in range(lg):
        yp = jnp.concatenate([yp, smul_w(yp, _tile(cur, 1 << j))], axis=-1)
        cur = smul_s(cur, cur)

    mu_b = _mat(sconsts_ref[0], nm * BLKP)
    negl_b = _mat(sconsts_ref[1], nm * BLKP)

    # g[i] = -rz - a * t[i]
    g = _sadd(_tile(neg_rz, nm), _smul(_tile(neg_a, nm), t, mu_b, negl_b))
    g = _renorm(g, mu_b, negl_b)

    # h[i] = rz + y^-i * (rzz * 2^(i%n) * z^(i/n) - b * t[nm-1-i])
    zj_parts, zp2 = [], None
    for j in range(m):
        zj_parts.append(rzz if j == 0 else smul_s(rzz, zp2))
        if j + 1 < m:
            zp2 = z if j == 0 else smul_s(zp2, z)
    rzz_zj = jnp.concatenate([_tile(p, n) for p in zj_parts], axis=-1)
    term1 = _smul_pow2(rzz_zj, pow2_ref[:], mu_b, negl_b)
    # reversed s-vector r*s[nm-1-i] by its own doubling over u_inv_sq
    # (the bits of nm-1-i complement those of i), so the forward t need
    # not stay live
    t_rev = t0r
    for j in range(lg):
        t_rev = jnp.concatenate(
            [t_rev, smul_w(t_rev, _tile(u_inv_sq[lg - 1 - j], 1 << j))],
            axis=-1)
    term2 = _smul(_tile(neg_b, nm), t_rev, mu_b, negl_b)
    inner = _smul(yp, _sadd(term1, term2), mu_b, negl_b)
    h = _renorm(_sadd(_tile(rz, nm), inner), mu_b, negl_b)

    new = jnp.stack([g, h])

    @pl.when(tile == 0)
    def _init():
        gh_ref[:] = new

    @pl.when(tile > 0)
    def _acc():
        gh_ref[:] = _kcarry(gh_ref[:] + new, L)

    # renormalize the accumulator before the 20-limb headroom (2^260)
    # overflows: 8 tiles of < ~10l each stay < 2^260
    @pl.when(tile % 8 == 7)
    def _renorm_acc():
        gh_ref[:] = _renorm(gh_ref[:], mu_b, negl_b)


@functools.partial(jax.jit, static_argnums=(0, 1))
def emit_digits(n: int, m: int, blk_limbs: jnp.ndarray):
    """blk_limbs (nblk, L, P) -> (dyn digits (64, P*n_dyn) in
    [tile][slot][lane] order, gh (2, L, nm*BLKP) lazy partial sums)."""
    nm = n * m
    lg = nm.bit_length() - 1
    nblk = lg + 8
    n_dyn = 4 + 2 * lg + m
    P = blk_limbs.shape[-1]
    assert P % BLKP == 0
    T = P // BLKP

    dig, gh = pl.pallas_call(
        functools.partial(_emit_kernel, n, m),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((3, _KQ, 1), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_POW2_LIMBS, nm * BLKP), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, L, BLKP), lambda t: (0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((64, n_dyn * BLKP), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, L, nm * BLKP), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((64, T * n_dyn * BLKP), jnp.int32),
            jax.ShapeDtypeStruct((2, L, nm * BLKP), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the working set peaks ~16.2 MB at nm = 64 x BLKP = 128 --
            # just over the default 16 MB scoped-vmem cap; v5e has headroom.
            # Larger aggregations scale the generator-axis lanes linearly
            # (nm = 128/256 for m = 2/4); cap at 112 MB of the 128 MB VMEM
            vmem_limit_bytes=min(112, 24 * max(1, nm // 64)) * 1024 * 1024),
        interpret=_INTERPRET,
    )(jnp.asarray(_SCONSTS), jnp.asarray(_pow2_lanes(n, m)), blk_limbs)
    return dig, gh


def _lane_tree_sum(v: jnp.ndarray) -> jnp.ndarray:
    """(..., L, K) lazy values (< ~80l: the kernel renorms its accumulator
    every 8 tiles) -> (..., L, 1) sums mod l.  Renormalize at entry, then
    every 3 halvings, to stay inside the 20-limb carry headroom."""
    level = 3
    while v.shape[-1] > 1:
        if level == 3:
            v = S.sreduce(v)
            level = 0
        half = v.shape[-1] // 2
        lo = S.sadd(v[..., :half], v[..., half: 2 * half])
        v = lo if v.shape[-1] % 2 == 0 else \
            jnp.concatenate([lo, v[..., 2 * half:]], axis=-1)
        level += 1
    return S.sreduce(v)


@functools.partial(jax.jit, static_argnums=(0, 1))
def fused_tail(n: int, m: int, blk_bytes: jnp.ndarray,
               pair_bytes: jnp.ndarray, static_pts: jnp.ndarray,
               dyn_pts: jnp.ndarray, dyn_valid: jnp.ndarray) -> jnp.ndarray:
    """One device program: Pallas scalar emit -> static g/h reduction ->
    concat/pad -> fused Pallas mega-MSM -> (is_identity AND all points
    decompressed validly) flag (1,).  dyn_pts/dyn_valid must be in the
    kernel's [tile][slot][lane] order."""
    from . import msm_pallas
    from . import vec_curve as VC

    nm = n * m
    lg = nm.bit_length() - 1
    nblk = lg + 8
    P = blk_bytes.shape[0] // nblk

    lim = S.from_bytes32(blk_bytes)                       # (L, P*nblk)
    blk = jnp.transpose(lim.reshape(L, P, nblk), (2, 0, 1))
    dyn_digits, gh = emit_digits(n, m, blk)

    # reduce the per-lane partials (limbs must sit at axis -2 for the
    # mod-l tree): (2, L, nm, BLKP) -> (2, nm, L, BLKP) -> (2, nm, L)
    gh = _lane_tree_sum(
        jnp.transpose(gh.reshape(2, L, nm, BLKP), (0, 2, 1, 3)))[..., 0]
    pair = S.from_bytes32(pair_bytes)                     # (L, 2)
    static_sc = jnp.concatenate([pair, gh[0].T, gh[1].T], axis=-1)
    static_digits = S.digits64(static_sc)

    # every MSM input carries Z = 1 (static points pre-normalized at
    # BatchVerifier init; dyn points come from device decompression;
    # padding is the identity) -> the 7-mul Niels mixed-add kernel applies
    all_pts = jnp.concatenate([static_pts, dyn_pts], axis=-1)
    digits = jnp.concatenate([static_digits, dyn_digits], axis=-1)
    total = all_pts.shape[-1]
    padded, blk_sz, kchunk = msm_pallas._pick_shape(total)
    niels = msm_pallas.to_niels_lanes(all_pts)
    if padded != total:
        niels = jnp.concatenate(
            [niels, msm_pallas._niels_pad(padded - total)], axis=-1)
        digits = jnp.concatenate(
            [digits, jnp.zeros((64, padded - total), jnp.int32)], axis=-1)
    flag = msm_pallas._msm_pallas_niels(niels, digits, blk_sz, kchunk)[1]
    return flag & jnp.all(dyn_valid).astype(flag.dtype)
