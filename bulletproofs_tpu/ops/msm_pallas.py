"""Pippenger MSM and point-codec kernels as fused Pallas TPU programs
(generation 3 -- the production compute path for the reference's
`VartimeMultiscalarMul` hot loop and batch point (de)compression).

Why Pallas: the XLA elementwise path round-trips every (L, N) intermediate
through HBM, so field muls are bandwidth-bound (~25 M Edwards adds/s);
fusing whole chains in VMEM reaches ~200 M adds/s (measured on v5e).
Design choices, driven by the hardware:

* **4-bit unsigned windows** (W = 64, B = 16 buckets): small enough that
  the data-dependent bucket access becomes a dense one-hot mux over 16
  VMEM slots (~0.8x an add's cost) -- no gather/scatter primitives, which
  Mosaic does not lower for per-lane indices;
* **bucket slab resident in VMEM scratch** across the whole point stream:
  grid is (windows, point-chunks); the slab (B, 4, L, BLK) persists across
  chunk steps (last grid axis) and is flushed to HBM once per window;
* three phases, all Pallas: accumulate -> per-window lane-tree + weighted
  bucket scan -> Horner window combine.  The serial Horner tail (252
  doublings at batch width 1) costs ~1 ms fused in one kernel, versus
  ~50 ms as XLA ops, because in-kernel op latency is ~ns not ~us.  The
  Horner kernel also emits an is-identity flag so a batch verifier needs
  no extra device round-trip;
* decompression/compression (the other verification hot spot: one
  sqrt_ratio exponentiation chain per point) are single fused kernels
  gridded over lane blocks.

In-kernel math lives in ops/pallas_math.py.  Digit extraction runs on
device from raw 32-byte scalars (one byte = two digits).  Identity padding
is free: digit 0 lands in bucket 0, which the weighted reduction excludes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_math as PM
from .limbs import NLIMBS

L = NLIMBS
WINDOW_BITS = 4
NUM_WINDOWS = 64               # 64 x 4 = 256 bits >= any scalar encoding
NUM_BUCKETS = 16

_INTERPRET = False             # flipped by tests on CPU


# --------------------------------------------------------------------------
# phase 1: bucket accumulation
# --------------------------------------------------------------------------

def _accum_kernel_niels(consts_ref, pre_ref, digs_ref, out_ref, slab):
    """Niels-form variant of _accum_kernel: pre (3, L, KCH, BLK) holds
    (Y+X, Y-X, 2dT) with Z = 1, so the bucket update is a 7-mul mixed
    addition instead of the 9-mul complete formula -- a ~1.5x win on the
    accumulation phase.  Valid whenever inputs have Z = 1, which is true
    for every production caller: decompressed points and generator
    tensors are emitted with Z = 1 (`to_niels_lanes` converts; use
    `normalize_z` first for arbitrary-Z inputs)."""
    PM.bind_consts(consts_ref)
    B = slab.shape[0]
    kc = pl.program_id(1)
    n_kc = pl.num_programs(1)
    KCH = pre_ref.shape[2]

    @pl.when(kc == 0)
    def _init():
        blk_n = slab.shape[-1]
        zero = jnp.zeros((L, blk_n), jnp.int32)
        one = jnp.concatenate([jnp.ones((1, blk_n), jnp.int32), zero[1:]],
                              axis=0)
        ident = jnp.stack([zero, one, one, zero])
        for b in range(B):
            slab[b] = ident

    def step(k, _):
        d = digs_ref[0, k, :, :]
        neg = d >= 16
        mag = d & 15
        ypx = pre_ref[0, :, k, :]
        ymx = pre_ref[1, :, k, :]
        td2 = pre_ref[2, :, k, :]
        pre = (jnp.where(neg, ymx, ypx), jnp.where(neg, ypx, ymx),
               jnp.where(neg, PM.fneg(td2), td2))
        masks = [mag == b for b in range(B)]
        cur = [jnp.zeros((L, pre[0].shape[-1]), jnp.int32) for _ in range(4)]
        for b in range(B):
            sb = slab[b]
            m = masks[b]
            for c in range(4):
                cur[c] = cur[c] + jnp.where(m, sb[c], 0)
        X1, Y1, Z1, T1 = cur
        A = PM.fmul(PM.fsub(Y1, X1), pre[1])
        Bv = PM.fmul(PM.fadd(Y1, X1), pre[0])
        Cv = PM.fmul(T1, pre[2])
        Dv = PM.fmul_small(Z1, 2)
        E = PM.fsub(Bv, A)
        Fv = PM.fsub(Dv, Cv)
        G = PM.fadd(Dv, Cv)
        H = PM.fadd(Bv, A)
        new = (PM.fmul(E, Fv), PM.fmul(G, H), PM.fmul(Fv, G), PM.fmul(E, H))
        for b in range(B):
            sb = slab[b]
            m = masks[b]
            slab[b] = jnp.stack([jnp.where(m, new[c], sb[c]) for c in range(4)])
        return 0

    jax.lax.fori_loop(0, KCH, step, 0)

    @pl.when(kc == n_kc - 1)
    def _flush():
        out_ref[0] = slab[:]


def _accum_kernel(consts_ref, pts_ref, digs_ref, out_ref, slab):
    """Grid (W, n_chunks).  pts (4, L, KCH, BLK) chunk; digs (1, KCH, 1, BLK)
    SIGNED-encoded (mag = d & 15 in [0, 8], bit 4 = negate the point); slab
    scratch (B=9, 4, L, BLK) persists across the chunk axis; out
    (1, B, 4, L, BLK) written on the last chunk.  Signed digits halve the
    bucket-mux cost versus 16 unsigned buckets; the point negation
    (-P = (-X : Y : Z : -T)) is two cheap field negations."""
    PM.bind_consts(consts_ref)
    B = slab.shape[0]
    kc = pl.program_id(1)
    n_kc = pl.num_programs(1)
    KCH = pts_ref.shape[2]

    @pl.when(kc == 0)
    def _init():
        blk_n = slab.shape[-1]
        zero = jnp.zeros((L, blk_n), jnp.int32)
        one = jnp.concatenate([jnp.ones((1, blk_n), jnp.int32), zero[1:]],
                              axis=0)
        ident = jnp.stack([zero, one, one, zero])        # (4, L, BLK)
        for b in range(B):
            slab[b] = ident

    def step(k, _):
        d = digs_ref[0, k, :, :]                     # (1, BLK)
        neg = d >= 16
        mag = d & 15
        pt = (jnp.where(neg, PM.fneg(pts_ref[0, :, k, :]),
                        pts_ref[0, :, k, :]),
              pts_ref[1, :, k, :], pts_ref[2, :, k, :],
              jnp.where(neg, PM.fneg(pts_ref[3, :, k, :]),
                        pts_ref[3, :, k, :]))
        masks = [mag == b for b in range(B)]
        cur = [jnp.zeros_like(pt[0]) for _ in range(4)]
        for b in range(B):
            sb = slab[b]
            m = masks[b]
            for c in range(4):
                cur[c] = cur[c] + jnp.where(m, sb[c], 0)
        new = PM.ed_add(tuple(cur), pt)
        for b in range(B):
            sb = slab[b]
            m = masks[b]
            slab[b] = jnp.stack([jnp.where(m, new[c], sb[c]) for c in range(4)])
        return 0

    jax.lax.fori_loop(0, KCH, step, 0)

    @pl.when(kc == n_kc - 1)
    def _flush():
        out_ref[0] = slab[:]


# --------------------------------------------------------------------------
# phase 2: per-window reduction (lane tree + weighted bucket scan)
# --------------------------------------------------------------------------

def _reduce_kernel(consts_ref, slab_ref, out_ref):
    """Grid (W,).  slab (1, B, 4, L, BLK) -> out (1, 4, L, 8):
    S_w = sum_b b * (sum_lanes slab[b]).  All buckets reduce together: the
    coordinate tuples carry a leading B axis, so each tree/scan level is
    ONE wide add."""
    PM.bind_consts(consts_ref)
    B = slab_ref.shape[1]
    blk = slab_ref.shape[-1]

    t = tuple(slab_ref[0, :, c] for c in range(4))   # 4 x (B, L, BLK)
    n = blk
    while n > 8:
        n //= 2
        t = PM.ed_add(tuple(x[..., :n] for x in t),
                      tuple(x[..., n: 2 * n] for x in t))

    # weighted sum over buckets: S = sum_{b>=1} b * t[b] via double suffix
    # scan over the leading B axis (shift up, pad with identity)
    def suffix(v):
        sh = 1
        while sh < B:
            ident = PM.identity_tuple((sh,) + v[0].shape[1:])
            shifted = tuple(jnp.concatenate([x[sh:], ident[c]], axis=0)
                            for c, x in enumerate(v))
            v = PM.ed_add(v, shifted)
            sh *= 2
        return v

    t = suffix(suffix(t))
    out_ref[0] = jnp.stack(tuple(x[1] for x in t))


# --------------------------------------------------------------------------
# phase 3: window combine (Horner tail) + identity flag
# --------------------------------------------------------------------------

def _horner_kernel(consts_ref, sums_ref, out_ref, flag_ref):
    """sums (W, 4, L, 8) -> out (4, L, 8) result point (lane 0) and
    flag (1, 8) int32 (lane 0: result == identity)."""
    PM.bind_consts(consts_ref)
    W = sums_ref.shape[0]

    def wstep(i, acc):
        w = W - 2 - i
        for _ in range(WINDOW_BITS):
            acc = PM.ed_double(acc)
        s = tuple(sums_ref[w, c] for c in range(4))
        return PM.ed_add(acc, s)

    acc = tuple(sums_ref[W - 1, c] for c in range(4))
    acc = jax.lax.fori_loop(0, W - 1, wstep, acc)
    n = 8
    while n > 1:
        n //= 2
        acc = PM.ed_add(tuple(x[..., :n] for x in acc),
                        tuple(x[..., n: 2 * n] for x in acc))
    out_ref[:] = jnp.stack(tuple(jnp.broadcast_to(x, (L, 8)) for x in acc))
    flag_ref[:] = jnp.broadcast_to(PM.is_identity(acc), (1, 8))


# --------------------------------------------------------------------------
# point codecs
# --------------------------------------------------------------------------

def _decompress_kernel(consts_ref, s_ref, valid_ref, pt_ref):
    """Grid (N/BLK,).  s (L, BLK) limb columns -> valid (1, BLK),
    point (4, L, BLK)."""
    PM.bind_consts(consts_ref)
    valid, pt = PM.decompress(s_ref[:])
    valid_ref[:] = valid
    pt_ref[:] = jnp.stack(pt)


def _compress_kernel(consts_ref, pt_ref, s_ref):
    """Grid (N/BLK,).  point (4, L, BLK) -> canonical s (L, BLK)."""
    PM.bind_consts(consts_ref)
    s_ref[:] = PM.compress((pt_ref[0], pt_ref[1], pt_ref[2], pt_ref[3]))


_CODEC_BLK = 2048


def _codec_blk(n: int) -> int:
    """Largest codec block size that DIVIDES n (grid = n // blk must cover
    every point: a non-dividing blk silently leaves a tail unprocessed)."""
    blk = _CODEC_BLK
    while n % blk:
        blk //= 2
    assert blk >= 256, n
    return blk


@jax.jit
def decompress_lanes(s: jnp.ndarray):
    """(L, N) limb columns -> (valid (N,) bool, points (4, L, N)).  N must
    be a multiple of 256; caller pads (the all-zero encoding is valid)."""
    n = s.shape[-1]
    blk = _codec_blk(n)
    valid, pts = pl.pallas_call(
        _decompress_kernel,
        grid=(n // blk,),
        in_specs=[
            pl.BlockSpec((PM.NCONST, L, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, L, blk), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((4, L, n), jnp.int32),
        ],
        interpret=_INTERPRET,
    )(jnp.asarray(PM.CONSTS), s)
    return valid[0] != 0, pts


@jax.jit
def compress_lanes(pts: jnp.ndarray) -> jnp.ndarray:
    """(4, L, N) points -> (L, N) canonical s limb columns."""
    n = pts.shape[-1]
    blk = _codec_blk(n)
    return pl.pallas_call(
        _compress_kernel,
        grid=(n // blk,),
        in_specs=[
            pl.BlockSpec((PM.NCONST, L, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, L, blk), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.int32),
        interpret=_INTERPRET,
    )(jnp.asarray(PM.CONSTS), pts)


# --------------------------------------------------------------------------
# MSM driver
# --------------------------------------------------------------------------

def device_digits4(sbytes: jnp.ndarray) -> jnp.ndarray:
    """(N, 32) uint8 -> (W=64, N) int32 unsigned base-16 digits."""
    b = sbytes.astype(jnp.int32)
    d = jnp.stack([b & 15, b >> 4], axis=2).reshape(b.shape[0], 64)
    return d.T


@jax.jit
def to_signed_digits(d: jnp.ndarray) -> jnp.ndarray:
    """(W, N) unsigned base-16 digits -> signed encoding: mag in [0, 8]
    in the low nibble, bit 4 set when the point should be negated
    (digit value -mag).  Sequential carry from the low window; the carry
    out of window W-1 must be zero, which requires the scalar VALUE to be
    < 8 * 2^252 (top window + incoming carry <= 8).  Every caller
    satisfies this: canonical scalars are < l ~ 2^252.03 and lazy Barrett
    outputs are < ~5l (cross-checked against the host oracle up to 7l)."""
    def step(carry, row):
        v = row + carry
        neg = v > 8
        out = jnp.where(neg, (16 - v) + 16, v)
        return neg.astype(jnp.int32), out

    _, rows = jax.lax.scan(step, jnp.zeros(d.shape[1:], jnp.int32), d)
    return rows


@jax.jit
def to_niels_lanes(points: jnp.ndarray) -> jnp.ndarray:
    """(4, L, N) points with Z = 1 -> (3, L, N) Niels (Y+X, Y-X, 2dT)."""
    from . import vec_field as F
    from . import vec_curve as C
    X, Y, T = points[0], points[1], points[3]
    d2 = jnp.asarray(C.const("d2"))
    return jnp.stack([F.add(Y, X), F.sub(Y, X), F.mul(T, d2)])


@jax.jit
def normalize_z(points: jnp.ndarray) -> jnp.ndarray:
    """(4, L, N) arbitrary-Z points -> same points with Z = 1."""
    from . import vec_field as F
    X, Y, Z, T = points[0], points[1], points[2], points[3]
    zi = F.invert(Z)
    x = F.mul(X, zi)
    y = F.mul(Y, zi)
    one = jnp.broadcast_to(jnp.asarray(F.ONE), x.shape)
    return jnp.stack([x, y, one, F.mul(x, y)])


@functools.partial(jax.jit, static_argnums=(2, 3))
def _msm_pallas_niels(niels: jnp.ndarray, digits: jnp.ndarray,
                      blk: int, kchunk: int):
    """Niels-input MSM: niels (3, L, N) with identity rows (1, 1, 0) for
    padding; UNSIGNED digits (W, N).  Same phases 2/3 as _msm_pallas."""
    W, B = NUM_WINDOWS, 9
    n = niels.shape[-1]
    n_chunks = n // (kchunk * blk)
    consts = jnp.asarray(PM.CONSTS)

    pre = niels.reshape(3, L, n_chunks * kchunk, blk)
    digs = to_signed_digits(digits).reshape(W, n_chunks * kchunk, 1, blk)

    slabs = pl.pallas_call(
        _accum_kernel_niels,
        grid=(W, n_chunks),
        in_specs=[
            pl.BlockSpec((PM.NCONST, L, 1), lambda w, kc: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, L, kchunk, blk), lambda w, kc: (0, 0, kc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kchunk, 1, blk), lambda w, kc: (w, kc, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, 4, L, blk), lambda w, kc: (w, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, B, 4, L, blk), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, 4, L, blk), jnp.int32)],
        interpret=_INTERPRET,
    )(consts, pre, digs)

    sums = pl.pallas_call(
        _reduce_kernel,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((PM.NCONST, L, 1), lambda w: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 4, L, blk), lambda w: (w, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, L, 8), lambda w: (w, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, 4, L, 8), jnp.int32),
        interpret=_INTERPRET,
    )(consts, slabs)

    out, flag = pl.pallas_call(
        _horner_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((4, L, 8), jnp.int32),
                   jax.ShapeDtypeStruct((1, 8), jnp.int32)],
        interpret=_INTERPRET,
    )(consts, sums)
    return out[..., :1], flag[0, :1]


def _niels_pad(n_pad: int) -> jnp.ndarray:
    ident = jnp.zeros((3, L, n_pad), jnp.int32)
    return ident.at[0, 0].set(1).at[1, 0].set(1)


def msm_lanes_niels_flag(points: jnp.ndarray, digits: jnp.ndarray,
                         blk: Optional[int] = None):
    """MSM via the Niels mixed-add kernel.  points (4, L, N) MUST have
    Z = 1 (decompressed points and generator tensors do; use normalize_z
    otherwise); digits (W, N) unsigned device digits."""
    n = points.shape[-1]
    padded, blk, kchunk = _pick_shape(n, blk)
    niels = to_niels_lanes(points)
    if padded != n:
        niels = jnp.concatenate([niels, _niels_pad(padded - n)], axis=-1)
        digits = jnp.concatenate(
            [digits, jnp.zeros((NUM_WINDOWS, padded - n), jnp.int32)], axis=-1)
    return _msm_pallas_niels(niels, digits, blk, kchunk)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _msm_pallas(points: jnp.ndarray, digits: jnp.ndarray,
                blk: int, kchunk: int):
    """points (4, L, N), UNSIGNED digits (W, N), N = n_chunks * kchunk * blk
    -> (result (4, L, 1), is_identity (1,) int32).  Digits are re-encoded
    signed (9 buckets) before the bucket accumulation."""
    W, B = NUM_WINDOWS, 9
    n = points.shape[-1]
    n_chunks = n // (kchunk * blk)
    consts = jnp.asarray(PM.CONSTS)

    pts = points.reshape(4, L, n_chunks * kchunk, blk)
    digs = to_signed_digits(digits).reshape(W, n_chunks * kchunk, 1, blk)

    slabs = pl.pallas_call(
        _accum_kernel,
        grid=(W, n_chunks),
        in_specs=[
            pl.BlockSpec((PM.NCONST, L, 1), lambda w, kc: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, L, kchunk, blk), lambda w, kc: (0, 0, kc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kchunk, 1, blk), lambda w, kc: (w, kc, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, 4, L, blk), lambda w, kc: (w, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, B, 4, L, blk), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, 4, L, blk), jnp.int32)],
        interpret=_INTERPRET,
    )(consts, pts, digs)

    sums = pl.pallas_call(
        _reduce_kernel,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((PM.NCONST, L, 1), lambda w: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 4, L, blk), lambda w: (w, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, L, 8), lambda w: (w, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, 4, L, 8), jnp.int32),
        interpret=_INTERPRET,
    )(consts, slabs)

    out, flag = pl.pallas_call(
        _horner_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((4, L, 8), jnp.int32),
                   jax.ShapeDtypeStruct((1, 8), jnp.int32)],
        interpret=_INTERPRET,
    )(consts, sums)
    return out[..., :1], flag[0, :1]


def _pick_shape(n: int, blk: Optional[int] = None, kchunk: int = 8):
    blk = blk or 512
    quantum = blk * kchunk
    padded = max(quantum, -(-n // quantum) * quantum)
    return padded, blk, kchunk


def msm_lanes_flag(points: jnp.ndarray, scalars, blk: Optional[int] = None):
    """MSM over device points (4, L, N) -> (result (4, L, 1),
    is_identity (1,) device flag)."""
    from . import vec_msm
    from . import vec_curve as C

    n = points.shape[-1]
    sbytes = scalars if isinstance(scalars, np.ndarray) else \
        vec_msm.scalars_to_bytes(scalars)
    padded, blk, kchunk = _pick_shape(n, blk)
    if padded != n:
        points = jnp.concatenate([points, C.identity((), padded - n)], axis=-1)
        sbytes = np.concatenate([sbytes, np.zeros((padded - n, 33), np.uint8)],
                                axis=0)
    digits = device_digits4(jnp.asarray(np.ascontiguousarray(sbytes[:, :32])))
    return _msm_pallas(points, digits, blk, kchunk)


def msm_digits_flag(points: jnp.ndarray, digits: jnp.ndarray,
                    blk: Optional[int] = None) -> jnp.ndarray:
    """MSM over device points (4, L, N) with DEVICE digits (W=64, N) int32
    (e.g. vec_scalar.digits64 of device-resident scalars) -> is_identity
    flag (1,) device array.  No host-side scalar bytes involved."""
    from . import vec_curve as C

    n = points.shape[-1]
    padded, blk, kchunk = _pick_shape(n, blk)
    if padded != n:
        points = jnp.concatenate([points, C.identity((), padded - n)], axis=-1)
        digits = jnp.concatenate(
            [digits, jnp.zeros((NUM_WINDOWS, padded - n), jnp.int32)], axis=-1)
    return _msm_pallas(points, digits, blk, kchunk)[1]


def msm_lanes(points: jnp.ndarray, scalars, blk: Optional[int] = None) -> jnp.ndarray:
    """MSM over device points (4, L, N) with host scalars / (N, 33) bytes
    -> (4, L, 1) on device."""
    from . import vec_curve as C
    if points.shape[-1] == 0:
        return C.identity((), 1)
    return msm_lanes_flag(points, scalars, blk)[0]


def msm(scalars, points, blk: Optional[int] = None):
    """Host-facing MSM (signature order matches core.ristretto.multiscalar_mul)."""
    from . import vec_curve as C
    from ..core.ristretto import RistrettoPoint

    points = list(points)
    if not points:
        return RistrettoPoint.identity()
    dev = jnp.asarray(C.points_to_lanes(points))
    out = np.asarray(jax.device_get(msm_lanes(dev, list(scalars), blk)))
    return C.lanes_to_points(out)[0]
