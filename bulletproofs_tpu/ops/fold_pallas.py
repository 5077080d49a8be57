"""Fused elementwise mod-l Pallas kernels for the batch prover's IPP folds.

round_fold's scalar math is minimal in op count (a/b fold = 2 smuls + add,
gw/hw update = 1 smul each) but as XLA each `smul` is a ~40-op limb chain
that round-trips every intermediate through HBM; at (L, n, P) =
(20, 64, 4096) that measures ~100 ms per round.  Fusing each compound op
into one VMEM-resident kernel removes the intermediate traffic.

Kernels take (L, N) lane-major limb tensors (the vec_scalar layout,
flattened) and reuse verify_pallas's in-kernel Barrett helpers.  Lazy
value domain matches vec_scalar: inputs < 2^256, outputs < ~10l < 2^256.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import NLIMBS
from .verify_pallas import (_SCONSTS, _mat, _smul, _sadd, _digits64, _KQ,
                            _renorm)

L = NLIMBS
BLKN = 512          # lane columns per grid cell

_INTERPRET = False


def usable(n_cols: int) -> bool:
    from ..config import settings
    if settings.no_fold_pallas:
        return False
    from .vec_msm import on_tpu
    return (on_tpu() or _INTERPRET) and n_cols % BLKN == 0


def _fold_kernel(sconsts_ref, x_ref, y_ref, u_ref, v_ref, out_ref):
    w = x_ref.shape[-1]
    mu = _mat(sconsts_ref[0], w)
    negl = _mat(sconsts_ref[1], w)
    out_ref[:] = _sadd(_smul(x_ref[:], u_ref[:], mu, negl),
                       _smul(y_ref[:], v_ref[:], mu, negl))


def _smul_kernel(sconsts_ref, x_ref, m_ref, out_ref):
    w = x_ref.shape[-1]
    mu = _mat(sconsts_ref[0], w)
    negl = _mat(sconsts_ref[1], w)
    out_ref[:] = _smul(x_ref[:], m_ref[:], mu, negl)


def _blk(n_cols: int) -> int:
    # widest tile that divides the column count: per-limb rows lower to
    # (1, blk) vectors, so width is what amortizes the sublane padding.
    # Capped at 2048: _digits64/_smul intermediates live entirely on the
    # scoped-VMEM stack, and at 8192-wide blocks they exceed the 16 MB
    # scoped limit (measured 18.75 MB for the digits kernel at (20, 8192)).
    for b in (2048, 1024, 512):
        if n_cols % b == 0:
            return b
    return n_cols


def _call(kernel, args):
    n_cols = args[0].shape[-1]
    blk = _blk(n_cols)
    T = n_cols // blk
    specs = [pl.BlockSpec((3, _KQ, 1), lambda t: (0, 0, 0),
                          memory_space=pltpu.VMEM)]
    specs += [pl.BlockSpec((L, blk), lambda t: (0, t),
                           memory_space=pltpu.VMEM)] * len(args)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=specs,
        out_specs=pl.BlockSpec((L, blk), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, n_cols), jnp.int32),
        interpret=_INTERPRET,
    )(jnp.asarray(_SCONSTS), *args)


@jax.jit
def fold_lanes(x: jnp.ndarray, y: jnp.ndarray,
               u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """u*x + v*y elementwise mod l over (L, N) limb tensors."""
    return _call(_fold_kernel, (x, y, u, v))


@jax.jit
def smul_lanes(x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """x*m elementwise mod l over (L, N) limb tensors."""
    return _call(_smul_kernel, (x, m))


def _signed_recode(rows):
    """(64, N) unsigned base-16 digit rows of a value < 8 * 2^252 ->
    signed encoding (mag | 16*neg, mag in [0, 8]); sequential carry over
    the static window axis (concat form, Mosaic-safe)."""
    out = []
    carry = jnp.zeros_like(rows[:1])
    for w in range(64):
        v = rows[w: w + 1] + carry
        neg = v > 8
        out.append(jnp.where(neg, 32 - v, v))
        carry = neg.astype(jnp.int32)
    return jnp.concatenate(out, axis=0)


def _digits_kernel(sconsts_ref, x_ref, out_ref):
    # renormalize to < ~5l < 8 * 2^252 first: the signed recode's carry out
    # of the top window must be zero, and inputs are lazy (< 2^256)
    w = x_ref.shape[-1]
    mu = _mat(sconsts_ref[0], w)
    negl = _mat(sconsts_ref[1], w)
    out_ref[:] = _signed_recode(_digits64(_renorm(x_ref[:], mu, negl)))


@jax.jit
def digits_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """(L, N) lazy limbs (< 2^260) -> (64, N) SIGNED 4-bit digit rows
    (mag | 16*neg, the ops/fixed_msm bucket encoding); fused Barrett
    renormalization + 19-step exact carry + 64 nibble extracts + signed
    recode, all in VMEM instead of ~150 HBM round-trips."""
    n_cols = x.shape[-1]
    blk = _blk(n_cols)
    T = n_cols // blk
    return pl.pallas_call(
        _digits_kernel,
        grid=(T,),
        in_specs=[pl.BlockSpec((3, _KQ, 1), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((L, blk), lambda t: (0, t),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, blk), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, n_cols), jnp.int32),
        interpret=_INTERPRET,
    )(jnp.asarray(_SCONSTS), x)
