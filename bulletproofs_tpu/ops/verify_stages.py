"""Device-side scalar emit for fused batch verification.

The reference verifier computes, per proof, O(nm) scalars on the CPU — the
s-vector, the g/h generator streams, and the per-point coefficients of the
mega-MSM (src/range_proof/mod.rs:406-445, src/inner_product_proof.rs:198-253).
In the TPU build those loops are the host bottleneck (the transcript replay
itself is cheap), so they run on device instead, batched over all proofs in
lane-major limb form (ops/vec_scalar.py):

  host (C++, native/verify_prep.cpp rangeproof_verify_replay_batch_c):
      transcript replay -> challenges; one shared batch inversion; emits a
      COMPACT per-proof "challenge block" of lg+8 canonical scalars (the
      challenge-block upload is a large share of the H2D bytes that floor
      batched-verification latency through a device tunnel)
  device (this module):
      u_sq       squares, u_inv_sq from allinv via prefix/suffix products
      t-vector   t[i] = r * s[i] (the r-weighted s-vector) by log-doubling
      y^-i       powers by log-doubling
      g/h        streams, accumulated across proofs with a halving tree
      dyn        per-proof MSM coefficients [r, rx, rcx, rcxx, r*u_sq,
                 r*u_inv_sq, r*c*z^2*z^j] in dynamic-point lane order

Challenge-block layout (must match the C++ writer):
  [0..lg) u | lg+0 r | +1 x | +2 rc | +3 z | +4 y_inv | +5 -a | +6 -b
  | +7 allinv = prod(u)^-1

All values stay in the lazy domain (< ~5l after smul, < 2^256 at digit
extraction); zero-padded proof slots contribute exactly zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.scalar import L as ELL
from . import vec_scalar as S
from .limbs import NLIMBS

L = NLIMBS

@functools.lru_cache(maxsize=None)
def _pow2_rows(n: int) -> np.ndarray:
    """(n, L, 1) limb rows of 2^i mod l."""
    return np.stack([S.const(pow(2, i, ELL)) for i in range(n)])


def _doubling_powers(base: jnp.ndarray, lg: int, seed: jnp.ndarray) -> jnp.ndarray:
    """(lg doublings) -> (2^lg, L, P) rows [seed * base^i for i in 0..2^lg)."""
    rows = seed[None]
    cur = base
    for _ in range(lg):
        rows = jnp.concatenate([rows, S.smul(rows, cur)], axis=0)
        cur = S.smul(cur, cur)
    return rows


def _sum_over_proofs(v: jnp.ndarray) -> jnp.ndarray:
    """(nm, L, P) lazy values (< ~10l) -> (nm, L, 1) sums mod l (halving
    tree over the proof axis, renormalized every 4 levels)."""
    level = 0
    while v.shape[-1] > 1:
        if level == 4:
            v = S.sreduce(v)
            level = 0
        half = v.shape[-1] // 2
        lo = S.sadd(v[..., :half], v[..., half: 2 * half])
        v = lo if v.shape[-1] % 2 == 0 else \
            jnp.concatenate([lo, v[..., 2 * half:]], axis=-1)
        level += 1
    return S.sreduce(v)


@functools.partial(jax.jit, static_argnums=(0, 1))
def fused_tail_tpu(n: int, m: int, blk_bytes: jnp.ndarray,
                   pair_bytes: jnp.ndarray, static_pts: jnp.ndarray,
                   dyn_pts: jnp.ndarray) -> jnp.ndarray:
    """TPU tail as ONE program (eager ops through the tunnel cost ~ms each):
    scalar emit -> digit extraction -> concat/pad -> fused Pallas mega-MSM
    -> is_identity flag (1,)."""
    from . import msm_pallas
    from . import vec_curve as VC

    dyn_sc, static_sc = emit_scalars(n, m, blk_bytes, pair_bytes)
    all_pts = jnp.concatenate([static_pts, dyn_pts], axis=-1)
    digits = S.digits64(jnp.concatenate([static_sc, dyn_sc], axis=-1))
    total = all_pts.shape[-1]
    padded, blk, kchunk = msm_pallas._pick_shape(total)
    if padded != total:
        all_pts = jnp.concatenate(
            [all_pts, VC.identity((), padded - total)], axis=-1)
        digits = jnp.concatenate(
            [digits, jnp.zeros((digits.shape[0], padded - total), jnp.int32)],
            axis=-1)
    return msm_pallas._msm_pallas(all_pts, digits, blk, kchunk)[1]


@functools.partial(jax.jit, static_argnums=(0, 1))
def emit_scalars(n: int, m: int, blk_bytes: jnp.ndarray,
                 pair_bytes: jnp.ndarray):
    """Device scalar emit for P (padded) proofs.

    blk_bytes:  (P * (lg+8), 32) uint8 challenge blocks, proof-major
    pair_bytes: (2, 32) uint8 host-accumulated [B_blinding, B] scalars
    returns (dyn (L, P * n_dyn) lane-ordered to match the dynamic-point
    stream [A,S,T1,T2,L..,R..,V..] per proof, static (L, 2 + 2nm) ordered
    [B_blinding, B, G.., H..]).
    """
    nm = n * m
    lg = nm.bit_length() - 1
    nblk = lg + 8
    P = blk_bytes.shape[0] // nblk

    blk = S.from_bytes32(blk_bytes).reshape(L, P, nblk)
    u = jnp.transpose(blk[:, :, :lg], (2, 0, 1))           # (lg, L, P)
    r, x, rc, z = (blk[:, :, lg + k] for k in range(4))
    y_inv, neg_a, neg_b = (blk[:, :, lg + 4 + k] for k in range(3))
    allinv = blk[:, :, lg + 7]

    # derive the full challenge set from the compact block (the C++ side
    # used to upload these; 448 B/proof instead of 672 B at nm = 64)
    u_sq = S.smul(u, u)                                    # (lg, L, P)
    ones = _ones_like(allinv)
    pres = [ones]                                          # prod u[<k]
    for k in range(1, lg):
        pres.append(S.smul(pres[-1], u[k - 1]))
    sufs = [None] * lg + [ones]                            # prod u[>k]
    for k in range(lg - 1, -1, -1):
        sufs[k] = S.smul(sufs[k + 1], u[k])
    uinv = jnp.stack([S.smul(S.smul(allinv, pres[k]), sufs[k + 1])
                      for k in range(lg)])
    u_inv_sq = S.smul(uinv, uinv)
    prod = S.smul(pres[lg - 1], u[lg - 1])                 # prod(u)
    t0 = S.smul(r, allinv)
    t0r = S.smul(r, prod)

    rx = S.smul(r, x)
    rcx = S.smul(rc, x)
    rcxx = S.smul(rcx, x)
    rz = S.smul(r, z)
    rzz = S.smul(rz, z)
    rczz = S.smul(S.smul(rc, z), z)
    neg_rz = S.sneg(rz)

    # dynamic-point coefficients, proof-major lane order
    dyn_rows = [r, rx, rcx, rcxx]
    ru_sq = S.smul(u_sq, r)
    ru_inv_sq = S.smul(u_inv_sq, r)
    zp = jnp.broadcast_to(jnp.asarray(S.ONE), z.shape)
    v_rows = []
    for _ in range(m):
        v_rows.append(S.smul(rczz, zp))
        zp = S.smul(zp, z)
    dyn = jnp.concatenate([jnp.stack(dyn_rows), ru_sq, ru_inv_sq,
                           jnp.stack(v_rows)])              # (n_dyn, L, P)
    dyn = jnp.transpose(dyn, (1, 2, 0)).reshape(L, -1)      # (L, P * n_dyn)

    # weighted s-vector t[i] = r * s[i] and y^-i powers by log-doubling
    t = _doubling_powers_from_usq(u_sq, lg, t0)             # (nm, L, P)
    ypow = _doubling_powers(y_inv, lg, _ones_like(y_inv))   # (nm, L, P)

    # g[i] = -rz - a * t[i]
    g = S.sadd(neg_rz, S.smul(neg_a, t))

    # h[i] = rz + y^-i * (rzz * 2^(i%n) * z^(i/n) - b * t[nm-1-i])
    zp = jnp.broadcast_to(jnp.asarray(S.ONE), z.shape)
    zj_rows = []
    for _ in range(m):
        zj_rows.append(S.smul(rzz, zp))
        zp = S.smul(zp, z)
    rzz_zj = jnp.repeat(jnp.stack(zj_rows), n, axis=0)      # (nm, L, P)
    pow2 = jnp.asarray(np.tile(_pow2_rows(n), (m, 1, 1)))   # (nm, L, 1)
    term1 = S.smul(rzz_zj, pow2)
    # reversed s-vector by its own doubling: the bits of nm-1-i complement
    # those of i, so r*s[nm-1-i] doubles up over u_inv_sq from r*prod(u)
    t_rev = _doubling_powers_from_usq(u_inv_sq, lg, t0r)
    term2 = S.smul(neg_b, t_rev)
    h = S.sadd(rz, S.smul(ypow, S.sadd(term1, term2)))

    g_acc = _sum_over_proofs(g)[:, :, 0].T                  # (L, nm)
    h_acc = _sum_over_proofs(h)[:, :, 0].T
    pair = S.from_bytes32(pair_bytes)                       # (L, 2)
    static = jnp.concatenate([pair, g_acc, h_acc], axis=1)  # (L, 2 + 2nm)
    return dyn, static


def _ones_like(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(S.ONE), a.shape)


def _doubling_powers_from_usq(u_sq: jnp.ndarray, lg: int,
                              seed: jnp.ndarray) -> jnp.ndarray:
    """s-vector by the inductive bit-decomposition (reference
    src/inner_product_proof.rs:241-250): rows[i] = seed * prod_{bit j of i}
    u_sq[lg-1-j], built in lg doubling steps."""
    rows = seed[None]
    for j in range(lg):
        rows = jnp.concatenate([rows, S.smul(rows, u_sq[lg - 1 - j])], axis=0)
    return rows
