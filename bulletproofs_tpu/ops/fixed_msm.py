"""Batched fixed-base MSM: many outputs over one shared base set.

This is the prover-side point engine (reference call sites: every
commitment and IPP L/R MSM in src/range_proof/party.rs,
src/range_proof/dealer.rs, src/inner_product_proof.rs).  The TPU-first
observation is that ALL prover point work is fixed-base: commitments use
the Pedersen/Bulletproof generators directly, and the IPP's L_k/R_k --
normally MSMs over *folded* per-proof generator vectors -- expand over the
ORIGINAL generators with challenge-product coefficients (the same identity
`verification_scalars` exploits, src/inner_product_proof.rs:198-253).  So
one engine serves the whole prover, and the bases are shared across every
proof in a batch and every protocol stage.

Shape of the computation: out[q] = sum_j coef[q, j] * Base_j for Q output
rows over NB bases.  Device algorithm:

* precompute tables T[j, w] = 2^(4w) * Base_j once per base set (W = 64
  doubling steps of the whole base row), batch-normalize Z -> 1 (one
  Fermat inversion chain over all NB*W points), and store in **Niels form**
  (Y+X, Y-X, 2d*T): the bucket accumulation then uses 7-mul mixed
  additions instead of 9-mul general ones, and no Horner doubling tail
  exists at all -- window weights live in the tables;
* the kernel streams the NB*W (table point, digit) pairs serially per
  output lane, accumulating a 9-bucket VMEM slab (SIGNED 4-bit digits,
  magnitude in [0, 8] plus a per-lane negation of the Niels point, dense
  one-hot mux as in ops/msm_pallas.py); outputs stay per-lane;
* a second kernel does the weighted bucket reduction (double suffix scan)
  per output lane.

Host fallback (CPU tests): the same coefficient matrices evaluated with
the host Pippenger oracle.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_math as PM
from . import vec_curve as C
from . import vec_field as F
from .limbs import NLIMBS

L = NLIMBS
WINDOW_BITS = 4
NUM_WINDOWS = 64
NUM_BUCKETS = 9                # signed digits: magnitude in [0, 8]

_INTERPRET = False

# read-side bucket mux as a select tree (see _fixed_accum_kernel);
# measured-gated -- flipped by benches/_kernel_tune.py style probes
_MUX_TREE = False


# --------------------------------------------------------------------------
# table precompute (XLA, one-time per base set)
# --------------------------------------------------------------------------

@jax.jit
def _make_tables(points: jnp.ndarray) -> jnp.ndarray:
    """(4, L, NB) bases -> (NB * W, 3, L, 1) Niels-form table stream,
    stream index s = j * W + w holding 2^(4w) * Base_j as
    (Y+X, Y-X, 2d*T) with Z normalized to 1."""
    nb = points.shape[-1]

    def dbl4(_, p):
        for _ in range(WINDOW_BITS):
            p = C.double(p)
        return p

    # all window multiples: rows[w] = 2^(4w) * bases  -- sequential doubling
    def step(p, _):
        return dbl4(None, p), p

    _, rows = jax.lax.scan(step, points, None, length=NUM_WINDOWS)
    # rows: (W, 4, L, NB) -> stream (NB * W): s = j * W + w
    pts = jnp.transpose(rows, (3, 0, 1, 2)).reshape(nb * NUM_WINDOWS, 4, L)
    pts = jnp.transpose(pts, (1, 2, 0))              # (4, L, NB*W)

    X, Y, Z, T = pts[0], pts[1], pts[2], pts[3]
    zinv = F.invert(Z)
    x = F.mul(X, zinv)
    y = F.mul(Y, zinv)
    t = F.mul(x, y)
    d2 = jnp.asarray(C.const("d2"))
    niels = jnp.stack([F.add(y, x), F.sub(y, x), F.mul(t, d2)])  # (3, L, S)
    return niels[..., None]                            # (3, L, S, 1)


class FixedBaseTables:
    """Device-resident window tables for a fixed base list."""

    def __init__(self, points_host: Sequence):
        self.num_bases = len(points_host)
        self.stream_len = self.num_bases * NUM_WINDOWS
        lanes = jnp.asarray(C.points_to_lanes(points_host))
        self.host_points = list(points_host)
        if _on_tpu():
            self.niels = jax.block_until_ready(_make_tables(lanes))
        else:
            self.niels = None

    def ensure_niels(self) -> jnp.ndarray:
        """Build the window tables on demand (CPU interpret-mode tests of
        the device path; on TPU they are built eagerly at init)."""
        if self.niels is None:
            lanes = jnp.asarray(C.points_to_lanes(self.host_points))
            self.niels = jax.block_until_ready(_make_tables(lanes))
        return self.niels

    def ensure_host_packed(self) -> bytes:
        """Extended-coordinate packed basis for the native row-MSM
        (built once; the off-TPU batch-prover stages reuse it)."""
        packed = getattr(self, "_host_packed", None)
        if packed is None:
            from ..core.ristretto import pack_points
            packed = self._host_packed = pack_points(self.host_points)
        return packed


class SubsetTables:
    """View over a FixedBaseTables restricted to a static base subset
    (e.g. the per-round active generators of the IPP: the L/R MSMs touch
    exactly half the G's and the complementary half of the H's, so compact
    streams halve the accumulation work)."""

    def __init__(self, full: FixedBaseTables, base_idx):
        import numpy as _np
        base_idx = _np.asarray(base_idx, _np.int32)
        self.num_bases = len(base_idx)
        self.stream_len = self.num_bases * NUM_WINDOWS
        self.host_points = [full.host_points[j] for j in base_idx]
        self._full = full
        self._sel = (base_idx[:, None] * NUM_WINDOWS
                     + _np.arange(NUM_WINDOWS)[None, :]).reshape(-1)
        if full.niels is not None:
            self.niels = full.niels[:, :, jnp.asarray(self._sel), :]
        else:
            self.niels = None

    def ensure_niels(self) -> jnp.ndarray:
        if self.niels is None:
            full = self._full.ensure_niels()
            self.niels = full[:, :, jnp.asarray(self._sel), :]
        return self.niels


class StreamSubsetTables:
    """View over ARBITRARY (base, window) stream rows (sel[i] = j * W + w)
    of a FixedBaseTables.  Lets coefficient structure shrink the stream:
    e.g. the range prover's A commitment has {0, +-1} coefficients on every
    G_i/H_i (reference party.rs:102-112), so only window 0 of those tables
    is ever touched -- 2N+64 stream rows instead of (2N+2)*64."""

    def __init__(self, full: FixedBaseTables, sel):
        import numpy as _np
        self._sel = _np.asarray(sel, _np.int32)
        self.stream_len = len(self._sel)
        self._full = full
        if full.niels is not None:
            self.niels = full.niels[:, :, jnp.asarray(self._sel), :]
        else:
            self.niels = None

    def ensure_niels(self) -> jnp.ndarray:
        if self.niels is None:
            full = self._full.ensure_niels()
            self.niels = full[:, :, jnp.asarray(self._sel), :]
        return self.niels


def _on_tpu() -> bool:
    try:
        dev = jax.config.jax_default_device or jax.devices()[0]
        return dev.platform == "tpu"
    except Exception:
        return False


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------

def _mixed_add(cur, pre):
    """cur (X, Y, Z, T) + precomputed (Y+X, Y-X, 2dT) with Z2 = 1."""
    X1, Y1, Z1, T1 = cur
    YpX, YmX, Td2 = pre
    A = PM.fmul(PM.fsub(Y1, X1), YmX)
    B = PM.fmul(PM.fadd(Y1, X1), YpX)
    Cv = PM.fmul(T1, Td2)
    Dv = PM.fmul_small(Z1, 2)
    E = PM.fsub(B, A)
    Fv = PM.fsub(Dv, Cv)
    G = PM.fadd(Dv, Cv)
    H = PM.fadd(B, A)
    return (PM.fmul(E, Fv), PM.fmul(G, H), PM.fmul(Fv, G), PM.fmul(E, H))


def _fixed_accum_kernel2(consts_ref, niels_ref, digs_ref, out_ref, slab):
    """2-way ILP variant of _fixed_accum_kernel: stream rows 2t and 2t+1
    accumulate into two SEPARATE bucket slabs (slab[0], slab[1]), giving
    the VPU two independent mixed-add dependency chains to interleave --
    the single-slab kernel is latency-bound on the serial
    read-bucket/add/write-bucket chain.  The two slabs merge with 9 full
    Edwards adds on the last chunk."""
    PM.bind_consts(consts_ref)
    ck = pl.program_id(1)
    n_ck = pl.num_programs(1)
    KCH = niels_ref.shape[2]
    qblk = slab.shape[-1]

    @pl.when(ck == 0)
    def _init():
        zero = jnp.zeros((L, qblk), jnp.int32)
        one = jnp.concatenate([jnp.ones((1, qblk), jnp.int32), zero[1:]], axis=0)
        ident = jnp.stack([zero, one, one, zero])
        for h in range(2):
            for b in range(NUM_BUCKETS):
                slab[h, b] = ident

    def one_lane(k, h):
        ypx = jnp.broadcast_to(niels_ref[0, :, k, :], (L, qblk))
        ymx = jnp.broadcast_to(niels_ref[1, :, k, :], (L, qblk))
        td2 = jnp.broadcast_to(niels_ref[2, :, k, :], (L, qblk))
        d = digs_ref[k]
        neg = d >= 16
        mag = d & 15
        pre = (jnp.where(neg, ymx, ypx), jnp.where(neg, ypx, ymx),
               jnp.where(neg, PM.fneg(td2), td2))
        masks = [mag == b for b in range(NUM_BUCKETS)]
        cur = [jnp.zeros((L, qblk), jnp.int32) for _ in range(4)]
        for b in range(NUM_BUCKETS):
            sb = slab[h, b]
            m = masks[b]
            for c in range(4):
                cur[c] = cur[c] + jnp.where(m, sb[c], 0)
        return pre, masks, tuple(cur)

    def step(t, _):
        k0 = 2 * t
        k1 = 2 * t + 1
        pre0, masks0, cur0 = one_lane(k0, 0)
        pre1, masks1, cur1 = one_lane(k1, 1)
        new0 = _mixed_add(cur0, pre0)
        new1 = _mixed_add(cur1, pre1)
        for b in range(NUM_BUCKETS):
            sb0 = slab[0, b]
            m0 = masks0[b]
            slab[0, b] = jnp.stack(
                [jnp.where(m0, new0[c], sb0[c]) for c in range(4)])
            sb1 = slab[1, b]
            m1 = masks1[b]
            slab[1, b] = jnp.stack(
                [jnp.where(m1, new1[c], sb1[c]) for c in range(4)])
        return 0

    jax.lax.fori_loop(0, KCH // 2, step, 0)

    @pl.when(ck == n_ck - 1)
    def _flush():
        for b in range(NUM_BUCKETS):
            a = tuple(slab[0, b, c] for c in range(4))
            bb = tuple(slab[1, b, c] for c in range(4))
            out_ref[0, b] = jnp.stack(PM.ed_add(a, bb))


def _fixed_accum_kernel(consts_ref, niels_ref, digs_ref, out_ref, slab):
    """Grid (n_qblk, n_chunks).  niels (3, L, KCH, 1) stream chunk (shared
    across lanes); digs (KCH, 1, QBLK) SIGNED-encoded (mag = d & 15 in
    [0, 8], bit 4 = negate the table point); slab scratch (B=9, 4, L, QBLK)
    persists across chunks; out (1, B, 4, L, QBLK) flushed on the last.
    Signed digits nearly halve the bucket-mux cost versus 16 unsigned
    buckets; negating a Niels point is a (Y+X, Y-X) swap plus one field
    negation of 2dT -- three per-lane selects."""
    PM.bind_consts(consts_ref)
    ck = pl.program_id(1)
    n_ck = pl.num_programs(1)
    KCH = niels_ref.shape[2]
    qblk = slab.shape[-1]

    @pl.when(ck == 0)
    def _init():
        zero = jnp.zeros((L, qblk), jnp.int32)
        one = jnp.concatenate([jnp.ones((1, qblk), jnp.int32), zero[1:]], axis=0)
        ident = jnp.stack([zero, one, one, zero])
        for b in range(NUM_BUCKETS):
            slab[b] = ident

    def step(k, _):
        # materialize the shared table point at full lane width once --
        # (L, 1) operands inside fmul lower to per-slice broadcasts that
        # Mosaic handles very slowly
        ypx = jnp.broadcast_to(niels_ref[0, :, k, :], (L, qblk))
        ymx = jnp.broadcast_to(niels_ref[1, :, k, :], (L, qblk))
        td2 = jnp.broadcast_to(niels_ref[2, :, k, :], (L, qblk))
        d = digs_ref[k]                                            # (1, QBLK)
        neg = d >= 16
        mag = d & 15
        pre = (jnp.where(neg, ymx, ypx), jnp.where(neg, ypx, ymx),
               jnp.where(neg, PM.fneg(td2), td2))
        masks = [mag == b for b in range(NUM_BUCKETS)]
        if _MUX_TREE:
            # read-side bucket select as a binary tree over mag's bits:
            # 8 selects/coord instead of the 9-where + 9-add one-hot sum
            # (~10% of per-step lane-ops; the write-back below must stay
            # one-hot -- only one bucket may change)
            b0 = (mag & 1) != 0
            b1 = (mag & 2) != 0
            b2 = (mag & 4) != 0
            b3 = mag >= 8
            t = [jnp.where(b0, slab[2 * i + 1], slab[2 * i])
                 for i in range(4)]
            u0 = jnp.where(b1, t[1], t[0])
            u1 = jnp.where(b1, t[3], t[2])
            v = jnp.where(b2, u1, u0)
            cur_arr = jnp.where(b3, slab[8], v)
            cur = [cur_arr[c] for c in range(4)]
        else:
            cur = [jnp.zeros((L, qblk), jnp.int32) for _ in range(4)]
            for b in range(NUM_BUCKETS):
                sb = slab[b]
                m = masks[b]
                for c in range(4):
                    cur[c] = cur[c] + jnp.where(m, sb[c], 0)
        new = _mixed_add(tuple(cur), pre)
        for b in range(NUM_BUCKETS):
            sb = slab[b]
            m = masks[b]
            slab[b] = jnp.stack([jnp.where(m, new[c], sb[c]) for c in range(4)])
        return 0

    jax.lax.fori_loop(0, KCH, step, 0)

    @pl.when(ck == n_ck - 1)
    def _flush():
        out_ref[0] = slab[:]


def _fixed_reduce_kernel(consts_ref, slab_ref, out_ref):
    """Grid (n_qblk,).  slab (1, B, 4, L, QBLK) -> out (1, 4, L, QBLK):
    per-lane weighted bucket sum via double suffix scan."""
    PM.bind_consts(consts_ref)
    B = slab_ref.shape[1]
    t = tuple(slab_ref[0, :, c] for c in range(4))     # (B, L, QBLK)

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


# 2-slab interleaved accumulation (_fixed_accum_kernel2): measured DEAD
# EVEN with the single-slab kernel (205 vs 205 M adds/s on v5e), i.e. the
# accumulation is VPU-throughput-bound, not latency-bound -- Mosaic already
# pipelines the serial bucket chain.  Kept for re-evaluation on other
# hardware; the next real lever is MXU int8 limb products (docs/kernels.md).
_ILP2 = False


@functools.partial(jax.jit, static_argnums=(3, 4))
def _fixed_msm(niels: jnp.ndarray, digits: jnp.ndarray, consts: jnp.ndarray,
               qblk: int, kchunk: int) -> jnp.ndarray:
    """niels (3, L, S, 1); digits (S, Q) -> (4, L, Q) output points."""
    S = niels.shape[2]
    Q = digits.shape[-1]
    B = NUM_BUCKETS
    n_qblk = Q // qblk
    n_chunks = S // kchunk
    digs = digits.reshape(S, 1, Q)

    ilp2 = _ILP2 and kchunk % 2 == 0 and not _INTERPRET
    slabs = pl.pallas_call(
        _fixed_accum_kernel2 if ilp2 else _fixed_accum_kernel,
        grid=(n_qblk, n_chunks),
        in_specs=[
            pl.BlockSpec((PM.NCONST, L, 1), lambda qb, ck: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, L, kchunk, 1), lambda qb, ck: (0, 0, ck, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kchunk, 1, qblk), lambda qb, ck: (ck, 0, qb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, 4, L, qblk), lambda qb, ck: (qb, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_qblk, B, 4, L, qblk), jnp.int32),
        scratch_shapes=[pltpu.VMEM(((2, B, 4, L, qblk) if ilp2
                                    else (B, 4, L, qblk)), jnp.int32)],
        interpret=_INTERPRET,
    )(consts, niels, digs)

    out = pl.pallas_call(
        _fixed_reduce_kernel,
        grid=(n_qblk,),
        in_specs=[
            pl.BlockSpec((PM.NCONST, L, 1), lambda qb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 4, L, qblk), lambda qb: (qb, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, L, qblk), lambda qb: (qb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_qblk, 4, L, qblk), jnp.int32),
        interpret=_INTERPRET,
    )(consts, slabs)
    return jnp.transpose(out, (1, 2, 0, 3)).reshape(4, L, Q)


def signed_digit_oracle(nibbles: np.ndarray) -> np.ndarray:
    """Host oracle for the signed recode: (..., W) unsigned base-16 digits
    -> signed encoding (mag | 16*neg, mag in [0, 8]).  Requires the scalar
    value < 8 * 2^252 so the carry out of the top window is zero."""
    out = np.zeros_like(nibbles)
    carry = np.zeros(nibbles.shape[:-1], nibbles.dtype)
    for w in range(nibbles.shape[-1]):
        v = nibbles[..., w] + carry
        neg = v > 8
        out[..., w] = np.where(neg, 32 - v, v)
        carry = neg.astype(nibbles.dtype)
    assert not carry.any(), "signed recode carried out of the top window"
    return out


def digits_from_bytes(coef_bytes: np.ndarray) -> np.ndarray:
    """(Q, NB, 32) uint8 scalar bytes (values < 8 * 2^252) -> (NB*W, Q)
    uint8 SIGNED 4-bit digit stream (host numpy; used by tests/fallbacks --
    the device path extracts digits on device, see _device_digit_stream)."""
    q, nb, _ = coef_bytes.shape
    lo = coef_bytes & 15
    hi = coef_bytes >> 4
    d = np.stack([lo, hi], axis=3).reshape(q, nb, 64)   # (Q, NB, W)
    d = signed_digit_oracle(d)
    return np.ascontiguousarray(d.reshape(q, nb * 64).T)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _device_digit_stream(coef_bytes: jnp.ndarray, pad_s: int, pad_q: int) -> jnp.ndarray:
    """(Q, NB, 32) uint8 on device (canonical scalars) -> (NB*64 + pad_s,
    Q + pad_q) int32 SIGNED digit stream (s = j * 64 + w); padding is
    digit 0 / ignored."""
    from .msm_pallas import to_signed_digits
    q, nb, _ = coef_bytes.shape
    b = coef_bytes.astype(jnp.int32)
    # (Q, NB, W) -> (W, Q*NB): the signed recode scans windows per scalar
    d = jnp.stack([b & 15, b >> 4], axis=3).reshape(q, nb, 64)
    d = to_signed_digits(jnp.transpose(d, (2, 0, 1)).reshape(64, q * nb))
    d = jnp.transpose(d.reshape(64, q, nb), (1, 2, 0)).reshape(q, nb * 64).T
    if pad_s:
        d = jnp.concatenate([d, jnp.zeros((pad_s, q), jnp.int32)], axis=0)
    if pad_q:
        d = jnp.concatenate([d, jnp.zeros((d.shape[0], pad_q), jnp.int32)],
                            axis=1)
    return d


def msm_rows(tables: FixedBaseTables, coef_bytes: np.ndarray,
             qblk: int = 512, kchunk: int = 16):
    """coef_bytes (Q, NB, 32) -> (4, L, Q) device points (Q padded up to a
    qblk multiple internally; caller slices)."""
    qn, nb, _ = coef_bytes.shape
    assert nb == tables.num_bases
    # Route by PLATFORM, not by table presence: ensure_niels may have built
    # device tables on CPU for an interpret-mode run, but msm_rows is the
    # host-oracle path and must stay native off-TPU.
    if not _on_tpu():
        return _host_msm_rows(tables, coef_bytes)
    s = nb * NUM_WINDOWS
    pad_s = (-s) % kchunk
    if qn < qblk:
        qblk = max(256, 1 << max(0, qn - 1).bit_length())
    pad_q = (-qn) % qblk
    digits = _device_digit_stream(
        jnp.asarray(np.ascontiguousarray(coef_bytes)), pad_s, pad_q)
    niels = tables.niels
    if pad_s:
        ident = jnp.zeros((3, niels.shape[1], pad_s, 1), jnp.int32)
        # Niels identity: (Y+X, Y-X, 2dT) = (1, 1, 0)
        ident = ident.at[0, 0].set(1).at[1, 0].set(1)
        niels = jnp.concatenate([niels, ident], axis=2)
    out = _fixed_msm(niels, digits, jnp.asarray(PM.CONSTS), qblk, kchunk)
    return out[..., :qn]


@jax.jit
def _msm_digits_xla(niels: jnp.ndarray, digits: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA twin of the Pallas bucket kernel: a lax.scan over the
    (table point, digit) stream with a one-hot 9-bucket mux, then the
    weighted double-suffix bucket reduction.  Used off-TPU so the fused
    prover program stays traceable on the CPU backend (interpret-mode
    Pallas would unroll its grid into tens of millions of traced ops);
    numerically identical to _fixed_msm by construction."""
    s, qn = digits.shape
    d2 = jnp.asarray(C.const("d2"))

    # stream-major tensors for the scan: (S, 3, L, 1) and (S, Q)
    stream = jnp.transpose(niels, (2, 0, 1, 3))

    def step(buckets, xs):
        pre, d = xs                                    # (3, L, 1), (Q,)
        neg = (d >= 16)[None, :]
        mag = d & 15
        ypx = jnp.broadcast_to(pre[0], (L, qn))
        ymx = jnp.broadcast_to(pre[1], (L, qn))
        td2 = jnp.broadcast_to(pre[2], (L, qn))
        pypx = jnp.where(neg, ymx, ypx)
        pymx = jnp.where(neg, ypx, ymx)
        ptd2 = jnp.where(neg, F.neg(td2), td2)
        masks = [(mag == b)[None, :] for b in range(NUM_BUCKETS)]
        cur = [jnp.zeros((L, qn), jnp.int32) for _ in range(4)]
        for b in range(NUM_BUCKETS):
            for c in range(4):
                cur[c] = cur[c] + jnp.where(masks[b], buckets[b, c], 0)
        X1, Y1, Z1, T1 = cur
        A = F.mul(F.sub(Y1, X1), pymx)
        B = F.mul(F.add(Y1, X1), pypx)
        Cv = F.mul(T1, ptd2)
        Dv = F.mul_small(Z1, 2)
        E = F.sub(B, A)
        Fv = F.sub(Dv, Cv)
        G = F.add(Dv, Cv)
        H = F.add(B, A)
        new = jnp.stack([F.mul(E, Fv), F.mul(G, H), F.mul(Fv, G),
                         F.mul(E, H)])
        nb = [jnp.where(masks[b][None], new, buckets[b])
              for b in range(NUM_BUCKETS)]
        return jnp.stack(nb), None

    buckets0 = jnp.broadcast_to(
        C.identity(n=qn)[None], (NUM_BUCKETS, 4, L, qn)).astype(jnp.int32)
    buckets, _ = jax.lax.scan(step, buckets0, (stream, digits))

    # weighted reduction sum_b b * bucket[b]: double suffix scan
    v = buckets                                        # (B, 4, L, Q)
    for _ in range(2):
        sh = 1
        while sh < NUM_BUCKETS:
            ident = jnp.broadcast_to(C.identity(n=qn)[None],
                                     (sh, 4, L, qn)).astype(jnp.int32)
            shifted = jnp.concatenate([v[sh:], ident], axis=0)
            v = C.add(v, shifted)
            sh *= 2
    return v[1]


def msm_digits_niels(niels: jnp.ndarray, digits: jnp.ndarray,
                     qblk: int = 512, kchunk: int = 16) -> jnp.ndarray:
    """Core of msm_digits over a raw (3, L, S, 1) Niels stream tensor --
    traceable inside an outer jit (the fused prover stages pass table
    tensors as arguments so one launch covers a whole protocol phase)."""
    s, qn = digits.shape
    assert s == niels.shape[2]
    if not _on_tpu():
        return _msm_digits_xla(niels, digits)
    pad_s = (-s) % kchunk
    if qn < qblk:
        qblk = max(256, 1 << max(0, qn - 1).bit_length())
    pad_q = (-qn) % qblk
    if pad_s or pad_q:
        digits = jnp.pad(digits, ((0, pad_s), (0, pad_q)))
    if pad_s:
        ident = jnp.zeros((3, niels.shape[1], pad_s, 1), jnp.int32)
        # Niels identity: (Y+X, Y-X, 2dT) = (1, 1, 0)
        ident = ident.at[0, 0].set(1).at[1, 0].set(1)
        niels = jnp.concatenate([niels, ident], axis=2)
    out = _fixed_msm(niels, digits, jnp.asarray(PM.CONSTS), qblk, kchunk)
    return out[..., :qn]


def msm_digits(tables: FixedBaseTables, digits: jnp.ndarray,
               qblk: int = 512, kchunk: int = 16) -> jnp.ndarray:
    """Device SIGNED digit stream (NB*64, Q) int32 (mag | 16*neg encoding,
    from prover_stages._coef_digits) -> (4, L, Q) points.  The digit stream
    never visits the host."""
    assert digits.shape[0] == tables.stream_len
    return msm_digits_niels(tables.ensure_niels(), digits, qblk, kchunk)


def _host_msm_points(tables: FixedBaseTables, coef_bytes: np.ndarray):
    """Host Pippenger per output row -> list of RistrettoPoint."""
    from ..core.ristretto import multiscalar_mul
    from ..core.scalar import Scalar

    rows = []
    for q in range(coef_bytes.shape[0]):
        scalars = [Scalar(int.from_bytes(coef_bytes[q, j].tobytes(), "little"))
                   for j in range(tables.num_bases)]
        rows.append(multiscalar_mul(scalars, tables.host_points))
    return rows


def _host_msm_rows(tables: FixedBaseTables, coef_bytes: np.ndarray):
    """CPU-test fallback: host Pippenger per output row."""
    return jnp.asarray(C.points_to_lanes(_host_msm_points(tables, coef_bytes)))


def msm_rows_compressed(tables: FixedBaseTables, coef_bytes: np.ndarray,
                        **kw) -> np.ndarray:
    """(Q, NB, 32) coefficient rows -> (Q, 32) compressed point bytes.

    Off-TPU this compresses with the native curve backend directly --
    routing through compress_to_bytes would JIT the device compression
    kernel on the CPU backend (~45 s cold) for no benefit."""
    consttime = kw.pop("consttime", False)
    if not _on_tpu():
        from ..core import ristretto as R
        if R._NATIVE is not None:
            # one C call for all rows over the shared packed basis, one for
            # the batch compression -- no per-row Python object churn.
            # consttime=True routes witness-bearing rows (V/A/S, T1/T2
            # coefficients) through the paired consttime Straus, matching
            # the reference's MultiscalarMul usage; the device path is
            # constant-access-pattern by construction, so the flag only
            # affects this host fallback.
            import ctypes as _ct
            q = coef_bytes.shape[0]
            out = _ct.create_string_buffer(128 * q)
            fn = (R._NATIVE.rist_msm_rows_ct if consttime
                  else R._NATIVE.rist_msm_rows)
            fn(q, tables.num_bases,
               np.ascontiguousarray(coef_bytes).tobytes(),
               tables.ensure_host_packed(), out)
            comp = _ct.create_string_buffer(32 * q)
            R._NATIVE.rist_batch_compress(q, out, comp)
            return np.frombuffer(comp.raw, np.uint8).reshape(q, 32).copy()
        rows = _host_msm_points(tables, coef_bytes)
        return np.frombuffer(b"".join(p.compress() for p in rows),
                             np.uint8).reshape(len(rows), 32)
    return C.compress_to_bytes(msm_rows(tables, coef_bytes, **kw))
