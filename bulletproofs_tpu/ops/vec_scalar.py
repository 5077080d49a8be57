"""Lane-major batched arithmetic mod l = 2^252 + 27742... (the ristretto
scalar field), for the device-resident prover stages.

Same packing as ops/vec_field.py: 20 x 13-bit limbs on the sublane axis,
batch on lanes.  Unlike GF(2^255-19), l is not pseudo-Mersenne, so
multiplication reduces with **Barrett** (base b = 2^13, k = 20 limbs,
mu = floor(b^40 / l)); the conditional subtraction is folded into an
all-additive form r = (x_low + q3 * (b^21 - l)) mod b^21 so everything
stays parallel carry-save (no borrow chains).

Value domain (lazy): inputs < 2^256; smul outputs < ~5l < 2^255; sums of
two outputs < 2^256.  Proof-facing canonical reduction happens on host.
Digit extraction (for the fixed-base MSM) runs an exact sequential carry
first; its inputs must be < 2^256.

Cross-checked against Python ints in tests/test_vec_scalar.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import NLIMBS, LIMB_BITS, LIMB_MASK
from ..core.scalar import L as ELL

L = NLIMBS
MASK = LIMB_MASK
B_POW = 1 << LIMB_BITS

_K = 20                       # l < b^20
_MU_LIMBS = 21                # mu = floor(b^40 / l) < b^21
_NEGL_LIMBS = 21              # b^21 - l


def _to_limbs(v: int, n: int) -> np.ndarray:
    out = np.zeros(n, np.int64)
    for k in range(n):
        out[k] = v & MASK
        v >>= LIMB_BITS
    assert v == 0
    return out


_MU = _to_limbs((1 << (LIMB_BITS * 2 * _K)) // ELL, _MU_LIMBS).astype(np.int32)
_NEGL = _to_limbs((1 << (LIMB_BITS * (_K + 1))) - ELL, _NEGL_LIMBS).astype(np.int32)
_R256 = _to_limbs((1 << 256) % ELL, L).astype(np.int32)

ZERO = np.zeros((L, 1), np.int32)
ONE = np.zeros((L, 1), np.int32)
ONE[0, 0] = 1


def const(v: int) -> np.ndarray:
    return _to_limbs(v % ELL, L).astype(np.int32)[:, None]


def _carry(c: jnp.ndarray, n: int) -> jnp.ndarray:
    """One parallel carry round over n limbs, discarding carry out of the
    top limb (callers guarantee the value fits)."""
    cr = c >> LIMB_BITS
    lo = c & MASK
    inc = jnp.concatenate([jnp.zeros_like(cr[..., :1, :]), cr[..., :n - 1, :]],
                          axis=-2)
    return lo + inc


def _mul_acc(a: jnp.ndarray, b: jnp.ndarray, na: int, nb: int,
             out_limbs: int) -> jnp.ndarray:
    """Plain schoolbook a (na limbs) x b (nb limbs), truncated to out_limbs
    (values may exceed, truncation is mod b^out_limbs by construction of the
    callers).  Product terms must fit int32: na, nb limbs <= ~2^13.2."""
    lanes = jnp.broadcast_shapes(a.shape[-1:], b.shape[-1:])
    lead = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    c = jnp.zeros(lead + (out_limbs,) + lanes, jnp.int32)
    for i in range(na):
        hi = min(nb, out_limbs - i)
        if hi <= 0:
            break
        c = c.at[..., i: i + hi, :].add(a[..., i: i + 1, :] * b[..., :hi, :])
    return c


def sadd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _carry(a + b, L)


def _barrett(x: jnp.ndarray) -> jnp.ndarray:
    """Reduce a 40-limb carry-save value x < b^40 to < ~5l (20 limbs)."""
    # q1 = x >> b^(k-1)  (21 limbs)
    q1 = x[..., _K - 1:, :]
    # q2 = q1 * mu; q3 = q2 >> b^(k+1)  (21 limbs)
    mu = jnp.asarray(_MU)[:, None]
    q2 = _mul_acc(q1, mu, _MU_LIMBS, _MU_LIMBS, 2 * _MU_LIMBS)
    q2 = _carry(_carry(_carry(q2, 2 * _MU_LIMBS), 2 * _MU_LIMBS), 2 * _MU_LIMBS)
    q3 = q2[..., _K + 1:, :]                     # 21 limbs
    # r = (x_low + q3 * (b^21 - l)) mod b^21;  r = x - q3*l < ~5l < b^21
    negl = jnp.asarray(_NEGL)[:, None]
    r = _mul_acc(q3, negl, _MU_LIMBS, _NEGL_LIMBS, _K + 1)
    r = r + x[..., : _K + 1, :]
    r = _carry(_carry(_carry(r, _K + 1), _K + 1), _K + 1)
    # value < 2^255 with nonnegative limbs -> limb 20 is zero
    return r[..., :L, :]


def smul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a * b mod l (lazy: output < ~5l).  Inputs < 2^256, loose limbs."""
    # wide product, 40 limbs (< 2^512 < b^40)
    x = _mul_acc(a, b, L, L, 2 * L)
    return _barrett(_carry(_carry(_carry(x, 2 * L), 2 * L), 2 * L))


def sreduce(c: jnp.ndarray) -> jnp.ndarray:
    """Normalize an accumulated value (< 2^259-ish, e.g. a tree_sum of lazy
    products) back to < ~5l so it fits the digit window (< 16l = 2^256)."""
    pad = jnp.zeros(c.shape[:-2] + (L,) + c.shape[-1:], jnp.int32)
    return _barrett(jnp.concatenate([_carry(c, L), pad], axis=-2))


_MINUS_ONE = _to_limbs(ELL - 1, L).astype(np.int32)


def sneg(a: jnp.ndarray) -> jnp.ndarray:
    """(-a) mod l via one Barrett mul by l - 1 (variable negation is rare in
    the prover stages; constant negations fold into the constants)."""
    return smul(a, jnp.asarray(_MINUS_ONE)[:, None])


def sneg_const(v: int) -> np.ndarray:
    """host-side: (-v) mod l as limb column."""
    return const((-v) % ELL)


def exact_limbs(c: jnp.ndarray) -> jnp.ndarray:
    """Sequential carry: exact 13-bit limbs (inputs < 2^260, nonneg)."""
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


# static nibble-extraction schedule: nibble w covers bits [4w, 4w+4)
_NIB_LIMB = np.array([(4 * w) // LIMB_BITS for w in range(64)], np.int32)
_NIB_OFF = np.array([(4 * w) % LIMB_BITS for w in range(64)], np.int32)


def digits64(c: jnp.ndarray) -> jnp.ndarray:
    """(..., L, N) exact limbs (< 2^256) -> (..., 64, N) int32 4-bit digits."""
    c = exact_limbs(c)
    padded = jnp.concatenate([c, jnp.zeros_like(c[..., :1, :])], axis=-2)
    lo = padded[..., _NIB_LIMB, :]
    hi = padded[..., _NIB_LIMB + 1, :]
    off = jnp.asarray(_NIB_OFF)[:, None]
    return ((lo >> off) | (hi << (LIMB_BITS - off))) & 15


# static byte-extraction schedule: byte i covers bits [8i, 8i+8); an 8-bit
# window starting at offset <= 12 inside a 13-bit limb spans at most 2 limbs
_BYTE_LIMB = np.array([(8 * i) // LIMB_BITS for i in range(33)], np.int32)
_BYTE_OFF = np.array([(8 * i) % LIMB_BITS for i in range(33)], np.int32)


def limbs_to_bytes33(c: jnp.ndarray) -> jnp.ndarray:
    """(L, N) limbs (value < 2^256) -> (N, 33) uint8 little-endian (pad
    byte 0), the wire form consumed by the XLA MSM's digit extraction."""
    c = exact_limbs(c)
    padded = jnp.concatenate([c, jnp.zeros_like(c[:2])], axis=0)
    lo = padded[_BYTE_LIMB, :]
    hi = padded[_BYTE_LIMB + 1, :]
    off = jnp.asarray(_BYTE_OFF)[:, None]
    b = ((lo >> off) | (hi << (LIMB_BITS - off))) & 255
    return b.T.astype(jnp.uint8)


def from_bytes32(raw: jnp.ndarray) -> jnp.ndarray:
    """(N, 32) uint8 -> (L, N) limbs (value < 2^256, loose top limb)."""
    from .vec_curve import device_limbs_from_bytes
    return device_limbs_from_bytes(raw)


def from_wide_bytes(raw: jnp.ndarray) -> jnp.ndarray:
    """(N, 64) uint8 -> (L, N) mod-l value (lo + 2^256 * hi mod l),
    renormalized to the lazy domain (< ~5l): the raw sum lo + 5l can reach
    ~1.27 * 2^256, which would alias under the < 2^256 digit-extraction
    window."""
    lo = from_bytes32(raw[:, :32])
    hi = from_bytes32(raw[:, 32:])
    r256 = jnp.asarray(_R256)[:, None]
    return sreduce(sadd(smul(hi, r256), lo))


# exponent bits of l - 2, MSB first, for the Fermat inversion ladder
_INV_BITS = np.array([(ELL - 2) >> i & 1
                      for i in range((ELL - 2).bit_length() - 1, -1, -1)],
                     np.int32)


@jax.jit
def sinv(x: jnp.ndarray) -> jnp.ndarray:
    """x^(l-2) mod l: per-lane Fermat inversion (x (L, P) lazy < 2^256 ->
    lazy < ~5l).  The reference computes per-round IPP challenge inverses
    on the CPU (src/inner_product_proof.rs:120); on device this keeps the
    whole prover round loop inside one program.  A binary ladder over the
    253 static exponent bits as a scan: ~500 smuls, lane-parallel."""
    one = jnp.broadcast_to(jnp.asarray(ONE), x.shape)

    def step(acc, bit):
        sq = smul(acc, acc)
        return jnp.where(bit != 0, smul(sq, x), sq), None

    acc, _ = jax.lax.scan(step, one, jnp.asarray(_INV_BITS))
    return acc


_NEGL_260 = _to_limbs((1 << (LIMB_BITS * L)) - ELL, L + 1).astype(np.int32)


def _exact_limbs_n(c: jnp.ndarray, n: int) -> jnp.ndarray:
    """Sequential carry over n limb rows (inputs nonneg, fit in n limbs)."""
    for k in range(n - 1):
        cr = c[..., k: k + 1, :] >> LIMB_BITS
        parts = []
        if k > 0:
            parts.append(c[..., :k, :])
        parts.append(c[..., k: k + 1, :] & MASK)
        parts.append(c[..., k + 1: k + 2, :] + cr)
        if k + 2 < n:
            parts.append(c[..., k + 2:, :])
        c = jnp.concatenate(parts, axis=-2)
    return c


def canonical(x: jnp.ndarray) -> jnp.ndarray:
    """(L, P) lazy value -> exact canonical limbs of x mod l (< l).

    sreduce leaves a value < ~5l; up to four exact conditional
    subtractions of l finish the job (r - l computed as
    r + (b^20 - l) - b^20 with the borrow read off limb 20)."""
    r = exact_limbs(sreduce(x))
    negl = jnp.asarray(_NEGL_260)[:, None]
    zero_top = jnp.zeros_like(r[..., :1, :])
    for _ in range(4):
        s = _exact_limbs_n(jnp.concatenate([r, zero_top], axis=-2) + negl,
                           L + 1)
        ge = s[..., L:, :] >= 1                    # r >= l
        r = jnp.where(ge, s[..., :L, :], r)
    return r


def canonical_bytes32(x: jnp.ndarray) -> jnp.ndarray:
    """(L, P) lazy value -> (P, 32) canonical little-endian scalar bytes
    (the proof/transcript wire form; host twin: rp_reduce_wide + emit32)."""
    c = canonical(x)
    padded = jnp.concatenate([c, jnp.zeros_like(c[:2])], axis=0)
    lo = padded[_BYTE_LIMB[:32], :]
    hi = padded[_BYTE_LIMB[:32] + 1, :]
    off = jnp.asarray(_BYTE_OFF[:32])[:, None]
    b = ((lo >> off) | (hi << (LIMB_BITS - off))) & 255
    return b.T.astype(jnp.uint8)


def power_sequence(y: jnp.ndarray, n: int) -> jnp.ndarray:
    """y (L, P) -> (L, n, P): [1, y, y^2, .., y^(n-1)] (sequential scan)."""
    one = jnp.broadcast_to(jnp.asarray(ONE), y.shape)

    def step(acc, _):
        return smul(acc, y), acc

    _, seq = jax.lax.scan(step, one, None, length=n)   # (n, L, P)
    return jnp.transpose(seq, (1, 0, 2))


def tree_sum(v: jnp.ndarray) -> jnp.ndarray:
    """(L, n, P) mod-l values -> (L, P) sum over the middle axis by halving
    (each level re-flattens to lane-major so the carry sees limbs at -2).
    Inputs < ~8l; levels whose partial sums would cross the 2^260 carry
    ceiling are Barrett-normalized mid-tree."""
    n, p = v.shape[-2], v.shape[-1]
    level = 0
    while n > 1:
        if level == 4:       # partial sums < 2^4 * 8l = 2^259; renormalize
            v = sreduce(v.reshape(L, n * p)).reshape(L, n, p)
            level = 0
        half = n // 2
        lo = sadd(v[:, :half].reshape(L, half * p),
                  v[:, half: 2 * half].reshape(L, half * p)).reshape(L, half, p)
        v = lo if n % 2 == 0 else jnp.concatenate([lo, v[:, 2 * half:]], axis=1)
        n = (n + 1) // 2
        level += 1
    return sreduce(v[:, 0])
