"""Device mod-l scalar layer vs Python ints (Barrett bounds included)."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from bulletproofs_tpu.ops import vec_scalar as S
from bulletproofs_tpu.ops import limbs
from bulletproofs_tpu.core.scalar import L as ELL

rr = random.Random(0xD00D)
N = 64

A_INT = [rr.randrange(1 << 256) for _ in range(N - 3)] + [0, 1, ELL - 1]
B_INT = [rr.randrange(1 << 256) for _ in range(N - 3)] + [ELL, 5 * ELL - 1, 2]
A = jnp.asarray(np.ascontiguousarray(limbs.ints_to_limbs(A_INT).T))
B = jnp.asarray(np.ascontiguousarray(limbs.ints_to_limbs(B_INT).T))


def ints(x):
    return limbs.limbs_to_ints(np.asarray(x).T)


def test_smul_matches_and_bounded():
    got = ints(jax.jit(S.smul)(A, B))
    for g, a, b in zip(got, A_INT, B_INT):
        assert g % ELL == (a * b) % ELL
        assert g < (1 << 255), "lazy Barrett output escaped its bound"


def test_smul_chain_stays_bounded():
    @jax.jit
    def chain(a, b):
        x = a
        for _ in range(5):
            x = S.smul(S.sadd(x, b), a)
        return x
    got = ints(chain(A, B))
    for g, a, b in zip(got, A_INT, B_INT):
        x = a
        for _ in range(5):
            x = (x + b) * a % ELL
        assert g % ELL == x and g < (1 << 256)


def test_sadd_sneg():
    got = ints(jax.jit(S.sadd)(A, B))
    for g, a, b in zip(got, A_INT, B_INT):
        assert g % ELL == (a + b) % ELL
    got = ints(jax.jit(S.sneg)(A))
    for g, a in zip(got, A_INT):
        assert g % ELL == (-a) % ELL


def test_digits64_reconstruct():
    d = np.asarray(jax.jit(S.digits64)(A))
    for j, a in enumerate(A_INT):
        rec = sum(int(d[w, j]) << (4 * w) for w in range(64))
        assert rec == a


def test_from_wide_bytes():
    raw = np.frombuffer(rr.randbytes(64 * 8), np.uint8).reshape(8, 64)
    got = ints(S.from_wide_bytes(jnp.asarray(raw)))
    for g, row in zip(got, raw):
        assert g % ELL == int.from_bytes(row.tobytes(), "little") % ELL


def test_from_wide_bytes_stays_below_digit_window():
    """Worst-case wide input: the raw lo + (hi * 2^256 mod l) sum can reach
    ~1.27 * 2^256, which would alias under the < 2^256 digit-extraction
    window; from_wide_bytes must renormalize into the lazy domain."""
    raw = np.full((4, 64), 0xFF, np.uint8)
    got = ints(S.from_wide_bytes(jnp.asarray(raw)))
    full = (1 << 512) - 1
    for g in got:
        assert g < 1 << 256
        assert g % ELL == full % ELL


def test_power_sequence_and_tree_sum():
    y = A[:, :4]
    seq = jax.jit(S.power_sequence, static_argnums=1)(y, 8)
    vals = np.asarray(seq)
    for j in range(4):
        for i in range(8):
            got = limbs.limbs_to_ints(vals[:, i, j][None, :].reshape(1, -1))[0]
            assert got % ELL == pow(A_INT[j], i, ELL)
    total = ints(jax.jit(S.tree_sum)(seq))
    for j in range(4):
        assert total[j] % ELL == sum(pow(A_INT[j], i, ELL) for i in range(8)) % ELL


def test_sinv_matches_oracle():
    import numpy as np
    from bulletproofs_tpu.core.scalar import Scalar, L as ELL
    from bulletproofs_tpu.ops import vec_scalar as VS
    rng = np.random.default_rng(11)
    vals = [int.from_bytes(rng.bytes(32), "little") % ELL for _ in range(4)]
    vals[0] = 1
    x = np.stack([VS.const(v)[:, 0] for v in vals], axis=1)
    inv = np.asarray(VS.canonical(VS.sinv(x)))
    for i, v in enumerate(vals):
        got = sum(int(inv[k, i]) << (13 * k) for k in range(VS.L))
        assert got == pow(v, ELL - 2, ELL)


def test_canonical_bytes32():
    import numpy as np
    from bulletproofs_tpu.core.scalar import L as ELL
    from bulletproofs_tpu.ops import vec_scalar as VS
    rng = np.random.default_rng(13)
    # lazy values up to ~5l: build as a + b*c with known ints
    raw = [int.from_bytes(rng.bytes(64), "little") for _ in range(3)]
    raw += [0, ELL - 1, ELL, 5 * ELL - 1]
    cols = []
    for v in raw:
        # spread into the lazy domain via from_wide_bytes
        cols.append(v % (1 << 512))
    wide = np.zeros((len(cols), 64), np.uint8)
    for i, v in enumerate(cols):
        wide[i] = np.frombuffer(v.to_bytes(64, "little"), np.uint8)
    x = VS.from_wide_bytes(wide)
    by = np.asarray(VS.canonical_bytes32(x))
    for i, v in enumerate(cols):
        assert int.from_bytes(by[i].tobytes(), "little") == v % ELL
