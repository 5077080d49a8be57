"""Lane-major vector core (ops/vec_*) vs the host Python-int oracle.

Same oracle-differencing strategy as test_ops.py, applied to the
generation-2 layout (limbs on sublanes, batch on lanes).
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bulletproofs_tpu.ops import vec_field as F
from bulletproofs_tpu.ops import vec_curve as C
from bulletproofs_tpu.ops import vec_msm
from bulletproofs_tpu.ops import limbs
from bulletproofs_tpu.core.field import P, sqrt_ratio_m1 as h_sqrt
from bulletproofs_tpu.core.ristretto import (RISTRETTO_BASEPOINT,
                                             RistrettoPoint, multiscalar_mul)
from bulletproofs_tpu.core.scalar import Scalar, L as ELL

rr = random.Random(0xC0DE)
N = 32

A_INT = [rr.randrange(P) for _ in range(N)]
B_INT = [rr.randrange(P) for _ in range(N)]
A = jnp.asarray(C.field_to_lanes(A_INT))
B = jnp.asarray(C.field_to_lanes(B_INT))


def ints(x):
    return [v % P for v in limbs.limbs_to_ints(np.asarray(x).T)]


def rand_points(k, seed=7):
    r = random.Random(seed)
    return [RISTRETTO_BASEPOINT.scalar_mul(Scalar(r.randrange(1, ELL)))
            for _ in range(k)]


def test_field_arith_matches_host():
    assert ints(jax.jit(F.add)(A, B)) == [(x + y) % P for x, y in zip(A_INT, B_INT)]
    assert ints(jax.jit(F.sub)(A, B)) == [(x - y) % P for x, y in zip(A_INT, B_INT)]
    assert ints(jax.jit(F.mul)(A, B)) == [(x * y) % P for x, y in zip(A_INT, B_INT)]
    assert ints(jax.jit(F.neg)(A)) == [(-x) % P for x in A_INT]
    assert ints(jax.jit(F.invert)(A)) == [pow(x, P - 2, P) for x in A_INT]
    assert ints(jax.jit(F.canonicalize)(A)) == A_INT


def test_field_sqrt_ratio_matches_host():
    was, r = jax.jit(F.sqrt_ratio_m1)(A, B)
    for j in range(N):
        hw, hr = h_sqrt(A_INT[j], B_INT[j])
        assert bool(np.asarray(was)[j]) == hw
        assert ints(r)[j] == hr


def test_point_add_double_negate():
    pts = rand_points(N)
    qts = rand_points(N, seed=8)
    p = jnp.asarray(C.points_to_lanes(pts))
    q = jnp.asarray(C.points_to_lanes(qts))
    got = C.lanes_to_points(np.asarray(jax.jit(C.add)(p, q)))
    assert all(g == (a + b) for g, a, b in zip(got, pts, qts))
    got = C.lanes_to_points(np.asarray(jax.jit(C.double)(p)))
    assert all(g == a.double() for g, a in zip(got, pts))
    got = C.lanes_to_points(np.asarray(jax.jit(C.negate)(p)))
    assert all(g == (-a) for g, a in zip(got, pts))
    # complete formulas: identity + identity, P + (-P)
    ident = C.identity((), N)
    got = C.lanes_to_points(np.asarray(jax.jit(C.add)(ident, ident)))
    assert all(g.is_identity() for g in got)
    got = C.lanes_to_points(np.asarray(jax.jit(C.add)(p, jax.jit(C.negate)(p))))
    assert all(g.is_identity() for g in got)


def test_point_eq_and_identity():
    pts = rand_points(8)
    p = jnp.asarray(C.points_to_lanes(pts))
    p2 = jnp.asarray(C.points_to_lanes([RistrettoPoint(
        x.X * 3 % P, x.Y * 3 % P, x.Z * 3 % P, x.T * 3 % P) for x in pts]))
    assert np.asarray(jax.jit(C.eq)(p, p2)).all()   # projective equality
    assert not np.asarray(C._is_identity_jit(p)).any()


def test_compress_decompress_roundtrip():
    pts = rand_points(N) + [RistrettoPoint.identity()]
    p = jnp.asarray(C.points_to_lanes(pts))
    enc = C.compress_to_bytes(p)
    assert [bytes(e) for e in enc] == [q.compress() for q in pts]
    valid, dec = C.decompress_bytes(enc)
    assert valid.all()
    got = C.lanes_to_points(np.asarray(dec))
    assert all(g == q for g, q in zip(got, pts))
    # invalid encodings rejected
    bad = np.asarray(enc).copy()
    bad[0] = np.frombuffer(b"\xff" * 32, np.uint8)       # >= p, non-canonical
    valid, _ = C.decompress_bytes(bad)
    assert not valid[0] and valid[1:].all()


def test_elligator_matches_host():
    raw = np.asarray([bytearray(rr.randbytes(64)) for _ in range(N)], np.uint8)
    got = C.lanes_to_points(np.asarray(C.from_uniform_bytes(raw)))
    exp = [RistrettoPoint.from_uniform_bytes(raw[j].tobytes()) for j in range(N)]
    assert all(g == e for g, e in zip(got, exp))


def test_device_digits():
    scalars = [rr.randrange(ELL) for _ in range(17)]
    sb = vec_msm.scalars_to_bytes(scalars)
    d = np.asarray(jax.jit(vec_msm.device_digits)(jnp.asarray(sb)))
    for j, s in enumerate(scalars):
        rec = sum(int(d[w, j]) << (7 * w) for w in range(vec_msm.NUM_WINDOWS))
        assert rec == s


@pytest.mark.parametrize("n", [1, 2, 7, 64, 300])
def test_msm_matches_host(n):
    r = random.Random(n)
    pts = rand_points(n, seed=n)
    scalars = [Scalar(r.randrange(ELL)) for _ in range(n)]
    got = vec_msm.msm(scalars, pts)
    exp = multiscalar_mul(scalars, pts)
    assert got == exp


def test_msm_zero_scalars_and_identity_points():
    pts = rand_points(5) + [RistrettoPoint.identity()]
    scalars = [Scalar(0), Scalar(1), Scalar(2), Scalar(0), Scalar(5), Scalar(7)]
    got = vec_msm.msm(scalars, pts)
    exp = multiscalar_mul(scalars, pts)
    assert got == exp


def test_bytes_to_limbs_gather_schedule():
    """The 3-byte gather formulation of bytes_to_limbs must equal the
    direct bit-matrix definition (limb k = bits [13k, 13k+13) of the
    little-endian input) for random and boundary encodings."""
    from bulletproofs_tpu.ops import limbs as LB

    rng = random.Random(1337)
    rows = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(64)]
    rows += [b"\x00" * 32, b"\xff" * 32,
             (1).to_bytes(32, "little"), (2**255 - 19).to_bytes(32, "little")]
    data = np.frombuffer(b"".join(rows), np.uint8).reshape(len(rows), 32)

    bits = np.unpackbits(data, axis=1, bitorder="little")
    bits = np.concatenate(
        [bits, np.zeros((len(rows), LB.NLIMBS * LB.LIMB_BITS - 256),
                        np.uint8)], axis=1)
    weights = (1 << np.arange(LB.LIMB_BITS, dtype=np.int64))
    want = (bits.reshape(len(rows), LB.NLIMBS, LB.LIMB_BITS).astype(np.int64)
            @ weights).astype(np.int32)

    got = LB.bytes_to_limbs(data)
    assert got.dtype == np.int32
    assert np.array_equal(got, want)
