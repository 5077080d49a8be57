"""Cross-checks: native C++ curve backend (native/ristretto.cpp) vs the
pure-Python oracle in core/ristretto.py.

The native backend reduces scalars mod l at the boundary; results may
differ from the pure path by a 4-torsion component, which ristretto
encode/equality quotient out -- so comparisons go through compress().
"""

import secrets

import pytest

from bulletproofs_tpu.core import ristretto as R
from bulletproofs_tpu.core.ristretto import (RISTRETTO_BASEPOINT,
                                             RistrettoPoint, multiscalar_mul)
from bulletproofs_tpu.core.scalar import Scalar

pytestmark = pytest.mark.skipif(R._NATIVE is None,
                                reason="native curve backend not built")


def _pure(monkeypatch):
    monkeypatch.setattr(R, "_NATIVE", None)


def _rand_scalar():
    return Scalar(int.from_bytes(secrets.token_bytes(32), "little"))


def test_scalar_mul_matches_pure(monkeypatch):
    B = RISTRETTO_BASEPOINT
    ks = [_rand_scalar() for _ in range(4)]
    native = [B.scalar_mul(k).compress() for k in ks]
    _pure(monkeypatch)
    pure = [B.scalar_mul(k).compress() for k in ks]
    assert native == pure


def test_compress_decompress_matches_pure(monkeypatch):
    pts = [RISTRETTO_BASEPOINT.scalar_mul(_rand_scalar()) for _ in range(4)]
    native_enc = [p.compress() for p in pts]
    native_dec = [RistrettoPoint.decompress(e) for e in native_enc]
    _pure(monkeypatch)
    assert [p.compress() for p in pts] == native_enc
    for e, d in zip(native_enc, native_dec):
        assert RistrettoPoint.decompress(e) == d
    # invalid encodings rejected identically
    for bad in (b"\xff" * 32, (1).to_bytes(32, "little"), b"\x01" + b"\x00" * 31):
        r_pure = RistrettoPoint.decompress(bad)
        monkeypatch.undo()
        assert RistrettoPoint.decompress(bad) == r_pure


def test_from_uniform_matches_pure(monkeypatch):
    seeds = [secrets.token_bytes(64) for _ in range(4)]
    native = [RistrettoPoint.from_uniform_bytes(s).compress() for s in seeds]
    _pure(monkeypatch)
    assert [RistrettoPoint.from_uniform_bytes(s).compress() for s in seeds] == native


def test_msm_matches_pure(monkeypatch):
    B = RISTRETTO_BASEPOINT
    for n in (1, 2, 5, 33, 130):
        pts = [B.scalar_mul(Scalar(secrets.randbelow(1 << 64) | 1))
               for _ in range(n)]
        scs = [_rand_scalar() for _ in range(n)]
        native = multiscalar_mul(scs, pts).compress()
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(R, "_NATIVE", None)
            pure = multiscalar_mul(scs, pts).compress()
        assert native == pure, f"n={n}"


def test_msm_zero_and_identity_edge_cases():
    B = RISTRETTO_BASEPOINT
    assert multiscalar_mul([], []).is_identity()
    assert multiscalar_mul([Scalar(0)], [B]).is_identity()
    assert multiscalar_mul([Scalar(0), Scalar(0)], [B, B + B]).is_identity()
    got = multiscalar_mul([Scalar(1), Scalar(0), Scalar(2)],
                          [RistrettoPoint.identity(), B, B])
    assert got == B + B


def test_native_sum_and_fold():
    import ctypes
    B = RISTRETTO_BASEPOINT
    pts = [B.scalar_mul(Scalar(i + 1)) for i in range(5)]
    packed = b"".join(R._to_ext(p) for p in pts)
    out = ctypes.create_string_buffer(128)
    R._NATIVE.rist_sum(len(pts), packed, out)
    exp = pts[0]
    for p in pts[1:]:
        exp = exp + p
    assert R._from_ext(out.raw) == exp

    x = _rand_scalar()
    a_pts, b_pts = pts[:2], pts[2:4]
    outs = ctypes.create_string_buffer(256)
    R._NATIVE.rist_fold(2, b"".join(R._to_ext(p) for p in a_pts),
                        b"".join(R._to_ext(p) for p in b_pts),
                        x.v.to_bytes(32, "little"), outs)
    for i in range(2):
        got = R._from_ext(outs.raw[128 * i:128 * (i + 1)])
        assert got == a_pts[i] + b_pts[i].scalar_mul(x)


def test_ct_msm_matches_vartime():
    """Consttime Straus (rist_msm_ct) agrees with the vartime Pippenger on
    random inputs and the zero/l-1 edge scalars (reference consttime
    MultiscalarMul vs VartimeMultiscalarMul, curve25519-dalek)."""
    from bulletproofs_tpu.core.ristretto import multiscalar_mul_ct
    from bulletproofs_tpu.core.scalar import L
    for n in (1, 2, 5, 33, 129):
        pts = [RistrettoPoint.from_uniform_bytes(secrets.token_bytes(64))
               for _ in range(n)]
        scs = [_rand_scalar() for _ in range(n)]
        assert multiscalar_mul(scs, pts) == multiscalar_mul_ct(scs, pts)
    pts = [RistrettoPoint.from_uniform_bytes(secrets.token_bytes(64))
           for _ in range(4)]
    scs = [Scalar.zero(), Scalar(L - 1), Scalar.one(), Scalar.zero()]
    assert multiscalar_mul(scs, pts) == multiscalar_mul_ct(scs, pts)
    assert multiscalar_mul_ct([], []) == RistrettoPoint.identity()


def test_ct_msm_pure_fallback_matches(monkeypatch):
    from bulletproofs_tpu.core.ristretto import multiscalar_mul_ct
    pts = [RistrettoPoint.from_uniform_bytes(secrets.token_bytes(64))
           for _ in range(7)]
    scs = [_rand_scalar() for _ in range(7)]
    native = multiscalar_mul_ct(scs, pts)
    _pure(monkeypatch)
    assert multiscalar_mul_ct(scs, pts).compress() == native.compress()


def test_bit_commit_matches_oracle(monkeypatch):
    """A_j = blind*B~ + sum(bit ? G : -H) equals the equivalent MSM with
    scalars {v_i} and {v_i - 1} (reference party.rs:102-112), native and
    pure paths alike."""
    from bulletproofs_tpu.core.ristretto import bit_commit
    for n in (8, 64):
        Gs = [RistrettoPoint.from_uniform_bytes(secrets.token_bytes(64))
              for _ in range(n)]
        Hs = [RistrettoPoint.from_uniform_bytes(secrets.token_bytes(64))
              for _ in range(n)]
        Bb = RistrettoPoint.from_uniform_bytes(secrets.token_bytes(64))
        v = int.from_bytes(secrets.token_bytes(8), "little") & ((1 << n) - 1)
        blind = _rand_scalar()
        got = bit_commit(n, v, Gs, Hs, blind, Bb)
        bits = [(v >> i) & 1 for i in range(n)]
        want = multiscalar_mul([blind] + bits + [b - 1 for b in bits],
                               [Bb] + Gs + Hs)
        assert got == want
        # extreme values: all-zero and all-one bit patterns
        for vv in (0, (1 << n) - 1):
            assert (bit_commit(n, vv, Gs, Hs, blind, Bb).compress() ==
                    multiscalar_mul(
                        [blind] + [(vv >> i) & 1 for i in range(n)]
                        + [((vv >> i) & 1) - 1 for i in range(n)],
                        [Bb] + Gs + Hs).compress())


def test_msm_same_bucket_collisions(monkeypatch):
    """All-equal scalars force every paired stream add into the same
    bucket (the P8 pairing conflict path); duplicates and interleaved
    zeros exercise the compaction edge."""
    s = _rand_scalar()
    pts = [RistrettoPoint.from_uniform_bytes(secrets.token_bytes(64))
           for _ in range(33)]
    native = multiscalar_mul([s] * 33, pts)
    _pure(monkeypatch)
    assert multiscalar_mul([s] * 33, pts).compress() == native.compress()


def test_msm_duplicate_points_and_zero_scalars(monkeypatch):
    base = RistrettoPoint.from_uniform_bytes(secrets.token_bytes(64))
    pts = [base] * 16
    scs = [Scalar.zero() if i % 2 else Scalar(i + 1) for i in range(16)]
    native = multiscalar_mul(scs, pts)
    _pure(monkeypatch)
    assert multiscalar_mul(scs, pts).compress() == native.compress()
