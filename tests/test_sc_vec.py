"""Native mod-l vector kernels (native/sc_vec.cpp) vs the Python oracle."""

import ctypes
import secrets

import pytest

from bulletproofs_tpu.core import ristretto as R
from bulletproofs_tpu.core.scalar import L, Scalar, batch_invert

pytestmark = pytest.mark.skipif(R._NATIVE is None,
                                reason="native backend not built")


def _pack(xs):
    return b"".join(x.to_bytes(32, "little") for x in xs)


def _unpack(buf, n):
    return [int.from_bytes(buf[32 * i:32 * (i + 1)], "little")
            for i in range(n)]


def _rand(n):
    return [int.from_bytes(secrets.token_bytes(32), "little") % L
            for _ in range(n)]


def test_vec_mul_add_scale_inner():
    n = 33
    a, b = _rand(n), _rand(n)
    out = ctypes.create_string_buffer(32 * n)
    R._NATIVE.sc_vec_mul(n, _pack(a), _pack(b), out)
    assert _unpack(out.raw, n) == [x * y % L for x, y in zip(a, b)]
    R._NATIVE.sc_vec_add(n, _pack(a), _pack(b), out)
    assert _unpack(out.raw, n) == [(x + y) % L for x, y in zip(a, b)]
    k = _rand(1)[0]
    R._NATIVE.sc_vec_scale(n, _pack(a), k.to_bytes(32, "little"), out)
    assert _unpack(out.raw, n) == [x * k % L for x in a]
    out32 = ctypes.create_string_buffer(32)
    R._NATIVE.sc_vec_inner(n, _pack(a), _pack(b), out32)
    assert _unpack(out32.raw, 1)[0] == sum(x * y for x, y in zip(a, b)) % L


def test_powers():
    x = _rand(1)[0]
    n = 17
    out = ctypes.create_string_buffer(32 * n)
    R._NATIVE.sc_powers(n, x.to_bytes(32, "little"), out)
    assert _unpack(out.raw, n) == [pow(x, i, L) for i in range(n)]


def test_batch_invert_matches_oracle():
    n = 9
    vals = _rand(n)
    buf = ctypes.create_string_buffer(_pack(vals), 32 * n)
    R._NATIVE.sc_vec_batch_invert(n, buf)
    got = _unpack(buf.raw, n)
    oracle = [Scalar(v) for v in vals]
    batch_invert(oracle)
    assert got == [s.v for s in oracle]
    assert all(v * g % L == 1 for v, g in zip(vals, got))


def test_ipp_round_and_fold_match_python():
    """One synthetic round vs hand-computed values."""
    n_full, n = 8, 4
    a, b = _rand(2 * n), _rand(2 * n)
    g, h = _rand(n_full), _rand(n_full)
    scL = ctypes.create_string_buffer(32 * (2 * n_full + 1))
    scR = ctypes.create_string_buffer(32 * (2 * n_full + 1))
    cL = ctypes.create_string_buffer(32)
    cR = ctypes.create_string_buffer(32)
    R._NATIVE.ipp_round_scalars(n_full, n, _pack(a), _pack(b), _pack(g),
                                _pack(h), scL, scR, cL, cR)
    assert _unpack(cL.raw, 1)[0] == sum(a[i] * b[n + i] for i in range(n)) % L
    assert _unpack(cR.raw, 1)[0] == sum(a[n + i] * b[i] for i in range(n)) % L
    gotL = _unpack(scL.raw, 2 * n_full)
    gotR = _unpack(scR.raw, 2 * n_full)
    for k in range(n_full):
        r = k % (2 * n)
        if r >= n:
            assert gotL[k] == a[r - n] * g[k] % L
            assert gotR[n_full + k] == b[r - n] * h[k] % L
            assert gotR[k] == 0 and gotL[n_full + k] == 0
        else:
            assert gotR[k] == a[n + r] * g[k] % L
            assert gotL[n_full + k] == b[n + r] * h[k] % L
            assert gotL[k] == 0 and gotR[n_full + k] == 0

    u, uinv = _rand(1)[0], None
    uinv = pow(u, L - 2, L)
    a_buf = ctypes.create_string_buffer(_pack(a), 32 * 2 * n)
    b_buf = ctypes.create_string_buffer(_pack(b), 32 * 2 * n)
    g_buf = ctypes.create_string_buffer(_pack(g), 32 * n_full)
    h_buf = ctypes.create_string_buffer(_pack(h), 32 * n_full)
    R._NATIVE.ipp_fold(n_full, n, a_buf, b_buf, g_buf, h_buf,
                       u.to_bytes(32, "little"), uinv.to_bytes(32, "little"))
    got_a = _unpack(a_buf.raw, n)
    got_b = _unpack(b_buf.raw, n)
    assert got_a == [(a[i] * u + uinv * a[n + i]) % L for i in range(n)]
    assert got_b == [(b[i] * uinv + u * b[n + i]) % L for i in range(n)]
    got_g = _unpack(g_buf.raw, n_full)
    got_h = _unpack(h_buf.raw, n_full)
    for k in range(n_full):
        if k % (2 * n) >= n:
            assert got_g[k] == g[k] * u % L and got_h[k] == h[k] * uinv % L
        else:
            assert got_g[k] == g[k] * uinv % L and got_h[k] == h[k] * u % L
