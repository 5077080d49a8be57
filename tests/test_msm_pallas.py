"""Pallas Pippenger MSM (signed-digit buckets) vs the host oracle, in
interpret mode on CPU.  Real-hardware validation happens in bench.py and
the batch-verification drives."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bulletproofs_tpu.core.ristretto import RISTRETTO_BASEPOINT, multiscalar_mul
from bulletproofs_tpu.core.scalar import Scalar, L as ELL
from bulletproofs_tpu.ops import msm_pallas, vec_curve as C


def test_signed_digit_encoding_roundtrip():
    rng = random.Random(1)
    vals = [0, 1, ELL - 1, 8 << 252, (8 << 252) - 1] + \
        [rng.randrange(8 << 252) for _ in range(64)]
    vals = [v for v in vals if v < (8 << 252)]
    d = np.zeros((64, len(vals)), np.int32)
    for i, v in enumerate(vals):
        for w in range(64):
            d[w, i] = (v >> (4 * w)) & 15
    enc = np.asarray(jax.device_get(msm_pallas.to_signed_digits(jnp.asarray(d))))
    for i, v in enumerate(vals):
        acc = 0
        for w in range(64):
            mag = int(enc[w, i]) & 15
            assert 0 <= mag <= 8
            sign = -1 if enc[w, i] >= 16 else 1
            acc += sign * mag * (1 << (4 * w))
        assert acc == v, (i, v)


@pytest.mark.slow
def test_msm_pallas_interpret_matches_oracle():
    msm_pallas._INTERPRET = True
    try:
        rng = random.Random(2)
        n_real = 100
        pts = [RISTRETTO_BASEPOINT.scalar_mul(Scalar(rng.randrange(1, ELL)))
               for _ in range(n_real)]
        # mix canonical and lazy (< 7l) scalar values
        vals = [rng.randrange(ELL) + rng.randrange(7) * ELL
                for _ in range(n_real)]
        dev = jnp.asarray(C.points_to_lanes(pts))
        sb = np.zeros((n_real, 33), np.uint8)
        for i, v in enumerate(vals):
            sb[i] = np.frombuffer(v.to_bytes(33, "little"), np.uint8)
        out = np.asarray(jax.device_get(
            msm_pallas.msm_lanes(dev, sb, blk=32)))
        got = C.lanes_to_points(out)[0]
        exp = multiscalar_mul([Scalar(v % ELL) for v in vals], pts)
        assert got == exp
    finally:
        msm_pallas._INTERPRET = False


def test_niels_msm_matches_general(rng):
    """The Niels mixed-add MSM equals the general-add MSM on Z=1 inputs."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from bulletproofs_tpu.ops import msm_pallas as MP
    from bulletproofs_tpu.ops import vec_curve as C
    from bulletproofs_tpu.ops import vec_msm

    old = MP._INTERPRET
    MP._INTERPRET = True
    N = 8
    raw = np.frombuffer(rng.randbytes(64 * N), np.uint8).reshape(N, 64)
    pts = C.from_uniform_bytes(raw)          # Z = 1 by construction
    ints = [int.from_bytes(rng.randbytes(31), "little") for _ in range(N)]
    sbytes = vec_msm.scalars_to_bytes(ints)
    digits = MP.device_digits4(jnp.asarray(np.ascontiguousarray(sbytes[:, :32])))

    out1, flag1 = MP.msm_lanes_flag(pts, sbytes)
    # from_uniform_bytes sums two Elligator points, so Z != 1: normalize
    out2, flag2 = MP.msm_lanes_niels_flag(MP.normalize_z(pts), digits)
    p1 = C.lanes_to_points(np.asarray(jax.device_get(out1)))[0]
    p2 = C.lanes_to_points(np.asarray(jax.device_get(out2)))[0]
    assert p1 == p2
    assert bool(np.asarray(jax.device_get(flag1))[0]) == bool(
        np.asarray(jax.device_get(flag2))[0])
    MP._INTERPRET = old
