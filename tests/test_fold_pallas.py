"""Interpret-mode checks of the fused fold kernels (ops/fold_pallas.py)
against the XLA vec_scalar oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from bulletproofs_tpu.ops import fold_pallas as FP
from bulletproofs_tpu.ops import vec_scalar as S
from bulletproofs_tpu.core.scalar import L as ELL


@pytest.fixture(autouse=True)
def _interpret():
    FP._INTERPRET = True
    yield
    FP._INTERPRET = False


def _rand_limbs(rng, n):
    vals = [rng.randrange(ELL) for _ in range(n)]
    import jax.numpy as jnp
    cols = np.stack([np.asarray(S._to_limbs(v, S.L)) for v in vals], axis=-1)
    return jnp.asarray(cols.astype(np.int32)), vals


def _to_ints(arr):
    a = np.asarray(S.exact_limbs(jnp.asarray(arr)))
    n = a.shape[-1]
    out = []
    for i in range(n):
        v = 0
        for k in range(a.shape[0] - 1, -1, -1):
            v = (v << S.LIMB_BITS) | int(a[k, i])
        out.append(v % ELL)
    return out


def test_fold_and_smul_match_oracle():
    import random
    rng = random.Random(7)
    N = FP.BLKN  # one tile
    x, xv = _rand_limbs(rng, N)
    y, yv = _rand_limbs(rng, N)
    u, uv = _rand_limbs(rng, N)
    v, vv = _rand_limbs(rng, N)
    got = _to_ints(FP.fold_lanes(x, y, u, v))
    exp = [(a * c + b * d) % ELL for a, b, c, d in zip(xv, yv, uv, vv)]
    assert got == exp
    got = _to_ints(FP.smul_lanes(x, u))
    assert got == [a * c % ELL for a, c in zip(xv, uv)]


def test_multi_tile_grid():
    import random
    rng = random.Random(8)
    N = 2 * FP.BLKN
    x, xv = _rand_limbs(rng, N)
    m, mv = _rand_limbs(rng, N)
    got = _to_ints(FP.smul_lanes(x, m))
    assert got == [a * b % ELL for a, b in zip(xv, mv)]


def test_digits_lanes_matches_oracle():
    import random
    rng = random.Random(9)
    N = FP.BLKN
    x, xv = _rand_limbs(rng, N)
    got = np.asarray(FP.digits_lanes(x))
    assert got.shape == (64, N)
    assert (got & 15).max() <= 8          # signed encoding: mag in [0, 8]
    # signed digit recomposition round-trips the values mod l
    recon = [sum((-1 if got[w, i] >= 16 else 1) * int(got[w, i] & 15)
                 << (4 * w) for w in range(64)) % ELL
             for i in range(N)]
    assert recon == xv


def test_digits_lanes_renormalizes_lazy_inputs():
    """Inputs above 8 * 2^252 (lazy Barrett domain, up to ~2^257) must be
    renormalized before the signed recode -- the digit value must equal the
    input mod l, not alias."""
    import random
    rng = random.Random(10)
    N = FP.BLKN
    vals = [rng.randrange(ELL, 1 << 256) for _ in range(N)]
    cols = np.stack([np.asarray(S._to_limbs(v, S.L)) for v in vals], axis=-1)
    got = np.asarray(FP.digits_lanes(jnp.asarray(cols.astype(np.int32))))
    recon = [sum((-1 if got[w, i] >= 16 else 1) * int(got[w, i] & 15)
                 << (4 * w) for w in range(64)) % ELL
             for i in range(N)]
    assert recon == [v % ELL for v in vals]
