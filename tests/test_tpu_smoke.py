"""On-chip smoke suite: real-TPU validation of every Pallas kernel at its
production block shapes, plus one end-to-end batch prove/verify, asserted
against the host oracle.

Run with BPTPU_TEST_TPU=1 (the default suite pins JAX to CPU and skips
these).  Budget: <10 minutes warm -- this is the pass that would have
caught the r01 VMEM OOM (fold_pallas block cap) before the driver's bench
did.

    BPTPU_TEST_TPU=1 python -m pytest tests/test_tpu_smoke.py -q
"""

import os
import secrets

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("BPTPU_TEST_TPU"),
    reason="real-TPU smoke pass (set BPTPU_TEST_TPU=1)")


def _on_tpu():
    import jax
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@pytest.fixture(scope="module")
def tpu():
    if not _on_tpu():
        pytest.skip("no TPU device")
    import jax
    return jax


def test_fixed_msm_max_shapes(tpu, rng):
    """Fixed-base bucket kernel at the prover's largest stream (the S
    commitment: (2N+1)*64 rows) and full lane width, vs the host MSM."""
    import jax.numpy as jnp
    from bulletproofs_tpu.generators import BulletproofGens, PedersenGens
    from bulletproofs_tpu.ops import fixed_msm as FM
    from bulletproofs_tpu.ops import vec_curve as C
    from bulletproofs_tpu.core.scalar import Scalar
    from bulletproofs_tpu.core.ristretto import multiscalar_mul

    n = 64
    pc, bp = PedersenGens(), BulletproofGens(n, 1)
    bases = [pc.B, pc.B_blinding] + bp.G(n, 1) + bp.H(n, 1)
    tables = FM.FixedBaseTables(bases)
    nb = len(bases)
    Q = 512
    coef = np.zeros((Q, nb, 32), np.uint8)
    sc_rows = []
    for q in range(Q):
        row = [Scalar.random(rng) for _ in range(nb)]
        sc_rows.append(row)
        for j, s in enumerate(row):
            coef[q, j] = np.frombuffer(s.to_bytes(), np.uint8)
    got = np.asarray(tpu.device_get(C.compress_device(
        FM.msm_rows(tables, coef))))
    for q in (0, 1, Q // 2, Q - 1):
        want = multiscalar_mul(sc_rows[q], bases).compress()
        assert got[q].tobytes() == want, f"row {q}"


def test_dynamic_msm_2e16(tpu, rng):
    """Pippenger kernel at the north-star shape (2^16 points) vs a host
    spot-check through the subtract trick: msm(s, P) - msm(s', P) ==
    msm(s - s', P) with s' = s except one entry."""
    import jax.numpy as jnp
    from bulletproofs_tpu.ops import msm_pallas as MP
    from bulletproofs_tpu.ops import vec_curve as C
    from bulletproofs_tpu.core.ristretto import RISTRETTO_BASEPOINT
    from bulletproofs_tpu.core.scalar import Scalar, L as ELL

    N = 1 << 16
    raw = np.frombuffer(secrets.token_bytes(64 * N), np.uint8).reshape(N, 64)
    pts = C.from_uniform_bytes(raw)
    ints = [int.from_bytes(secrets.token_bytes(31), "little") for _ in range(N)]
    from bulletproofs_tpu.ops import vec_msm
    out1 = np.asarray(tpu.device_get(MP.msm_lanes(
        pts, vec_msm.scalars_to_bytes(ints))))
    # tweak one scalar by +1: difference must equal that point
    ints2 = list(ints)
    ints2[12345] += 1
    out2 = np.asarray(tpu.device_get(MP.msm_lanes(
        pts, vec_msm.scalars_to_bytes(ints2))))
    p1 = C.lanes_to_points(out1.reshape(4, 20, 1))[0]
    p2 = C.lanes_to_points(out2.reshape(4, 20, 1))[0]
    want = C.lanes_to_points(np.asarray(
        tpu.device_get(pts[..., 12345:12346])))[0]
    assert (p2 - p1) == want


def test_fold_digits_kernels_max_width(tpu):
    """fold_pallas at the prover's widest shape (N*P columns) vs the XLA
    scalar path."""
    import jax.numpy as jnp
    from bulletproofs_tpu.ops import fold_pallas as FP
    from bulletproofs_tpu.ops import vec_scalar as VS

    cols = 64 * 4096
    if not FP.usable(cols):
        pytest.skip("fold kernel unusable at this width")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(0, 1 << 13, size=(VS.L, cols), dtype=np.int32))
    y = jnp.asarray(rng.integers(0, 1 << 13, size=(VS.L, cols), dtype=np.int32))
    u = jnp.asarray(rng.integers(0, 1 << 13, size=(VS.L, cols), dtype=np.int32))
    v = jnp.asarray(rng.integers(0, 1 << 13, size=(VS.L, cols), dtype=np.int32))
    got = np.asarray(tpu.device_get(FP.fold_lanes(x, y, u, v)))
    want = np.asarray(tpu.device_get(
        VS.sadd(VS.smul(x, u), VS.smul(y, v))))
    # compare canonical values, not lazy limb representations
    got_c = np.asarray(tpu.device_get(VS.canonical_bytes32(jnp.asarray(got[:, :1024]))))
    want_c = np.asarray(tpu.device_get(VS.canonical_bytes32(jnp.asarray(want[:, :1024]))))
    assert (got_c == want_c).all()
    d = np.asarray(tpu.device_get(FP.digits_lanes(x[:, :1024])))
    assert d.shape == (64, 1024)


def test_codecs_roundtrip_large(tpu):
    """compress/decompress kernels at codec block size, roundtrip."""
    import jax.numpy as jnp
    from bulletproofs_tpu.ops import msm_pallas as MP
    from bulletproofs_tpu.ops import vec_curve as C

    N = 8192
    raw = np.frombuffer(secrets.token_bytes(64 * N), np.uint8).reshape(N, 64)
    pts = C.from_uniform_bytes(raw)
    lim = MP.compress_lanes(pts)
    ok, back = MP.decompress_lanes(lim)
    assert bool(np.asarray(tpu.device_get(ok)).all())
    lim2 = MP.compress_lanes(back)
    assert (np.asarray(tpu.device_get(lim))
            == np.asarray(tpu.device_get(lim2))).all()


def test_end_to_end_batch_prove_verify(tpu, rng):
    """64 proofs through the fused device prover, verified by the fused
    batch verifier AND spot-checked against the host verifier."""
    from bulletproofs_tpu import (BulletproofGens, PedersenGens, RangeProof,
                                  Transcript, Scalar)
    from bulletproofs_tpu.proofs.batch_prover import BatchProver
    from bulletproofs_tpu.parallel import BatchVerifier

    n, count = 64, 64
    pc, bp = PedersenGens(), BulletproofGens(n, 1)
    prover = BatchProver(bp, pc, n)
    values = [int.from_bytes(secrets.token_bytes(8), "little")
              for _ in range(count)]
    blinds = [Scalar.random(rng) for _ in range(count)]
    labels = [b"smoke %d" % i for i in range(count)]
    proofs, vcs = prover.prove_batch(values, blinds,
                                     [Transcript(l) for l in labels], rng=rng)
    bv = BatchVerifier(bp, pc, n=n, m=1)
    bv.verify_batch(proofs, [[v] for v in vcs],
                    [Transcript(l) for l in labels], rng=rng)
    # host-oracle spot check
    proofs[3].verify_single(bp, pc, Transcript(labels[3]), vcs[3], n)
    # tamper rejection
    from bulletproofs_tpu.errors import ProofError
    raw = bytearray(proofs[0].to_bytes())
    raw[40] ^= 1
    try:
        bad = RangeProof.from_bytes(bytes(raw))
        with pytest.raises(Exception):
            bad.verify_single(bp, pc, Transcript(labels[0]), vcs[0], n)
    except ProofError:
        pass
