"""Mesh-sharded execution on the virtual 8-device CPU mesh: the sharded
MSM kernel and the mesh-enabled batched verifier (BASELINE scaling config)."""

import secrets

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bulletproofs_tpu import (BulletproofGens, PedersenGens, RangeProof,
                              Transcript, Scalar)
from bulletproofs_tpu.core.ristretto import (RISTRETTO_BASEPOINT,
                                             multiscalar_mul)
from bulletproofs_tpu.parallel.sharded_msm import make_mesh, sharded_msm_lanes
from bulletproofs_tpu.parallel import BatchVerifier
from bulletproofs_tpu.ops import vec_curve as C


class Rng:
    randbytes = staticmethod(secrets.token_bytes)


def _mesh8():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_sharded_msm_matches_host_oracle():
    mesh = _mesh8()
    rng = np.random.RandomState(3)
    N = 32
    pts_host = [RISTRETTO_BASEPOINT.scalar_mul(
        Scalar(int.from_bytes(rng.bytes(16), "little") | 1)) for _ in range(N)]
    from bulletproofs_tpu.core.scalar import L as ELL
    scalars = [int.from_bytes(rng.bytes(32), "little") % ELL for _ in range(N)]
    pts = jnp.asarray(C.points_to_lanes(pts_host))
    out = jax.device_get(sharded_msm_lanes(pts, scalars, mesh))
    got = C.lanes_to_points(np.asarray(out).reshape(4, 20, 1))[0]
    exp = multiscalar_mul([Scalar(s) for s in scalars], pts_host)
    assert got == exp


def test_sharded_msm_non_pow2_groups():
    """N=19 over 8 devices -> 3 groups/device before rounding; the finalize
    halving tree silently dropped the odd group (regression)."""
    mesh = _mesh8()
    rng = np.random.RandomState(7)
    N = 19
    pts_host = [RISTRETTO_BASEPOINT.scalar_mul(
        Scalar(int.from_bytes(rng.bytes(16), "little") | 1)) for _ in range(N)]
    from bulletproofs_tpu.core.scalar import L as ELL
    scalars = [int.from_bytes(rng.bytes(32), "little") % ELL for _ in range(N)]
    pts = jnp.asarray(C.points_to_lanes(pts_host))
    out = jax.device_get(sharded_msm_lanes(pts, scalars, mesh))
    got = C.lanes_to_points(np.asarray(out).reshape(4, 20, 1))[0]
    exp = multiscalar_mul([Scalar(s) for s in scalars], pts_host)
    assert got == exp


@pytest.mark.slow
def test_mesh_batch_verifier_accepts_and_rejects(rng=Rng()):
    mesh = _mesh8()
    n, batch = 8, 4
    pc, bp = PedersenGens(), BulletproofGens(n, 1)
    proofs, vcs, transcripts = [], [], []
    for i in range(batch):
        label = b"mesh bv %d" % i
        p, V = RangeProof.prove_single(bp, pc, Transcript(label),
                                       i + 1, Scalar.random(rng), n, rng=rng)
        proofs.append(p)
        vcs.append(V if isinstance(V, list) else [V])
        transcripts.append(label)
    bv = BatchVerifier(bp, pc, n=n, m=1, mesh=mesh)
    bv.verify_batch(proofs, vcs, [Transcript(l) for l in transcripts],
                    rng=rng)
    # tamper with one proof -> the batch must fail
    from bulletproofs_tpu.errors import ProofError
    raw = bytearray(proofs[2].to_bytes())
    raw[0] ^= 4
    bad = RangeProof.from_bytes(bytes(raw))
    if bad is not None:
        with pytest.raises(ProofError):
            bv.verify_batch(proofs[:2] + [bad] + proofs[3:], vcs,
                            [Transcript(l) for l in transcripts], rng=rng)


@pytest.mark.slow
def test_sharded_canonical_chunks_and_fold():
    """N > canonical capacity (8 devices x 1024): the canonical CPU-mesh
    path splits into chunks of ONE reused executable and folds the
    partials; cross-checked against a one-scalar-mul oracle over a small
    table of known basepoint multiples (same scheme as the dryrun's
    2^16-point production stage)."""
    import jax
    from bulletproofs_tpu.core.scalar import L as ELL

    mesh = _mesh8()
    cap = mesh.devices.size * 1024
    N = cap + 37                      # 2 chunks: one full, one padded
    rng = np.random.RandomState(11)
    acc, table = RISTRETTO_BASEPOINT, []
    for _ in range(16):
        table.append(acc)
        acc = acc + RISTRETTO_BASEPOINT
    table_lanes = jnp.asarray(C.points_to_lanes(table))
    idx = rng.randint(0, 16, N)
    pts = jnp.take(table_lanes, jnp.asarray(idx), axis=-1)
    scalars = [int.from_bytes(rng.bytes(32), "little") % ELL
               for _ in range(N)]
    out = jax.device_get(sharded_msm_lanes(pts, scalars, mesh))
    got = C.lanes_to_points(np.asarray(out).reshape(4, 20, 1))[0]
    exp_scalar = sum((int(k) + 1) * s for k, s in zip(idx, scalars)) % ELL
    from bulletproofs_tpu.core.scalar import Scalar as Sc
    exp = RISTRETTO_BASEPOINT.scalar_mul(Sc(exp_scalar))
    assert got == exp
