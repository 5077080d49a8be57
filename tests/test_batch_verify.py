"""Fused batch verification tests (CPU backend; small sizes to keep compile
time down -- real-TPU throughput is bench.py's job)."""

import pytest

from bulletproofs_tpu import (BulletproofGens, PedersenGens, RangeProof,
                              Transcript, Scalar, ProofError)
from bulletproofs_tpu.parallel import BatchVerifier

BP = BulletproofGens(64, 8)
PC = PedersenGens()


def _make_proofs(k, n, rng):
    proofs, vcss, labels = [], [], []
    for i in range(k):
        label = b"batch %d" % i
        t = Transcript(label)
        p, vcs = RangeProof.prove_multiple(
            BP, PC, t, [i * 31 + 5], [Scalar.random(rng)], n, rng=rng)
        proofs.append(p)
        vcss.append(vcs)
        labels.append(label)
    return proofs, vcss, labels


@pytest.mark.slow
@pytest.mark.parametrize("prefer_host", [True, False])
def test_batch_verify_accepts_and_rejects(rng, prefer_host):
    proofs, vcss, labels = _make_proofs(3, 8, rng)
    bv = BatchVerifier(BP, PC, n=8, m=1, prefer_host=prefer_host)
    bv.verify_batch(proofs, vcss, [Transcript(l) for l in labels], rng=rng)

    # tampered proof in the batch
    bad = RangeProof.from_bytes(proofs[1].to_bytes())
    bad.t_x = bad.t_x + Scalar.one()
    with pytest.raises(ProofError):
        bv.verify_batch([proofs[0], bad, proofs[2]], vcss,
                        [Transcript(l) for l in labels], rng=rng)

    # wrong transcript binding
    with pytest.raises(ProofError):
        bv.verify_batch(proofs, vcss,
                        [Transcript(l) for l in (labels[0], b"x", labels[2])],
                        rng=rng)


def test_fast_scalar_path_matches_reference_path(rng):
    """verification_scalars_ints must produce exactly the scalars of the
    Scalar-object path for identical rng draws."""
    import random

    class FixedRng:
        def __init__(self, seed):
            self.r = random.Random(seed)

        def randbytes(self, n):
            return self.r.randbytes(n)

    proofs, vcss, labels = _make_proofs(1, 8, rng)
    proof, vcs, label = proofs[0], vcss[0], labels[0]

    s_slow, comp, static_pts, vcb = proof.verification_scalars_and_points(
        BP, PC, Transcript(label), vcs, 8, rng=FixedRng(7))
    d_fast, st_fast, pts_fast = proof.verification_scalars_ints(
        BP, PC, Transcript(label), vcs, 8, rng=FixedRng(7))
    k = len(comp)
    ns = len(static_pts)
    assert [s.v for s in s_slow[:k]] + [s.v for s in s_slow[k + ns:]] == d_fast
    assert [s.v for s in s_slow[k:k + ns]] == st_fast
    assert pts_fast == comp + vcb


@pytest.mark.slow
@pytest.mark.parametrize("prefer_host", [True, False])
def test_batch_verify_aggregated_m2(rng, prefer_host):
    """Fused batching over aggregated (m = 2) proofs."""
    n, m = 8, 2
    proofs, vcss, labels = [], [], []
    for i in range(2):
        label = b"agg %d" % i
        p, vcs = RangeProof.prove_multiple(
            BP, PC, Transcript(label), [i + 1, 200 + i],
            [Scalar.random(rng), Scalar.random(rng)], n, rng=rng)
        proofs.append(p)
        vcss.append(vcs)
        labels.append(label)
    bv = BatchVerifier(BP, PC, n=n, m=m, prefer_host=prefer_host)
    bv.verify_batch(proofs, vcss, [Transcript(l) for l in labels], rng=rng)
    with pytest.raises(ProofError):
        bv.verify_batch(proofs, [vcss[0], vcss[0]],
                        [Transcript(l) for l in labels], rng=rng)
