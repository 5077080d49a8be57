"""Batch prover vs the reference-validated verifier (CPU path: the C++
scalar stages drive the host Pippenger oracle instead of the TPU kernels)."""

import pytest

from bulletproofs_tpu import (BulletproofGens, PedersenGens, RangeProof,
                              Transcript, Scalar, ProofError)
from bulletproofs_tpu.proofs.batch_prover import BatchProver, _NATIVE

pytestmark = pytest.mark.skipif(_NATIVE is None,
                                reason="native prove engine not built")

BP = BulletproofGens(64, 1)
PC = PedersenGens()


def test_batch_prove_verifies_individually(rng):
    n, count = 8, 3
    prover = BatchProver(BP, PC, n)
    values = [0, 1, (1 << n) - 1]
    blinds = [Scalar.random(rng) for _ in range(count)]
    labels = [b"bpv %d" % i for i in range(count)]
    proofs, vcs = prover.prove_batch(values, blinds,
                                     [Transcript(l) for l in labels], rng=rng)
    for i in range(count):
        proofs[i].verify_single(BP, PC, Transcript(labels[i]), vcs[i], n)
    # wire roundtrip
    p = RangeProof.from_bytes(proofs[1].to_bytes())
    p.verify_single(BP, PC, Transcript(labels[1]), vcs[1], n)
    # wrong transcript rejected
    with pytest.raises(ProofError):
        proofs[0].verify_single(BP, PC, Transcript(b"other"), vcs[0], n)


def test_batch_prove_matches_host_prover_semantics(rng):
    """Same transcript label: a batch-proved proof and a host-proved proof
    both verify against the same verifier flow (proof bytes differ only by
    blinding randomness)."""
    n = 8
    prover = BatchProver(BP, PC, n)
    proofs, vcs = prover.prove_batch([37], [Scalar.random(rng)],
                                     [Transcript(b"same label")], rng=rng)
    host_p, host_vcs = RangeProof.prove_multiple(
        BP, PC, Transcript(b"same label"), [37], [Scalar.random(rng)], n, rng=rng)
    proofs[0].verify_single(BP, PC, Transcript(b"same label"), vcs[0], n)
    host_p.verify_single(BP, PC, Transcript(b"same label"), host_vcs[0], n)
    assert len(proofs[0].to_bytes()) == len(host_p.to_bytes())


def test_batch_prove_m1_device_path(rng):
    """Single-value (m = 1) batched proving through the device stages
    (interpret-mode Pallas on CPU): V rows over the 2-base tables, A/S
    over the full tables; outputs verify individually."""
    from bulletproofs_tpu.ops import fixed_msm

    n = 8
    prover = BatchProver(BP, PC, n)
    prover.force_device = True
    old = fixed_msm._INTERPRET
    fixed_msm._INTERPRET = True
    try:
        values = [5, (1 << n) - 1]
        blinds = [Scalar.random(rng) for _ in range(2)]
        labels = [b"devbp %d" % i for i in range(2)]
        proofs, vcs = prover.prove_batch(
            values, blinds, [Transcript(l) for l in labels], rng=rng)
        for i in range(2):
            proofs[i].verify_single(BP, PC, Transcript(labels[i]), vcs[i], n)
    finally:
        fixed_msm._INTERPRET = old


@pytest.mark.slow
def test_batch_prove_aggregated_m2_device_path(rng):
    """Aggregated (m = 2) batched proving through the device stages
    (interpret-mode Pallas on CPU); outputs verify via verify_multiple and
    fused batch verification."""
    from bulletproofs_tpu.ops import fixed_msm
    from bulletproofs_tpu.parallel import BatchVerifier

    n, m = 8, 2
    bp = BulletproofGens(n, m)
    prover = BatchProver(bp, PC, n, m=m)
    prover.force_device = True
    old = fixed_msm._INTERPRET
    fixed_msm._INTERPRET = True
    try:
        values = [[3, 200], [7, (1 << n) - 1]]
        blinds = [[Scalar.random(rng) for _ in range(m)] for _ in range(2)]
        labels = [b"aggbp %d" % i for i in range(2)]
        proofs, vcs = prover.prove_batch(
            values, blinds, [Transcript(l) for l in labels], rng=rng)
        for i in range(2):
            assert len(vcs[i]) == m
            proofs[i].verify_multiple(bp, PC, Transcript(labels[i]),
                                      vcs[i], n, rng=rng)
        bv = BatchVerifier(bp, PC, n=n, m=m, prefer_host=True)
        bv.verify_batch(proofs, vcs, [Transcript(l) for l in labels], rng=rng)
        with pytest.raises(ProofError):
            proofs[0].verify_multiple(bp, PC, Transcript(b"wrong"), vcs[0],
                                      n, rng=rng)
    finally:
        fixed_msm._INTERPRET = old


@pytest.mark.slow
def test_batch_prove_aggregated_segmented_path(rng):
    """The SEGMENTED three-program rest (prove_mid / round_step / fin --
    the m > 1 TPU production path) produces verifying proofs, cross-checked
    against the one-scan form's transcripts (interpret-mode on CPU)."""
    from bulletproofs_tpu.ops import fixed_msm

    n, m = 8, 2
    bp = BulletproofGens(n, m)
    prover = BatchProver(bp, PC, n, m=m)
    prover.force_device = True
    prover.use_segmented = True
    old = fixed_msm._INTERPRET
    fixed_msm._INTERPRET = True
    try:
        values = [[9, 77], [250, 0]]
        blinds = [[Scalar.random(rng) for _ in range(m)] for _ in range(2)]
        labels = [b"segbp %d" % i for i in range(2)]
        tss = [Transcript(l) for l in labels]
        proofs, vcs = prover.prove_batch(values, blinds, tss, rng=rng)
        for i in range(2):
            proofs[i].verify_multiple(bp, PC, Transcript(labels[i]),
                                      vcs[i], n, rng=rng)
        # final transcript state matches a verifier's (composability)
        t_v = Transcript(labels[0])
        proofs[0].verify_multiple(bp, PC, t_v, vcs[0], n, rng=rng)
        assert tss[0].challenge_scalar(b"post") == t_v.challenge_scalar(b"post")
        # ONE executable serves every round: the traced round counter keeps
        # round_step_fused shape-uniform (N=16 -> 4 rounds, 3 step calls)
        from bulletproofs_tpu.ops import prover_stages as PS
        assert PS.round_step_fused._cache_size() == 1
    finally:
        fixed_msm._INTERPRET = old


def test_batch_prove_rejects_out_of_range(rng):
    prover = BatchProver(BP, PC, 8)
    with pytest.raises(ValueError):
        prover.prove_batch([1 << 8], [Scalar.random(rng)],
                           [Transcript(b"x")], rng=rng)


def test_batch_prove_transcript_advances(rng):
    """Prover and verifier transcripts end in the same state (protocol
    composability, reference semantics)."""
    n = 8
    prover = BatchProver(BP, PC, n)
    t_prove = Transcript(b"compose")
    proofs, vcs = prover.prove_batch([5], [Scalar.random(rng)], [t_prove],
                                     rng=rng)
    t_verify = Transcript(b"compose")
    proofs[0].verify_single(BP, PC, t_verify, vcs[0], n)
    assert t_prove.challenge_scalar(b"post") == t_verify.challenge_scalar(b"post")


def test_fused_path_transcript_advances(rng):
    """The fused device path writes back the final STROBE states: prover
    and verifier transcripts end in the same state (composability), even
    with different-length labels in one batch."""
    n = 8
    prover = BatchProver(BP, PC, n)
    prover.force_device = True
    t_a, t_b = Transcript(b"fp a"), Transcript(b"fp longer b")
    proofs, vcs = prover.prove_batch([5, 200], [Scalar.random(rng),
                                               Scalar.random(rng)],
                                     [t_a, t_b], rng=rng)
    for t, label, proof, vc in ((t_a, b"fp a", proofs[0], vcs[0]),
                                (t_b, b"fp longer b", proofs[1], vcs[1])):
        t_v = Transcript(label)
        proof.verify_single(BP, PC, t_v, vc, n)
        assert t.challenge_scalar(b"post") == t_v.challenge_scalar(b"post")


def test_fused_fallback_policy(rng, monkeypatch):
    """Fused-path failure policy (VERDICT r4 item 8): a compile/dispatch
    error (JaxRuntimeError) degrades to the per-stage pipeline with the
    transcripts restored; any OTHER exception type propagates -- also with
    the transcripts restored -- instead of silently falling back."""
    import jax.errors
    from bulletproofs_tpu.ops import fixed_msm
    from bulletproofs_tpu.proofs import batch_prover as bpmod

    n = 8
    prover = BatchProver(BP, PC, n)
    monkeypatch.setattr(fixed_msm, "_on_tpu", lambda: True)
    assert not prover.force_device and prover.fused

    def boom_dispatch(values, blindings, transcripts, rng):
        transcripts[0].append_message(b"corrupt", b"mid-half write")
        raise jax.errors.JaxRuntimeError("mosaic rejected the program")

    def boom_logic(values, blindings, transcripts, rng):
        transcripts[0].append_message(b"corrupt", b"mid-half write")
        raise ValueError("a logic bug, not a compile failure")

    sentinel = (["proofs"], ["vcs"])
    calls = []

    def fake_per_stage(values, blindings, transcripts, rng):
        calls.append(len(transcripts))
        return sentinel

    monkeypatch.setattr(prover, "_prove_batch_device", fake_per_stage)
    blinds = [Scalar.random(rng)]

    # dispatch error -> fallback runs, transcript state restored first
    t = Transcript(b"fallback")
    snap = t.strobe.buf.raw
    monkeypatch.setattr(prover, "_prove_batch_device_fused", boom_dispatch)
    assert prover.prove_batch([5], blinds, [t], rng=rng) is sentinel
    assert calls == [1]
    assert t.strobe.buf.raw == snap

    # logic error -> propagates (no silent degradation), transcript restored
    t = Transcript(b"fallback")
    snap = t.strobe.buf.raw
    monkeypatch.setattr(prover, "_prove_batch_device_fused", boom_logic)
    with pytest.raises(ValueError, match="logic bug"):
        prover.prove_batch([5], blinds, [t], rng=rng)
    assert calls == [1]          # per-stage pipeline NOT invoked again
    assert t.strobe.buf.raw == snap

    # force_device re-raises even dispatch errors
    prover.force_device = True
    monkeypatch.setattr(prover, "_prove_batch_device_fused", boom_dispatch)
    with pytest.raises(jax.errors.JaxRuntimeError):
        prover.prove_batch([5], blinds, [Transcript(b"fd")], rng=rng)
    assert calls == [1]
