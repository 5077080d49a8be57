"""Decode-path fuzzing: random mutations of valid proof bytes must either
parse-and-fail verification or raise ProofError/R1CSError cleanly -- never
crash, hang, or verify (the reference enforces the same via canonical
scalar checks and identity-point rules on deserialize,
src/range_proof/mod.rs:504-538, src/inner_product_proof.rs:373-407)."""

import json
import os
import random

import pytest

from bulletproofs_tpu import (BulletproofGens, PedersenGens, RangeProof,
                              Transcript, Scalar, ProofError)
from bulletproofs_tpu.proofs.linear import LinearProof
from bulletproofs_tpu.errors import R1CSError

BP = BulletproofGens(64, 8)
PC = PedersenGens()


def _golden():
    path = os.path.join(os.path.dirname(__file__), "golden_vectors.json")
    gv = json.load(open(path))
    return (bytes.fromhex(gv["proofs"][0][0]),
            [bytes.fromhex(h) for h in gv["value_commitments"]][:1])


@pytest.mark.slow
def test_rangeproof_byte_mutations_never_verify(rng):
    pbytes, vcs = _golden()
    rr = random.Random(1234)
    accepted = 0
    for trial in range(200):
        mutated = bytearray(pbytes)
        for _ in range(rr.randrange(1, 4)):
            mutated[rr.randrange(len(mutated))] ^= 1 << rr.randrange(8)
        try:
            proof = RangeProof.from_bytes(bytes(mutated))
            proof.verify_multiple(
                BP, PC, Transcript(b"Deserialize-And-Verify Test"),
                vcs, 8, rng=rng)
            accepted += 1
        except ProofError:
            pass
    assert accepted == 0


def test_rangeproof_truncations_and_extensions_raise():
    pbytes, _ = _golden()
    for cut in (0, 1, 31, 32, 100, len(pbytes) - 1):
        with pytest.raises(ProofError):
            RangeProof.from_bytes(pbytes[:cut])
    with pytest.raises(ProofError):
        RangeProof.from_bytes(pbytes + b"\x00" * 32)


def test_linear_proof_mutations_never_verify(rng):
    from bulletproofs_tpu.core.ristretto import multiscalar_mul
    from bulletproofs_tpu.utils.util import inner_product

    n = 16
    G = BP.share(0).G(n)
    F, B = PC.B, PC.B_blinding
    a = [Scalar.random(rng) for _ in range(n)]
    b = [Scalar.random(rng) for _ in range(n)]
    r = Scalar.random(rng)
    C = multiscalar_mul(a + [r, inner_product(a, b)], G + [B, F]).compress()
    proof = LinearProof.create(Transcript(b"fuzz"), rng, C, r,
                               list(a), list(b), list(G), F, B)
    pbytes = proof.to_bytes()
    rr = random.Random(99)
    for trial in range(60):
        mutated = bytearray(pbytes)
        mutated[rr.randrange(len(mutated))] ^= 1 << rr.randrange(8)
        try:
            LinearProof.from_bytes(bytes(mutated)).verify(
                Transcript(b"fuzz"), C, G, F, B, list(b))
            raise AssertionError("mutated linear proof verified")
        except ProofError:
            pass


def test_r1cs_proof_mutations_never_verify(rng):
    """R1CSProof has the trickiest wire format (version tag byte,
    phase-2 identity elision, reference src/r1cs/proof.rs:70-124):
    mutations must parse-and-fail or raise, never crash or verify."""
    import random as _random
    from bulletproofs_tpu.proofs.r1cs import Prover, Verifier, R1CSProof
    from bulletproofs_tpu.core.scalar import Scalar as _S

    pc = PedersenGens()
    bp = BulletproofGens(8, 1)
    prover = Prover(pc, Transcript(b"r1cs fuzz"))
    c1, v1 = prover.commit(_S(3), _S.random(rng))
    c2, v2 = prover.commit(_S(5), _S.random(rng))
    _, _, out = prover.multiply(v1 + v2, v1 - v2)
    prover.constrain(out + _S(16))
    proof = prover.prove(bp, rng=rng)
    pbytes = proof.to_bytes()

    def fresh_verifier():
        vf = Verifier(Transcript(b"r1cs fuzz"))
        w1, w2 = vf.commit(c1), vf.commit(c2)
        _, _, vout = vf.multiply(w1 + w2, w1 - w2)
        vf.constrain(vout + _S(16))
        return vf

    # sanity: the untouched proof verifies
    fresh_verifier().verify(R1CSProof.from_bytes(pbytes), pc, bp, rng=rng)

    rr = _random.Random(99)
    accepted = 0
    for trial in range(120):
        mutated = bytearray(pbytes)
        for _ in range(rr.randrange(1, 4)):
            mutated[rr.randrange(len(mutated))] ^= 1 << rr.randrange(8)
        try:
            fresh_verifier().verify(R1CSProof.from_bytes(bytes(mutated)),
                                    pc, bp, rng=rng)
            accepted += 1
        except (ProofError, R1CSError):
            pass
    assert accepted == 0

    for cut in (0, 1, 32, len(pbytes) - 1):
        with pytest.raises((ProofError, R1CSError)):
            R1CSProof.from_bytes(pbytes[:cut])
    with pytest.raises((ProofError, R1CSError)):
        R1CSProof.from_bytes(bytes([0xFF]) + pbytes[1:])  # bad version tag
