"""Range proof tests: golden vectors (bit-exactness oracle), roundtrips,
delta, and adversarial MPC behavior (mirrors reference
src/range_proof/mod.rs:601-840 and tests/range_proof.rs)."""

import json
import os
import random

import pytest

from bulletproofs_tpu import (BulletproofGens, PedersenGens, RangeProof,
                              Transcript, Scalar, ProofError, MPCError)
from bulletproofs_tpu.core.scalar import L
from bulletproofs_tpu.proofs.rangeproof import delta
from bulletproofs_tpu.proofs.dealer import Dealer
from bulletproofs_tpu.proofs.party import Party
from bulletproofs_tpu.utils.util import exp_iter_take

HERE = os.path.dirname(os.path.abspath(__file__))

_GENS = {}


def shared_gens(n, m):
    key = (64, 8)
    if key not in _GENS:
        _GENS[key] = BulletproofGens(64, 8), PedersenGens()
    return _GENS[key]


def test_delta():
    rr = random.Random(11)
    y, z = Scalar(rr.randrange(L)), Scalar(rr.randrange(L))
    n = 256
    z2 = z * z
    z3 = z2 * z
    power_g = Scalar.zero()
    exp_y, exp_2 = Scalar.one(), Scalar.one()
    for _ in range(n):
        power_g = power_g + (z - z2) * exp_y - z3 * exp_2
        exp_y = exp_y * y
        exp_2 = exp_2 + exp_2
    assert power_g == delta(n, 1, y, z)


@pytest.mark.slow
def test_golden_vectors_bit_exact():
    """The 16 v1.0.0 proofs from the reference's regression suite must
    verify byte-for-byte (tests/range_proof.rs:16-95)."""
    data = json.load(open(os.path.join(HERE, "golden_vectors.json")))
    bp, pc = shared_gens(64, 8)
    vcs = [bytes.fromhex(h) for h in data["value_commitments"]]
    for i in range(4):
        for j in range(4):
            n, m = 8 << i, 1 << j
            proof = RangeProof.from_bytes(bytes.fromhex(data["proofs"][i][j]))
            t = Transcript(data["transcript_label"].encode())
            proof.verify_multiple(bp, pc, t, vcs[:m], n)


def _create_and_verify(n, m, rng):
    bp, pc = shared_gens(64, 8)
    values = [random.Random(m * 100 + n).randrange(2 ** n) for _ in range(m)]
    blindings = [Scalar.random(rng) for _ in range(m)]

    t = Transcript(b"AggregatedRangeProofTest")
    proof, vcs = RangeProof.prove_multiple(bp, pc, t, values, blindings, n, rng=rng)

    wire = proof.to_bytes()
    assert len(wire) == 32 * (9 + 2 * (n * m).bit_length() - 2)
    proof2 = RangeProof.from_bytes(wire)

    t2 = Transcript(b"AggregatedRangeProofTest")
    proof2.verify_multiple(bp, pc, t2, vcs, n, rng=rng)


@pytest.mark.parametrize("n,m", [(32, 1), (32, 2), (8, 4), (16, 2), (64, 1)])
def test_create_and_verify(n, m, rng):
    _create_and_verify(n, m, rng)


@pytest.mark.slow
@pytest.mark.parametrize("n,m", [(32, 4), (32, 8), (64, 2), (64, 4), (64, 8)])
def test_create_and_verify_slow(n, m, rng):
    _create_and_verify(n, m, rng)


def test_verify_fails_on_wrong_commitment(rng):
    bp, pc = shared_gens(64, 8)
    t = Transcript(b"t")
    proof, vcs = RangeProof.prove_multiple(bp, pc, t, [42], [Scalar.random(rng)], 8, rng=rng)
    bad_vc = pc.commit(Scalar(43), Scalar.random(rng)).compress()
    t2 = Transcript(b"t")
    with pytest.raises(ProofError):
        proof.verify_multiple(bp, pc, t2, [bad_vc], 8, rng=rng)


def test_verify_fails_on_wrong_transcript_label(rng):
    bp, pc = shared_gens(64, 8)
    t = Transcript(b"t")
    proof, vcs = RangeProof.prove_multiple(bp, pc, t, [42], [Scalar.random(rng)], 8, rng=rng)
    t2 = Transcript(b"different")
    with pytest.raises(ProofError):
        proof.verify_multiple(bp, pc, t2, vcs, 8, rng=rng)


def test_prove_rejects_bad_params(rng):
    bp, pc = shared_gens(64, 8)
    with pytest.raises(ProofError) as e:
        RangeProof.prove_multiple(bp, pc, Transcript(b"t"), [1], [Scalar.random(rng)], 10, rng=rng)
    assert e.value.kind == ProofError.INVALID_BITSIZE
    with pytest.raises(ProofError):
        RangeProof.prove_multiple(bp, pc, Transcript(b"t"), [1, 2, 3],
                                  [Scalar.random(rng)] * 3, 8, rng=rng)  # m=3 not pow2
    with pytest.raises(ProofError) as e:
        RangeProof.prove_multiple(bp, pc, Transcript(b"t"), [1],
                                  [Scalar.random(rng)] * 2, 8, rng=rng)
    assert e.value.kind == ProofError.WRONG_NUM_BLINDING_FACTORS


def test_from_bytes_rejects_garbage():
    with pytest.raises(ProofError):
        RangeProof.from_bytes(b"\x01" * 33)
    with pytest.raises(ProofError):
        RangeProof.from_bytes(b"\x01" * 64)
    # non-canonical scalar in t_x position
    buf = bytearray(32 * 11)
    buf[128:160] = b"\xff" * 32
    with pytest.raises(ProofError):
        RangeProof.from_bytes(bytes(buf))


# ---------------------------------------------------------------------------
# adversarial MPC (reference src/range_proof/mod.rs:727-840)
# ---------------------------------------------------------------------------

def test_detect_dishonest_party_during_aggregation(rng):
    """Parties 1 and 3 use 64-bit values in a 32-bit proof; the dealer's
    audit must report exactly those indices."""
    bp, pc = shared_gens(64, 8)
    n, m = 32, 4

    values = [0, (1 << 40) + 937, 920212, (1 << 63) + 533]
    blindings = [Scalar.random(rng) for _ in range(m)]

    dealer = Dealer.new(bp, pc, Transcript(b"AggregatedRangeProofTest"), n, m)

    # dishonest parties claim bitsize 64 to Party::new so it doesn't reject
    parties = [
        Party.new(bp, pc, values[0], blindings[0], n),
        Party.new(bp, pc, values[1], blindings[1], 64),
        Party.new(bp, pc, values[2], blindings[2], n),
        Party.new(bp, pc, values[3], blindings[3], 64),
    ]
    # but then truncate their state to n bits of work by re-running with n
    parties[1].n = n
    parties[3].n = n

    states, bits = zip(*[p.assign_position(j, rng) for j, p in enumerate(parties)])
    dealer, bit_challenge = dealer.receive_bit_commitments(list(bits))
    states, polys = zip(*[p.apply_challenge(bit_challenge, rng) for p in states])
    dealer, poly_challenge = dealer.receive_poly_commitments(list(polys))
    shares = [p.apply_challenge(poly_challenge) for p in states]

    with pytest.raises(MPCError) as e:
        dealer.receive_shares(shares, rng)
    assert e.value.kind == MPCError.MALFORMED_PROOF_SHARES
    assert e.value.bad_shares == [1, 3]


def test_detect_malicious_dealer(rng):
    """A party rejects the dealer's x = 0 challenge
    (reference mod.rs:800-840)."""
    from bulletproofs_tpu.proofs.messages import PolyChallenge
    bp, pc = shared_gens(64, 8)
    n = 32

    dealer = Dealer.new(bp, pc, Transcript(b"AggregatedRangeProofTest"), n, 1)
    party = Party.new(bp, pc, 1, Scalar.random(rng), n)
    state, bits = party.assign_position(0, rng)
    dealer, bit_challenge = dealer.receive_bit_commitments([bits])
    state, poly = state.apply_challenge(bit_challenge, rng)
    dealer, _ = dealer.receive_poly_commitments([poly])

    with pytest.raises(MPCError) as e:
        state.apply_challenge(PolyChallenge(x=Scalar.zero()))
    assert e.value.kind == MPCError.MALICIOUS_DEALER


def test_session_types_one_shot(rng):
    bp, pc = shared_gens(64, 8)
    party = Party.new(bp, pc, 1, Scalar.random(rng), 8)
    party.assign_position(0, rng)
    with pytest.raises(RuntimeError):
        party.assign_position(0, rng)


def test_single_verify_routes_through_fused_host_path(monkeypatch):
    """Off-TPU, verify_multiple must take the all-native fused path
    (host_verify_one); this pins the routing so a refactor cannot silently
    fall back to the slow Python scalar streams."""
    import secrets
    from bulletproofs_tpu.parallel import batch_verify as BV
    from bulletproofs_tpu import (BulletproofGens, PedersenGens, RangeProof,
                                  Transcript, Scalar)

    class Rng:
        randbytes = staticmethod(secrets.token_bytes)

    calls = []
    orig = BV.host_verify_one

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(BV, "host_verify_one", spy)
    rng = Rng()
    pc, bp = PedersenGens(), BulletproofGens(8, 1)
    p, v = RangeProof.prove_single(bp, pc, Transcript(b"route"), 3,
                                   Scalar.random(rng), 8, rng=rng)
    p.verify_single(bp, pc, Transcript(b"route"), v, 8, rng=rng)
    assert calls, "fused host path was not used"
