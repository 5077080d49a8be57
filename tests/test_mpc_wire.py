"""MPC over the wire: run the full aggregation protocol with every message
serialized and deserialized between party and dealer, as a networked
deployment would (the reference's messages are serde wire types,
messages.rs:17-53; docs/aggregation-api.md:8 'can be run locally or across
a network')."""

import pytest

from bulletproofs_tpu import (BulletproofGens, PedersenGens, RangeProof,
                              Transcript, Scalar)
from bulletproofs_tpu.range_proof_mpc import Dealer, Party
from bulletproofs_tpu.proofs import messages as M


def test_mpc_protocol_over_serialized_messages(rng):
    bp, pc = BulletproofGens(64, 4), PedersenGens()
    n, m = 16, 4
    values = [101, 202, 303, 404]
    blindings = [Scalar.random(rng) for _ in range(m)]

    dealer = Dealer.new(bp, pc, Transcript(b"wire mpc test"), n, m)
    parties = [Party.new(bp, pc, v, vb, n) for v, vb in zip(values, blindings)]

    # round 1: bit commitments cross the wire
    states, wire_bits = [], []
    for j, p in enumerate(parties):
        st, bc = p.assign_position(j, rng)
        states.append(st)
        wire_bits.append(M.bit_commitment_to_bytes(bc))
    bits = [M.bit_commitment_from_bytes(b) for b in wire_bits]
    dealer, bit_challenge = dealer.receive_bit_commitments(bits)

    # challenge crosses the wire back
    bc_wire = M.bit_challenge_to_bytes(bit_challenge)
    bit_challenge_rx = M.bit_challenge_from_bytes(bc_wire)
    assert bit_challenge_rx.y == bit_challenge.y

    # round 2: poly commitments
    states2, wire_polys = [], []
    for st in states:
        st2, pcm = st.apply_challenge(bit_challenge_rx, rng)
        states2.append(st2)
        wire_polys.append(M.poly_commitment_to_bytes(pcm))
    polys = [M.poly_commitment_from_bytes(b) for b in wire_polys]
    dealer, poly_challenge = dealer.receive_poly_commitments(polys)

    x_wire = M.poly_challenge_to_bytes(poly_challenge)
    poly_challenge_rx = M.poly_challenge_from_bytes(x_wire)

    # round 3: proof shares
    wire_shares = [M.proof_share_to_bytes(st.apply_challenge(poly_challenge_rx))
                   for st in states2]
    shares = [M.proof_share_from_bytes(b) for b in wire_shares]

    proof = dealer.receive_shares(shares, rng)

    # the aggregated proof verifies
    vcs = [b.V_j for b in bits]
    t = Transcript(b"wire mpc test")
    proof.verify_multiple(bp, pc, t, vcs, n, rng=rng)


def _party_process(conn, j, n, value, blinding_bytes, seed):
    """One MPC party in its own OS process: host-native math only, every
    message crossing the process boundary as wire bytes."""
    import random

    from bulletproofs_tpu import BulletproofGens, PedersenGens, Scalar
    from bulletproofs_tpu.range_proof_mpc import Party
    from bulletproofs_tpu.proofs import messages as MM

    rng = random.Random(seed)
    bp, pc = BulletproofGens(64, 4), PedersenGens()
    party = Party.new(bp, pc, value,
                      Scalar.from_canonical_bytes(blinding_bytes), n)
    st, bc = party.assign_position(j, rng)
    conn.send_bytes(MM.bit_commitment_to_bytes(bc))
    st2, pcm = st.apply_challenge(
        MM.bit_challenge_from_bytes(conn.recv_bytes()), rng)
    conn.send_bytes(MM.poly_commitment_to_bytes(pcm))
    share = st2.apply_challenge(
        MM.poly_challenge_from_bytes(conn.recv_bytes()))
    conn.send_bytes(MM.proof_share_to_bytes(share))
    conn.close()


@pytest.mark.slow
def test_mpc_across_processes(rng):
    """The dealer aggregates parties living in SEPARATE OS processes --
    the protocol's 3 rounds run over multiprocessing pipes with the same
    wire codecs as the in-process test (SURVEY §2c.5: in-process and
    networked flows are the same protocol)."""
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    bp, pc = BulletproofGens(64, 4), PedersenGens()
    n, m = 16, 4
    values = [11, 22, 33, 44]

    dealer = Dealer.new(bp, pc, Transcript(b"cross-process mpc"), n, m)
    pipes, procs = [], []
    for j in range(m):
        parent, child = ctx.Pipe()
        pr = ctx.Process(target=_party_process,
                         args=(child, j, n, values[j],
                               Scalar.random(rng).to_bytes(), 1000 + j))
        pr.start()
        pipes.append(parent)
        procs.append(pr)
    try:
        bits = [M.bit_commitment_from_bytes(c.recv_bytes()) for c in pipes]
        dealer, bit_challenge = dealer.receive_bit_commitments(bits)
        wire = M.bit_challenge_to_bytes(bit_challenge)
        for c in pipes:
            c.send_bytes(wire)
        polys = [M.poly_commitment_from_bytes(c.recv_bytes()) for c in pipes]
        dealer, poly_challenge = dealer.receive_poly_commitments(polys)
        wire = M.poly_challenge_to_bytes(poly_challenge)
        for c in pipes:
            c.send_bytes(wire)
        shares = [M.proof_share_from_bytes(c.recv_bytes()) for c in pipes]
        proof = dealer.receive_shares(shares, rng)
    finally:
        for pr in procs:
            pr.join(timeout=60)
            if pr.is_alive():
                pr.terminate()

    proof.verify_multiple(bp, pc, Transcript(b"cross-process mpc"),
                          [b.V_j for b in bits], n, rng=rng)


def test_message_codec_rejects_bad_encodings():
    with pytest.raises(ValueError):
        M.bit_commitment_from_bytes(bytes(32) + b"\x01" * 32 + bytes(32))
    with pytest.raises(ValueError):
        M.proof_share_from_bytes(b"\xff" * 32 * 3 + bytes(16))
