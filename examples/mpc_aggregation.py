"""Multi-party aggregation: mutually-distrusting parties produce one
aggregated range proof via the dealer protocol, every message crossing the
party/dealer boundary as wire bytes (reference docs/aggregation-api.md;
the session-typed flow of src/range_proof/{party,dealer}.rs).

Also demonstrates misbehavior detection: a party proving a too-large value
is identified by index when the dealer audits shares.

Run: python examples/mpc_aggregation.py
"""

import os
import secrets
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bulletproofs_tpu import (BulletproofGens, PedersenGens, Transcript,
                              Scalar, MPCError)
from bulletproofs_tpu.range_proof_mpc import Dealer, Party
from bulletproofs_tpu.proofs import messages as M


class Rng:
    randbytes = staticmethod(secrets.token_bytes)


def run(values, n=32, label=b"mpc example"):
    rng = Rng()
    m = len(values)
    pc, bp = PedersenGens(), BulletproofGens(64, m)

    dealer = Dealer.new(bp, pc, Transcript(label), n, m)
    parties = [Party.new(bp, pc, v, Scalar.random(rng), n) for v in values]

    # round 1: bit commitments (serialized, as a networked run would)
    states, wire = zip(*[p.assign_position(j, rng)
                         for j, p in enumerate(parties)])
    bits = [M.bit_commitment_from_bytes(M.bit_commitment_to_bytes(b))
            for b in wire]
    dealer, bit_challenge = dealer.receive_bit_commitments(bits)

    # round 2: poly commitments
    states, polys = zip(*[s.apply_challenge(bit_challenge, rng)
                          for s in states])
    dealer, poly_challenge = dealer.receive_poly_commitments(list(polys))

    # round 3: shares -- the dealer verifies the assembled proof and, on
    # failure, audits each share to identify the misbehaving parties
    shares = [s.apply_challenge(poly_challenge) for s in states]
    proof = dealer.receive_shares(shares, rng)

    vcs = [b.V_j for b in bits]
    proof.verify_multiple(bp, pc, Transcript(label), vcs, n, rng=rng)
    return proof


def main():
    proof = run([101, 202, 303, 404])
    print(f"4-party aggregated proof: {len(proof.to_bytes())} bytes, verified")

    # a dishonest party: 64-bit value in a 32-bit proof
    try:
        run([1, 2, 1 << 40, 4])
        raise SystemExit("dishonest party was NOT detected")
    except MPCError as e:
        print(f"dishonest party detected: {e}")


if __name__ == "__main__":
    main()
