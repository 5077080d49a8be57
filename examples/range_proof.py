"""Single and aggregated range proofs (reference README.md:93-147 and
docs/aggregation-api.md).

Run: python examples/range_proof.py
"""

import os
import secrets
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bulletproofs_tpu import (BulletproofGens, PedersenGens, RangeProof,
                              Transcript, Scalar)


class Rng:
    randbytes = staticmethod(secrets.token_bytes)


def main():
    rng = Rng()
    pc_gens = PedersenGens()
    bp_gens = BulletproofGens(64, 16)

    # -- single 32-bit proof ------------------------------------------------
    secret_value = 1037578891
    blinding = Scalar.random(rng)
    proof, committed_value = RangeProof.prove_single(
        bp_gens, pc_gens, Transcript(b"doctest example"),
        secret_value, blinding, 32, rng=rng)
    proof.verify_single(bp_gens, pc_gens, Transcript(b"doctest example"),
                        committed_value, 32, rng=rng)
    print(f"single 32-bit proof: {len(proof.to_bytes())} bytes, verified")

    # -- aggregated proof: 16 values in one proof ---------------------------
    values = [secrets.randbelow(1 << 32) for _ in range(16)]
    blindings = [Scalar.random(rng) for _ in range(16)]
    proof, vcs = RangeProof.prove_multiple(
        bp_gens, pc_gens, Transcript(b"aggregated"), values, blindings, 32,
        rng=rng)
    proof.verify_multiple(bp_gens, pc_gens, Transcript(b"aggregated"),
                          vcs, 32, rng=rng)
    print(f"aggregated 16x32-bit proof: {len(proof.to_bytes())} bytes "
          f"(vs {16 * 608} for 16 single proofs), verified")

    # -- wire roundtrip ------------------------------------------------------
    proof2 = RangeProof.from_bytes(proof.to_bytes())
    proof2.verify_multiple(bp_gens, pc_gens, Transcript(b"aggregated"),
                           vcs, 32, rng=rng)
    print("wire roundtrip verified (byte format identical to the Rust crate)")


if __name__ == "__main__":
    main()
