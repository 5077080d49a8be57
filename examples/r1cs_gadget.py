"""Building a custom constraint-system proof with the R1CS API.

Worked example mirroring the reference's R1CS walkthrough
(/root/reference/docs/r1cs-docs-example.md): a ShuffleProof gadget proving
that one list of committed values is a permutation of another, without
revealing the permutation.  It exercises the full gadget-building surface:

- `commit` for high-level witness variables (Pedersen commitments),
- `multiply` / `constrain` over the `LinearCombination` algebra,
- the TWO-PHASE protocol: `specify_randomized_constraints` defers gadget
  construction until after the prover commits, so the gadget can consume a
  Fiat-Shamir `challenge_scalar` soundly,
- one gadget function shared verbatim between prover and verifier (the
  constraint system is the same; only assignments differ).

The permutation argument: lists x and y are equal as multisets iff the
polynomials prod_i (x_i - z) and prod_i (y_i - z) agree at a random z.
The gadget chains k-1 multipliers per side and constrains the two roots
to be equal.

Run: python examples/r1cs_gadget.py [k]
"""

import os
import random
import secrets
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bulletproofs_tpu import (BulletproofGens, PedersenGens, Transcript,
                              Scalar)
from bulletproofs_tpu.core.scalar import L
from bulletproofs_tpu.errors import R1CSError
from bulletproofs_tpu.proofs.r1cs import Prover, Verifier


class Rng:
    randbytes = staticmethod(secrets.token_bytes)


def shuffle_gadget(cs, x, y):
    """Constrain y to be a permutation of x.  Works on any
    ConstraintSystem: the prover passes one holding assignments, the
    verifier one holding only the structure."""
    assert len(x) == len(y)
    k = len(x)
    if k == 1:
        cs.constrain(y[0] - x[0])
        return

    def randomized(cs2):
        # drawn AFTER the input/output commitments entered the transcript,
        # so the prover cannot grind the permutation against it
        z = cs2.challenge_scalar(b"shuffle challenge")
        _, _, acc_x = cs2.multiply(x[k - 1] - z, x[k - 2] - z)
        for i in range(k - 3, -1, -1):
            _, _, acc_x = cs2.multiply(acc_x, x[i] - z)
        _, _, acc_y = cs2.multiply(y[k - 1] - z, y[k - 2] - z)
        for i in range(k - 3, -1, -1):
            _, _, acc_y = cs2.multiply(acc_y, y[i] - z)
        cs2.constrain(acc_x - acc_y)

    cs.specify_randomized_constraints(randomized)


def prove_shuffle(pc_gens, bp_gens, inputs, outputs, rng):
    """Returns (proof, input_commitments, output_commitments)."""
    prover = Prover(pc_gens, Transcript(b"ShuffleProofExample"))
    in_pairs = [prover.commit(v, Scalar.random(rng)) for v in inputs]
    out_pairs = [prover.commit(v, Scalar.random(rng)) for v in outputs]
    shuffle_gadget(prover,
                   [var for _, var in in_pairs],
                   [var for _, var in out_pairs])
    proof = prover.prove(bp_gens, rng=rng)
    return (proof,
            [com for com, _ in in_pairs],
            [com for com, _ in out_pairs])


def verify_shuffle(pc_gens, bp_gens, proof, in_coms, out_coms, rng):
    verifier = Verifier(Transcript(b"ShuffleProofExample"))
    in_vars = [verifier.commit(c) for c in in_coms]
    out_vars = [verifier.commit(c) for c in out_coms]
    shuffle_gadget(verifier, in_vars, out_vars)
    verifier.verify(proof, pc_gens, bp_gens, rng=rng)


def main(k=8):
    rng = Rng()
    pc_gens = PedersenGens()
    # 2*(k-1) multipliers, padded to the next power of two
    bp_gens = BulletproofGens(max(2 * k, 2), 1)

    rr = random.Random()
    inputs = [Scalar(rr.randrange(L)) for _ in range(k)]
    outputs = list(inputs)
    rr.shuffle(outputs)

    proof, in_coms, out_coms = prove_shuffle(
        pc_gens, bp_gens, inputs, outputs, rng)
    print(f"k={k} shuffle proof: {len(proof.to_bytes())} bytes")

    verify_shuffle(pc_gens, bp_gens, proof, in_coms, out_coms, rng)
    print("verified: committed outputs are a permutation of the inputs")

    # a non-permutation must fail
    bad = list(inputs)
    bad[0] = bad[0] + Scalar.one()
    proof2, in2, out2 = prove_shuffle(pc_gens, bp_gens, inputs, bad, rng)
    try:
        verify_shuffle(pc_gens, bp_gens, proof2, in2, out2, rng)
    except R1CSError as e:
        print(f"tampered outputs rejected: {e}")
    else:
        raise SystemExit("tampered shuffle unexpectedly verified")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
