"""One-off helper: prove a batch of 64-bit range proofs and cache them on
disk so perf-profiling runs skip the (slow) proving step.  Not part of the
library; used by benches/ profiling during development."""
import pickle
import secrets
import sys
import time

sys.path.insert(0, "/root/repo")

from bulletproofs_tpu import BulletproofGens, PedersenGens, Transcript, Scalar
from bulletproofs_tpu.proofs.batch_prover import BatchProver


class Rng:
    @staticmethod
    def randbytes(n):
        return secrets.token_bytes(n)


def main(batch=8192, n=64, out="/tmp/bp_proofs.pkl"):
    rng = Rng()
    pc, bp = PedersenGens(), BulletproofGens(n, 1)
    prover = BatchProver(bp, pc, n)
    vals = [int.from_bytes(secrets.token_bytes(8), "little") for _ in range(batch)]
    blinds = [Scalar.random(rng) for _ in range(batch)]
    labels = [b"bench proof %d" % i for i in range(batch)]
    t0 = time.time()
    proofs, vcs = prover.prove_batch(vals, blinds,
                                     [Transcript(l) for l in labels], rng=rng)
    print(f"proved {batch} in {time.time()-t0:.1f}s", flush=True)
    with open(out, "wb") as f:
        pickle.dump({"n": n,
                     "proof_bytes": [p.to_bytes() for p in proofs],
                     "vcs": vcs, "labels": labels}, f)
    print("saved", out, flush=True)


if __name__ == "__main__":
    main(*(int(a) if a.isdigit() else a for a in sys.argv[1:]))
