"""Profile batched verification end-to-end using proofs cached by
benches/_mk_proofs.py.  Development tool, not part of the library."""
import pickle
import secrets
import sys
import time

sys.path.insert(0, "/root/repo")

from bulletproofs_tpu import BulletproofGens, PedersenGens, RangeProof, Transcript
from bulletproofs_tpu.parallel import BatchVerifier


class Rng:
    @staticmethod
    def randbytes(n):
        return secrets.token_bytes(n)


def main(batch=None, src="/tmp/bp_proofs.pkl"):
    with open(src, "rb") as f:
        data = pickle.load(f)
    n = data["n"]
    proofs = [RangeProof.from_bytes(b) for b in data["proof_bytes"]]
    vcss = [[v] for v in data["vcs"]]
    labels = data["labels"]
    if batch:
        proofs, vcss, labels = proofs[:batch], vcss[:batch], labels[:batch]
    batch = len(proofs)
    rng = Rng()
    pc, bp = PedersenGens(), BulletproofGens(n, 1)
    bv = BatchVerifier(bp, pc, n=n, m=1)

    t0 = time.time()
    bv.verify_batch(proofs, vcss, [Transcript(l) for l in labels], rng=rng)
    print(f"warm-up ({batch}): {time.time()-t0:.1f}s", flush=True)
    for _ in range(4):
        t0 = time.time()
        bv.verify_batch(proofs, vcss, [Transcript(l) for l in labels], rng=rng)
        dt = time.time() - t0
        print(f"verify {batch}: {dt*1000:.0f} ms -> {batch/dt:.0f} proofs/s",
              flush=True)


if __name__ == "__main__":
    main(*(int(a) if a.isdigit() else a for a in sys.argv[1:]))
