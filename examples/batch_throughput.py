"""High-throughput batched proving and verification (the TPU-native paths;
they also run on CPU via the native host backend / interpret fallbacks).

Run: python examples/batch_throughput.py [batch]
"""

import os
import secrets
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bulletproofs_tpu import (BulletproofGens, PedersenGens, Transcript,
                              Scalar)
from bulletproofs_tpu.parallel import BatchVerifier
from bulletproofs_tpu.proofs.batch_prover import BatchProver


class Rng:
    randbytes = staticmethod(secrets.token_bytes)


def main(batch=256):
    rng = Rng()
    n = 64
    pc, bp = PedersenGens(), BulletproofGens(n, 1)

    prover = BatchProver(bp, pc, n)
    values = [secrets.randbelow(1 << n) for _ in range(batch)]
    blindings = [Scalar.random(rng) for _ in range(batch)]
    labels = [b"batch %d" % i for i in range(batch)]

    t0 = time.time()
    proofs, vcs = prover.prove_batch(values, blindings,
                                     [Transcript(l) for l in labels], rng=rng)
    dt = time.time() - t0
    print(f"proved {batch} x {n}-bit proofs in {dt:.2f}s "
          f"({batch / dt:.0f} proofs/s)")

    bv = BatchVerifier(bp, pc, n=n, m=1)
    t0 = time.time()
    bv.verify_batch(proofs, [[vc] for vc in vcs],
                    [Transcript(l) for l in labels], rng=rng)
    dt = time.time() - t0
    print(f"verified all {batch} in ONE fused MSM in {dt * 1e3:.0f} ms "
          f"({batch / dt:.0f} proofs/s)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
