"""Stage-level profiling of the batch prover on TPU.  Dev tool."""
import secrets
import sys
import time

sys.path.insert(0, "/root/repo")


class Rng:
    randbytes = staticmethod(secrets.token_bytes)


def main(batch=4096, n=64):
    import ctypes
    import numpy as np
    import jax
    import jax.numpy as jnp
    from bulletproofs_tpu import BulletproofGens, PedersenGens, Transcript, Scalar
    from bulletproofs_tpu.proofs import batch_prover as BPV

    rng = Rng()
    pc, bp = PedersenGens(), BulletproofGens(n, 1)
    prover = BPV.BatchProver(bp, pc, n)
    vals = [int.from_bytes(secrets.token_bytes(n // 8), "little") for _ in range(batch)]
    blinds = [Scalar.random(rng) for _ in range(batch)]
    labels = [b"pp %d" % i for i in range(batch)]

    # instrument by monkeypatching time around the native calls + device fetches
    import bulletproofs_tpu.ops.vec_curve as C
    import bulletproofs_tpu.ops.fixed_msm as FM
    times = {}
    orig_compress = C.compress_to_bytes
    orig_msm = FM.msm_digits

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.time()
            r = fn(*a, **k)
            times[name] = times.get(name, 0) + time.time() - t0
            return r
        return wrap

    C.compress_to_bytes = timed("compress+fetch", orig_compress)
    FM.msm_digits = timed("msm dispatch", orig_msm)

    def run():
        times.clear()
        t0 = time.time()
        proofs, vcs = prover.prove_batch(
            vals, blinds, [Transcript(l) for l in labels], rng=rng)
        total = time.time() - t0
        return total, dict(times)

    total, ts = run()
    print(f"warm-up: {total:.1f}s", flush=True)
    for _ in range(3):
        total, ts = run()
        other = total - sum(ts.values())
        parts = "  ".join(f"{k}:{v*1000:.0f}" for k, v in ts.items())
        print(f"total {total*1000:.0f} ms -> {batch/total:.0f} proofs/s "
              f"[{parts}  other:{other*1000:.0f}]", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
