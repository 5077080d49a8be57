"""Serialized stage timing of the batch prover's device work: blocks after
every stage so per-stage device time is visible (totals exceed the
pipelined wall-clock).  Dev tool."""
import ctypes
import secrets
import sys
import time

sys.path.insert(0, "/root/repo")


class Rng:
    randbytes = staticmethod(secrets.token_bytes)


def main(batch=4096, n=64):
    import numpy as np
    import jax
    from bulletproofs_tpu import BulletproofGens, PedersenGens, Transcript, Scalar
    from bulletproofs_tpu.proofs import batch_prover as BPV
    from bulletproofs_tpu.ops import prover_stages as PS
    from bulletproofs_tpu.ops import fixed_msm as FM
    from bulletproofs_tpu.ops import vec_curve as C

    rng = Rng()
    pc, bp = PedersenGens(), BulletproofGens(n, 1)
    prover = BPV.BatchProver(bp, pc, n)
    vals = [int.from_bytes(secrets.token_bytes(n // 8), "little")
            for _ in range(batch)]
    blinds = [Scalar.random(rng) for _ in range(batch)]
    labels = [b"ps %d" % i for i in range(batch)]

    times = {}

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.time()
            r = fn(*a, **k)
            jax.block_until_ready(r)
            times[name] = times.get(name, 0) + time.time() - t0
            return r
        return wrap

    PS.stage0_fused = timed("stage0", PS.stage0_fused)
    PS.stage1_fused = timed("stage1", PS.stage1_fused)
    PS.stage2_fused = timed("stage2", PS.stage2_fused)
    PS.round_first_fused = timed("rounds", PS.round_first_fused)
    PS.roundk_fused = timed("rounds", PS.roundk_fused)
    PS.final_fused = timed("final", PS.final_fused)
    # leaf wrappers keep working for the non-fused (host-oracle) path
    FM.msm_digits = timed("msm", FM.msm_digits)
    C.compress_device = timed("compress", C.compress_device)

    def run():
        times.clear()
        t0 = time.time()
        prover.prove_batch(vals, blinds, [Transcript(l) for l in labels],
                           rng=rng)
        return time.time() - t0

    total = run()
    print(f"warm-up: {total:.1f}s", flush=True)
    for _ in range(2):
        total = run()
        acc = sum(times.values())
        parts = "  ".join(f"{k}:{v*1000:.0f}" for k, v in times.items())
        print(f"total {total*1000:.0f} ms (serialized) [{parts}] "
              f"device-sum:{acc*1000:.0f} host:{(total-acc)*1000:.0f}",
              flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
