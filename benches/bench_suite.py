"""Benchmark sweeps mirroring the reference's criterion configuration
(SURVEY.md §6: benches/range_proof.rs, generators.rs, linear_proof.rs,
r1cs.rs).

Usage:
    python benches/bench_suite.py [rangeproof|generators|linear|r1cs|batch|msm]

Prints one human-readable line per config and writes JSON results to
benches/results.json.  Unlike bench.py (the driver's single-number bench),
this is the full sweep for tracking regressions.
"""

import json
import os
import secrets
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = []


class Rng:
    randbytes = staticmethod(secrets.token_bytes)


def record(name, config, seconds):
    RESULTS.append({"bench": name, "config": config, "seconds": seconds})
    print(f"{name:40s} {config:24s} {seconds*1e3:10.2f} ms")


def timeit(fn, reps=3):
    fn()  # warm-up
    t0 = time.time()
    for _ in range(reps):
        fn()
    return (time.time() - t0) / reps


def bench_rangeproof():
    """prove/verify n in {8..64} x m in {1,2,4,8,16,32}
    (reference benches/range_proof.rs:16)."""
    from bulletproofs_tpu import BulletproofGens, PedersenGens, RangeProof, Transcript, Scalar
    rng = Rng()
    pc = PedersenGens()
    bp = BulletproofGens(64, 32)
    for n in (8, 16, 32, 64):
        for m in (1, 2, 4, 8, 16, 32):
            values = [secrets.randbelow(2 ** n) for _ in range(m)]
            blindings = [Scalar.random(rng) for _ in range(m)]

            def prove():
                t = Transcript(b"AggregateRangeProofBenchmark")
                return RangeProof.prove_multiple(bp, pc, t, values, blindings, n, rng=rng)

            dt = timeit(prove, reps=1)
            record("aggregated rangeproof creation", f"n={n} m={m}", dt)

            proof, vcs = prove()

            def verify():
                t = Transcript(b"AggregateRangeProofBenchmark")
                proof.verify_multiple(bp, pc, t, vcs, n, rng=rng)

            dt = timeit(verify, reps=1)
            record("aggregated rangeproof verification", f"n={n} m={m}", dt)


def bench_generators():
    """BulletproofGens sizes (reference benches/generators.rs:7-17)."""
    from bulletproofs_tpu import BulletproofGens, PedersenGens
    for size in (2, 64, 256, 1024):
        dt = timeit(lambda: BulletproofGens(size, 1), reps=1)
        record("bp_gens", f"size={size}", dt)
    dt = timeit(lambda: PedersenGens(), reps=3)
    record("pc_gens", "", dt)


def bench_linear():
    """LinearProof n in {64..1024} (reference benches/linear_proof.rs:22)."""
    from bulletproofs_tpu import BulletproofGens, PedersenGens, Transcript, Scalar, LinearProof
    from bulletproofs_tpu.core.ristretto import multiscalar_mul
    from bulletproofs_tpu.utils.util import inner_product
    rng = Rng()
    pc = PedersenGens()
    for n in (64, 128, 256, 512, 1024):
        bp = BulletproofGens(n, 1)
        G = bp.share(0).G(n)
        a = [Scalar.random(rng) for _ in range(n)]
        b = [Scalar.random(rng) for _ in range(n)]
        r = Scalar.random(rng)
        c = inner_product(a, b)
        C = multiscalar_mul(a + [r, c], G + [pc.B_blinding, pc.B]).compress()

        def prove():
            return LinearProof.create(Transcript(b"linear proof"), rng, C, r,
                                      list(a), list(b), list(G), pc.B, pc.B_blinding)

        dt = timeit(prove, reps=1)
        record("linear proof creation", f"n={n}", dt)
        proof = prove()

        def verify():
            proof.verify(Transcript(b"linear proof"), C, G, pc.B, pc.B_blinding, list(b))

        dt = timeit(verify, reps=1)
        record("linear proof verification", f"n={n}", dt)


def bench_linear_batch():
    """Batched linear-proof verification: host accumulation path vs the
    device route (compressed dyn upload + device decompress + fused MSM,
    proofs/linear._device_linear_check).  One proof tiled (identical
    verification work per proof)."""
    from bulletproofs_tpu import (BulletproofGens, PedersenGens, Transcript,
                                  Scalar, LinearProof)
    from bulletproofs_tpu.core.ristretto import multiscalar_mul
    from bulletproofs_tpu.utils.util import inner_product
    from bulletproofs_tpu.ops.vec_msm import on_tpu
    rng = Rng()
    pc = PedersenGens()
    for n, count in ((128, 256), (1024, 64)):
        bp = BulletproofGens(n, 1)
        G = bp.share(0).G(n)
        a = [Scalar.random(rng) for _ in range(n)]
        b = [Scalar.random(rng) for _ in range(n)]
        r = Scalar.random(rng)
        C = multiscalar_mul(a + [r, inner_product(a, b)],
                            G + [pc.B_blinding, pc.B]).compress()
        proof = LinearProof.create(Transcript(b"lb"), rng, C, r, list(a),
                                   list(b), list(G), pc.B, pc.B_blinding)

        def batch(device):
            LinearProof.batch_verify(
                [(proof, Transcript(b"lb"), C, list(b))
                 for _ in range(count)],
                G, pc.B, pc.B_blinding, rng=rng, device=device)

        dt = timeit(lambda: batch(False), reps=1)
        record("linear batch verify (host msm)", f"n={n} x{count}", dt)
        if on_tpu():
            batch(True)   # warm-up (compiles)
            dt = timeit(lambda: batch(True), reps=3)
            record("linear batch verify (device)", f"n={n} x{count}", dt)


def bench_r1cs():
    """k-shuffle prove/verify (reference benches/r1cs.rs:162-260)."""
    import random
    from bulletproofs_tpu import BulletproofGens, PedersenGens, Transcript, Scalar
    from bulletproofs_tpu.proofs.r1cs import Prover, Verifier
    from bulletproofs_tpu.core.scalar import L
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_r1cs import shuffle_gadget
    rng = Rng()
    pc = PedersenGens()
    for k in (8, 64, 256, 1024):
        bp = BulletproofGens(2 * k, 1)
        rr = random.Random(k)
        inputs = [Scalar(rr.randrange(L)) for _ in range(k)]
        outputs = list(inputs)
        rr.shuffle(outputs)

        def prove():
            t = Transcript(b"ShuffleProofBench")
            p = Prover(pc, t)
            in_pairs = [p.commit(v, Scalar.random(rng)) for v in inputs]
            out_pairs = [p.commit(v, Scalar.random(rng)) for v in outputs]
            shuffle_gadget(p, [v for _, v in in_pairs], [v for _, v in out_pairs])
            return p.prove(bp, rng=rng), [c for c, _ in in_pairs], [c for c, _ in out_pairs]

        dt = timeit(prove, reps=1)
        record("k-shuffle proof creation", f"k={k}", dt)
        proof, ins, outs = prove()

        def verify():
            t = Transcript(b"ShuffleProofBench")
            v = Verifier(t)
            iv = [v.commit(c) for c in ins]
            ov = [v.commit(c) for c in outs]
            shuffle_gadget(v, iv, ov)
            v.verify(proof, pc, bp, rng=rng)

        dt = timeit(verify, reps=1)
        record("k-shuffle proof verification", f"k={k}", dt)

    # batched R1CS verification: many k=64 shuffles in one mega-MSM
    from bulletproofs_tpu.proofs.r1cs import batch_verify
    k = 64
    bp = BulletproofGens(2 * k, 1)
    rr = random.Random(7)
    inputs = [Scalar(rr.randrange(L)) for _ in range(k)]
    outputs = list(inputs)
    rr.shuffle(outputs)
    p = Prover(pc, Transcript(b"ShuffleBatchBench"))
    in_pairs = [p.commit(v, Scalar.random(rng)) for v in inputs]
    out_pairs = [p.commit(v, Scalar.random(rng)) for v in outputs]
    shuffle_gadget(p, [v for _, v in in_pairs], [v for _, v in out_pairs])
    proof = p.prove(bp, rng=rng)
    ins, outs = [c for c, _ in in_pairs], [c for c, _ in out_pairs]

    def fresh_verifier():
        v = Verifier(Transcript(b"ShuffleBatchBench"))
        iv = [v.commit(c) for c in ins]
        ov = [v.commit(c) for c in outs]
        shuffle_gadget(v, iv, ov)
        return v

    for batch in (16, 64):
        def run():
            batch_verify([(fresh_verifier(), proof) for _ in range(batch)],
                         pc, bp, rng=rng)
        dt = timeit(run, reps=1)
        record("r1cs batch verification", f"batch={batch} k={k}", dt)
        record("r1cs batch verification rate", f"batch={batch}",
               1.0 / (batch / dt))


def bench_r1cs_scale():
    """k-shuffle at 2^15 (~2^16 multipliers): BASELINE.json configs[4] /
    SURVEY.md §7 step 11.  Heavy (~1 min); run explicitly."""
    import random
    from bulletproofs_tpu import BulletproofGens, PedersenGens, Transcript, Scalar
    from bulletproofs_tpu.proofs.r1cs import Prover, Verifier
    from bulletproofs_tpu.core.scalar import L
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_r1cs import shuffle_gadget
    rng = Rng()
    pc = PedersenGens()
    k = 1 << 15
    bp = BulletproofGens(1 << 16, 1)
    rr = random.Random(k)
    inputs = [Scalar(rr.randrange(L)) for _ in range(k)]
    outputs = list(inputs)
    rr.shuffle(outputs)

    t0 = time.time()
    p = Prover(pc, Transcript(b"ShuffleScaleBench"))
    blinds = [Scalar.random(rng) for _ in range(2 * k)]
    pairs = p.commit_many(inputs + outputs, blinds)
    in_pairs, out_pairs = pairs[:k], pairs[k:]
    shuffle_gadget(p, [v for _, v in in_pairs], [v for _, v in out_pairs])
    proof = p.prove(bp, rng=rng)
    record("k-shuffle proof creation", f"k=2^15 (incl. gadget)",
           time.time() - t0)
    ins, outs = [c for c, _ in in_pairs], [c for c, _ in out_pairs]

    t0 = time.time()
    v = Verifier(Transcript(b"ShuffleScaleBench"))
    iv = v.commit_many(ins)
    ov = v.commit_many(outs)
    shuffle_gadget(v, iv, ov)
    v.verify(proof, pc, bp, rng=rng)
    record("k-shuffle proof verification", f"k=2^15", time.time() - t0)

    # warm repeat: on TPU the mega-MSM routes to the device kernel with the
    # [G | H] tensor already cached device-resident (the steady-state rate)
    t0 = time.time()
    v = Verifier(Transcript(b"ShuffleScaleBench"))
    iv = v.commit_many(ins)
    ov = v.commit_many(outs)
    shuffle_gadget(v, iv, ov)
    v.verify(proof, pc, bp, rng=rng)
    record("k-shuffle proof verification", f"k=2^15 warm", time.time() - t0)


def bench_batch():
    """Fused batched verification (the TPU-native headline config)."""
    from bulletproofs_tpu import BulletproofGens, PedersenGens, RangeProof, Transcript, Scalar
    from bulletproofs_tpu.parallel import BatchVerifier
    rng = Rng()
    pc = PedersenGens()
    bp = BulletproofGens(64, 1)
    t = Transcript(b"batch")
    proof, vcs = RangeProof.prove_multiple(bp, pc, t, [7], [Scalar.random(rng)], 64, rng=rng)
    bv = BatchVerifier(bp, pc, 64, 1)
    for batch in (64, 256, 1024):
        def run():
            bv.verify_batch([proof] * batch, [vcs] * batch,
                            [Transcript(b"batch") for _ in range(batch)], rng=rng)
        dt = timeit(run, reps=2)
        record("fused batch verification", f"batch={batch} n=64", dt)
        record("fused batch verification rate", f"batch={batch}",
               1.0 / (batch / dt))

    # aggregated batches (m = 2, 4): nm > 64 routes to the chunked
    # C++-emit pipeline unless settings.fused_verify_max_nm is raised --
    # bench both to quantify the gate (VERDICT r3 item 8; decision in
    # docs/kernels.md)
    from bulletproofs_tpu.config import settings
    from bulletproofs_tpu.ops.vec_msm import on_tpu
    for m in (2, 4):
        bpm = BulletproofGens(64, m)
        tm = Transcript(b"batchm")
        pm, vcm = RangeProof.prove_multiple(
            bpm, pc, tm, list(range(7, 7 + m)),
            [Scalar.random(rng) for _ in range(m)], 64, rng=rng)
        bvm = BatchVerifier(bpm, pc, 64, m)
        batch = 256
        def runm():
            bvm.verify_batch([pm] * batch, [vcm] * batch,
                             [Transcript(b"batchm") for _ in range(batch)],
                             rng=rng)
        dt = timeit(runm, reps=2)
        record("aggregated batch verification (chunked)",
               f"m={m} batch={batch}", dt)
        if on_tpu():
            old = settings.fused_verify_max_nm
            settings.fused_verify_max_nm = 64 * m
            try:
                runm()    # warm-up (compiles the nm>64 emit kernel)
                dt = timeit(runm, reps=2)
                record("aggregated batch verification (fused)",
                       f"m={m} batch={batch}", dt)
            except Exception as e:
                record("aggregated batch verification (fused FAILED: %s)"
                       % type(e).__name__, f"m={m} batch={batch}", -1.0)
            finally:
                settings.fused_verify_max_nm = old


def bench_batch_prove():
    """TPU batch prover throughput (the fast proving path; the per-proof
    times in bench_rangeproof use the slow host-oracle path and measure
    LATENCY, not throughput)."""
    from bulletproofs_tpu import BulletproofGens, PedersenGens, Transcript, Scalar
    from bulletproofs_tpu.proofs.batch_prover import BatchProver
    rng = Rng()
    pc = PedersenGens()
    bp = BulletproofGens(64, 1)
    prover = BatchProver(bp, pc, 64)
    for batch in (1024, 4096):
        vals = [secrets.randbelow(2 ** 64) for _ in range(batch)]
        blinds = [Scalar.random(rng) for _ in range(batch)]

        def run():
            prover.prove_batch(vals, blinds,
                               [Transcript(b"bp %d" % i) for i in range(batch)],
                               rng=rng)
        dt = timeit(run, reps=1)
        record("batch prove", f"batch={batch} n=64", dt)
        record("batch prove rate", f"batch={batch}", 1.0 / (batch / dt))

    # aggregated statements through the same pipeline (m values per proof);
    # m=16 is BASELINE.json configs[2] (BulletproofGens(64, 16))
    for m, batch in ((8, 256), (16, 256)):
        bp_m = BulletproofGens(64, m)
        prover_m = BatchProver(bp_m, pc, 64, m=m)
        vals = [[secrets.randbelow(2 ** 64) for _ in range(m)]
                for _ in range(batch)]
        blinds = [[Scalar.random(rng) for _ in range(m)]
                  for _ in range(batch)]

        def run_agg(pm=prover_m, v=vals, b=blinds, bt=batch):
            pm.prove_batch(v, b,
                           [Transcript(b"abp %d" % i) for i in range(bt)],
                           rng=rng)
        dt = timeit(run_agg, reps=1)
        record("aggregated batch prove", f"batch={batch} n=64 m={m}", dt)
        record("aggregated batch prove rate (proofs)",
               f"batch={batch} m={m}", 1.0 / (batch / dt))
        record("aggregated batch prove rate (values)",
               f"batch={batch} m={m}", 1.0 / (batch * m / dt))


def bench_msm():
    """Raw MSM points/s (the north-star kernel metric)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from bulletproofs_tpu.ops import vec_curve as C
    from bulletproofs_tpu.ops import vec_msm
    for logn in (12, 16):
        N = 1 << logn
        raw = np.frombuffer(secrets.token_bytes(64 * N), np.uint8).reshape(N, 64)
        pts = C.from_uniform_bytes(raw)
        sbytes = vec_msm.scalars_to_bytes(
            [int.from_bytes(secrets.token_bytes(31), "little") for _ in range(N)])
        def run():
            jax.device_get(vec_msm.msm_lanes_auto(pts, sbytes))
        dt = timeit(run, reps=3)
        record("msm", f"2^{logn}", dt)


ALL = {"rangeproof": bench_rangeproof, "generators": bench_generators,
       "linear": bench_linear, "linear_batch": bench_linear_batch,
       "r1cs": bench_r1cs,
       "r1cs_scale": bench_r1cs_scale, "batch": bench_batch,
       "batch_prove": bench_batch_prove, "msm": bench_msm}


def _flush_results():
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.json")
    merged = {}
    if os.path.exists(out):
        with open(out) as f:
            for r in json.load(f):
                merged[(r["bench"], r["config"])] = r
    for r in RESULTS:
        merged[(r["bench"], r["config"])] = r
    with open(out, "w") as f:
        json.dump(list(merged.values()), f, indent=1)
    return out


if __name__ == "__main__":
    which = sys.argv[1:] or ["generators", "rangeproof", "linear", "r1cs"]
    for name in which:
        # flush after every section so a mid-sweep failure keeps data
        try:
            ALL[name]()
        finally:
            out = _flush_results()
    print("wrote", out)
