"""Round-4 profile: where does the 8192-batch fused verify spend its time?

Tiles ONE host-proved proof to `batch` copies (identical verification work,
same as proving them all) and breaks the fused sub-batch pipeline into
phases: host reorder, decompress dispatch (upload #1), C++ replay, tail
dispatch (upload #2), final sync.  Sweeps sub-batch sizes.

Run on TPU: python benches/_profile_verify_r4.py
"""

import os
import secrets
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class Rng:
    @staticmethod
    def randbytes(n):
        return secrets.token_bytes(n)


def main():
    import jax
    import jax.numpy as jnp
    from bulletproofs_tpu import (BulletproofGens, PedersenGens, RangeProof,
                                  Transcript, Scalar)
    from bulletproofs_tpu.parallel.batch_verify import BatchVerifier
    from bulletproofs_tpu.ops import verify_pallas

    rng = Rng()
    pc = PedersenGens()
    bp = BulletproofGens(64, 1)
    n, m = 64, 1
    batch = 8192

    # raw tunnel probes
    x = jnp.zeros((1,), jnp.int32)
    jax.device_get(x)
    t0 = time.time()
    for _ in range(5):
        jax.device_get(jnp.zeros((1,), jnp.int32) + 1)
    log(f"RTT (tiny roundtrip): {(time.time()-t0)/5*1000:.1f} ms")
    big = np.zeros((4 << 20,), np.uint8)
    t0 = time.time()
    a = jnp.asarray(big)
    a.block_until_ready()
    log(f"H2D 4MB (asarray+ready): {(time.time()-t0)*1000:.0f} ms -> "
        f"{4/ (time.time()-t0):.1f} MB/s")
    t0 = time.time()
    jax.device_get(a)
    log(f"D2H 4MB: {(time.time()-t0)*1000:.0f} ms")

    # one proof, tiled
    label = b"profile proof"
    t0 = time.time()
    proof, V = RangeProof.prove_single(bp, pc, Transcript(label),
                                       12345678901234567, Scalar.random(rng),
                                       64, rng=rng)
    log(f"one host prove: {time.time()-t0:.2f}s")
    proofs = [proof] * batch
    vcss = [[V]] * batch

    bv = BatchVerifier(bp, pc, n=n, m=m)

    lg = (n * m).bit_length() - 1
    n_dyn_per = 4 + 2 * lg + m
    plen = 32 * (9 + 2 * lg)

    proofs_blob, vcs_blob, dyn_pts_arr = bv._serialize(
        proofs, vcss, lg, n_dyn_per, plen)

    def run(step, phases=False, reps=1):
        best = None
        for _ in range(reps):
            transcripts = [Transcript(label) for _ in range(batch)]
            t_start = time.time()
            ph = dict(reorder=0.0, replay=0.0, dispatch=0.0)
            flags = []
            for lo in range(0, batch, step):
                hi = min(lo + step, batch)
                tt = transcripts[lo:hi]
                pb = proofs_blob[lo * plen: hi * plen]
                vb = vcs_blob[lo * 32 * m: hi * 32 * m]
                da = dyn_pts_arr[lo * n_dyn_per: hi * n_dyn_per]
                t0 = time.time()
                valid_dev, dyn_pts, blk, pair_arr = bv._prep_subbatch(
                    pb, vb, da, tt, rng, reorder=True)
                ph["replay"] += time.time() - t0
                t0 = time.time()
                flags.append(verify_pallas.fused_tail(
                    n, m, jnp.asarray(blk), jnp.asarray(pair_arr),
                    bv._static_dev, dyn_pts, valid_dev))
                ph["dispatch"] += time.time() - t0
            t0 = time.time()
            oks = jax.device_get(flags)
            sync = time.time() - t0
            total = time.time() - t_start
            assert all(bool(np.asarray(ok).reshape(-1)[0]) for ok in oks), oks
            if best is None or total < best[0]:
                best = (total, ph, sync)
        total, ph, sync = best
        log(f"  step {step:5d}: total {total*1000:7.1f} ms"
            f"  prep(replay+upload1) {ph['replay']*1000:7.1f}"
            f"  tail-dispatch(upload2) {ph['dispatch']*1000:7.1f}"
            f"  final-sync {sync*1000:7.1f}"
            f"  -> {batch/total:.0f}/s")
        return total

    # warm-up compiles at each step size we test
    log("warm-up (compiles)...")
    for step in (2048,):
        run(step)
    log("sweep (best of 3):")
    for step in (512, 1024, 2048, 4096, 8192):
        run(step, reps=3)

    # finer split of one 2048 sub-batch
    log("phase split at step=2048 (one sub-batch, sequenced with syncs):")
    tt = [Transcript(label) for _ in range(2048)]
    pb = proofs_blob[: 2048 * plen]
    vb = vcs_blob[: 2048 * 32 * m]
    da = dyn_pts_arr[: 2048 * n_dyn_per]
    from bulletproofs_tpu.ops import vec_curve as C
    from bulletproofs_tpu.ops.verify_pallas import BLKP
    import ctypes
    p_pad = -(-2048 // 256) * 256
    arr = np.zeros((p_pad, n_dyn_per, 32), np.uint8)
    arr[:2048] = da.reshape(2048, n_dyn_per, 32)
    raw = np.ascontiguousarray(
        arr.reshape(p_pad // BLKP, BLKP, n_dyn_per, 32)
        .transpose(0, 2, 1, 3)).reshape(-1, 32)
    t0 = time.time(); raw_dev = jnp.asarray(raw); raw_dev.block_until_ready()
    log(f"  upload dyn bytes ({raw.nbytes/1e6:.2f} MB): {(time.time()-t0)*1000:.1f} ms")
    t0 = time.time()
    valid_dev, dyn_pts = C.decompress_device(raw_dev)
    jax.block_until_ready((valid_dev, dyn_pts))
    log(f"  decompress (device, synced): {(time.time()-t0)*1000:.1f} ms")
    strobe_size = len(tt[0].strobe.buf.raw)
    strobes = ctypes.create_string_buffer(
        b"".join(t.strobe.buf.raw for t in tt), strobe_size * 2048)
    cr = rng.randbytes(128 * 2048)
    nblk = lg + 8          # compact challenge block
    blocks = ctypes.create_string_buffer(32 * nblk * 2048)
    pair = ctypes.create_string_buffer(64)
    from bulletproofs_tpu.parallel.batch_verify import _NATIVE_PREP
    t0 = time.time()
    rc = _NATIVE_PREP.rangeproof_verify_replay_batch_c(
        strobes, ctypes.c_size_t(strobe_size), pb, ctypes.c_size_t(plen), vb,
        ctypes.c_uint64(n), ctypes.c_uint64(m), ctypes.c_uint64(2048),
        cr, blocks, pair)
    log(f"  C++ replay 2048: {(time.time()-t0)*1000:.1f} ms (rc={rc})")
    blk = np.zeros((p_pad * nblk, 32), np.uint8)
    blk[: 2048 * nblk] = np.frombuffer(blocks.raw, np.uint8).reshape(-1, 32)
    pair_arr = np.frombuffer(pair.raw, np.uint8).reshape(2, 32)
    t0 = time.time(); blk_dev = jnp.asarray(blk); blk_dev.block_until_ready()
    log(f"  upload blk ({blk.nbytes/1e6:.2f} MB): {(time.time()-t0)*1000:.1f} ms")
    t0 = time.time()
    flag = verify_pallas.fused_tail(n, m, blk_dev, jnp.asarray(pair_arr),
                                    bv._static_dev, dyn_pts, valid_dev)
    jax.device_get(flag)
    log(f"  fused tail (device, synced): {(time.time()-t0)*1000:.1f} ms")


if __name__ == "__main__":
    main()
