"""Stage-level profiling of the batched-verification pipeline on TPU:
device decompression vs dynamic MSM vs host C++ prep.  Dev tool."""
import ctypes
import pickle
import secrets
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bulletproofs_tpu import BulletproofGens, PedersenGens, RangeProof, Transcript
from bulletproofs_tpu.parallel import batch_verify as BV
from bulletproofs_tpu.ops import msm_pallas, vec_curve as C


class Rng:
    randbytes = staticmethod(secrets.token_bytes)


def bench(label, fn, reps=5):
    fn()  # warm
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out) if hasattr(out, "block_until_ready") or isinstance(out, (tuple, list)) else None
    dt = (time.time() - t0) / reps
    print(f"{label:46s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main(batch=4096):
    with open("/tmp/bp_proofs.pkl", "rb") as f:
        data = pickle.load(f)
    n, m = data["n"], 1
    proofs = [RangeProof.from_bytes(b) for b in data["proof_bytes"][:batch]]
    vcss = [[v] for v in data["vcs"][:batch]]
    labels = data["labels"][:batch]
    rng = Rng()
    pc, bp = PedersenGens(), BulletproofGens(n, 1)
    bv = BV.BatchVerifier(bp, pc, n=n, m=m)

    nm = n * m
    lg = nm.bit_length() - 1
    n_dyn_per = 4 + 2 * lg + m
    chunk_proofs = max(1, bv._CHUNK_PTS // n_dyn_per)
    chunk_pts = BV._pad_quantum(min(chunk_proofs, batch) * n_dyn_per)
    n_chunks = -(-batch // chunk_proofs)
    print(f"batch={batch} n_dyn_per={n_dyn_per} chunk_proofs={chunk_proofs} "
          f"chunk_pts={chunk_pts} n_chunks={n_chunks}", flush=True)

    # ---- device: decompression of one chunk
    raw = np.frombuffer(b"".join(p.to_bytes()[:128] for p in proofs),
                        np.uint8).reshape(-1, 32)[:chunk_pts]
    if raw.shape[0] < chunk_pts:
        raw = np.concatenate([raw, np.zeros((chunk_pts - raw.shape[0], 32), np.uint8)])
    rawj = jnp.asarray(raw)

    def d():
        v, p = C.decompress_device(rawj)
        jax.block_until_ready(p)
        return p
    t_dec = bench(f"decompress {chunk_pts} pts", d)

    # ---- device: dynamic MSM of one chunk
    _, pts = C.decompress_device(rawj)
    pts = jax.block_until_ready(pts)
    sb = np.zeros((chunk_pts, 33), np.uint8)
    sb[:, :31] = np.frombuffer(secrets.token_bytes(31 * chunk_pts),
                               np.uint8).reshape(-1, 31)

    def mm():
        r = msm_pallas.msm_lanes(pts, sb)
        jax.block_until_ready(r)
        return r
    t_msm = bench(f"pallas MSM {chunk_pts} pts", mm)

    # ---- host: C++ prep of one chunk
    cnt = chunk_proofs
    plen = 32 * (9 + 2 * lg)
    proofs_blob = b"".join(p.to_bytes() for p in proofs[:cnt])
    vcs_blob = b"".join(vcss[i][0] for i in range(cnt))
    strobe_size = len(Transcript(b"x").strobe.buf.raw)
    tss = [Transcript(l) for l in labels[:cnt]]
    static_buf = ctypes.create_string_buffer(32 * bv._num_static)

    def prep():
        strobes = ctypes.create_string_buffer(
            b"".join(t.strobe.buf.raw for t in tss), strobe_size * cnt)
        cr = rng.randbytes(128 * cnt)
        dyn_out = ctypes.create_string_buffer(32 * n_dyn_per * cnt)
        rc = BV._NATIVE_PREP.rangeproof_verify_prep_batch(
            strobes, ctypes.c_size_t(strobe_size),
            proofs_blob, ctypes.c_size_t(plen), vcs_blob,
            ctypes.c_uint64(n), ctypes.c_uint64(m), ctypes.c_uint64(cnt),
            cr, dyn_out, static_buf)
        assert rc == 0
        return None
    t_prep = bench(f"C++ prep {cnt} proofs", prep)

    # ---- host: serialization / numpy shuffling for one chunk
    def ser():
        pb = [p.to_bytes() for p in proofs[:cnt]]
        blob = b"".join(pb)
        parr = np.frombuffer(blob, np.uint8).reshape(cnt, plen)
        lr = parr[:, 224: 224 + 64 * lg].reshape(cnt, lg, 2, 32)
        varr = np.frombuffer(vcs_blob, np.uint8).reshape(cnt, m, 32)
        return np.concatenate(
            [parr[:, :128].reshape(cnt, 4, 32), lr[:, :, 0], lr[:, :, 1], varr],
            axis=1).reshape(cnt * n_dyn_per, 32)
    t_ser = bench(f"host serialize {cnt} proofs", ser)

    per_chunk_device = t_dec + t_msm
    per_chunk_host = t_prep + t_ser
    print(f"\nper chunk: device {per_chunk_device*1e3:.1f} ms  "
          f"host {per_chunk_host*1e3:.1f} ms  "
          f"bound: {'device' if per_chunk_device > per_chunk_host else 'host'}")
    est = n_chunks * max(per_chunk_device, per_chunk_host)
    print(f"pipeline estimate {batch}: {est*1e3:.0f} ms -> {batch/est:.0f} proofs/s")

    # ---- end-to-end
    def e2e():
        bv.verify_batch(proofs, vcss, [Transcript(l) for l in labels], rng=rng)
    t = bench(f"end-to-end verify_batch {batch}", e2e, reps=3)
    print(f"-> {batch/t:.0f} proofs/s")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
