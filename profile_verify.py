"""Break down batched-verification time on the v2/v3 path."""
import secrets, sys, time
import numpy as np


class Rng:
    @staticmethod
    def randbytes(n):
        return secrets.token_bytes(n)


def main():
    import jax
    import jax.numpy as jnp
    from bulletproofs_tpu import (BulletproofGens, PedersenGens, RangeProof,
                                  Transcript, Scalar)
    from bulletproofs_tpu.parallel import BatchVerifier
    from bulletproofs_tpu.ops import vec_curve as C
    from bulletproofs_tpu.ops import vec_msm

    pc = PedersenGens(); bp = BulletproofGens(64, 1)
    n, n_distinct, batch = 64, 4, 512
    rng = Rng()
    proofs, vcss, labels = [], [], []
    t0 = time.time()
    for i in range(n_distinct):
        label = b"bench proof %d" % i
        t = Transcript(label)
        p, vcs = RangeProof.prove_multiple(
            bp, pc, t, [int.from_bytes(secrets.token_bytes(8), "little")],
            [Scalar.random(rng)], n, rng=rng)
        proofs.append(p); vcss.append(vcs); labels.append(label)
    print(f"prove {n_distinct}: {time.time()-t0:.1f}s", flush=True)

    reps = batch // n_distinct
    all_p, all_v, all_l = proofs * reps, vcss * reps, labels * reps
    bv = BatchVerifier(bp, pc, n=n, m=1)

    def run(tag):
        ts = {}
        t0 = time.time()
        dyn_blob, static_acc, dyn_bytes = bv._prep_native(
            all_p, all_v, [Transcript(l) for l in all_l], rng)
        dyn_scalars = np.frombuffer(dyn_blob, np.uint8).reshape(-1, 32)
        ts["prep_native"] = time.time() - t0

        t0 = time.time()
        n_dyn = len(dyn_bytes)
        padded = -(-n_dyn // 4096) * 4096 if n_dyn > 2048 else 1 << max(0, (n_dyn-1)).bit_length()
        dyn_bytes2 = list(dyn_bytes) + [bytes(32)] * (padded - n_dyn)
        raw = np.frombuffer(b"".join(dyn_bytes2), np.uint8).reshape(-1, 32)
        ts["pad_pack"] = time.time() - t0

        t0 = time.time()
        valid, dyn_pts = C.decompress_bytes(raw)
        dyn_pts.block_until_ready()
        ts["decompress"] = time.time() - t0
        assert valid.all()

        t0 = time.time()
        all_points = jnp.concatenate([dyn_pts, bv._static_dev], axis=-1)
        sbytes = np.zeros((padded + bv._num_static, 33), np.uint8)
        sbytes[:n_dyn, :32] = dyn_scalars
        sbytes[padded:, :32] = np.frombuffer(
            b"".join(int(s).to_bytes(32, "little") for s in static_acc),
            np.uint8).reshape(-1, 32)
        ts["concat"] = time.time() - t0

        t0 = time.time()
        result = vec_msm.msm_lanes_auto(all_points, sbytes)
        np.asarray(jax.device_get(result))
        ts["msm"] = time.time() - t0

        t0 = time.time()
        ok = bool(np.asarray(jax.device_get(C._is_identity_jit(result)))[0])
        ts["ident_check"] = time.time() - t0
        assert ok
        tot = sum(ts.values())
        print(f"[{tag}] total {tot*1e3:.0f} ms  " +
              "  ".join(f"{k}={v*1e3:.0f}" for k, v in ts.items()),
              f" n_dyn={padded} n_static={bv._num_static}", flush=True)

    run("warmup")
    for i in range(4):
        run(f"hot{i}")


main()
