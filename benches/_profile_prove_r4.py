"""Round-4 prove-side profile: where do the 406 us/proof go?

The fixed-base accumulation kernel bound is ~17k mixed adds/proof at
~200 M adds/s = ~85 us/proof, but the measured two-program prove runs at
~406 us/proof (2.46k proofs/s).  This probe splits the pipeline on real
hardware:

  stage0 (dispatch->fetch)         blinding expansion + V/A/S commitments
  host FS (rp_ts_yz)               the only host protocol step
  prove_rest (dispatch->fetch)     stages 1-2 + IPP rounds + device FS
  f1600 standalone                 batched Keccak-f at (200, P) to cost
                                   the device-transcript share
  fixed-base MSM standalone        the S-commitment shape (largest MSM)

Run: python benches/_profile_prove_r4.py [P]
"""

import ctypes
import os
import secrets
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class Rng:
    randbytes = staticmethod(secrets.token_bytes)


def main():
    import jax
    import jax.numpy as jnp
    from bulletproofs_tpu import (BulletproofGens, PedersenGens, Transcript,
                                  Scalar)
    from bulletproofs_tpu.proofs.batch_prover import BatchProver, _NATIVE
    from bulletproofs_tpu.ops import prover_stages as PS

    P = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n, m = 64, 1
    N = n * m
    rng = Rng()
    pc = PedersenGens()
    bp = BulletproofGens(n, 1)
    prover = BatchProver(bp, pc, n)
    niels = prover.tables.ensure_niels()

    values = [[secrets.randbelow(1 << n)] for _ in range(P)]
    blinds = [[Scalar.random(rng)] for _ in range(P)]
    labels = [b"pp %d" % i for i in range(P)]

    v_bytes = jnp.asarray(np.frombuffer(
        b"".join(int(values[p][0]).to_bytes(32, "little") for p in range(P)),
        np.uint8).reshape(P, 32))
    vb_bytes = jnp.asarray(np.frombuffer(
        b"".join(blinds[p][0].to_bytes() for p in range(P)),
        np.uint8).reshape(P, 32))
    vals_np = np.array([[int(values[p][0]) for p in range(P)]], np.uint64)
    shifts = np.arange(n, dtype=np.uint64)
    bits_u8 = jnp.asarray(((vals_np[:, None, :] >> shifts[None, :, None]) & 1)
                          .reshape(N, P).astype(np.uint8))
    kn = np.zeros(11, np.uint32)
    kn[:8] = np.frombuffer(rng.randbytes(32), "<u4")

    # ---- stage0 --------------------------------------------------------
    vas_dev, red = PS.stage0_fused_v2(n, m, niels, jnp.asarray(kn),
                                      v_bytes, vb_bytes, bits_u8)
    vas = np.asarray(jax.device_get(vas_dev))      # warm-up + fetch
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        vas_dev, red = PS.stage0_fused_v2(n, m, niels, jnp.asarray(kn),
                                          v_bytes, vb_bytes, bits_u8)
        vas = np.asarray(jax.device_get(vas_dev))
    dt0 = (time.time() - t0) / reps
    log(f"stage0 (dispatch+fetch, P={P}): {dt0*1000:.0f} ms "
        f"({dt0/P*1e6:.0f} us/proof)")

    # ---- host FS -------------------------------------------------------
    transcripts = [Transcript(l) for l in labels]
    strobe_size = len(transcripts[0].strobe.buf.raw)
    strobes = ctypes.create_string_buffer(
        b"".join(t.strobe.buf.raw for t in transcripts), strobe_size * P)
    yz = ctypes.create_string_buffer(3 * P * 32)
    t0 = time.time()
    rc = _NATIVE.rp_ts_yz(ctypes.c_uint64(P), strobes,
                          ctypes.c_size_t(strobe_size),
                          ctypes.c_uint64(n), ctypes.c_uint64(m),
                          vas.tobytes(), yz)
    dty = time.time() - t0
    log(f"host rp_ts_yz: {dty*1000:.0f} ms (rc={rc})")
    states_z = np.frombuffer(strobes.raw, np.uint8).reshape(
        P, strobe_size)[:, :200].T.copy()
    yz_rows = jnp.asarray(np.frombuffer(yz.raw, np.uint8).reshape(3 * P, 32))

    # ---- prove_rest ----------------------------------------------------
    rest = PS.prove_rest_fused(n, m, niels, jnp.asarray(states_z), red,
                               bits_u8, yz_rows, vb_bytes)
    jax.device_get(rest[2])                         # warm-up
    t0 = time.time()
    for _ in range(reps):
        rest = PS.prove_rest_fused(n, m, niels, jnp.asarray(states_z), red,
                                   bits_u8, yz_rows, vb_bytes)
        jax.device_get(rest[2])
    dtr = (time.time() - t0) / reps
    log(f"prove_rest (dispatch+fetch): {dtr*1000:.0f} ms "
        f"({dtr/P*1e6:.0f} us/proof)")
    log(f"-> two-program total ~{(dt0+dty+dtr)/P*1e6:.0f} us/proof "
        f"(bench end-to-end was ~406 us at 8192 with interleaved halves)")

    # ---- f1600 standalone ---------------------------------------------
    from bulletproofs_tpu.ops import keccak_device as KD
    st = jnp.asarray(np.frombuffer(rng.randbytes(200 * P),
                                   np.uint8).reshape(200, P))
    out = KD.f1600_state_bytes(st)
    jax.device_get(out[:1])
    t0 = time.time()
    k_reps = 20
    cur = st
    for _ in range(k_reps):
        cur = KD.f1600_state_bytes(cur)
    jax.device_get(cur[:1])
    dtk = (time.time() - t0) / k_reps
    log(f"f1600 batched (200, {P}): {dtk*1000:.2f} ms per permutation "
        f"({dtk/P*1e9:.0f} ns/proof/permutation)")

    # ---- fixed-base MSM standalone (S-commitment shape) ----------------
    from bulletproofs_tpu.ops import fixed_msm as FM
    s_niels = prover.s_tables.ensure_niels()
    S_rows = s_niels.shape[2]
    digs = jnp.asarray(np.random.RandomState(0).randint(
        0, 9, size=(S_rows, P)).astype(np.int32))
    pts = FM.msm_digits_niels(s_niels, digs)
    jax.device_get(pts[:, :, :1])
    t0 = time.time()
    for _ in range(reps):
        pts = FM.msm_digits_niels(s_niels, digs)
        jax.device_get(pts[:, :, :1])
    dtm = (time.time() - t0) / reps
    log(f"fixed-base MSM ({S_rows} stream rows x {P} lanes): "
        f"{dtm*1000:.0f} ms ({S_rows*P/dtm/1e6:.0f} M adds/s, "
        f"{dtm/P*1e6:.1f} us/proof)")


if __name__ == "__main__":
    main()
