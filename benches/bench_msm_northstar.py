"""North-star MSM benchmark: points/sec/chip at 2^16, DEVICE-RESIDENT.

BASELINE.json's metric is per-chip MSM capability; the bench.py number
published in round 2 (0.549 M pts/s) timed a host->device digit upload
(~2.2 MB over a ~30 MB/s tunnel) inside the loop, so it measured the
tunnel, not the chip.  Here points AND digits live on device before the
clock starts (as they do in the batch-verification pipeline, where digits
are produced on device from uploaded 32-byte scalars), so the measured
rate is the kernel's.

Also prints an ops-level MFU estimate (docs/kernels.md derives the
counts): the bucket accumulation performs W=64 mixed Edwards additions
per point (7 fmul + 4 add/sub each) plus the 9-slot one-hot mux, and one
fmul is a 20x20 int32 schoolbook + pseudo-Mersenne carry chain
(~1.3k int32 lane-ops).

Usage: python benches/bench_msm_northstar.py [log2_n]
"""

import sys
import time

import numpy as np


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N = 1 << lg
    import jax
    import jax.numpy as jnp
    from bulletproofs_tpu.ops import vec_curve as C
    from bulletproofs_tpu.ops import msm_pallas

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(7)

    raw = rng.integers(0, 256, size=(N, 64), dtype=np.uint8)
    t0 = time.time()
    pts = jax.block_until_ready(C.from_uniform_bytes(raw))
    print(f"points on device ({N}): {time.time()-t0:.1f}s", file=sys.stderr)

    sbytes = rng.integers(0, 256, size=(N, 32), dtype=np.uint8)
    sbytes[:, 31] &= 15          # < 2^252 so the signed recode cannot carry out
    digits = msm_pallas.device_digits4(jnp.asarray(sbytes))
    # Niels mixed-add kernel: production inputs carry Z = 1 (decompressed
    # points / generator tensors); these synthetic points need the
    # one-time normalization, staged outside the timed region
    pts = msm_pallas.normalize_z(pts)

    # warm-up (compile + first execution through the tunnel); NB
    # block_until_ready does not block through the axon tunnel, so sync
    # via a tiny device_get and time CHAINED async dispatches
    t0 = time.time()
    jax.device_get(msm_pallas.msm_lanes_niels_flag(pts, digits, blk=256)[1])
    print(f"warm-up: {time.time()-t0:.1f}s", file=sys.stderr)

    iters = 6
    t0 = time.time()
    for _ in range(iters):
        out = msm_pallas.msm_lanes_niels_flag(pts, digits, blk=256)
    jax.device_get(out[1])
    dt = (time.time() - t0) / iters
    dts = [dt]
    rate = N / dt

    # ops accounting (per point): W mixed adds of 7 fmul + ~4 fadd, plus the
    # 2 * 9-bucket mux (4 coords * 20 limbs select+accumulate each way)
    FMUL_OPS = 20 * 20 * 2 + 3 * 40 + 21 * 2      # schoolbook + carries ~ 962
    ADD_OPS = 20 * 3
    MIXED_ADD = 7 * FMUL_OPS + 4 * ADD_OPS        # Niels 7-mul form
    MUX = 2 * 9 * 4 * 20
    per_point = msm_pallas.NUM_WINDOWS * (MIXED_ADD + MUX)
    total_ops = N * per_point
    # v5e VPU: 8 sublanes x 128 lanes x 4 scalar units x ~0.94 GHz
    peak = 8 * 128 * 4 * 0.94e9
    mfu = total_ops / dt / peak
    print(f"MSM 2^{lg} device-resident: {dt*1000:.1f} ms "
          f"(avg of {iters} chained) -> {rate/1e6:.3f} M pts/s",
          file=sys.stderr)
    print(f"ops/point ~ {per_point/1e3:.0f}k int32 lane-ops; "
          f"total {total_ops/1e9:.1f} G-ops; est. VPU MFU {mfu*100:.0f}%",
          file=sys.stderr)
    import json
    print(json.dumps({"metric": f"device-resident MSM 2^{lg}",
                      "value": round(rate / 1e6, 3), "unit": "M points/s"}))


if __name__ == "__main__":
    main()
