"""Weak-scaling benchmark for the mesh-sharded MSM (BASELINE target:
>= 80% scaling efficiency from 1 chip to N).

Weak scaling: each device gets a fixed local shard of K points; an
N-device mesh computes an N*K-point MSM.  Efficiency(N) = t(1) / t(N)
(ideal weak scaling keeps t flat as N grows, since each chip's local
Pippenger work is constant and the collective is one 320-byte all-gather
per chip over ICI).

Run on real multi-chip hardware:   python benches/bench_scaling.py
Smoke on a virtual CPU mesh:       JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python benches/bench_scaling.py 4096
(virtual devices share one core, so CPU 'efficiency' only validates the
sharding compiles and stays correct, not the scaling itself)
"""

import os
import secrets
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(local_k=1 << 14):
    import jax
    import numpy as np

    from bulletproofs_tpu.ops import vec_curve as C
    from bulletproofs_tpu.ops import vec_msm
    from bulletproofs_tpu.parallel.sharded_msm import (make_mesh,
                                                       sharded_msm_lanes)

    n_dev = len(jax.devices())
    print(f"devices: {n_dev} ({jax.devices()[0].platform})", flush=True)

    results = {}
    sizes = [1]
    d = 2
    while d <= n_dev:
        sizes.append(d)
        d *= 2
    for nd in sizes:
        N = local_k * nd
        raw = np.frombuffer(secrets.token_bytes(64 * N),
                            np.uint8).reshape(N, 64)
        pts = C.from_uniform_bytes(raw)
        scalars = [int.from_bytes(secrets.token_bytes(31), "little")
                   for _ in range(N)]
        mesh = make_mesh(nd)
        out = sharded_msm_lanes(pts, scalars, mesh)   # compile + warm
        jax.device_get(out)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            jax.device_get(sharded_msm_lanes(pts, scalars, mesh))
        dt = (time.time() - t0) / reps
        results[nd] = dt
        eff = results[1] / dt
        print(f"mesh={nd:2d} points=2^{N.bit_length()-1:2d} "
              f"t={dt*1e3:8.1f} ms  weak-scaling efficiency={eff*100:5.1f}%",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 14)
