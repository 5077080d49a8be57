"""Pallas MSM benchmark: marginal rate over rep counts with varying inputs."""
import secrets, time
import jax, jax.numpy as jnp, numpy as np
from bulletproofs_tpu.ops import vec_curve as C
from bulletproofs_tpu.ops import msm_pallas as MP
from bulletproofs_tpu.ops.vec_msm import scalars_to_bytes


def bench(n):
    raw = np.random.RandomState(0).randint(0, 256, (n, 64)).astype(np.uint8)
    pts = jax.block_until_ready(C.from_uniform_bytes(raw))
    padded, blk, kchunk = MP._pick_shape(n)
    assert padded == n
    variants = []
    for i in range(12):
        sb = scalars_to_bytes([int.from_bytes(secrets.token_bytes(31), "little")
                               for _ in range(n)])
        variants.append(MP.device_digits4(jnp.asarray(
            np.ascontiguousarray(sb[:, :32]))))

    def run(reps):
        outs = []
        t0 = time.time()
        for i in range(reps):
            outs.append(MP._msm_pallas(pts, variants[i], blk, kchunk))
        for o in outs:
            np.asarray(jax.device_get(o))
        return time.time() - t0

    run(1)  # compile
    ts = []
    for _ in range(3):
        t1 = run(2)
        t2 = run(12)
        ts.append((t2 - t1) / 10)
    dt = sorted(ts)[1]
    print(f"N={n}: {dt*1e3:.1f} ms/msm -> {n/dt/1e6:.3f} M pts/s "
          f"(samples {[f'{t*1e3:.0f}' for t in ts]})", flush=True)


for n in (12288, 65536, 262144):
    bench(n)
