"""Can first-executions of distinct executables overlap through the tunnel?

Warm the batch-verify executables (decompress_device, fused_tail) with
dummy inputs in two THREADS and compare wall-clock to the serial ~78 s.
Run in a FRESH process each time (the cost is per-process).

  python benches/_warmup_overlap_r4.py serial
  python benches/_warmup_overlap_r4.py threads
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(mode):
    import jax
    import jax.numpy as jnp
    from bulletproofs_tpu.ops import vec_curve as C
    from bulletproofs_tpu.ops import verify_pallas
    from bulletproofs_tpu import BulletproofGens, PedersenGens
    from bulletproofs_tpu.parallel.batch_verify import BatchVerifier

    n, m, step = 64, 1, 2048
    lg = 6
    n_dyn_per = 4 + 2 * lg + m
    nblk = lg + 8          # compact challenge block
    p_pad = step

    bv = BatchVerifier(BulletproofGens(64, 1), PedersenGens(), n=n, m=m)

    t_all = time.time()

    def warm_decompress():
        t0 = time.time()
        raw = np.zeros((p_pad * n_dyn_per, 32), np.uint8)
        valid, pts = C.decompress_device(jnp.asarray(raw))
        jax.block_until_ready((valid, pts))
        log(f"  decompress warm: {time.time()-t0:.1f}s")
        return valid, pts

    holder = {}

    def warm_tail():
        t0 = time.time()
        blk = np.zeros((p_pad * nblk, 32), np.uint8)
        pair = np.zeros((2, 32), np.uint8)
        # identity dyn points (all-zero enc decompresses to identity? no --
        # feed a self-made dummy with the right shapes instead)
        dyn = jnp.zeros((4, 20, p_pad * n_dyn_per), jnp.int32)
        dyn = dyn.at[1].set(1).at[2].set(1)   # identity in extended coords
        valid = jnp.ones((p_pad * n_dyn_per,), jnp.bool_)
        flag = verify_pallas.fused_tail(n, m, jnp.asarray(blk),
                                        jnp.asarray(pair), bv._static_dev,
                                        dyn, valid)
        jax.device_get(flag)
        log(f"  fused_tail warm: {time.time()-t0:.1f}s")

    if mode == "serial":
        warm_decompress()
        warm_tail()
    else:
        t1 = threading.Thread(target=warm_decompress)
        t2 = threading.Thread(target=warm_tail)
        t1.start(); t2.start(); t1.join(); t2.join()
    log(f"total warm-up ({mode}): {time.time()-t_all:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "serial")
