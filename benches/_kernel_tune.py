"""One-process TPU kernel tuning sweeps (dev tool).

Measures, with everything device-resident (no tunnel traffic inside the
timed region):
  1. fixed-base MSM rate at prover shapes, qblk/kchunk variants
  2. dynamic Pippenger MSM rate at 2^16 points, blk variants
  3. compress/decompress codec rates
"""
import secrets
import sys
import time

sys.path.insert(0, "/root/repo")


def _sync(r):
    """Force completion through the tunnel: block_until_ready does not
    block there, so fetch a one-element probe of the first output leaf."""
    import jax
    leaf = jax.tree_util.tree_leaves(r)[0]
    jax.device_get(leaf.reshape(-1)[:1])


def timeit(label, fn, iters=3):
    _sync(fn())          # compile + first execution
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    _sync(r)
    dt = (time.time() - t0) / iters
    print(f"{label}: {dt*1000:.1f} ms", flush=True)
    return dt


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from bulletproofs_tpu.generators import BulletproofGens, PedersenGens
    from bulletproofs_tpu.ops import fixed_msm as FM
    from bulletproofs_tpu.ops import msm_pallas as MP
    from bulletproofs_tpu.ops import vec_curve as C

    n = 64
    pc, bp = PedersenGens(), BulletproofGens(n, 1)
    bases = [pc.B, pc.B_blinding] + bp.G(n, 1) + bp.H(n, 1)
    tables = FM.FixedBaseTables(bases)
    nb = len(bases)
    print(f"tables built: {nb} bases", flush=True)

    # prover-shaped digit stream: (nb*64, Q)
    for Q in (4096, 8192):
        digs = jnp.asarray(
            np.random.randint(0, 16, size=(nb * 64, Q), dtype=np.int32))
        for qblk, kchunk in ((512, 16), (1024, 16), (512, 32), (256, 16),
                             (1024, 8)):
            try:
                dt = timeit(
                    f"fixed_msm nb={nb} Q={Q} qblk={qblk} kchunk={kchunk}",
                    lambda d=digs, q=qblk, k=kchunk:
                        FM.msm_digits(tables, d, qblk=q, kchunk=k))
                adds = nb * 64 * Q
                print(f"   -> {adds/dt/1e6:.0f} M mixed adds/s", flush=True)
            except Exception as e:
                print(f"   FAILED: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)

    # dynamic MSM at 2^16, device-resident digits
    N = 1 << 16
    raw = np.frombuffer(secrets.token_bytes(64 * N), np.uint8).reshape(N, 64)
    pts = C.from_uniform_bytes(raw)
    sb = np.frombuffer(secrets.token_bytes(32 * N), np.uint8).reshape(N, 32)
    sb = sb.copy()
    sb[:, 31] &= 15          # < 2^252, valid for signed recode
    digits = jax.block_until_ready(MP.device_digits4(jnp.asarray(sb)))
    for blk in (256, 512, 1024):
        try:
            padded, b, kc = MP._pick_shape(N, blk)
            dt = timeit(f"msm_pallas 2^16 blk={b} kchunk={kc}",
                        lambda b=b, kc=kc: MP._msm_pallas(pts, digits, b, kc))
            print(f"   -> {N/dt/1e6:.2f} M points/s "
                  f"({64*N/dt/1e6:.0f} M adds/s)", flush=True)
        except Exception as e:
            print(f"   FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    # signed digit recode cost
    timeit("to_signed_digits 2^16", lambda: MP.to_signed_digits(digits))

    # codecs
    for NC in (8192, 65536):
        ptsc = pts[..., :NC]
        dt = timeit(f"compress {NC}", lambda p=ptsc: MP.compress_lanes(p))
        print(f"   -> {NC/dt/1e6:.2f} M points/s", flush=True)
        lim = MP.compress_lanes(ptsc)
        dt = timeit(f"decompress {NC}", lambda l=lim: MP.decompress_lanes(l))
        print(f"   -> {NC/dt/1e6:.2f} M points/s", flush=True)


if __name__ == "__main__":
    main()
