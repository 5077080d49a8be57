"""Kernel timing with device_get-based sync (block_until_ready does not
reliably sync through the axon tunnel).  Dev tool."""
import secrets
import sys
import time

sys.path.insert(0, "/root/repo")


def timeit(label, fn, iters=3, rtt=0.031):
    import jax
    import numpy as np
    np.asarray(jax.device_get(fn()))         # compile + settle
    dts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(jax.device_get(fn()))
        dts.append(time.time() - t0)
    dt = min(dts) - rtt                      # subtract one tunnel round-trip
    print(f"{label}: {dt*1000:.1f} ms (+~31ms RTT)", flush=True)
    return max(dt, 1e-9)


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

    def msm_out(d, q, k):
        # reduce fetch to one point: sum output lanes mod nothing -- just
        # fetch a tiny slice to force execution
        return FM.msm_digits(tables, d, qblk=q, kchunk=k)[..., :1]

    for Q in (8192,):
        digs = jnp.asarray(
            np.random.randint(0, 16, size=(nb * 64, Q), dtype=np.int32))
        for qblk, kchunk in ((512, 16), (512, 32), (256, 16), (512, 64)):
            try:
                dt = timeit(
                    f"fixed_msm nb={nb} Q={Q} qblk={qblk} kchunk={kchunk}",
                    lambda d=digs, q=qblk, k=kchunk: msm_out(d, q, k))
                adds = nb * 64 * Q
                print(f"   -> {adds/dt/1e6:.0f} M mixed adds/s", flush=True)
            except Exception as e:
                print(f"   FAILED: {type(e).__name__}: {str(e)[:150]}",
                      flush=True)

    N = 1 << 16
    raw = np.frombuffer(secrets.token_bytes(64 * N), np.uint8).reshape(N, 64)
    pts = C.from_uniform_bytes(raw)
    sb = np.frombuffer(secrets.token_bytes(32 * N), np.uint8).reshape(N, 32).copy()
    sb[:, 31] &= 15
    digits = MP.device_digits4(jnp.asarray(sb))
    for blk in (512, 256):
        padded, b, kc = MP._pick_shape(N, blk)
        dt = timeit(f"msm_pallas 2^16 blk={b} kchunk={kc}",
                    lambda b=b, kc=kc: MP._msm_pallas(pts, digits, b, kc)[0])
        print(f"   -> {N/dt/1e6:.2f} M points/s "
              f"({64*N/dt/1e6:.0f} M adds/s)", flush=True)

    for NC in (65536,):
        ptsc = pts[..., :NC]
        dt = timeit(f"compress {NC}",
                    lambda p=ptsc: MP.compress_lanes(p)[..., :1])
        print(f"   -> {NC/dt/1e6:.2f} M points/s", flush=True)
        lim = MP.compress_lanes(ptsc)
        dt = timeit(f"decompress {NC}",
                    lambda l=lim: MP.decompress_lanes(l)[1][..., :1])
        print(f"   -> {NC/dt/1e6:.2f} M points/s", flush=True)


if __name__ == "__main__":
    main()
