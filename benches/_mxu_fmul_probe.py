"""MXU int8-matmul field-mul probe (docs/kernels.md "headroom notes").

The fixed-base bucket kernel's mixed add has 3 of 7 fmuls with a SHARED
operand (the Niels table point, constant across the lane axis).  A shared
operand b can be hoisted into a banded int8 matrix M(b) so the schoolbook
product becomes ONE (156, 40) @ (40, Q) int8 matmul on the MXU:

  a (20 x 13-bit limbs, lazy < 2^14)  ->  A = [a & 127; a >> 7]  (40, Q) int8
  b (20 x 13-bit limbs, canonical)    ->  blo = b & 127, bhi = b >> 7
  M = [[band(blo) | 0], [0 | band(blo)], [band(bhi) | 0], [0 | band(bhi)]]
      (4*39, 40) int8, band(x)[k, i] = x[k - i]
  P = M @ A  (int32)  ->  c_k = P1_k + 128*(P2_k + P3_k) + 16384*P4_k
  then the usual pseudo-Mersenne fold + carries.

This probe measures, on the real chip, a dependency-chained loop of
3-shared-mul steps in (a) the schoolbook VPU form and (b) the MXU form,
both as Pallas kernels and as plain XLA, and checks bit-exactness of one
product against the Python oracle.

Run: python benches/_mxu_fmul_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


P25519 = (1 << 255) - 19
LIMB = 13
L = 20
MASK = (1 << LIMB) - 1


def to_limbs(v, n=L, bits=LIMB):
    out = np.zeros(n, np.int64)
    m = (1 << bits) - 1
    for k in range(n):
        out[k] = v & m
        v >>= bits
    return out


def band_matrix(b_int):
    """(156, 40) int8 matrix for shared operand b (canonical < p)."""
    bl = to_limbs(b_int)
    blo = (bl & 127).astype(np.int8)
    bhi = (bl >> 7).astype(np.int8)

    def band(x):
        m = np.zeros((2 * L - 1, L), np.int8)
        for k in range(2 * L - 1):
            for i in range(L):
                if 0 <= k - i < L:
                    m[k, i] = x[k - i]
        return m

    Bl, Bh = band(blo), band(bhi)
    Z = np.zeros_like(Bl)
    return np.concatenate([
        np.concatenate([Bl, Z], axis=1),
        np.concatenate([Z, Bl], axis=1),
        np.concatenate([Bh, Z], axis=1),
        np.concatenate([Z, Bh], axis=1)], axis=0)   # (156, 40)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from bulletproofs_tpu.ops import pallas_math as PM

    Q = 512
    T = 1024          # chained steps per kernel call
    rng = np.random.RandomState(5)

    # operands: per-lane a (L, Q) lazy-ish limbs (< 2^13 here), shared b
    a_int = [int.from_bytes(rng.bytes(31), "little") % P25519 for _ in range(Q)]
    b_int = int.from_bytes(rng.bytes(31), "little") % P25519
    a_np = np.stack([to_limbs(v) for v in a_int], axis=1).astype(np.int32)
    b_np = to_limbs(b_int).astype(np.int32)[:, None]
    M_np = band_matrix(b_int)

    # ---- correctness: one MXU-form product vs oracle --------------------
    def mxu_mul(a, Mmat):
        """(L, Q) int32 x banded matrix -> (L, Q) reduced (same tail as
        PM.fmul)."""
        alo = (a & 127).astype(jnp.int8)
        ahi = (a >> 7).astype(jnp.int8)
        A = jnp.concatenate([alo, ahi], axis=0)                  # (40, Q)
        Pm = jax.lax.dot_general(
            Mmat, A, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)                    # (156, Q)
        n = 2 * L - 1
        c = (Pm[:n] + 128 * (Pm[n: 2 * n] + Pm[2 * n: 3 * n])
             + 16384 * Pm[3 * n: 4 * n])                         # (39, Q)
        lo = c[:L]
        hi = c[L:]
        z1 = jnp.zeros_like(hi[:1])
        TOP = 608    # 2^260 mod p = 19 * 2^5 (ops/pallas_math.py)
        lo = lo + TOP * jnp.concatenate([hi & MASK, z1], axis=0)
        lo = lo + TOP * jnp.concatenate([z1, hi >> LIMB], axis=0)

        def carry(cv):
            cr = cv >> LIMB
            lo2 = cv & MASK
            return lo2 + jnp.concatenate([TOP * cr[-1:], cr[:-1]], axis=0)

        return carry(carry(carry(lo)))

    got = np.asarray(jax.device_get(mxu_mul(jnp.asarray(a_np),
                                            jnp.asarray(M_np))))

    def limbs_to_int(col):
        return sum(int(v) << (LIMB * k) for k, v in enumerate(col))

    ok = all(limbs_to_int(got[:, q]) % P25519 ==
             (a_int[q] * b_int) % P25519 for q in range(0, Q, 37))
    log(f"MXU-form product bit-exact vs oracle: {ok}")
    if not ok:
        log("ABORT: formulation wrong")
        return

    # ---- throughput: chained 3-mul steps, Pallas ------------------------
    consts = jnp.asarray(PM.CONSTS)

    def vpu_kernel(consts_ref, b3_ref, a_ref, out_ref):
        PM.bind_consts(consts_ref)
        a = a_ref[0]

        def step(k, a):
            y1 = PM.fmul(a, jnp.broadcast_to(b3_ref[0, :, k, :], a.shape))
            y2 = PM.fmul(a, jnp.broadcast_to(b3_ref[1, :, k, :], a.shape))
            y3 = PM.fmul(a, jnp.broadcast_to(b3_ref[2, :, k, :], a.shape))
            return PM.carry(y1 + y2 + y3)

        out_ref[0] = jax.lax.fori_loop(0, T, step, a)

    def mxu_kernel(consts_ref, m3_ref, a_ref, out_ref):
        PM.bind_consts(consts_ref)
        a = a_ref[0]
        n = 2 * L - 1

        def one(a, Mmat):
            alo = (a & 127).astype(jnp.int8)
            ahi = (a >> 7).astype(jnp.int8)
            A = jnp.concatenate([alo, ahi], axis=0)
            Pm = jax.lax.dot_general(
                Mmat, A, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            c = (Pm[:n] + 128 * (Pm[n: 2 * n] + Pm[2 * n: 3 * n])
                 + 16384 * Pm[3 * n: 4 * n])
            lo = c[:L]
            hi = c[L:]
            z1 = jnp.zeros_like(hi[:1])
            lo = lo + 608 * jnp.concatenate([hi & MASK, z1], axis=0)
            lo = lo + 608 * jnp.concatenate([z1, hi >> LIMB], axis=0)
            return PM.carry(PM.carry(PM.carry(lo)))

        def step(k, a):
            y1 = one(a, m3_ref[0, k])
            y2 = one(a, m3_ref[1, k])
            y3 = one(a, m3_ref[2, k])
            return PM.carry(y1 + y2 + y3)

        out_ref[0] = jax.lax.fori_loop(0, T, step, a)

    # shared operands per step: 3 "table" values, T steps
    b_steps = [int.from_bytes(rng.bytes(31), "little") % P25519
               for _ in range(3 * T)]
    b3_np = np.zeros((3, L, T, 1), np.int32)
    m3_np = np.zeros((3, T, 4 * (2 * L - 1), 2 * L), np.int8)
    for j in range(3):
        for t in range(T):
            v = b_steps[j * T + t]
            b3_np[j, :, t, 0] = to_limbs(v)
            m3_np[j, t] = band_matrix(v)

    a_dev = jnp.asarray(a_np)[None]

    vpu = pl.pallas_call(
        vpu_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, L, Q), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    mxu = pl.pallas_call(
        mxu_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, L, Q), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    for name, fn, args in (
            ("VPU schoolbook", vpu, (consts, jnp.asarray(b3_np), a_dev)),
            ("MXU int8 matmul", mxu, (consts, jnp.asarray(m3_np), a_dev))):
        try:
            out = fn(*args)
            jax.device_get(out)
            t0 = time.time()
            reps = 8
            for _ in range(reps):
                out = fn(*args)
            jax.device_get(out)
            dt = (time.time() - t0) / reps
            rate = 3 * T * Q / dt
            log(f"{name}: {dt*1000:7.2f} ms for {3*T} chained shared-muls "
                f"x {Q} lanes -> {rate/1e9:.2f} G muls/s")
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
