"""Pallas batch-verification emit kernel vs the XLA oracle (interpret mode
on CPU; the real-hardware path is exercised by bench.py and was validated
bit-exactly against the same oracle on a v5e)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bulletproofs_tpu.core.scalar import L as ELL
from bulletproofs_tpu.ops import vec_scalar as VS
from bulletproofs_tpu.ops import verify_pallas as VP
from bulletproofs_tpu.ops import verify_stages as VST


def _li(col):
    return sum(int(v) << (13 * k) for k, v in enumerate(col)) % ELL


@pytest.mark.slow
@pytest.mark.parametrize("n,m", [(8, 1), (8, 2)])
def test_emit_kernel_matches_xla_oracle(n, m):
    VP._INTERPRET = True
    try:
        nm = n * m
        lg = nm.bit_length() - 1
        nblk = lg + 8          # compact challenge block
        P = VP.BLKP * 2          # two tiles: exercises the accumulation
        rng = np.random.RandomState(7 + n + m)
        ints = [int.from_bytes(rng.bytes(31), "little") % ELL
                for _ in range(P * nblk)]
        blk_bytes = np.frombuffer(
            b"".join(v.to_bytes(32, "little") for v in ints),
            np.uint8).reshape(P * nblk, 32).copy()
        pair = np.zeros((2, 32), np.uint8)

        dyn_ref, static_ref = VST.emit_scalars(
            n, m, jnp.asarray(blk_bytes), jnp.asarray(pair))
        dyn_ref = np.asarray(jax.device_get(dyn_ref))
        static_ref = np.asarray(jax.device_get(static_ref))

        lim = VS.from_bytes32(jnp.asarray(blk_bytes))
        blk = jnp.transpose(lim.reshape(VP.L, P, nblk), (2, 0, 1))
        dig, gh = VP.emit_digits(n, m, blk)
        dig = np.asarray(jax.device_get(dig))
        ghr = VP._lane_tree_sum(jnp.transpose(
            gh.reshape(2, VP.L, nm, VP.BLKP), (0, 2, 1, 3)))[..., 0]
        ghr = np.asarray(jax.device_get(ghr))

        for i in range(nm):
            assert _li(ghr[0, i, :]) == _li(static_ref[:, 2 + i])
            assert _li(ghr[1, i, :]) == _li(static_ref[:, 2 + nm + i])

        n_dyn = 4 + 2 * lg + m
        for p in range(0, P, 29):
            for s in range(n_dyn):
                tile, lane = divmod(p, VP.BLKP)
                kl = tile * (n_dyn * VP.BLKP) + s * VP.BLKP + lane
                got = sum(int(d) << (4 * w)
                          for w, d in enumerate(dig[:, kl])) % ELL
                assert got == _li(dyn_ref[:, p * n_dyn + s]), (p, s)
    finally:
        VP._INTERPRET = False
