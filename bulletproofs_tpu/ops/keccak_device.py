"""Batched Keccak-f[1600] on device: P independent sponge states on lanes.

This is the permutation under the Merlin/STROBE-128 transcript (reference
dependency `merlin`, /root/reference/Cargo.toml:31).  The reference keeps
the transcript on the CPU because it proves ONE statement at a time; the
TPU batch prover runs P independent transcripts -- one per proof -- so the
byte-oriented sponge becomes embarrassingly lane-parallel: 25 x 64-bit
lanes as 50 uint32 words on sublanes, P transcripts on lanes, pure
XOR/rotate/ANDNOT VPU work.

With this, Fiat-Shamir no longer forces a host sync per protocol phase:
the whole batched prove compiles to ONE XLA program
(ops/prover_stages.prove_rest_fused).

Bit-exact against the host oracle (utils/keccak.f1600_state) in
tests/test_keccak_device.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_RC = np.array([
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
], np.uint64)

# rotation offsets for lane (x, y), lane index = x + 5y
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def _rotl64(lo: jnp.ndarray, hi: jnp.ndarray, r: int):
    """64-bit rotate-left of a (lo, hi) uint32 pair."""
    r &= 63
    if r == 0:
        return lo, hi
    if r == 32:
        return hi, lo
    if r < 32:
        s = np.uint32(r)
        t = np.uint32(32 - r)
        return ((lo << s) | (hi >> t), (hi << s) | (lo >> t))
    s = np.uint32(r - 32)
    t = np.uint32(64 - r)
    return ((hi << s) | (lo >> t), (lo << s) | (hi >> t))


# round constants split into (lo, hi) uint32 pairs for indexing inside the
# round loop
_RC_LO = (_RC & np.uint64(0xFFFFFFFF)).astype(np.uint32)
_RC_HI = (_RC >> np.uint64(32)).astype(np.uint32)


@jax.jit
def f1600_words(words: jnp.ndarray) -> jnp.ndarray:
    """(50, ...) uint32 -> (50, ...) uint32: lane i = rows (2i lo, 2i+1 hi),
    little-endian (matching the byte order of utils/keccak.f1600_state).

    jit-wrapped so the ~30 permutation call sites inside the fused prover
    program share ONE traced subjaxpr, and the 24 rounds run under
    lax.fori_loop -- the fully unrolled permutation (~7K scalar-ish ops)
    sends the XLA CPU backend into minutes-long compiles."""
    rc_lo = jnp.asarray(_RC_LO)
    rc_hi = jnp.asarray(_RC_HI)

    def round_body(rnd, words):
        a = [(words[2 * i], words[2 * i + 1]) for i in range(25)]
        # theta
        c = []
        for x in range(5):
            lo = a[x][0] ^ a[x + 5][0] ^ a[x + 10][0] ^ a[x + 15][0] ^ a[x + 20][0]
            hi = a[x][1] ^ a[x + 5][1] ^ a[x + 10][1] ^ a[x + 15][1] ^ a[x + 20][1]
            c.append((lo, hi))
        for x in range(5):
            rl, rh = _rotl64(*c[(x + 1) % 5], 1)
            dl = c[(x + 4) % 5][0] ^ rl
            dh = c[(x + 4) % 5][1] ^ rh
            for y in range(5):
                a[x + 5 * y] = (a[x + 5 * y][0] ^ dl, a[x + 5 * y][1] ^ dh)
        # rho + pi: B[y + 5*((2x+3y) % 5)] = rol(A[x + 5y], ROT[x][y])
        b = [None] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl64(*a[x + 5 * y],
                                                           _ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                b1 = b[(x + 1) % 5 + 5 * y]
                b2 = b[(x + 2) % 5 + 5 * y]
                a[x + 5 * y] = (b[x + 5 * y][0] ^ (~b1[0] & b2[0]),
                                b[x + 5 * y][1] ^ (~b1[1] & b2[1]))
        # iota
        a[0] = (a[0][0] ^ rc_lo[rnd], a[0][1] ^ rc_hi[rnd])
        return jnp.stack([w for lane in a for w in lane])

    return jax.lax.fori_loop(0, 24, round_body, words)


def bytes_to_words(st: jnp.ndarray) -> jnp.ndarray:
    """(200, ...) uint8 little-endian state -> (50, ...) uint32."""
    b = st.astype(jnp.uint32).reshape((50, 4) + st.shape[1:])
    return (b[:, 0] | (b[:, 1] << np.uint32(8)) | (b[:, 2] << np.uint32(16))
            | (b[:, 3] << np.uint32(24)))


def words_to_bytes(w: jnp.ndarray) -> jnp.ndarray:
    """(50, ...) uint32 -> (200, ...) uint8 little-endian."""
    parts = jnp.stack([(w >> np.uint32(8 * k)).astype(jnp.uint8)
                       for k in range(4)], axis=1)
    return parts.reshape((200,) + w.shape[1:])


def f1600_state_bytes(st: jnp.ndarray) -> jnp.ndarray:
    """(200, ...) uint8 -> (200, ...) uint8 permuted state."""
    return words_to_bytes(f1600_words(bytes_to_words(st)))
