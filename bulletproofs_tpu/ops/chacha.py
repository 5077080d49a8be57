"""Device-resident ChaCha20 CSPRNG for the batch prover's blinding draws.

The prover needs 4 + 2N secret scalars per proof (a/s blindings, t-poly
blindings, the s_L/s_R vectors; reference src/range_proof/party.rs:87-124,
182-237).  Drawing them on host and uploading costs 32 B x (4+2N) x P per
batch -- ~17 MB at (n, P) = (64, 4096), i.e. ~0.6 s through a ~30 MB/s
device tunnel, dwarfing the actual device compute.  Instead the host
draws ONE 256-bit seed per batch from the caller's rng and the device
expands it: ChaCha20 (RFC 8439) is pure 32-bit ARX, so it vectorizes
perfectly onto the VPU lanes -- one 64-byte keystream block per scalar,
reduced mod l with the wide Barrett path (`from_wide_bytes`), exactly the
distribution the host path gets from rp_reduce_wide.

Security note: the blinding factors are secrets of the prover only; they
never leave the device, and ChaCha20 under a fresh random 256-bit key is
a standard CSPRNG (the reference's own `rand::thread_rng` is ChaCha-based).
Distinct scalars use distinct block counters; one batch never draws more
than 2^32 blocks.

Cross-checked against a pure-Python oracle and the RFC 8439 keystream
test vector in tests/test_chacha.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_SIGMA = np.frombuffer(b"expa" b"nd 3" b"2-by" b"te k", dtype="<u4").copy()


def _rotl(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _quarter(a, b, c, d):
    a = a + b
    d = _rotl(d ^ a, 16)
    c = c + d
    b = _rotl(b ^ c, 12)
    a = a + b
    d = _rotl(d ^ a, 8)
    c = c + d
    b = _rotl(b ^ c, 7)
    return a, b, c, d


@functools.partial(jax.jit, static_argnums=(1,))
def _keystream_blocks(key_nonce: jnp.ndarray, n: int) -> jnp.ndarray:
    """key_nonce (11,) uint32 = key words 0..7 then nonce words 0..2 ->
    (n, 64) uint8 keystream blocks with counters 0..n-1."""
    ctr = jax.lax.broadcasted_iota(jnp.uint32, (1, n), 1)
    rows = ([jnp.broadcast_to(jnp.uint32(w), (1, n)) for w in _SIGMA]
            + [jnp.broadcast_to(key_nonce[i], (1, n)) for i in range(8)]
            + [ctr]
            + [jnp.broadcast_to(key_nonce[8 + i], (1, n)) for i in range(3)])
    init = jnp.concatenate(rows, axis=0)                    # (16, n)
    x = [init[i] for i in range(16)]

    for _ in range(10):                                     # 20 rounds
        # column rounds
        x[0], x[4], x[8], x[12] = _quarter(x[0], x[4], x[8], x[12])
        x[1], x[5], x[9], x[13] = _quarter(x[1], x[5], x[9], x[13])
        x[2], x[6], x[10], x[14] = _quarter(x[2], x[6], x[10], x[14])
        x[3], x[7], x[11], x[15] = _quarter(x[3], x[7], x[11], x[15])
        # diagonal rounds
        x[0], x[5], x[10], x[15] = _quarter(x[0], x[5], x[10], x[15])
        x[1], x[6], x[11], x[12] = _quarter(x[1], x[6], x[11], x[12])
        x[2], x[7], x[8], x[13] = _quarter(x[2], x[7], x[8], x[13])
        x[3], x[4], x[9], x[14] = _quarter(x[3], x[4], x[9], x[14])

    out = jnp.stack(x) + init                               # (16, n)
    # little-endian serialization: word w bytes [4w, 4w+4)
    by = jnp.stack([(out >> np.uint32(8 * k)).astype(jnp.uint8)
                    for k in range(4)], axis=1)             # (16, 4, n)
    return by.reshape(64, n).T                              # (n, 64)


def random_wide(seed32: bytes, n: int) -> jnp.ndarray:
    """256-bit seed -> (n, 64) uint8 uniform device bytes (nonce 0; the
    caller must use a fresh seed per expansion)."""
    assert len(seed32) == 32
    kn = np.zeros(11, np.uint32)
    kn[:8] = np.frombuffer(seed32, "<u4")
    return _keystream_blocks(jnp.asarray(kn), n)


def random_scalars(seed32: bytes, n: int) -> jnp.ndarray:
    """256-bit seed -> (L, n) lane-major mod-l scalar limbs, each reduced
    from a 512-bit keystream draw (negligible mod-l bias, same as the host
    rp_reduce_wide path)."""
    from . import vec_scalar as VS
    return VS.from_wide_bytes(random_wide(seed32, n))
