"""Device-resident Merlin/STROBE-128 transcripts for the batched prover.

The batch prover runs P independent Fiat-Shamir transcripts -- one per
proof.  Their *data* differs per lane, but the *schedule* (labels, lengths,
operation order) is identical and known when the prover program is traced.
STROBE's sponge position, frame boundaries, and permutation points depend
only on that schedule, so they are compile-time Python ints here; the
200-byte duplex state rides the device as a (200, P) uint8 tensor and every
absorb/squeeze lowers to static slicing + XOR around the lane-parallel
Keccak-f of ops/keccak_device.py.

This removes the last host round-trip from proving: challenges are squeezed
on device, reduced mod l on device (vec_scalar.from_wide_bytes), and feed
the next stage inside the same XLA program.  Semantics are bit-exact with
utils/strobe.PyStrobe128 / the merlin crate (reference dependency,
/root/reference/Cargo.toml:31; domain separators from
/root/reference/src/transcript.rs:44-94), verified byte-for-byte in
tests/test_transcript_device.py.
"""

from __future__ import annotations

import struct

import jax.numpy as jnp
import numpy as np

from .keccak_device import f1600_state_bytes

STROBE_R = 166

FLAG_I = 1
FLAG_A = 1 << 1
FLAG_C = 1 << 2
FLAG_T = 1 << 3
FLAG_M = 1 << 4
FLAG_K = 1 << 5


def _u32le(x: int) -> bytes:
    return struct.pack("<I", x)


def _u64le(x: int) -> bytes:
    return struct.pack("<Q", x)


class DeviceStrobe:
    """STROBE-128 with traced (200, P) state and static counters.

    Mirrors utils/strobe.PyStrobe128 operation-for-operation; `pos`,
    `pos_begin`, `cur_flags` are Python ints (the schedule is static), so
    a batch of transcripts can only be driven together while their
    counters agree -- the prover checks that before entering the fused
    program and falls back otherwise.
    """

    __slots__ = ("st", "pos", "pos_begin", "cur_flags")

    def __init__(self, state: jnp.ndarray, pos: int, pos_begin: int,
                 cur_flags: int):
        assert state.shape[0] == 200
        self.st = state
        self.pos = int(pos)
        self.pos_begin = int(pos_begin)
        self.cur_flags = int(cur_flags)

    # -- internals ----------------------------------------------------------
    def _run_f(self) -> None:
        pad = np.zeros(200, np.uint8)
        pad[self.pos] ^= self.pos_begin
        pad[self.pos + 1] ^= 0x04
        pad[STROBE_R + 1] ^= 0x80
        self.st = f1600_state_bytes(self.st ^ jnp.asarray(pad)[:, None])
        self.pos = 0
        self.pos_begin = 0

    def _xor_rows(self, rows: jnp.ndarray, at: int, k: int) -> None:
        """XOR (k, P) data rows into state rows [at, at+k)."""
        parts = []
        if at:
            parts.append(jnp.zeros((at,) + self.st.shape[1:], jnp.uint8))
        parts.append(rows)
        if at + k < 200:
            parts.append(jnp.zeros((200 - at - k,) + self.st.shape[1:],
                                   jnp.uint8))
        self.st = self.st ^ jnp.concatenate(parts, axis=0)

    def _absorb_const(self, data: bytes) -> None:
        i = 0
        while i < len(data):
            take = min(len(data) - i, STROBE_R - self.pos)
            pad = np.zeros(200, np.uint8)
            pad[self.pos: self.pos + take] = np.frombuffer(
                data[i: i + take], np.uint8)
            self.st = self.st ^ jnp.asarray(pad)[:, None]
            self.pos += take
            i += take
            if self.pos == STROBE_R:
                self._run_f()

    def _absorb_rows(self, rows: jnp.ndarray) -> None:
        """Absorb per-lane data: rows (k, P) uint8."""
        k = rows.shape[0]
        i = 0
        while i < k:
            take = min(k - i, STROBE_R - self.pos)
            self._xor_rows(rows[i: i + take], self.pos, take)
            self.pos += take
            i += take
            if self.pos == STROBE_R:
                self._run_f()

    def _overwrite_rows(self, rows: jnp.ndarray) -> None:
        k = rows.shape[0]
        i = 0
        while i < k:
            take = min(k - i, STROBE_R - self.pos)
            keep = np.ones(200, np.uint8)
            keep[self.pos: self.pos + take] = 0
            self.st = self.st * jnp.asarray(keep)[:, None]
            self._xor_rows(rows[i: i + take], self.pos, take)
            self.pos += take
            i += take
            if self.pos == STROBE_R:
                self._run_f()

    def _squeeze(self, n: int) -> jnp.ndarray:
        """-> (n, P) uint8 PRF output (squeezed bytes zeroed in-state)."""
        out = []
        got = 0
        while got < n:
            take = min(n - got, STROBE_R - self.pos)
            out.append(self.st[self.pos: self.pos + take])
            keep = np.ones(200, np.uint8)
            keep[self.pos: self.pos + take] = 0
            self.st = self.st * jnp.asarray(keep)[:, None]
            self.pos += take
            got += take
            if self.pos == STROBE_R:
                self._run_f()
        return out[0] if len(out) == 1 else jnp.concatenate(out, axis=0)

    def _begin_op(self, flags: int, more: bool) -> None:
        if more:
            assert self.cur_flags == flags, "STROBE op continuation changed flags"
            return
        assert not flags & FLAG_T, "transport ops unsupported"
        old_begin = self.pos_begin
        self.pos_begin = self.pos + 1
        self.cur_flags = flags
        self._absorb_const(bytes([old_begin, flags]))
        if flags & (FLAG_C | FLAG_K) and self.pos != 0:
            self._run_f()

    # -- STROBE ops ----------------------------------------------------------
    def meta_ad_const(self, data: bytes, more: bool) -> None:
        self._begin_op(FLAG_M | FLAG_A, more)
        self._absorb_const(data)

    def ad_const(self, data: bytes, more: bool) -> None:
        self._begin_op(FLAG_A, more)
        self._absorb_const(data)

    def ad_rows(self, rows: jnp.ndarray, more: bool) -> None:
        self._begin_op(FLAG_A, more)
        self._absorb_rows(rows)

    def prf(self, n: int, more: bool) -> jnp.ndarray:
        self._begin_op(FLAG_I | FLAG_A | FLAG_C, more)
        return self._squeeze(n)

    def key_rows(self, rows: jnp.ndarray, more: bool) -> None:
        self._begin_op(FLAG_A | FLAG_C, more)
        self._overwrite_rows(rows)

    # -- Merlin framing (transcript.py twins) ---------------------------------
    def append_const(self, label: bytes, message: bytes) -> None:
        self.meta_ad_const(label, False)
        self.meta_ad_const(_u32le(len(message)), True)
        self.ad_const(message, False)

    def append_rows(self, label: bytes, rows: jnp.ndarray) -> None:
        """Per-lane message: rows (k, P) uint8."""
        self.meta_ad_const(label, False)
        self.meta_ad_const(_u32le(rows.shape[0]), True)
        self.ad_rows(rows, False)

    def append_u64(self, label: bytes, x: int) -> None:
        self.append_const(label, _u64le(x))

    def challenge_bytes(self, label: bytes, n: int) -> jnp.ndarray:
        """-> (n, P) uint8."""
        self.meta_ad_const(label, False)
        self.meta_ad_const(_u32le(n), True)
        return self.prf(n, False)

    def challenge_scalar(self, label: bytes) -> jnp.ndarray:
        """-> (L, P) mod-l limbs (lazy domain), the device twin of
        Transcript.challenge_scalar / from_bytes_mod_order_wide."""
        from . import vec_scalar as VS
        return VS.from_wide_bytes(self.challenge_bytes(label, 64).T)

    # -- protocol domain separators (reference src/transcript.rs:44-65) ------
    def rangeproof_domain_sep(self, n: int, m: int) -> None:
        self.append_const(b"dom-sep", b"rangeproof v1")
        self.append_u64(b"n", n)
        self.append_u64(b"m", m)

    def innerproduct_domain_sep(self, n: int) -> None:
        self.append_const(b"dom-sep", b"ipp v1")
        self.append_u64(b"n", n)

    def counters(self):
        return self.pos, self.pos_begin, self.cur_flags
