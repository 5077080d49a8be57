"""Keccak / STROBE / Merlin transcript tests.

The Keccak permutation is validated by rebuilding SHA3/SHAKE from it and
comparing against hashlib; the Merlin layer is validated against the
upstream merlin crate's `equivalence_simple` test vector and, transitively,
by the golden-proof tests (any framing difference breaks those).
"""

import hashlib

from bulletproofs_tpu.utils.keccak import Sponge, f1600_state
from bulletproofs_tpu.transcript import Transcript


def test_sha3_256_from_our_permutation():
    for msg in [b"", b"x", b"hello world", b"a" * 135, b"b" * 136, b"c" * 1000]:
        s = Sponge(136, 0x06)
        s.absorb(msg)
        assert s.squeeze(32) == hashlib.sha3_256(msg).digest()


def test_sha3_512_from_our_permutation():
    for msg in [b"", b"abc", b"z" * 71, b"z" * 72, b"q" * 500]:
        s = Sponge(72, 0x06)
        s.absorb(msg)
        assert s.squeeze(64) == hashlib.sha3_512(msg).digest()


def test_shake256_from_our_permutation():
    for msg in [b"", b"abc" * 100]:
        s = Sponge(136, 0x1F)
        s.absorb(msg)
        assert s.squeeze(300) == hashlib.shake_256(msg).digest(300)


def test_f1600_changes_state():
    st = bytes(200)
    out = f1600_state(st)
    assert out != st and len(out) == 200
    # permutation is deterministic
    assert f1600_state(st) == out


def test_merlin_equivalence_simple():
    """Upstream merlin transcript test vector."""
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    ch = t.challenge_bytes(b"challenge", 32)
    assert ch.hex() == "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"


def test_merlin_clone_independent():
    t = Transcript(b"proto")
    t.append_message(b"a", b"b")
    t2 = t.clone()
    c1 = t.challenge_bytes(b"c", 32)
    c2 = t2.challenge_bytes(b"c", 32)
    assert c1 == c2
    # diverge after different appends
    t.append_message(b"x", b"1")
    t2.append_message(b"x", b"2")
    assert t.challenge_bytes(b"c", 32) != t2.challenge_bytes(b"c", 32)


def test_transcript_rng_deterministic(rng):
    t = Transcript(b"proto")
    t.append_message(b"a", b"b")
    r1 = t.build_rng().rekey_with_witness_bytes(b"w", b"secret").finalize(_Fixed())
    r2 = t.build_rng().rekey_with_witness_bytes(b"w", b"secret").finalize(_Fixed())
    assert r1.randbytes(64) == r2.randbytes(64)
    # different witness -> different stream
    r3 = t.build_rng().rekey_with_witness_bytes(b"w", b"other").finalize(_Fixed())
    assert r1.randbytes(32) != r3.randbytes(32)


class _Fixed:
    @staticmethod
    def randbytes(n):
        return bytes(n)
