"""Secret wiping: consumed prover states drop their witness material.

The reference zeroizes party states, the R1CS prover's blinding vectors,
and the poly types on Drop (party.rs:148-153,241-259,309-319,
r1cs/prover.rs:672-679, util.rs:170-217) and unit-tests that the memory
is actually cleared (util.rs:270-397).  Python ints are immutable, so the
equivalent here is: containers emptied, references dropped, and the
native prover path's ctypes scalar buffers memset to zero.
"""

import secrets

from bulletproofs_tpu import BulletproofGens, PedersenGens, Transcript, Scalar
from bulletproofs_tpu.proofs.party import Party
from bulletproofs_tpu.proofs.dealer import Dealer
from bulletproofs_tpu.utils.util import VecPoly1, VecPoly3, Poly2, Poly6


class Rng:
    randbytes = staticmethod(secrets.token_bytes)


def test_party_states_wiped_after_transitions():
    rng = Rng()
    n = 8
    pc, bp = PedersenGens(), BulletproofGens(n, 1)
    t = Transcript(b"zeroize")
    dealer = Dealer.new(bp, pc, t, n, 1)

    p0 = Party.new(bp, pc, 5, Scalar.random(rng), n)
    p1, bc = p0.assign_position(0, rng)
    assert p0.v is None and p0.v_blinding is None

    dealer, bit_challenge = dealer.receive_bit_commitments([bc])
    p2, pcm = p1.apply_challenge(bit_challenge, rng)
    assert p1.v is None and p1.v_blinding is None
    assert p1.a_blinding is None and p1.s_blinding is None
    assert p1.s_L == [] and p1.s_R == []

    dealer, poly_challenge = dealer.receive_poly_commitments([pcm])
    share = p2.apply_challenge(poly_challenge)
    assert p2.v_blinding is None and p2.a_blinding is None
    assert p2.s_blinding is None and p2.t_1_blinding is None
    assert p2.l_poly.c0 == [] and p2.l_poly.c1 == []
    assert p2.r_poly.c0 == [] and p2.r_poly.c1 == []
    assert (p2.t_poly.a is None and p2.t_poly.b is None
            and p2.t_poly.c is None)

    # the share still carries what the protocol needs
    proof = dealer.receive_trusted_shares([share])
    assert len(share.l_vec) == n and proof is not None


def test_poly_wipe_methods():
    one = Scalar.one()
    vp1 = VecPoly1([one] * 4, [one] * 4)
    vp1.wipe()
    assert vp1.c0 == [] and vp1.c1 == []

    vp3 = VecPoly3.zero(4)
    vp3.wipe()
    assert all(c == [] for c in vp3.c)

    p2 = Poly2(one, one, one)
    p2.wipe()
    assert p2.a is None and p2.b is None and p2.c is None

    p6 = Poly6(one, one, one, one, one, one)
    p6.wipe()
    assert p6.t == [None] * 6
