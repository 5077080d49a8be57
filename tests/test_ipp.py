"""Inner-product proof tests (mirrors reference src/inner_product_proof.rs:426-552)."""

import random

import pytest

from bulletproofs_tpu.core.ristretto import RistrettoPoint, multiscalar_mul
from bulletproofs_tpu.core.scalar import Scalar, L
from bulletproofs_tpu.generators import BulletproofGens, GeneratorsChain
from bulletproofs_tpu.proofs.ipp import InnerProductProof
from bulletproofs_tpu.transcript import Transcript
from bulletproofs_tpu.utils.util import inner_product, exp_iter_take
from bulletproofs_tpu.errors import ProofError


def _ipp_test_helper(n: int):
    rr = random.Random(n)
    bp_gens = BulletproofGens(n, 1)
    G = bp_gens.share(0).G(n)
    H = bp_gens.share(0).H(n)

    Q = GeneratorsChain(b"test point").take(1)[0]

    a = [Scalar(rr.randrange(L)) for _ in range(n)]
    b = [Scalar(rr.randrange(L)) for _ in range(n)]
    c = inner_product(a, b)

    y_inv = Scalar(rr.randrange(1, L))
    G_factors = [Scalar.one()] * n
    H_factors = exp_iter_take(y_inv, n)

    b_prime = [bi * yi for bi, yi in zip(b, H_factors)]
    a_prime = list(a)

    # P = <a', G> + <b', H> + c*Q (the verification statement)
    P = multiscalar_mul(a_prime + b_prime + [c], G + H + [Q])

    t = Transcript(b"innerproducttest")
    proof = InnerProductProof.create(
        t, Q, G_factors, H_factors, list(G), list(H), list(a), list(b))

    t2 = Transcript(b"innerproducttest")
    proof.verify(n, t2, [Scalar.one()] * n, exp_iter_take(y_inv, n), P, Q, G, H)

    # serde roundtrip
    proof2 = InnerProductProof.from_bytes(proof.to_bytes())
    t3 = Transcript(b"innerproducttest")
    proof2.verify(n, t3, [Scalar.one()] * n, exp_iter_take(y_inv, n), P, Q, G, H)


@pytest.mark.parametrize("n", [1, 2, 4, 32, 64])
def test_ipp_roundtrip(n):
    _ipp_test_helper(n)


def test_inner_product():
    a = [Scalar(x) for x in (1, 2, 3, 4)]
    b = [Scalar(x) for x in (2, 3, 4, 5)]
    assert inner_product(a, b) == Scalar(40)


def test_verification_fails_on_wrong_statement():
    n = 4
    rr = random.Random(7)
    bp_gens = BulletproofGens(n, 1)
    G, H = bp_gens.share(0).G(n), bp_gens.share(0).H(n)
    Q = GeneratorsChain(b"test point").take(1)[0]
    a = [Scalar(rr.randrange(L)) for _ in range(n)]
    b = [Scalar(rr.randrange(L)) for _ in range(n)]
    ones = [Scalar.one()] * n
    t = Transcript(b"innerproducttest")
    proof = InnerProductProof.create(t, Q, ones, ones, list(G), list(H), list(a), list(b))
    bad_P = Q  # wrong commitment
    t2 = Transcript(b"innerproducttest")
    with pytest.raises(ProofError):
        proof.verify(n, t2, ones, ones, bad_P, Q, G, H)
