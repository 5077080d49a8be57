"""R1CS gadget tests (mirrors reference tests/r1cs.rs).

Three gadgets exercise the API the same way the reference's suite does:
a k-shuffle (two-phase randomized constraints), an example arithmetic
gadget with positive/negative cases and serialization, and a
bit-decomposition range gadget including out-of-range rejection.
"""

import random

import pytest

from bulletproofs_tpu import BulletproofGens, PedersenGens, Transcript, Scalar
from bulletproofs_tpu.core.scalar import L
from bulletproofs_tpu.errors import R1CSError
from bulletproofs_tpu.proofs.r1cs import (Prover, Verifier, R1CSProof,
                                          LinearCombination, Variable)

PC = PedersenGens()
BP = BulletproofGens(128, 1)


# ---------------------------------------------------------------------------
# k-shuffle gadget (reference tests/r1cs.rs:22-144): proves y is a
# permutation of x, using a randomized challenge z and the product trick
#   prod(x_i - z) == prod(y_i - z)
# ---------------------------------------------------------------------------

def shuffle_gadget(cs, x, y):
    assert len(x) == len(y)
    k = len(x)
    if k == 1:
        cs.constrain(y[0] - x[0])
        return

    def randomized(cs2):
        z = cs2.challenge_scalar(b"shuffle challenge")
        # last x multiplier
        _, _, last_mulx_out = cs2.multiply(x[k - 1] - z, x[k - 2] - z)
        first_mulx_out = last_mulx_out
        for i in range(k - 3, -1, -1):
            _, _, first_mulx_out = cs2.multiply(first_mulx_out, x[i] - z)
        _, _, last_muly_out = cs2.multiply(y[k - 1] - z, y[k - 2] - z)
        first_muly_out = last_muly_out
        for i in range(k - 3, -1, -1):
            _, _, first_muly_out = cs2.multiply(first_muly_out, y[i] - z)
        cs2.constrain(first_mulx_out - first_muly_out)

    cs.specify_randomized_constraints(randomized)


def shuffle_proof_roundtrip(k, rng, tamper=False):
    rr = random.Random(k)
    inputs = [Scalar(rr.randrange(L)) for _ in range(k)]
    outputs = list(inputs)
    rr.shuffle(outputs)
    if tamper:
        outputs[0] = outputs[0] + Scalar.one()

    # prove
    t = Transcript(b"ShuffleProofTest")
    prover = Prover(PC, t)
    in_pairs = [prover.commit(v, Scalar.random(rng)) for v in inputs]
    out_pairs = [prover.commit(v, Scalar.random(rng)) for v in outputs]
    in_vars = [v for _, v in in_pairs]
    out_vars = [v for _, v in out_pairs]
    shuffle_gadget(prover, in_vars, out_vars)
    proof = prover.prove(BP, rng=rng)

    in_commitments = [c for c, _ in in_pairs]
    out_commitments = [c for c, _ in out_pairs]

    # verify
    t2 = Transcript(b"ShuffleProofTest")
    verifier = Verifier(t2)
    in_vars = [verifier.commit(c) for c in in_commitments]
    out_vars = [verifier.commit(c) for c in out_commitments]
    shuffle_gadget(verifier, in_vars, out_vars)
    verifier.verify(proof, PC, BP, rng=rng)


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5, 6, 7])
def test_shuffle_gadget(k, rng):
    shuffle_proof_roundtrip(k, rng)


@pytest.mark.slow
@pytest.mark.parametrize("k", [24, 42])
def test_shuffle_gadget_larger(k, rng):
    shuffle_proof_roundtrip(k, rng)


def test_shuffle_gadget_rejects_non_permutation(rng):
    with pytest.raises(R1CSError):
        shuffle_proof_roundtrip(4, rng, tamper=True)


def _shuffle_instance(k, seed, rng, tamper=False):
    """Prove one k-shuffle; return (fresh verifier with constraints built,
    proof)."""
    rr = random.Random(seed)
    inputs = [Scalar(rr.randrange(L)) for _ in range(k)]
    outputs = list(inputs)
    rr.shuffle(outputs)
    if tamper:
        outputs[0] = outputs[0] + Scalar.one()
    prover = Prover(PC, Transcript(b"BatchShuffleTest %d" % seed))
    in_pairs = [prover.commit(v, Scalar.random(rng)) for v in inputs]
    out_pairs = [prover.commit(v, Scalar.random(rng)) for v in outputs]
    shuffle_gadget(prover, [v for _, v in in_pairs], [v for _, v in out_pairs])
    proof = prover.prove(BP, rng=rng)

    verifier = Verifier(Transcript(b"BatchShuffleTest %d" % seed))
    in_vars = [verifier.commit(c) for c, _ in in_pairs]
    out_vars = [verifier.commit(c) for c, _ in out_pairs]
    shuffle_gadget(verifier, in_vars, out_vars)
    return verifier, proof


def test_batch_verify_shuffles(rng):
    """Many R1CS proofs (different sizes) fused into one mega-MSM."""
    from bulletproofs_tpu.proofs.r1cs import batch_verify

    items = [_shuffle_instance(k, 100 + k, rng) for k in (2, 3, 5)]
    batch_verify(items, PC, BP, rng=rng)

    # one bad proof poisons the batch
    items = [_shuffle_instance(k, 200 + k, rng) for k in (2, 3)]
    items.append(_shuffle_instance(4, 204, rng, tamper=True))
    with pytest.raises(R1CSError):
        batch_verify(items, PC, BP, rng=rng)


# ---------------------------------------------------------------------------
# example gadget (reference tests/r1cs.rs:226-364):
# proves (a1 + a2) * (b1 + b2) == c1 + c2
# ---------------------------------------------------------------------------

def example_gadget(cs, a1, a2, b1, b2, c1, c2):
    _, _, c_var = cs.multiply(a1 + a2, b1 + b2)
    cs.constrain(c1 + c2 - c_var)


def example_gadget_roundtrip(a1, a2, b1, b2, c1, c2, rng):
    # prove
    t = Transcript(b"R1CSExampleGadget")
    prover = Prover(PC, t)
    values = [Scalar(x) for x in (a1, a2, b1, b2, c1)]
    pairs = [prover.commit(v, Scalar.random(rng)) for v in values]
    vars_ = [v for _, v in pairs]
    example_gadget(prover, *vars_, Scalar(c2))
    proof = prover.prove(BP, rng=rng)
    commitments = [c for c, _ in pairs]

    # serialization roundtrip
    proof = R1CSProof.from_bytes(proof.to_bytes())

    # verify
    t2 = Transcript(b"R1CSExampleGadget")
    verifier = Verifier(t2)
    vars_ = [verifier.commit(c) for c in commitments]
    example_gadget(verifier, *vars_, Scalar(c2))
    verifier.verify(proof, PC, BP, rng=rng)


def test_example_gadget_positive(rng):
    # (3 + 4) * (6 + 1) = (40 + 9)
    example_gadget_roundtrip(3, 4, 6, 1, 40, 9, rng)


def test_example_gadget_negative(rng):
    # (3 + 4) * (6 + 1) != (40 + 10)
    with pytest.raises(R1CSError):
        example_gadget_roundtrip(3, 4, 6, 1, 40, 10, rng)


def test_example_gadget_one_phase_wire_format(rng):
    """No randomized constraints -> phase-2 commitments omitted on the wire
    (version byte 0, reference proof.rs:15-16,83-124)."""
    t = Transcript(b"R1CSExampleGadget")
    prover = Prover(PC, t)
    pairs = [prover.commit(Scalar(x), Scalar.random(rng)) for x in (3, 4, 6, 1, 40)]
    example_gadget(prover, *[v for _, v in pairs], Scalar(9))
    proof = prover.prove(BP, rng=rng)
    wire = proof.to_bytes()
    assert wire[0] == 0  # one-phase tag
    assert proof.missing_phase2_commitments()
    assert len(wire) == proof.serialized_size()


# ---------------------------------------------------------------------------
# range-proof gadget (reference tests/r1cs.rs:369-453)
# ---------------------------------------------------------------------------

def range_proof_gadget(cs, v_var, v_assignment, n):
    """Constrain v in [0, 2^n) via bit decomposition."""
    exp_2 = Scalar.one()
    v_lc = LinearCombination.from_value(v_var)
    for i in range(n):
        if v_assignment is not None:
            bit = (v_assignment >> i) & 1
            a, b, o = cs.allocate_multiplier((Scalar(1 - bit), Scalar(bit)))
        else:
            a, b, o = cs.allocate_multiplier(None)
        # b * (1 - b) = 0  <=>  a * b = 0 with a = 1 - b
        cs.constrain(o.to_lc())
        cs.constrain(a + (b - 1))
        v_lc = v_lc - b * exp_2
        exp_2 = exp_2 + exp_2
    cs.constrain(v_lc)


def range_proof_roundtrip(v, n, rng):
    t = Transcript(b"RangeProofGadget")
    prover = Prover(PC, t)
    com, var = prover.commit(Scalar(v), Scalar.random(rng))
    range_proof_gadget(prover, var, v, n)
    proof = prover.prove(BP, rng=rng)

    t2 = Transcript(b"RangeProofGadget")
    verifier = Verifier(t2)
    var = verifier.commit(com)
    range_proof_gadget(verifier, var, None, n)
    verifier.verify(proof, PC, BP, rng=rng)


@pytest.mark.parametrize("n", [2, 10, 32, 63])
def test_range_proof_gadget_in_range(n, rng):
    rr = random.Random(n)
    for _ in range(2):
        v = rr.randrange(2 ** n)
        range_proof_roundtrip(v, n, rng)


def test_range_proof_gadget_out_of_range(rng):
    # max + 1 is out of range: the prover's truncated bit witness can't satisfy
    with pytest.raises(R1CSError):
        range_proof_roundtrip(2 ** 16, 16, rng)


def test_verifier_allocate_without_assignment(rng):
    """The verifier's allocate path never needs assignments."""
    t = Transcript(b"alloc test")
    verifier = Verifier(t)
    a = verifier.allocate()
    b = verifier.allocate()
    assert a.is_multiplier_left() and b.is_multiplier_right()


def test_prover_allocate_missing_assignment_errors():
    t = Transcript(b"alloc test")
    prover = Prover(PC, t)
    with pytest.raises(R1CSError):
        prover.allocate(None)


def test_native_vector_stage_cross_paths(rng):
    """The native large-circuit vector stages (r1cs_lr_polys/eval,
    r1cs_verify_scalars) are bit-compatible with the Python oracle: the
    k-shuffle roundtrip passes with each prover/verifier path combination
    (any challenge divergence would fail verification)."""
    from bulletproofs_tpu.core._native import LIB
    if LIB is None:
        pytest.skip("native backend not built")
    from bulletproofs_tpu.proofs.r1cs import prover as prover_mod
    from bulletproofs_tpu.proofs.r1cs import verifier as verifier_mod

    old_p, old_v = prover_mod._NATIVE_MIN_N, verifier_mod._NATIVE_MIN_N
    try:
        for p_thresh, v_thresh in ((4, 1 << 40), (1 << 40, 4), (4, 4)):
            prover_mod._NATIVE_MIN_N = p_thresh
            verifier_mod._NATIVE_MIN_N = v_thresh
            shuffle_proof_roundtrip(9, rng)
            with pytest.raises(R1CSError):
                shuffle_proof_roundtrip(5, rng, tamper=True)
    finally:
        prover_mod._NATIVE_MIN_N = old_p
        verifier_mod._NATIVE_MIN_N = old_v


def test_batch_verify_mixed_native_python_paths(rng):
    """A batch mixing proofs above and below the native threshold
    exercises the byte-accumulator grow/fold paths in batch_verify."""
    from bulletproofs_tpu.core._native import LIB
    if LIB is None:
        pytest.skip("native backend not built")
    from bulletproofs_tpu.proofs.r1cs import batch_verify
    from bulletproofs_tpu.proofs.r1cs import verifier as verifier_mod

    old = verifier_mod._NATIVE_MIN_N
    try:
        verifier_mod._NATIVE_MIN_N = 8   # k=9 -> padded 16 >= 8 (native);
                                         # k=3 -> padded 4 < 8 (python)
        items = []
        for k, seed in ((3, 1), (9, 2), (3, 3), (9, 4)):
            v, proof = _shuffle_instance(k, seed, rng)
            items.append((v, proof))
        batch_verify(items, PC, BP, rng=rng)
        # order flipped: native-path proof first, then python-path
        items = []
        for k, seed in ((9, 5), (3, 6)):
            v, proof = _shuffle_instance(k, seed, rng)
            items.append((v, proof))
        batch_verify(items, PC, BP, rng=rng)
        # a tampered member still fails the batch
        items = []
        for k, seed, bad in ((9, 7, False), (3, 8, True)):
            v, proof = _shuffle_instance(k, seed, rng, tamper=bad)
            items.append((v, proof))
        with pytest.raises(R1CSError):
            batch_verify(items, PC, BP, rng=rng)
        # regression: [byte-path pn=32, python-path (folds the buffer back
        # to a 32-long Scalar list), byte-path pn=16] -- the regrow branch
        # must size the new buffers to the FOLDED length, not this proof's
        # smaller pn (previously a ValueError from the ctypes slice assign)
        items = []
        for k, seed in ((17, 9), (3, 10), (9, 11)):
            v, proof = _shuffle_instance(k, seed, rng)
            items.append((v, proof))
        batch_verify(items, PC, BP, rng=rng)
    finally:
        verifier_mod._NATIVE_MIN_N = old


def test_device_mega_msm_path(rng, monkeypatch):
    """The device route of the byte-path verification mega-MSM (cached
    device G/H lanes + one fused MSM; the r1cs_scale production path on
    TPU) accepts valid proofs and rejects tampered ones.  On CPU the inner
    MSM runs the XLA twin of the Pallas kernel."""
    from bulletproofs_tpu.core._native import LIB
    if LIB is None:
        pytest.skip("native backend not built")
    from bulletproofs_tpu.proofs.r1cs import batch_verify
    from bulletproofs_tpu.proofs.r1cs import verifier as verifier_mod

    monkeypatch.setattr(verifier_mod, "_NATIVE_MIN_N", 8)
    monkeypatch.setattr(verifier_mod, "_use_device_msm", lambda pn: pn >= 8)
    shuffle_proof_roundtrip(9, rng)
    with pytest.raises(R1CSError):
        shuffle_proof_roundtrip(5, rng, tamper=True)
    # the batch_verify byte tail through the same device route
    items = [_shuffle_instance(k, 60 + k, rng) for k in (9, 17)]
    batch_verify(items, PC, BP, rng=rng)
    items = [_shuffle_instance(9, 80, rng),
             _shuffle_instance(9, 81, rng, tamper=True)]
    with pytest.raises(R1CSError):
        batch_verify(items, PC, BP, rng=rng)


def test_native_path_rejects_lr_length_mismatch(rng):
    """A directly-constructed proof with len(R_vec) < len(L_vec) must raise
    R1CSError, not under-read the native challenge buffer."""
    from bulletproofs_tpu.core._native import LIB
    if LIB is None:
        pytest.skip("native backend not built")
    from bulletproofs_tpu.proofs.r1cs import verifier as verifier_mod

    old = verifier_mod._NATIVE_MIN_N
    try:
        verifier_mod._NATIVE_MIN_N = 8
        v, proof = _shuffle_instance(9, 42, rng)
        proof.ipp_proof.R_vec = proof.ipp_proof.R_vec[:-1]
        with pytest.raises(R1CSError):
            v.verify(proof, PC, BP, rng=rng)
    finally:
        verifier_mod._NATIVE_MIN_N = old


def test_commit_many_matches_commit_loop(rng):
    """Prover.commit_many (one native consttime MSM pass) is bit-identical
    to the commit() loop -- same compressed V bytes, same transcript
    state -- so proofs built with either commitment form cross-verify."""
    k = 12
    rr = random.Random(99)
    ins = [Scalar(rr.randrange(L)) for _ in range(k)]
    outs = list(ins)
    rr.shuffle(outs)
    vals = ins + outs
    blinds = [Scalar.random(rng) for _ in range(2 * k)]

    p1 = Prover(PC, Transcript(b"cm"))
    pairs1 = [p1.commit(v, b) for v, b in zip(vals, blinds)]
    p2 = Prover(PC, Transcript(b"cm"))
    pairs2 = p2.commit_many(vals, blinds)
    assert [V for V, _ in pairs1] == [V for V, _ in pairs2]

    shuffle_gadget(p2, [v for _, v in pairs2[:k]], [v for _, v in pairs2[k:]])
    proof = p2.prove(BP, rng=rng)

    v = Verifier(Transcript(b"cm"))
    vars_ = v.commit_many([V for V, _ in pairs2])
    shuffle_gadget(v, vars_[:k], vars_[k:])
    v.verify(proof, PC, BP, rng=rng)


def test_commit_many_and_packed_flatten_match_loop(rng):
    """Verifier.commit_many (batched absorb) is byte-identical to the
    commit loop, and flattened_constraints_packed matches the Scalar
    form (VERDICT r4 item 4 hot-path rewrites)."""
    from bulletproofs_tpu.core.scalar import L as _ELL
    import random as _random
    pc = PedersenGens()
    rr = _random.Random(7)
    vals = [Scalar(rr.randrange(_ELL)) for _ in range(8)]
    outs = list(reversed(vals))
    p = Prover(pc, Transcript(b"cmf"))
    pairs = p.commit_many(vals + outs, [Scalar.random(rng) for _ in range(16)])
    ins_c = [c for c, _ in pairs[:8]]
    outs_c = [c for c, _ in pairs[8:]]

    v1 = Verifier(Transcript(b"cmf"))
    a1 = v1.commit_many(ins_c)
    b1 = [v1.commit(c) for c in outs_c]
    v2 = Verifier(Transcript(b"cmf"))
    a2 = [v2.commit(c) for c in ins_c]
    b2 = v2.commit_many(outs_c)
    assert v1._transcript.strobe.buf.raw == v2._transcript.strobe.buf.raw
    assert [x.index for x in a1 + b1] == [x.index for x in a2 + b2]

    shuffle_gadget(v1, a1, b1)
    shuffle_gadget(v2, a2, b2)
    v1._transcript.append_message(b"sync", b"x")
    v2._transcript.append_message(b"sync", b"x")
    z1 = v1._transcript.challenge_scalar(b"z")
    z2 = v2._transcript.challenge_scalar(b"z")
    assert z1.v == z2.v
    v1.pending_multiplier = None
    v2.pending_multiplier = None
    # run the deferred randomized constraints with one shared challenge
    for cb in v1.deferred_constraints:
        from bulletproofs_tpu.proofs.r1cs.verifier import RandomizingVerifier
        cb(RandomizingVerifier(v1))
    for cb in v2.deferred_constraints:
        from bulletproofs_tpu.proofs.r1cs.verifier import RandomizingVerifier
        cb(RandomizingVerifier(v2))
    padded = 1 << (v1.num_vars - 1).bit_length()
    wLs, wRs, wOs, wVs, wcs = v1.flattened_constraints(z1)
    wLb, wRb, wOb, wVp, wcp = v2.flattened_constraints_packed(z1, padded)
    assert wLb == b"".join(s.to_bytes() for s in wLs) + bytes(
        32 * (padded - len(wLs)))
    assert wRb == b"".join(s.to_bytes() for s in wRs) + bytes(
        32 * (padded - len(wRs)))
    assert wOb == b"".join(s.to_bytes() for s in wOs) + bytes(
        32 * (padded - len(wOs)))
    assert [s.v for s in wVp] == [s.v for s in wVs]
    assert wcp.v == wcs.v
