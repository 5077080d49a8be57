"""Linear proof tests (mirrors reference src/linear_proof.rs:409-488)."""

import pytest

from bulletproofs_tpu.core.ristretto import RistrettoPoint, multiscalar_mul
from bulletproofs_tpu.core.scalar import Scalar
from bulletproofs_tpu.generators import BulletproofGens, PedersenGens
from bulletproofs_tpu.proofs.linear import LinearProof
from bulletproofs_tpu.transcript import Transcript
from bulletproofs_tpu.errors import ProofError


def _linear_helper(n, rng):
    bp_gens = BulletproofGens(n, 1)
    G = bp_gens.share(0).G(n)
    pc = PedersenGens()
    F, B = pc.B, pc.B_blinding

    a = [Scalar.random(rng) for _ in range(n)]
    b = [Scalar.random(rng) for _ in range(n)]
    r = Scalar.random(rng)
    # C = <a, G> + r*B + <a,b>*F  (commitment to secret vector AND the value)
    from bulletproofs_tpu.utils.util import inner_product
    c = inner_product(a, b)
    C = multiscalar_mul(a + [r, c], G + [B, F]).compress()

    t = Transcript(b"linearprooftest")
    proof = LinearProof.create(t, rng, C, r, list(a), list(b), list(G), F, B)

    t2 = Transcript(b"linearprooftest")
    proof.verify(t2, C, G, F, B, list(b))

    # serde roundtrip
    proof2 = LinearProof.from_bytes(proof.to_bytes())
    assert len(proof.to_bytes()) == proof.serialized_size()
    t3 = Transcript(b"linearprooftest")
    proof2.verify(t3, C, F=F, B=B, G=G, b_vec=list(b))
    return proof, C, G, F, B, b


@pytest.mark.parametrize("n", [1, 16, 32, 64])
def test_linear_roundtrip(n, rng):
    _linear_helper(n, rng)


def test_linear_rejects_wrong_b(rng):
    proof, C, G, F, B, b = _linear_helper(16, rng)
    bad_b = list(b)
    bad_b[3] = bad_b[3] + Scalar.one()
    t = Transcript(b"linearprooftest")
    with pytest.raises(ProofError):
        proof.verify(t, C, G, F, B, bad_b)


def test_linear_batch_verify(rng):
    """Many linear proofs (different sizes) fused into one identity MSM."""
    bp_gens = BulletproofGens(32, 1)
    G = bp_gens.share(0).G(32)
    pc = PedersenGens()
    F, B = pc.B, pc.B_blinding
    from bulletproofs_tpu.utils.util import inner_product

    def make(n, label):
        a = [Scalar.random(rng) for _ in range(n)]
        b = [Scalar.random(rng) for _ in range(n)]
        r = Scalar.random(rng)
        C = multiscalar_mul(a + [r, inner_product(a, b)],
                            G[:n] + [B, F]).compress()
        proof = LinearProof.create(Transcript(label), rng, C, r,
                                   list(a), list(b), list(G[:n]), F, B)
        return proof, C, b, label

    made = [make(n, b"lbv %d" % n) for n in (4, 16, 32)]
    LinearProof.batch_verify(
        [(p, Transcript(l), C, list(b)) for p, C, b, l in made],
        G, F, B, rng=rng)

    # tampered scalar poisons the batch
    p0, C0, b0, l0 = made[0]
    bad = LinearProof.from_bytes(p0.to_bytes())
    bad.a = bad.a + Scalar.one()
    items = [(bad, Transcript(l0), C0, list(b0))] + [
        (p, Transcript(l), C, list(b)) for p, C, b, l in made[1:]]
    with pytest.raises(ProofError):
        LinearProof.batch_verify(items, G, F, B, rng=rng)

    # empty batch refuses
    with pytest.raises(ProofError):
        LinearProof.batch_verify([], G, F, B, rng=rng)

    # device route (forced; XLA path on CPU): same accepts and rejects --
    # decompression validity and the identity check both run on device
    LinearProof.batch_verify(
        [(p, Transcript(l), C, list(b)) for p, C, b, l in made],
        G, F, B, rng=rng, device=True)
    with pytest.raises(ProofError):
        items = [(bad, Transcript(l0), C0, list(b0))] + [
            (p, Transcript(l), C, list(b)) for p, C, b, l in made[1:]]
        LinearProof.batch_verify(items, G, F, B, rng=rng, device=True)
    # an invalid point encoding fails on the device validity flags
    garb = LinearProof.from_bytes(p0.to_bytes())
    garb.S = b"\xff" * 32
    with pytest.raises(ProofError):
        items = [(garb, Transcript(l0), C0, list(b0))] + [
            (p, Transcript(l), C, list(b)) for p, C, b, l in made[1:]]
        LinearProof.batch_verify(items, G, F, B, rng=rng, device=True)


def test_linear_rejects_wrong_commitment(rng):
    proof, C, G, F, B, b = _linear_helper(16, rng)
    bad_C = multiscalar_mul([Scalar(7)], [F]).compress()
    t = Transcript(b"linearprooftest")
    with pytest.raises(ProofError):
        proof.verify(t, bad_C, G, F, B, list(b))


def test_linear_batch_verify_native_replay(rng):
    """Uniform-n batches route through linear_verify_replay_batch_c (one
    C++ call: lockstep transcript replay, b-fold, shared inversion, subset
    products).  Cross-checks against the Python oracle path: same
    accept/reject behavior and byte-identical final transcript states."""
    from bulletproofs_tpu.core.ristretto import _NATIVE
    if _NATIVE is None or not hasattr(_NATIVE, "linear_verify_replay_batch_c"):
        pytest.skip("native replay not built")
    n = 16
    bp_gens = BulletproofGens(n, 1)
    G = bp_gens.share(0).G(n)
    pc = PedersenGens()
    F, B = pc.B, pc.B_blinding
    from bulletproofs_tpu.utils.util import inner_product

    def make(label):
        a = [Scalar.random(rng) for _ in range(n)]
        b = [Scalar.random(rng) for _ in range(n)]
        r = Scalar.random(rng)
        C = multiscalar_mul(a + [r, inner_product(a, b)],
                            G + [B, F]).compress()
        proof = LinearProof.create(Transcript(label), rng, C, r,
                                   list(a), list(b), list(G), F, B)
        return proof, C, b, label

    made = [make(b"lnat %d" % i) for i in range(5)]

    # native path (uniform n, no injected msm)
    ts_native = [Transcript(l) for _, _, _, l in made]
    LinearProof.batch_verify(
        [(p, t, C, list(b)) for (p, C, b, _), t in zip(made, ts_native)],
        G, F, B, rng=rng)

    # Python oracle path (msm injection disables the native replay)
    ts_py = [Transcript(l) for _, _, _, l in made]
    LinearProof.batch_verify(
        [(p, t, C, list(b)) for (p, C, b, _), t in zip(made, ts_py)],
        G, F, B, rng=rng, msm=multiscalar_mul)

    for tn, tp in zip(ts_native, ts_py):
        assert tn.strobe.buf.raw == tp.strobe.buf.raw

    # tampered proof scalar rejects through the native path
    p0, C0, b0, l0 = made[0]
    bad = LinearProof.from_bytes(p0.to_bytes())
    bad.a = bad.a + Scalar.one()
    items = [(bad, Transcript(l0), C0, list(b0))] + [
        (p, Transcript(l), C, list(b)) for p, C, b, l in made[1:]]
    with pytest.raises(ProofError):
        LinearProof.batch_verify(items, G, F, B, rng=rng)

    # identity L encoding rejects (structural precheck)
    zeroL = LinearProof.from_bytes(p0.to_bytes())
    zeroL.L_vec = [bytes(32)] + list(zeroL.L_vec[1:])
    items = [(zeroL, Transcript(l0), C0, list(b0))] + [
        (p, Transcript(l), C, list(b)) for p, C, b, l in made[1:]]
    with pytest.raises(ProofError):
        LinearProof.batch_verify(items, G, F, B, rng=rng)

    # forced device route over the native replay (XLA on CPU)
    LinearProof.batch_verify(
        [(p, Transcript(l), C, list(b)) for p, C, b, l in made],
        G, F, B, rng=rng, device=True)
