"""Fused batch verification tests (CPU backend; small sizes to keep compile
time down -- real-TPU throughput is bench.py's job)."""

import pytest

from bulletproofs_tpu import (BulletproofGens, PedersenGens, RangeProof,
                              Transcript, Scalar, ProofError)
from bulletproofs_tpu.parallel import BatchVerifier

BP = BulletproofGens(64, 8)
PC = PedersenGens()


def _make_proofs(k, n, rng):
    proofs, vcss, labels = [], [], []
    for i in range(k):
        label = b"batch %d" % i
        t = Transcript(label)
        p, vcs = RangeProof.prove_multiple(
            BP, PC, t, [(i * 31 + 5) % (1 << n)], [Scalar.random(rng)], n,
            rng=rng)
        proofs.append(p)
        vcss.append(vcs)
        labels.append(label)
    return proofs, vcss, labels


@pytest.mark.slow
@pytest.mark.parametrize("prefer_host", [True, False])
def test_batch_verify_accepts_and_rejects(rng, prefer_host):
    proofs, vcss, labels = _make_proofs(3, 8, rng)
    bv = BatchVerifier(BP, PC, n=8, m=1, prefer_host=prefer_host)
    bv.verify_batch(proofs, vcss, [Transcript(l) for l in labels], rng=rng)

    # tampered proof in the batch
    bad = RangeProof.from_bytes(proofs[1].to_bytes())
    bad.t_x = bad.t_x + Scalar.one()
    with pytest.raises(ProofError):
        bv.verify_batch([proofs[0], bad, proofs[2]], vcss,
                        [Transcript(l) for l in labels], rng=rng)

    # wrong transcript binding
    with pytest.raises(ProofError):
        bv.verify_batch(proofs, vcss,
                        [Transcript(l) for l in (labels[0], b"x", labels[2])],
                        rng=rng)


def test_fast_scalar_path_matches_reference_path(rng):
    """verification_scalars_ints must produce exactly the scalars of the
    Scalar-object path for identical rng draws."""
    import random

    class FixedRng:
        def __init__(self, seed):
            self.r = random.Random(seed)

        def randbytes(self, n):
            return self.r.randbytes(n)

    proofs, vcss, labels = _make_proofs(1, 8, rng)
    proof, vcs, label = proofs[0], vcss[0], labels[0]

    s_slow, comp, static_pts, vcb = proof.verification_scalars_and_points(
        BP, PC, Transcript(label), vcs, 8, rng=FixedRng(7))
    d_fast, st_fast, pts_fast = proof.verification_scalars_ints(
        BP, PC, Transcript(label), vcs, 8, rng=FixedRng(7))
    k = len(comp)
    ns = len(static_pts)
    assert [s.v for s in s_slow[:k]] + [s.v for s in s_slow[k + ns:]] == d_fast
    assert [s.v for s in s_slow[k:k + ns]] == st_fast
    assert pts_fast == comp + vcb


@pytest.mark.slow
@pytest.mark.parametrize("prefer_host", [True, False])
def test_batch_verify_aggregated_m2(rng, prefer_host):
    """Fused batching over aggregated (m = 2) proofs."""
    n, m = 8, 2
    proofs, vcss, labels = [], [], []
    for i in range(2):
        label = b"agg %d" % i
        p, vcs = RangeProof.prove_multiple(
            BP, PC, Transcript(label), [i + 1, 200 + i],
            [Scalar.random(rng), Scalar.random(rng)], n, rng=rng)
        proofs.append(p)
        vcss.append(vcs)
        labels.append(label)
    bv = BatchVerifier(BP, PC, n=n, m=m, prefer_host=prefer_host)
    bv.verify_batch(proofs, vcss, [Transcript(l) for l in labels], rng=rng)
    with pytest.raises(ProofError):
        bv.verify_batch(proofs, [vcss[0], vcss[0]],
                        [Transcript(l) for l in labels], rng=rng)


@pytest.mark.slow
def test_batch_verify_lockstep_groups(rng):
    """count >= 8 exercises the full-width 8-way pooled transcript replay
    and (on IFMA CPUs) the 8-proof-lockstep g/h scalar emit, including a
    ragged 3-proof tail group."""
    proofs, vcss, labels = _make_proofs(11, 8, rng)
    bv = BatchVerifier(BP, PC, n=8, m=1, prefer_host=True)
    bv.verify_batch(proofs, vcss, [Transcript(l) for l in labels], rng=rng)
    bad = RangeProof.from_bytes(proofs[9].to_bytes())
    bad.t_x = bad.t_x + Scalar.one()
    tampered = proofs[:9] + [bad] + proofs[10:]
    with pytest.raises(ProofError):
        bv.verify_batch(tampered, vcss, [Transcript(l) for l in labels],
                        rng=rng)


def test_host_prep_batch_matches_single_prep():
    """rangeproof_verify_prep_batch must emit byte-identical dyn/static
    scalars and transcript states to per-proof rangeproof_verify_prep, at
    a count (11) that spans one full 8-lane group plus a ragged tail --
    pinning the pooled Keccak replay and the IFMA lockstep emit against
    the scalar path with synthetic (non-verifying) proof bytes."""
    import ctypes
    import random as _random

    from bulletproofs_tpu.parallel.batch_verify import _load_native_prep

    lib = _load_native_prep()
    if lib is None:
        pytest.skip("native prep unavailable")
    r = _random.Random(1234)

    def rand_scalar32():
        b = bytearray(r.randbytes(32))
        b[31] &= 0x0F  # < 2^252 -> canonical mod l
        return bytes(b)

    def rand_point32():
        return bytes([1 + r.randrange(255)]) + r.randbytes(31)

    n, m, count = 8, 2, 11
    lg = (n * m).bit_length() - 1
    plen = 32 * (9 + 2 * lg)
    n_dyn_per = 4 + 2 * lg + m
    nstatic = 2 + 2 * n * m

    proofs = [
        b"".join([rand_point32() for _ in range(4)] +
                 [rand_scalar32() for _ in range(3)] +
                 [rand_point32() for _ in range(2 * lg)] +
                 [rand_scalar32() for _ in range(2)])
        for _ in range(count)
    ]
    vcss = [b"".join(rand_point32() for _ in range(m)) for _ in range(count)]
    cr = r.randbytes(128 * count)

    ts = [Transcript(b"prep equiv %d" % i) for i in range(count)]
    ssize = len(ts[0].strobe.buf.raw)
    strobes = ctypes.create_string_buffer(
        b"".join(t.strobe.buf.raw for t in ts), ssize * count)
    dyn_b = ctypes.create_string_buffer(32 * count * n_dyn_per)
    stat_b = ctypes.create_string_buffer(32 * nstatic)
    rc = lib.rangeproof_verify_prep_batch(
        strobes, ctypes.c_size_t(ssize), b"".join(proofs),
        ctypes.c_size_t(plen), b"".join(vcss), ctypes.c_uint64(n),
        ctypes.c_uint64(m), ctypes.c_uint64(count), cr, dyn_b, stat_b)
    assert rc == 0

    stat_ref = ctypes.create_string_buffer(32 * nstatic)
    for i in range(count):
        sb = ctypes.create_string_buffer(
            Transcript(b"prep equiv %d" % i).strobe.buf.raw, ssize)
        d1 = ctypes.create_string_buffer(32 * n_dyn_per)
        rc1 = lib.rangeproof_verify_prep(
            sb, proofs[i], ctypes.c_size_t(plen), vcss[i],
            ctypes.c_uint64(n), ctypes.c_uint64(m),
            cr[128 * i: 128 * i + 64], cr[128 * i + 64: 128 * i + 128],
            d1, stat_ref)
        assert rc1 == 0
        assert strobes.raw[i * ssize: (i + 1) * ssize] == sb.raw
        assert dyn_b.raw[32 * n_dyn_per * i: 32 * n_dyn_per * (i + 1)] == \
            d1.raw
    assert stat_b.raw == stat_ref.raw
