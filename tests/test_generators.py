"""Generator derivation tests (mirrors reference src/generators.rs:289-356)."""

from bulletproofs_tpu.generators import BulletproofGens, PedersenGens


def test_pedersen_commit():
    from bulletproofs_tpu.core.scalar import Scalar
    pc = PedersenGens()
    c = pc.commit(Scalar(5), Scalar(7))
    assert c == pc.B.scalar_mul(Scalar(5)) + pc.B_blinding.scalar_mul(Scalar(7))


def test_aggregated_gens_matches_flat_map():
    bp = BulletproofGens(64, 8)
    for n, m in [(64, 8), (64, 4), (64, 2), (64, 1), (32, 2), (16, 4)]:
        agg_G = bp.G(n, m)
        flat_G = [g for j in range(m) for g in bp.G_vec[j][:n]]
        assert agg_G == flat_G
        agg_H = bp.H(n, m)
        flat_H = [h for j in range(m) for h in bp.H_vec[j][:n]]
        assert agg_H == flat_H


def test_resizing_matches_creating_bigger_gens():
    gens = BulletproofGens(64, 8)
    gen_resized = BulletproofGens(32, 8)
    gen_resized.increase_capacity(64)
    for j in range(8):
        assert gens.G_vec[j] == gen_resized.G_vec[j]
        assert gens.H_vec[j] == gen_resized.H_vec[j]


def test_share_view():
    bp = BulletproofGens(16, 4)
    for j in range(4):
        assert bp.share(j).G(16) == bp.G_vec[j][:16]
        assert bp.share(j).H(8) == bp.H_vec[j][:8]


def test_commit_many_rejects_length_mismatch(rng):
    """Mismatched values/blindings raise instead of zip-truncating (the
    native path would otherwise emit identity commitments for the tail)."""
    import pytest
    from bulletproofs_tpu import Scalar
    pc = PedersenGens()
    vals = [Scalar(i + 1) for i in range(20)]
    blinds = [Scalar.random(rng) for _ in range(19)]
    with pytest.raises(ValueError):
        pc.commit_many(vals, blinds)
    with pytest.raises(ValueError):
        pc.commit_many(vals[:5], blinds[:9])   # short path too
