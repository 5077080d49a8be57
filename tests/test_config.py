"""settings wiring + the constant-time fallback gate."""

import warnings

import pytest

from bulletproofs_tpu.config import (Settings, settings,
                                     VartimeFallbackWarning,
                                     vartime_witness_fallback,
                                     _vartime_warned)


def test_settings_read_env(monkeypatch):
    monkeypatch.setenv("BPTPU_FUSED_VERIFY_CHUNK", "512")
    monkeypatch.setenv("BPTPU_MSM_DEVICE_FLOOR", "4096")
    monkeypatch.setenv("BPTPU_REQUIRE_CONSTTIME", "1")
    s = Settings()
    assert s.fused_verify_chunk == 512
    assert s.msm_device_floor == 4096
    assert s.require_consttime


def test_settings_defaults(monkeypatch):
    for var in ("BPTPU_FUSED_VERIFY_CHUNK", "BPTPU_MSM_DEVICE_FLOOR",
                "BPTPU_REQUIRE_CONSTTIME", "BPTPU_ENABLE_R1CS"):
        monkeypatch.delenv(var, raising=False)
    s = Settings()
    assert s.fused_verify_chunk == 0          # auto
    assert s.msm_device_floor is None         # auto
    assert not s.require_consttime
    assert s.enable_r1cs
    assert s.fused_verify_max_nm == 256   # measured decision, docs/kernels.md
    assert s.verify_chunk_pts == 8192


def test_vartime_gate_warns_by_default():
    _vartime_warned.discard("test-op")
    old = settings.require_consttime
    settings.require_consttime = False
    try:
        with pytest.warns(VartimeFallbackWarning):
            vartime_witness_fallback("test-op")
        # once per call site only
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            vartime_witness_fallback("test-op")
    finally:
        settings.require_consttime = old
        _vartime_warned.discard("test-op")


def test_vartime_gate_raises_when_required():
    old = settings.require_consttime
    settings.require_consttime = True
    try:
        with pytest.raises(RuntimeError, match="constant-time"):
            vartime_witness_fallback("other-op")
    finally:
        settings.require_consttime = old


def test_ipp_prove_gated_without_native(rng):
    """Witness-carrying IPP proving on the pure-Python path is refused
    under require_consttime (VERDICT round 3 item 9)."""
    from bulletproofs_tpu.core._native import LIB
    if LIB is not None:
        pytest.skip("native backend present: the fallback never engages")
    from bulletproofs_tpu import BulletproofGens, PedersenGens, Transcript
    from bulletproofs_tpu.core.scalar import Scalar
    from bulletproofs_tpu.proofs.ipp import InnerProductProof

    bp = BulletproofGens(4, 1)
    g = bp.share(0)
    Q = PedersenGens().B
    ones = [Scalar.one()] * 4
    a = [Scalar(3), Scalar(1), Scalar(4), Scalar(1)]
    b = [Scalar(2), Scalar(7), Scalar(1), Scalar(8)]
    old = settings.require_consttime
    settings.require_consttime = True
    try:
        with pytest.raises(RuntimeError, match="constant-time"):
            InnerProductProof.create(Transcript(b"ct gate"), Q, ones, ones,
                                     g.G(4), g.H(4), a, b)
    finally:
        settings.require_consttime = old


def test_msm_device_floor_setting(monkeypatch):
    """msm_host_auto honors settings.msm_device_floor."""
    from bulletproofs_tpu.ops import vec_msm
    from bulletproofs_tpu import PedersenGens
    from bulletproofs_tpu.core.scalar import Scalar

    old = settings.msm_device_floor
    settings.msm_device_floor = 1 << 30   # never route to device
    try:
        p = vec_msm.msm_host_auto([Scalar(2)], [PedersenGens().B])
        assert p.compress() == (PedersenGens().B + PedersenGens().B).compress()
    finally:
        settings.msm_device_floor = old
