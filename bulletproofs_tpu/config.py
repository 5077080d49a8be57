"""Framework configuration (the reference's Cargo-feature analog,
SURVEY.md §5 "config/flag system").

One `settings` object holding every runtime knob the framework actually
reads.  Each field is seeded from its BPTPU_* environment variable at
import; code paths read `settings.<field>` at call time, so tests and
embedders can also flip them directly before first use.

| field                  | env var                   | consumer |
|------------------------|---------------------------|----------|
| no_native              | BPTPU_NO_NATIVE           | core/_native.py (force pure-Python) |
| compile_cache_dir      | BPTPU_COMPILE_CACHE       | ops/__init__.py (persistent XLA cache) |
| msm_device_floor       | BPTPU_MSM_DEVICE_FLOOR    | ops/vec_msm.msm_host_auto crossover |
| linear_device_msm_floor| BPTPU_LINEAR_DEVICE_FLOOR | proofs/linear.batch_verify device route |
| r1cs_device_msm_floor  | BPTPU_R1CS_DEVICE_FLOOR   | proofs/r1cs/verifier device mega-MSM |
| no_fold_pallas         | BPTPU_NO_FOLD_PALLAS      | ops/fold_pallas.usable |
| sharded_canonical      | BPTPU_SHARDED_CANONICAL   | parallel/sharded_msm one-executable CPU-mesh shape |
| segmented_round_pairing| BPTPU_SEGMENTED_ROUND_PAIRING | ops/prover_stages.prove_rest_segmented round pairs |
| fused_verify_chunk     | BPTPU_FUSED_VERIFY_CHUNK  | parallel/batch_verify sub-batch size (0 = default) |
| verify_chunk_pts       | BPTPU_VERIFY_CHUNK_PTS    | parallel/batch_verify chunked pipeline |
| fused_verify_max_nm    | BPTPU_FUSED_VERIFY_MAX_NM | parallel/batch_verify Pallas-emit VMEM gate |
| require_consttime      | BPTPU_REQUIRE_CONSTTIME   | vartime_witness_fallback (hard gate) |
| enable_r1cs            | BPTPU_ENABLE_R1CS         | proofs/r1cs (the `yoloproofs` feature flag) |
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


def _env_opt_int(name: str):
    v = os.environ.get(name)
    if not v:
        return None
    try:
        return int(v)
    except ValueError:
        return None


@dataclass
class Settings:
    # --- backend selection ---------------------------------------------------
    # force the pure-Python curve/scalar oracle (tests cross-check backends)
    no_native: bool = field(
        default_factory=lambda: bool(os.environ.get("BPTPU_NO_NATIVE")))

    # persistent XLA compile cache directory ("" / "0" disables; None = the
    # repo-local .jax_cache default, applied in ops/__init__.py with a
    # CPU-only guard since CPU AOT entries are not portable across hosts)
    compile_cache_dir: str | None = field(
        default_factory=lambda: os.environ.get("BPTPU_COMPILE_CACHE"))

    # --- MSM routing ----------------------------------------------------------
    # point count above which msm_host_auto routes to the device kernel;
    # None = auto (2^18 with the C++ backend built, 32 without)
    msm_device_floor: int | None = field(
        default_factory=lambda: _env_opt_int("BPTPU_MSM_DEVICE_FLOOR"))

    # total point count from which LinearProof.batch_verify routes its
    # fused MSM to the device kernel on TPU (dyn points upload compressed).
    # Measured round 5 (after the native batched replay landed): the host
    # C++ route wins every practical config -- n=1024 x2048 proofs (46k
    # points) is 1174 ms host vs 1244 ms device, n=1024 x64 is 54 vs 85 ms
    # -- because the shared C++ replay floors both routes and the device
    # adds tunnel-sync overhead.  Default effectively disables the device
    # route (documented negative, docs/kernels.md); force with device=True
    # or lower this floor on locally-attached hardware.
    linear_device_msm_floor: int = field(
        default_factory=lambda: _env_int("BPTPU_LINEAR_DEVICE_FLOOR",
                                         1 << 20))

    # circuit size (padded multiplier count) from which the R1CS
    # verification mega-MSM routes to the device kernel on TPU
    r1cs_device_msm_floor: int = field(
        default_factory=lambda: _env_int("BPTPU_R1CS_DEVICE_FLOOR", 1 << 14))

    # disable the Pallas generator-fold kernel (IPP prover fallback path)
    no_fold_pallas: bool = field(
        default_factory=lambda: bool(os.environ.get("BPTPU_NO_FOLD_PALLAS")))

    # segmented m>1 prover: fuse IPP round PAIRS into one dispatch
    # (round_step2_fused).  Measured 10.26 -> 10.12 ms/proof at m=16
    # batch 512 warm, but the extra ~2x-sized executable costs ~90 s of
    # cold staging on a bad tunnel day -- default off; enable for
    # long-lived serving processes.
    segmented_round_pairing: bool = field(
        default_factory=lambda: bool(
            os.environ.get("BPTPU_SEGMENTED_ROUND_PAIRING")))

    # CPU/virtual meshes: route every sharded MSM through ONE canonical
    # executable shape (chunk + fold for larger inputs) instead of a fresh
    # XLA-CPU compile per (groups, k_steps) pair.  "0" restores the
    # per-size shapes (parallel/sharded_msm.py).
    sharded_canonical: bool = field(
        default_factory=lambda: os.environ.get(
            "BPTPU_SHARDED_CANONICAL", "1") != "0")

    # --- batched verification -------------------------------------------------
    # fused-path sub-batch size (proofs per device dispatch); 0 = auto-tune
    # per batch (parallel/batch_verify picks a size that balances host replay
    # against device-tail overlap)
    fused_verify_chunk: int = field(
        default_factory=lambda: _env_int("BPTPU_FUSED_VERIFY_CHUNK", 0))

    # chunked-pipeline dynamic-point budget per chunk
    verify_chunk_pts: int = field(
        default_factory=lambda: _env_int("BPTPU_VERIFY_CHUNK_PTS", 8192))

    # largest aggregation size nm routed through the fully-fused Pallas emit
    # kernel (its VMEM working set scales with nm: ~16 MB at nm=64, capped
    # at 112 MB -> nm=256 fits a v5e); larger aggregations take the chunked
    # C++-emit pipeline.  Measured decision in docs/kernels.md: at m=2/m=4,
    # batch=256, the fused path beat chunked 71->48 ms / 78->50 ms.
    fused_verify_max_nm: int = field(
        default_factory=lambda: _env_int("BPTPU_FUSED_VERIFY_MAX_NM", 256))

    # --- constant-time policy -------------------------------------------------
    # witness-carrying proving REQUIRES the constant-time native backend:
    # raise instead of falling back to the variable-time pure-Python oracle
    # (which, like any Python big-int code, makes no timing guarantees).
    # Default off: the fallback warns once and proceeds (test oracle use).
    require_consttime: bool = field(
        default_factory=lambda: bool(os.environ.get("BPTPU_REQUIRE_CONSTTIME")))

    # --- feature flags (reference Cargo features) -----------------------------
    # the reference gates R1CS behind the unstable `yoloproofs` feature
    # (/root/reference/Cargo.toml); here it is on by default and this flag
    # is enforced at proofs/r1cs import
    enable_r1cs: bool = field(
        default_factory=lambda: os.environ.get("BPTPU_ENABLE_R1CS", "1") != "0")


settings = Settings()


class VartimeFallbackWarning(RuntimeWarning):
    """A witness-carrying operation ran on the variable-time pure-Python
    path because the constant-time native backend is unavailable."""


_vartime_warned: set = set()


def vartime_witness_fallback(what: str) -> None:
    """Gate for witness-carrying operations about to run variable-time.

    The native/device paths honor the reference's MultiscalarMul (consttime)
    vs VartimeMultiscalarMul split (/root/reference/src/range_proof/party.rs
    102-124); the pure-Python oracle cannot.  Secrets must not route through
    it silently: raise under settings.require_consttime, warn once per call
    site otherwise."""
    if settings.require_consttime:
        raise RuntimeError(
            f"{what}: constant-time native backend unavailable and "
            "BPTPU_REQUIRE_CONSTTIME is set; refusing to run "
            "witness-carrying code on the variable-time pure-Python path "
            "(build native/libbptranscript.so)")
    if what not in _vartime_warned:
        _vartime_warned.add(what)
        import warnings
        warnings.warn(
            f"{what}: running witness-carrying code on the VARIABLE-TIME "
            "pure-Python fallback (native backend unavailable); timing "
            "side-channels are not mitigated on this path",
            VartimeFallbackWarning, stacklevel=3)
