"""Batched range-proof verification: many proofs fused into ONE MSM.

Extends the reference's random-linear-combination batching (it batches two
equations per proof, src/range_proof/mod.rs:396,418-419) across *proofs*
(SURVEY.md §2c.3, the BASELINE "1000 proofs as one giant MSM" config):

    sum_p r_p * MegaCheck_p == identity

Each proof contributes 4 + 2*lg(nm) + m dynamic points (A, S, T_1, T_2,
L_i, R_i, V_j); the 2nm + 2 static points (B, B~, G, H) are shared, their
per-proof scalars summed host-side.  Dynamic points are batch-decompressed
on device; the fused MSM runs single-chip (ops/vec_msm.py) or across a
mesh (parallel/sharded_msm.py).  All device math uses the lane-major core
(ops/vec_field.py layout).

Host work per proof (transcript replay + verification scalars) is the
sequential Fiat-Shamir part; it runs in native C++ when the extension is
built (native/verify_prep.cpp, bit-identical to the Python path and
cross-validated in tests) and in Python otherwise.
"""

from __future__ import annotations

import secrets
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.scalar import L
from ..errors import ProofError
from ..generators import BulletproofGens, PedersenGens
from ..ops import vec_curve as C
from ..ops import vec_msm
from ..transcript import Transcript


def _load_native_prep():
    """ctypes handle to the C++ verification-prep fast path."""
    import ctypes, os
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    so = os.path.join(here, "native", "libbptranscript.so")
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.rangeproof_verify_prep.restype = ctypes.c_int
        return lib
    except (OSError, AttributeError):
        return None


_NATIVE_PREP = _load_native_prep()


class BatchVerifier:
    """Caches device-resident generators for (n, m) and verifies batches of
    aggregated range proofs in one fused MSM."""

    def __init__(self, bp_gens: BulletproofGens, pc_gens: PedersenGens,
                 n: int, m: int = 1, mesh=None, use_native: bool = True):
        self.bp_gens = bp_gens
        self.pc_gens = pc_gens
        self.n = n
        self.m = m
        self.mesh = mesh
        self.use_native = use_native and _NATIVE_PREP is not None
        static_host = ([pc_gens.B_blinding, pc_gens.B]
                       + bp_gens.G(n, m) + bp_gens.H(n, m))
        self._static_dev = jnp.asarray(C.points_to_lanes(static_host))
        self._num_static = len(static_host)

    def verify_batch(self, proofs: Sequence, value_commitments: List[List[bytes]],
                     transcripts: List[Transcript], rng=None) -> None:
        """Verify all proofs or raise ProofError.

        Each proof gets its own transcript (replayed in place) and list of
        m value commitments.  Raises on the first structural error; a failed
        fused check raises VerificationError (callers wanting the failing
        index can bisect with verify_batch on sub-batches -- O(log) fused
        MSMs instead of one per proof).
        """
        rng = rng or _SystemRandom()
        np_proofs = len(proofs)
        assert np_proofs == len(value_commitments) == len(transcripts)

        if self.use_native:
            dyn_blob, static_acc, dyn_bytes = self._prep_native(
                proofs, value_commitments, transcripts, rng)
            dyn_scalars = np.frombuffer(dyn_blob, np.uint8).reshape(-1, 32)
        else:
            dyn_ints = []
            dyn_bytes = []
            static_acc = [0] * self._num_static
            for proof, vcs, transcript in zip(proofs, value_commitments, transcripts):
                dyn_s, static_s, dyn_pts = proof.verification_scalars_ints(
                    self.bp_gens, self.pc_gens, transcript, vcs, self.n, rng=rng)
                r = int.from_bytes(rng.randbytes(64), "little") % L
                dyn_ints.extend(r * s % L for s in dyn_s)
                dyn_bytes.extend(dyn_pts)
                for j, s in enumerate(static_s):
                    static_acc[j] = (static_acc[j] + r * s) % L
            dyn_scalars = vec_msm.scalars_to_bytes(dyn_ints)[:, :32]

        # pad the decompression batch to a shape quantum so compiled programs
        # are reused across batch sizes (identity encodings are valid, scalar 0)
        n_dyn = len(dyn_bytes)
        if n_dyn <= 2048:
            padded = 1 << max(0, (n_dyn - 1)).bit_length()
        else:
            padded = -(-n_dyn // 4096) * 4096
        dyn_bytes = list(dyn_bytes) + [bytes(32)] * (padded - n_dyn)

        raw = np.frombuffer(b"".join(dyn_bytes), np.uint8).reshape(-1, 32)
        valid, dyn_pts = C.decompress_bytes(raw)
        if not valid.all():
            raise ProofError.verification()

        all_points = jnp.concatenate([dyn_pts, self._static_dev], axis=-1)
        sbytes = np.zeros((padded + self._num_static, 33), np.uint8)
        sbytes[:n_dyn, :32] = dyn_scalars
        sbytes[padded:, :32] = np.frombuffer(
            b"".join(int(s).to_bytes(32, "little") for s in static_acc),
            np.uint8).reshape(-1, 32)

        if self.mesh is not None and self.mesh.devices.size > 1:
            from .sharded_msm import sharded_msm_lanes
            result = sharded_msm_lanes(all_points, sbytes, self.mesh)
        else:
            result = vec_msm.msm_lanes_auto(all_points, sbytes)

        if not bool(np.asarray(jax.device_get(C._is_identity_jit(result)))[0]):
            raise ProofError.verification()

    def _prep_native(self, proofs, value_commitments, transcripts, rng):
        """C++ per-proof prep: returns (dyn_scalar_blob, static_acc list,
        dyn_point_bytes list)."""
        import ctypes

        n, m = self.n, self.m
        nm = n * m
        lg = (nm).bit_length() - 1
        n_dyn = 4 + 2 * lg + m
        dyn_blob = bytearray()
        dyn_bytes: List[bytes] = []
        static_buf = ctypes.create_string_buffer(32 * self._num_static)

        for proof, vcs, transcript in zip(proofs, value_commitments, transcripts):
            if len(vcs) != m or len(proof.ipp_proof.L_vec) != lg:
                raise ProofError.verification()
            pb = proof.to_bytes()
            dyn_out = ctypes.create_string_buffer(32 * n_dyn)
            rc = _NATIVE_PREP.rangeproof_verify_prep(
                transcript.strobe.buf, pb, len(pb), b"".join(vcs),
                ctypes.c_uint64(n), ctypes.c_uint64(m),
                rng.randbytes(64), rng.randbytes(64), dyn_out, static_buf)
            if rc != 0:
                raise ProofError.verification()
            dyn_blob += dyn_out.raw
            dyn_bytes.extend([proof.A, proof.S, proof.T_1, proof.T_2]
                             + proof.ipp_proof.L_vec + proof.ipp_proof.R_vec
                             + list(vcs))

        static_acc = [int.from_bytes(static_buf.raw[32 * j: 32 * (j + 1)], "little")
                      for j in range(self._num_static)]
        return bytes(dyn_blob), static_acc, dyn_bytes


class _SystemRandom:
    @staticmethod
    def randbytes(n: int) -> bytes:
        return secrets.token_bytes(n)
