"""Batched range-proof verification: many proofs fused into ONE MSM.

Extends the reference's random-linear-combination batching (it batches two
equations per proof, src/range_proof/mod.rs:396,418-419) across *proofs*
(SURVEY.md §2c.3, the BASELINE "1000 proofs as one giant MSM" config):

    sum_p r_p * MegaCheck_p == identity

Each proof contributes 4 + 2*lg(nm) + m dynamic points (A, S, T_1, T_2,
L_i, R_i, V_j); the 2nm + 2 static points (B, B~, G, H) are shared, their
per-proof scalars summed host-side.  Dynamic points are batch-decompressed
on device; the fused MSM runs single-chip (ops/msm.py) or across a mesh
(parallel/sharded_msm.py).

Host work per proof (transcript replay + verification scalars) is the
sequential Fiat-Shamir part and stays on host by design.
"""

from __future__ import annotations

import secrets
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.scalar import Scalar, L
from ..errors import ProofError
from ..generators import BulletproofGens, PedersenGens
from ..ops import curve_jax as C
from ..ops import msm as msm_mod
from ..ops.limbs import points_to_limbs
from ..transcript import Transcript


class BatchVerifier:
    """Caches device-resident generators for (n, m) and verifies batches of
    aggregated range proofs in one fused MSM."""

    def __init__(self, bp_gens: BulletproofGens, pc_gens: PedersenGens,
                 n: int, m: int = 1, mesh=None):
        self.bp_gens = bp_gens
        self.pc_gens = pc_gens
        self.n = n
        self.m = m
        self.mesh = mesh
        static_host = ([pc_gens.B_blinding, pc_gens.B]
                       + bp_gens.G(n, m) + bp_gens.H(n, m))
        self._static_dev = jnp.asarray(points_to_limbs(static_host))
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

        dyn_scalars: List[Scalar] = []
        dyn_bytes: List[bytes] = []
        static_acc = [0] * self._num_static

        for proof, vcs, transcript in zip(proofs, value_commitments, transcripts):
            scalars, compressed, _static_pts, vc_bytes = \
                proof.verification_scalars_and_points(
                    self.bp_gens, self.pc_gens, transcript, vcs, self.n, rng=rng)
            k = len(compressed)
            r = Scalar.from_bytes_mod_order_wide(rng.randbytes(64))
            # dynamic: [A, S, T1, T2, L..., R...] then V...
            for s, b in zip(scalars[:k], compressed):
                dyn_scalars.append(r * s)
                dyn_bytes.append(b)
            for s, b in zip(scalars[k + self._num_static:], vc_bytes):
                dyn_scalars.append(r * s)
                dyn_bytes.append(b)
            rv = r.v
            for j in range(self._num_static):
                static_acc[j] = (static_acc[j] + rv * scalars[k + j].v) % L

        raw = np.frombuffer(b"".join(dyn_bytes), np.uint8).reshape(-1, 32)
        valid, dyn_pts = C.decompress_bytes(raw)
        if not valid.all():
            raise ProofError.verification()

        all_points = jnp.concatenate([dyn_pts, self._static_dev], axis=0)
        all_scalars = [s.v for s in dyn_scalars] + static_acc

        if self.mesh is not None and self.mesh.devices.size > 1:
            from .sharded_msm import sharded_msm_limbs
            result = sharded_msm_limbs(all_points, all_scalars, self.mesh)
        else:
            result = msm_mod.msm_limbs(all_points, all_scalars)

        if not bool(np.asarray(jax.device_get(C._is_identity_jit(result)))):
            raise ProofError.verification()


class _SystemRandom:
    @staticmethod
    def randbytes(n: int) -> bytes:
        return secrets.token_bytes(n)
