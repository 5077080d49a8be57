"""bulletproofs_tpu: a TPU-native Bulletproofs framework.

A from-scratch reimplementation of the capabilities of the
`dalek-cryptography/bulletproofs` crate (range proofs, MPC aggregation,
R1CS constraint-system proofs, linear proofs over ristretto255), designed
TPU-first: batched packed-limb field/curve kernels in JAX/Pallas, a
Pippenger MSM as the core primitive, pjit/shard_map sharding for
multi-chip batch verification, and a host-side Merlin transcript for
bit-exact Fiat-Shamir against the reference.
"""

from .errors import ProofError, MPCError, R1CSError
from .transcript import Transcript
from .generators import PedersenGens, BulletproofGens, BulletproofGensShare
from .core.scalar import Scalar
from .core.ristretto import RistrettoPoint, RISTRETTO_BASEPOINT
from .proofs.ipp import InnerProductProof
from .proofs.rangeproof import RangeProof
from .proofs.linear import LinearProof
from .proofs import r1cs
from . import range_proof_mpc

__version__ = "0.1.0"

__all__ = [
    "ProofError", "MPCError", "R1CSError",
    "Transcript", "PedersenGens", "BulletproofGens", "BulletproofGensShare",
    "Scalar", "RistrettoPoint", "RISTRETTO_BASEPOINT",
    "InnerProductProof", "RangeProof", "LinearProof", "r1cs",
]
