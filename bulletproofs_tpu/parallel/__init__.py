"""Multi-chip parallelism: sharded MSM and batched proof verification.

The reference's parallelism inventory (SURVEY.md §2c) maps here:
SIMD data-parallelism -> batched limb kernels (ops/); statement batching ->
BatchVerifier's fused MSM; multi-party distribution -> mesh-sharded MSM
with collectives over ICI.
"""

from .sharded_msm import sharded_msm_lanes, make_mesh
from .batch_verify import BatchVerifier
