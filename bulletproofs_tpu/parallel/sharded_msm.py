"""MSM sharded over a device mesh.

TPU-native distribution (SURVEY.md §2c.5): points and scalar digits are
partitioned across chips along the point axis with shard_map; each chip
runs the full local Pippenger accumulation + reduction on its shard
(ops/vec_msm.py), then the per-chip partial results (group elements, NOT
summable with psum) are all-gathered over ICI and folded with Edwards
additions on every chip.  Communication is one all-gather of a single
point per chip -- 320 bytes each -- so scaling efficiency is limited only
by local MSM balance.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import vec_curve as C
from ..ops import vec_msm
from ..ops.limbs import NLIMBS

L = NLIMBS


def make_mesh(n_devices: Optional[int] = None, axis: str = "points") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


@functools.partial(jax.jit, static_argnums=(2, 3), static_argnames=("mesh",))
def _sharded_msm_xla(points, digits, groups, k_steps, *, mesh):
    axis = mesh.axis_names[0]

    def local(points_shard, digits_shard):
        buckets = vec_msm._accum_kernel(
            points_shard.reshape(4, L, groups, k_steps),
            digits_shard.reshape(vec_msm.NUM_WINDOWS, groups, k_steps))
        partial = vec_msm._finalize_kernel(buckets)      # (4, L, 1)
        gathered = jax.lax.all_gather(partial, axis, axis=2, tiled=True)
        acc = gathered[:, :, :1]
        for i in range(1, gathered.shape[2]):
            acc = C.add(acc, gathered[:, :, i: i + 1])
        return acc

    f = shard_map(local, mesh=mesh,
                  in_specs=(P(None, None, axis), P(None, axis)),
                  out_specs=P(),
                  check_vma=False)
    return f(points, digits)


@functools.partial(jax.jit, static_argnums=(2, 3), static_argnames=("mesh",))
def _sharded_msm_pallas(points, digits4, blk, kchunk, *, mesh):
    from ..ops import msm_pallas
    axis = mesh.axis_names[0]

    def local(points_shard, digits_shard):
        partial, _ = msm_pallas._msm_pallas.__wrapped__(
            points_shard, digits_shard, blk, kchunk)     # (4, L, 1)
        gathered = jax.lax.all_gather(partial, axis, axis=2, tiled=True)
        acc = gathered[:, :, :1]
        for i in range(1, gathered.shape[2]):
            acc = C.add(acc, gathered[:, :, i: i + 1])
        return acc

    f = shard_map(local, mesh=mesh,
                  in_specs=(P(None, None, axis), P(None, axis)),
                  out_specs=P(),
                  check_vma=False)
    return f(points, digits4)


# Canonical per-device shard shape for non-TPU (virtual/CPU) meshes.  On
# XLA-CPU each distinct (groups, k_steps) pair is a fresh multi-minute
# compile of the sharded limb-arithmetic program, while execution costs
# seconds -- round 4's driver dry run timed out (MULTICHIP_r04 rc=124)
# compiling a new variant per MSM size.  Fixing ONE shape makes every call
# site (small tests, batched verification chunks, the 2^16 production MSM)
# reuse a single executable: smaller MSMs pad with identity points (digit 0
# -> bucket 0, excluded), larger ones run as chunks of the same executable
# with the per-chunk partial points folded by a tiny width-1 add program.
_CPU_GROUPS = 8
_CPU_KSTEPS = 128             # capacity per device = G * K = 1024 points

_fold_add = jax.jit(C.add)


def _canonical_cpu_msm(points: jnp.ndarray, sbytes: np.ndarray,
                       mesh: Mesh) -> jnp.ndarray:
    n = points.shape[-1]
    cap = mesh.devices.size * _CPU_GROUPS * _CPU_KSTEPS
    # normalize to host arrays: committed device arrays (e.g. decompression
    # output) would otherwise be a different jit signature than numpy
    # inputs and trigger a second multi-minute XLA-CPU compile of the same
    # program (observed: two jit__sharded_msm_xla cache entries)
    points = np.asarray(jax.device_get(points))
    acc = None
    for lo in range(0, n, cap):
        hi = min(lo + cap, n)
        pts = points[..., lo:hi]
        sb = sbytes[lo:hi]
        if hi - lo < cap:
            pts = jnp.concatenate(
                [pts, C.identity((), cap - (hi - lo))], axis=-1)
            sb = np.concatenate(
                [sb, np.zeros((cap - (hi - lo), 33), np.uint8)], axis=0)
        digits = vec_msm.device_digits(jnp.asarray(sb))
        part = _sharded_msm_xla(pts, digits, _CPU_GROUPS, _CPU_KSTEPS,
                                mesh=mesh)
        acc = part if acc is None else _fold_add(acc, part)
    return acc


def sharded_msm_lanes(points: jnp.ndarray, scalars, mesh: Mesh,
                      groups_per_device: int = 64) -> jnp.ndarray:
    """MSM of (4, L, N) device points x host scalars over `mesh` -> (4, L, 1).

    Points and digits shard along the point axis; each chip runs the local
    Pippenger (fused Pallas kernels on TPU meshes, the XLA kernel on CPU
    meshes), and per-chip partials are all-gathered over ICI and folded.
    N is padded so each device gets an equal shard; identity-padding is
    harmless (digit 0 -> bucket 0, excluded from the weighted reduction).
    CPU/virtual meshes route through ONE canonical executable shape
    (_canonical_cpu_msm) unless settings.sharded_canonical is off.
    """
    n = points.shape[-1]
    ndev = mesh.devices.size
    sbytes = scalars if isinstance(scalars, np.ndarray) else \
        vec_msm.scalars_to_bytes(scalars)
    tpu_mesh = mesh.devices.flat[0].platform == "tpu"

    if tpu_mesh:
        from ..ops import msm_pallas
        shard, blk, kchunk = msm_pallas._pick_shape(-(-n // ndev))
        padded = ndev * shard
        if padded != n:
            points = jnp.concatenate(
                [points, C.identity((), padded - n)], axis=-1)
            sbytes = np.concatenate(
                [sbytes, np.zeros((padded - n, 33), np.uint8)], axis=0)
        digits = msm_pallas.device_digits4(
            jnp.asarray(np.ascontiguousarray(sbytes[:, :32])))
        return _sharded_msm_pallas(points, digits, blk, kchunk, mesh=mesh)

    from ..config import settings
    if settings.sharded_canonical:
        return _canonical_cpu_msm(points, sbytes, mesh)

    shard = -(-n // ndev)
    k_steps = max(1, -(-shard // groups_per_device))
    k_steps = 1 << (k_steps - 1).bit_length() if k_steps > 1 else 1
    groups = max(1, -(-shard // k_steps))
    # _finalize_kernel reduces groups by a halving tree; a non-power-of-2
    # G silently drops the trailing groups
    groups = 1 << (groups - 1).bit_length()
    padded = ndev * groups * k_steps
    if padded != n:
        points = jnp.concatenate([points, C.identity((), padded - n)], axis=-1)
        sbytes = np.concatenate([sbytes, np.zeros((padded - n, 33), np.uint8)],
                                axis=0)
    digits = vec_msm.device_digits(jnp.asarray(sbytes))
    return _sharded_msm_xla(points, digits, groups, k_steps, mesh=mesh)
