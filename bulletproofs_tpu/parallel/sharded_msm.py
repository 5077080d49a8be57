"""MSM sharded over a device mesh.

TPU-native distribution (SURVEY.md §2c.5): points and scalar digits are
partitioned across chips along the point axis with shard_map; each chip
runs the full local Pippenger accumulation on its shard, then the per-chip
partial results (group elements, NOT summable with psum) are all-gathered
over ICI and folded with Edwards additions on every chip.  Communication is
one all-gather of a single point per chip -- 320 bytes each -- so scaling
efficiency is limited only by the local MSM balance.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import curve_jax as C
from ..ops.limbs import NLIMBS
from ..ops import msm as msm_mod


def make_mesh(n_devices: Optional[int] = None, axis: str = "points") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5), static_argnames=("mesh",))
def _sharded_msm(points, digits, num_windows, c, groups, k_steps, *, mesh):
    axis = mesh.axis_names[0]

    def local(points_shard, digits_shard):
        partial = msm_mod._msm_kernel.__wrapped__(
            points_shard, digits_shard, num_windows, c, groups, k_steps)
        gathered = jax.lax.all_gather(partial, axis)  # (ndev, 4, 20)
        acc = gathered[0]
        for i in range(1, gathered.shape[0]):
            acc = C.add(acc, gathered[i])
        return acc

    f = shard_map(local, mesh=mesh,
                  in_specs=(P(axis), P(None, axis)),
                  out_specs=P(),
                  check_rep=False)
    return f(points, digits)


def sharded_msm_limbs(points: jnp.ndarray, scalars: Sequence[int], mesh: Mesh,
                      c: int = 8, groups_per_device: int = 64) -> jnp.ndarray:
    """MSM of (N, 4, 20) device points x host int scalars over `mesh`.

    N is padded so each device gets an equal shard; identity-padding is
    harmless (digit 0 -> ignored bucket 0).
    """
    n = points.shape[0]
    ndev = mesh.devices.size
    scalars = [s.v if hasattr(s, "v") else int(s) for s in scalars]
    num_windows = -(-253 // c) + 1

    shard = -(-n // ndev)
    k_steps = max(1, -(-shard // groups_per_device))
    k_steps = 1 << (k_steps - 1).bit_length() if k_steps > 1 else 1
    groups = max(1, -(-shard // k_steps))
    padded = ndev * groups * k_steps

    digits = msm_mod.signed_digits(scalars, c, num_windows)
    if padded != n:
        points = jnp.concatenate([points, C.identity((padded - n,))], axis=0)
        digits = np.concatenate(
            [digits, np.zeros((num_windows, padded - n), np.int32)], axis=1)

    return _sharded_msm(points, jnp.asarray(digits), num_windows, c, groups,
                        k_steps, mesh=mesh)
