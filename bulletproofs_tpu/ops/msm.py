"""Pippenger multi-scalar multiplication on TPU -- the centerpiece kernel.

Every Bulletproofs prove/verify reduces to one or more MSMs (the
reference's `VartimeMultiscalarMul`, SURVEY.md §2b: "THE hot loop").  This
is a TPU-first redesign, not a translation of the CPU algorithm:

* scalars are decomposed on host (vectorized numpy) into W signed c-bit
  window digits -- signed digits halve the bucket count to B = 2^(c-1)+1;
* the N points are split into G groups; each group accumulates its own
  (W, B) bucket array serially over its K = N/G points, so every step
  performs W*G independent, conflict-free Edwards additions -- the
  data-dependent bucket scatter of CPU/GPU Pippenger becomes a
  constant-shape gather -> add -> scatter over the batch axis
  (SURVEY.md §7 "one-hot scatter-add rather than bucket lists");
* bucket arrays reduce across groups by a log2(G) halving tree, then each
  window's weighted bucket sum is a B-step suffix scan, then windows
  combine Horner-style with c doublings per window;
* digit 0 lands in bucket 0, which the weighted reduction ignores -- no
  branches anywhere.

The entire device part is one jitted program; sharding across chips is
layered on top in bulletproofs_tpu.parallel (bucket arrays are psum-able).
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import curve_jax as C
from . import field_jax as F
from .limbs import NLIMBS, points_to_limbs, limbs_to_ints


def signed_digits(scalars: Sequence[int], c: int, num_windows: int) -> np.ndarray:
    """Decompose scalars (< 2^(c*W - 1)) into signed base-2^c digits.

    Returns (W, N) int32 with digits in [-2^(c-1), 2^(c-1)].
    """
    n = len(scalars)
    arr = np.zeros((num_windows, n), dtype=np.int64)
    buf = b"".join(int(s).to_bytes(40, "little") for s in scalars)
    raw = np.frombuffer(buf, dtype=np.uint8).reshape(n, 40)
    bits = np.unpackbits(raw, axis=1, bitorder="little")  # (N, 320)
    need = c * num_windows
    assert need <= 320
    w = bits[:, :need].reshape(n, num_windows, c).astype(np.int64)
    digits = (w @ (1 << np.arange(c, dtype=np.int64))).T  # (W, N)
    # balance: digit > 2^(c-1) -> digit - 2^c, carry 1 up
    half = 1 << (c - 1)
    full = 1 << c
    carry = np.zeros(n, dtype=np.int64)
    for wi in range(num_windows):
        d = digits[wi] + carry
        carry = (d >= half).astype(np.int64) & ((d > half) | (d == half)).astype(np.int64)
        # subtract 2^c where d > half, or where d == half choose +half (no carry)
        carry = (d > half).astype(np.int64)
        arr[wi] = d - carry * full
    assert (carry == 0).all(), "scalar overflow for window configuration"
    assert (np.abs(arr) <= half).all()
    return arr.astype(np.int32)


def _default_params(n: int, c: Optional[int], groups: Optional[int]):
    # Fixed c=8 keeps one compiled kernel shape family (W = 33) across all
    # call sites; groups and K are quantized to powers of two so the jit
    # cache stays small.
    if c is None:
        c = 8
    if groups is None:
        groups = max(1, min(128, n // 32))
        groups = 1 << (groups.bit_length() - 1)
    return c, groups


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _msm_kernel(points: jnp.ndarray, digits: jnp.ndarray,
                num_windows: int, c: int, groups: int, k_steps: int) -> jnp.ndarray:
    """points: (G*K, 4, 20); digits: (W, G*K) -> (4, 20) result point."""
    W, G, K = num_windows, groups, k_steps
    B = (1 << (c - 1)) + 1

    pts = points.reshape(G, K, 4, NLIMBS)
    digs = digits.reshape(W, G, K)

    buckets = C.identity((W, G, B))

    w_idx = jnp.arange(W)[:, None]
    g_idx = jnp.arange(G)[None, :]

    def step(k, buckets):
        d = jax.lax.dynamic_index_in_dim(digs, k, axis=2, keepdims=False)  # (W, G)
        idx = jnp.abs(d)
        pt = jax.lax.dynamic_index_in_dim(pts, k, axis=1, keepdims=False)  # (G, 4, 20)
        pt = jnp.broadcast_to(pt[None], (W, G, 4, NLIMBS))
        pt = C.cond_negate(pt, d < 0)
        cur = jnp.take_along_axis(
            buckets, idx[:, :, None, None, None], axis=2)[:, :, 0]
        new = C.add(cur, pt)
        return buckets.at[w_idx, g_idx, idx].set(new, unique_indices=True)

    buckets = jax.lax.fori_loop(0, K, step, buckets)

    # tree-reduce groups: (W, G, B, ...) -> (W, B, ...)
    g = G
    while g > 1:
        g //= 2
        buckets = C.add(buckets[:, :g], buckets[:, g: 2 * g])
    buckets = buckets[:, 0]  # (W, B, 4, 20)

    # weighted bucket reduction: S_w = sum_{b=1}^{B-1} b * bucket[w, b]
    # via suffix scan: running += bucket[b]; acc += running  (b descending)
    def bucket_step(i, carry):
        running, acc = carry
        b = B - 1 - i
        bk = jax.lax.dynamic_index_in_dim(buckets, b, axis=1, keepdims=False)
        running = C.add(running, bk)
        acc = C.add(acc, running)
        return running, acc

    running = C.identity((W,))
    acc = C.identity((W,))
    _, window_sums = jax.lax.fori_loop(0, B - 1, bucket_step, (running, acc))

    # Horner combine across windows: result = sum_w 2^(c*w) * S_w
    def horner_step(i, result):
        result = jax.lax.fori_loop(0, c, lambda _, p: C.double(p), result)
        sw = jax.lax.dynamic_index_in_dim(window_sums, W - 2 - i, axis=0,
                                          keepdims=False)
        return C.add(result, sw)

    return jax.lax.fori_loop(0, W - 1, horner_step, window_sums[W - 1])


def msm_limbs(points: jnp.ndarray, scalars: Sequence[int],
              c: Optional[int] = None, groups: Optional[int] = None) -> jnp.ndarray:
    """MSM over device-resident points (N, 4, 20) with host integer scalars.

    Returns the (4, 20) result point on device.
    """
    n = points.shape[0]
    if n == 0:
        return C.identity(())
    scalars = [s.v if hasattr(s, "v") else int(s) for s in scalars]
    assert len(scalars) == n
    c, groups = _default_params(n, c, groups)
    num_windows = -(-253 // c) + 1
    k_steps = -(-n // groups)
    # quantize K to a power of two so distinct N values share compilations
    k_steps = 1 << (k_steps - 1).bit_length() if k_steps > 1 else 1
    pad = groups * k_steps - n

    digits = signed_digits(scalars, c, num_windows)
    if pad:
        points = jnp.concatenate([points, C.identity((pad,))], axis=0)
        digits = np.concatenate([digits, np.zeros((num_windows, pad), np.int32)], axis=1)

    return _msm_kernel(points, jnp.asarray(digits), num_windows, c, groups, k_steps)


def msm(scalars, points, c: Optional[int] = None, groups: Optional[int] = None):
    """Drop-in MSM over host Scalars/RistrettoPoints -> host RistrettoPoint.

    Signature order matches the host oracle `core.ristretto.multiscalar_mul`.
    """
    from ..core.ristretto import RistrettoPoint

    points = list(points)
    if not points:
        return RistrettoPoint.identity()
    dev_points = jnp.asarray(points_to_limbs(points))
    out = np.asarray(jax.device_get(msm_limbs(dev_points, list(scalars), c, groups)))
    x, y, z, t = limbs_to_ints(out.reshape(4, NLIMBS))
    return RistrettoPoint(x, y, z, t)
