"""Pippenger multi-scalar multiplication, lane-major core (generation 2).

TPU-first redesign of the reference's `VartimeMultiscalarMul` hot loop
(SURVEY.md §2b; call sites listed there).  Differences from a CPU/GPU
Pippenger, driven by the hardware:

* **unsigned 7-bit windows** (W = 37, B = 128 buckets): no digit balancing
  or point negation in the kernel, digit extraction is pure byte math done
  ON DEVICE from the raw 32-byte scalar encodings (the host only ships
  bytes), and B = 128 exactly fills a lane tile;
* **lane-major layout** (ops/vec_field.py): buckets live as
  (B, 4, L, W, G) so every Edwards add vectorizes over the trailing
  (W, G) = windows x groups axes with ~1.2x tile padding;
* the data-dependent bucket scatter of CPU Pippenger becomes a
  constant-shape `take_along_axis` / `put_along_axis` pair over the
  leading bucket axis -- each (w, g) slot touches exactly one bucket per
  step, so the scatter is collision-free by construction;
* bucket reduction is a Hillis-Steele *suffix scan* (7 wide steps) plus a
  halving tree instead of the B-step serial scan;
* the window combine is Horner over 36 windows (7 doublings + 1 add each).
  This is the serial tail; it runs at batch width 1 and is the price of a
  single-output MSM (the batched fixed-base path in vec_fixed_msm.py has
  no such tail).

All device work is a single jitted program; sharding across chips layers
on top (parallel/sharded_msm.py) by summing per-device bucket arrays.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import vec_curve as C
from . import vec_field as F
from .limbs import NLIMBS

L = NLIMBS
WINDOW_BITS = 7
NUM_WINDOWS = 37            # ceil(253 / 7) = 37 covers scalars < 2^253
NUM_BUCKETS = 1 << WINDOW_BITS

# static byte/shift schedule for digit extraction (window w covers scalar
# bits [7w, 7w + 7))
_BYTE_IDX = np.array([(7 * w) // 8 for w in range(NUM_WINDOWS)], np.int32)
_BIT_OFF = np.array([(7 * w) % 8 for w in range(NUM_WINDOWS)], np.int32)


def scalars_to_bytes(scalars: Sequence) -> np.ndarray:
    """Host ints / Scalars -> (N, 33) uint8 little-endian (one pad byte so
    the two-byte digit window never reads out of bounds)."""
    from ..core.scalar import L as _ELL
    # the signed-digit kernels assume scalars < l; reduction only moves the
    # result within its ristretto coset
    vals = [s.v if hasattr(s, "v") else int(s) % _ELL for s in scalars]
    buf = b"".join(v.to_bytes(33, "little") for v in vals)
    return np.frombuffer(buf, np.uint8).reshape(len(vals), 33)


def device_digits(sbytes: jnp.ndarray) -> jnp.ndarray:
    """(N, 33) uint8 -> (W, N) int32 unsigned base-2^7 digits, on device."""
    b = sbytes.astype(jnp.int32)
    lo = b[:, _BYTE_IDX]                  # (N, W)
    hi = b[:, _BYTE_IDX + 1]
    d = ((lo | (hi << 8)) >> jnp.asarray(_BIT_OFF)[None, :]) & (NUM_BUCKETS - 1)
    return d.T                            # (W, N)


def _suffix_weighted_sum(buckets: jnp.ndarray) -> jnp.ndarray:
    """(B, 4, L, W) bucket points -> (4, L, W) window sums
    S_w = sum_{b=1}^{B-1} b * bucket[b, w].

    Two Hillis-Steele suffix scans: with T_b = sum_{b'>=b} x_b' the second
    scan gives U_1 = sum_{b>=1} T_b = sum_b b * x_b -- 14 wide add steps in
    a fixed-shape fori_loop instead of a B-step serial reduction."""
    B = buckets.shape[0]
    lg_b = B.bit_length() - 1
    ident = C.identity((B,), buckets.shape[-1])
    iota = jnp.arange(B)[:, None, None, None]

    def scan(t):
        def step(i, t):
            sh = jnp.int32(1) << i
            rolled = jnp.roll(t, -sh, axis=0)
            masked = jnp.where(iota >= B - sh, ident, rolled)
            return C.add(t, masked)
        return jax.lax.fori_loop(0, lg_b, step, t)

    return scan(scan(buckets))[1]


@jax.jit
def _accum_kernel(points: jnp.ndarray, digits: jnp.ndarray) -> jnp.ndarray:
    """Bucket accumulation: points (4, L, G, K), digits (W, G, K) ->
    buckets (B, W, 4, L, G).  Kept minimal (one add + gather + scatter per
    step) so per-(G, K) compiles stay cheap; the shape-stable reduction
    lives in _finalize_kernel."""
    W, B = NUM_WINDOWS, NUM_BUCKETS
    G, K = points.shape[2], points.shape[3]

    buckets = C.identity((B, W), G)         # (B, W, 4, L, G)

    def step(k, buckets):
        d = jax.lax.dynamic_index_in_dim(digits, k, axis=2, keepdims=False)  # (W, G)
        pt = jax.lax.dynamic_index_in_dim(points, k, axis=3, keepdims=False)  # (4, L, G)
        pt = jnp.broadcast_to(pt[None], (W, 4, L, G))
        idx = d[None, :, None, None, :]     # (1, W, 1, 1, G)
        cur = jnp.take_along_axis(buckets, idx, axis=0)[0]
        new = C.add(cur, pt)
        return jnp.put_along_axis(
            buckets, jnp.broadcast_to(idx, (1, W, 4, L, G)), new[None],
            axis=0, inplace=False)

    return jax.lax.fori_loop(0, K, step, buckets)


@jax.jit
def _finalize_kernel(buckets: jnp.ndarray) -> jnp.ndarray:
    """(B, W, 4, L, G) buckets -> (4, L, 1) MSM result.  Compiles once per
    G (shape-stable across MSM sizes)."""
    W = NUM_WINDOWS
    g = buckets.shape[-1]
    assert g & (g - 1) == 0, f"group count {g} must be a power of two"
    while g > 1:
        g //= 2
        buckets = C.add(buckets[..., :g], buckets[..., g: 2 * g])

    # move W onto the lane axis for the scan phase: (B, 4, L, W)
    buckets = jnp.transpose(buckets[..., 0], (0, 2, 3, 1))

    window_sums = _suffix_weighted_sum(buckets)     # (4, L, W)

    # Horner combine: result = sum_w 2^(7w) * S_w (serial tail, width 1)
    def horner_step(i, acc):
        acc = jax.lax.fori_loop(0, WINDOW_BITS, lambda _, p: C.double(p), acc)
        sw = jax.lax.dynamic_index_in_dim(window_sums, W - 2 - i, axis=2,
                                          keepdims=True)
        return C.add(acc, sw)

    return jax.lax.fori_loop(0, W - 1, horner_step, window_sums[..., W - 1:])


def _msm_kernel(points: jnp.ndarray, digits: jnp.ndarray,
                groups: int, k_steps: int) -> jnp.ndarray:
    """points (4, L, G*K); digits (W, G*K) -> (4, L, 1) result point."""
    G, K = groups, k_steps
    buckets = _accum_kernel(points.reshape(4, L, G, K),
                            digits.reshape(NUM_WINDOWS, G, K))
    return _finalize_kernel(buckets)


def _default_groups(n: int) -> int:
    # Each group adds B buckets of tree-reduce work (W*B*G adds total) but
    # divides the serial accumulation depth K = N/G.  Balance K ~ B.
    g = max(1, n // NUM_BUCKETS)
    g = 1 << (g - 1).bit_length()
    return min(g, 512)


def msm_lanes(points: jnp.ndarray, scalars, groups: Optional[int] = None) -> jnp.ndarray:
    """MSM over device points (4, L, N) with host scalars -> (4, L, 1).

    Scalars may be ints, Scalar objects, or a pre-packed (N, 33) uint8 array.
    """
    n = points.shape[-1]
    if n == 0:
        return C.identity((), 1)
    sbytes = scalars if isinstance(scalars, np.ndarray) else scalars_to_bytes(scalars)
    assert sbytes.shape == (n, 33)
    groups = groups or _default_groups(n)
    k_steps = -(-n // groups)
    k_steps = 1 << (k_steps - 1).bit_length() if k_steps > 1 else 1
    pad = groups * k_steps - n
    if pad:
        points = jnp.concatenate([points, C.identity((), pad)], axis=-1)
        sbytes = np.concatenate([sbytes, np.zeros((pad, 33), np.uint8)], axis=0)
    digits = device_digits(jnp.asarray(sbytes))
    return _msm_kernel(points, digits, groups, k_steps)


def msm(scalars, points, groups: Optional[int] = None):
    """Drop-in MSM over host Scalars/RistrettoPoints -> host RistrettoPoint
    (signature order matches core.ristretto.multiscalar_mul)."""
    points = list(points)
    if not points:
        from ..core.ristretto import RistrettoPoint
        return RistrettoPoint.identity()
    dev = jnp.asarray(C.points_to_lanes(points))
    out = np.asarray(jax.device_get(msm_lanes_auto(dev, list(scalars))))
    return C.lanes_to_points(out)[0]


def msm_host_auto(scalars, points):
    """Host-facing MSM for the single-proof provers/verifiers: the native
    C++ backend below a size floor, the TPU kernel above it.

    With the C++ backend built, the host Pippenger runs ~8 M point-adds/s
    with zero dispatch latency; a single device MSM pays one H2D transfer
    (128 B/point) plus a blocking sync, so the crossover sits around 2^18
    points on locally-attached hardware (far higher over a development
    tunnel).  Without the C++ backend, the pure-Python oracle is so slow
    that the device wins from 32 points up.  settings.msm_device_floor
    (BPTPU_MSM_DEVICE_FLOOR) overrides the crossover."""
    points = list(points)
    from ..config import settings
    from ..core._native import LIB
    floor = settings.msm_device_floor
    if floor is None:
        floor = (1 << 18) if LIB is not None else 32
    if on_tpu() and len(points) >= floor:
        return msm(scalars, points)
    from ..core.ristretto import multiscalar_mul
    return multiscalar_mul(scalars, points)


def on_tpu() -> bool:
    try:
        dev = jax.config.jax_default_device or jax.devices()[0]
        return dev.platform == "tpu"
    except Exception:
        return False


def msm_lanes_auto(points: jnp.ndarray, scalars) -> jnp.ndarray:
    """Backend dispatch: the fused Pallas kernels on real TPU hardware, the
    XLA lane-major kernel elsewhere (CPU tests, interpret-free fallback)."""
    if on_tpu():
        from . import msm_pallas
        return msm_pallas.msm_lanes(points, scalars)
    return msm_lanes(points, scalars)
