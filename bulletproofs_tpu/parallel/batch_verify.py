"""Batched range-proof verification: many proofs fused into ONE MSM.

Extends the reference's random-linear-combination batching (it batches two
equations per proof, src/range_proof/mod.rs:396,418-419) across *proofs*
(SURVEY.md §2c.3, the BASELINE "1000 proofs as one giant MSM" config):

    sum_p r_p * MegaCheck_p == identity

Each proof contributes 4 + 2*lg(nm) + m dynamic points (A, S, T_1, T_2,
L_i, R_i, V_j); the 2nm + 2 static points (B, B~, G, H) are shared, their
per-proof scalars accumulated ON DEVICE across the batch.

The default native path is fully fused: the host does one C++ call
(transcript replay + challenges + one shared batch inversion,
native/verify_prep.cpp) and uploads a compact challenge block per proof;
ONE device program then runs batch point decompression, the O(nm)-per-
proof verification-scalar emit (Pallas kernel ops/verify_pallas.py on
TPU, XLA ops/verify_stages.py elsewhere), digit extraction, and the
fused mega-MSM, returning a single accept flag.  Device decompression is
dispatched before the host replay so the two overlap.  With a mesh, the
chunked pipeline (sharded MSM over parallel/sharded_msm.py) is used
instead.
"""

from __future__ import annotations

import secrets
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import settings
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
        lib.rangeproof_verify_prep_batch.restype = ctypes.c_int
        lib.rangeproof_verify_replay_batch_c.restype = ctypes.c_int
        lib.rist_batch_decompress.restype = ctypes.c_int
        lib.rist_is_identity.restype = ctypes.c_int
        lib.rist_msm.restype = None
        return lib
    except (OSError, AttributeError):
        return None


_NATIVE_PREP = _load_native_prep()


def _pad_quantum(n_dyn: int) -> int:
    """Decompression batch padding so compiled programs are reused across
    batch sizes (the all-zero encoding is valid, scalar 0)."""
    if n_dyn <= 2048:
        return 1 << max(0, (n_dyn - 1)).bit_length()
    return -(-n_dyn // 4096) * 4096


class BatchVerifier:
    """Caches device-resident generators for (n, m) and verifies batches of
    aggregated range proofs in one fused MSM."""

    def __init__(self, bp_gens: BulletproofGens, pc_gens: PedersenGens,
                 n: int, m: int = 1, mesh=None, use_native: bool = True,
                 prefer_host=None):
        self.bp_gens = bp_gens
        self.pc_gens = pc_gens
        self.n = n
        self.m = m
        self.mesh = mesh
        self.use_native = use_native and _NATIVE_PREP is not None
        # prefer_host: None = auto (the all-C++ path on non-TPU platforms),
        # True/False = force/forbid it
        self.prefer_host = prefer_host
        static_host = ([pc_gens.B_blinding, pc_gens.B]
                       + bp_gens.G(n, m) + bp_gens.H(n, m))
        self._static_host = static_host
        self._static_ext = None      # packed lazily for the host path
        # device copy NORMALIZED to Z = 1 (a representation change only):
        # the fused tail's mega-MSM then runs the 7-mul Niels mixed-add
        # kernel, whose other inputs (device-decompressed dyn points,
        # identity padding) already carry Z = 1
        from ..core.field import P as _FP
        norm = []
        for p in static_host:
            zi = pow(p.Z, _FP - 2, _FP)
            x, y = p.X * zi % _FP, p.Y * zi % _FP
            norm.append(type(p)(x, y, 1, x * y % _FP))
        self._static_dev = jnp.asarray(C.points_to_lanes(norm))
        self._num_static = len(static_host)

    # -- public API ----------------------------------------------------------

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
        assert len(proofs) == len(value_commitments) == len(transcripts)
        if not proofs:
            raise ValueError("verify_batch requires at least one proof "
                             "(an empty batch would vacuously accept)")
        # Host path: replay, decompression, and the mega-MSM all in C++
        # (IFMA when the CPU supports it).  Without a TPU attached the XLA
        # lane kernels on CPU are far slower than the native backend, so
        # auto-route there.
        host = self.prefer_host
        if host is None:
            host = not vec_msm.on_tpu()
        if host and self.use_native and self.mesh is None:
            return self._verify_host(proofs, value_commitments, transcripts,
                                     rng)
        # The Pallas emit kernel's VMEM working set scales with nm (the
        # generator axis rides the lanes; ~16 MB at nm = 64); route larger
        # aggregations through the chunked C++-emit pipeline instead.
        fused_ok = self.mesh is None and \
            (not vec_msm.on_tpu()
             or self.n * self.m <= settings.fused_verify_max_nm)
        if self.use_native and fused_ok:
            self._verify_native(proofs, value_commitments, transcripts, rng)
        elif self.use_native:
            self._verify_native_chunked(proofs, value_commitments,
                                        transcripts, rng)
        else:
            self._verify_python(proofs, value_commitments, transcripts, rng)

    # -- all-host native path (no TPU attached) --------------------------------

    def _verify_host(self, proofs, value_commitments, transcripts, rng):
        """Everything in C++: one batched transcript replay, batch point
        decompression, and ONE vartime Pippenger mega-MSM on the host curve
        backend (native/ristretto.cpp, AVX-512 IFMA 4-way field path when
        available).  The fast route when no accelerator is attached --
        mirrors the reference running on curve25519-dalek's SIMD backend."""
        import ctypes

        n, m = self.n, self.m
        lg = (n * m).bit_length() - 1
        n_dyn_per = 4 + 2 * lg + m
        count = len(proofs)
        plen = 32 * (9 + 2 * lg)
        proofs_blob, vcs_blob, dyn_pts_arr = self._serialize(
            proofs, value_commitments, lg, n_dyn_per, plen)

        strobe_size = len(transcripts[0].strobe.buf.raw)
        strobes = ctypes.create_string_buffer(
            b"".join(t.strobe.buf.raw for t in transcripts),
            strobe_size * count)
        cr = rng.randbytes(128 * count)
        n_dyn = count * n_dyn_per
        dyn_sc = ctypes.create_string_buffer(32 * n_dyn)
        static_sc = ctypes.create_string_buffer(32 * self._num_static)
        rc = _NATIVE_PREP.rangeproof_verify_prep_batch(
            strobes, ctypes.c_size_t(strobe_size),
            proofs_blob, ctypes.c_size_t(plen), vcs_blob,
            ctypes.c_uint64(n), ctypes.c_uint64(m), ctypes.c_uint64(count),
            cr, dyn_sc, static_sc)
        if rc != 0:
            raise ProofError.verification()
        sraw = strobes.raw
        for i, t in enumerate(transcripts):
            t.strobe.buf.raw = sraw[i * strobe_size: (i + 1) * strobe_size]

        dyn_ext = ctypes.create_string_buffer(128 * n_dyn)
        ok = ctypes.create_string_buffer(n_dyn)
        good = _NATIVE_PREP.rist_batch_decompress(
            ctypes.c_size_t(n_dyn), dyn_pts_arr.tobytes(), dyn_ext, ok)
        if good != n_dyn:
            raise ProofError.verification()

        if self._static_ext is None:
            from ..core.ristretto import _to_ext
            self._static_ext = b"".join(_to_ext(p) for p in self._static_host)
        out = ctypes.create_string_buffer(128)
        _NATIVE_PREP.rist_msm(
            ctypes.c_size_t(self._num_static + n_dyn),
            static_sc.raw + dyn_sc.raw, self._static_ext + dyn_ext.raw, out)
        if not _NATIVE_PREP.rist_is_identity(out):
            raise ProofError.verification()

    # -- native fused path (single chip) ---------------------------------------

    def _serialize(self, proofs, value_commitments, lg, n_dyn_per, plen):
        """Proof blobs + the dynamic-point byte stream (pure slices)."""
        count = len(proofs)
        pblobs = []
        for proof, vcs in zip(proofs, value_commitments):
            if len(vcs) != self.m or len(proof.ipp_proof.L_vec) != lg:
                raise ProofError.verification()
            pb = proof.to_bytes()
            assert len(pb) == plen
            pblobs.append(pb)
        proofs_blob = b"".join(pblobs)
        vcs_blob = b"".join(b"".join(v) for v in value_commitments)
        parr = np.frombuffer(proofs_blob, np.uint8).reshape(count, plen)
        lr = parr[:, 224: 224 + 64 * lg].reshape(count, lg, 2, 32)
        varr = np.frombuffer(vcs_blob, np.uint8).reshape(count, self.m, 32)
        dyn_pts_arr = np.concatenate(
            [parr[:, :128].reshape(count, 4, 32), lr[:, :, 0], lr[:, :, 1],
             varr], axis=1).reshape(count * n_dyn_per, 32)
        return proofs_blob, vcs_blob, dyn_pts_arr

    # Default sub-batch size for the fused TPU path: each sub-batch's device
    # tail (decompress + emit + MSM) is dispatched asynchronously, so the
    # host replay of the NEXT sub-batch overlaps it; flags are fetched once
    # at the end.  2048 balances overlap granularity against per-dispatch
    # overhead; settings.fused_verify_chunk overrides (0 = this default).
    _FUSED_CHUNK = 2048

    def _verify_native(self, proofs, value_commitments, transcripts, rng):
        """Fused path: per sub-batch, ONE C++ replay call (transcript +
        challenges only) and ONE asynchronous device program (decompress +
        scalar emit + mega-MSM); a single sync fetches every sub-batch's
        accept flag.  The O(nm)-per-proof scalar streams run on device --
        the Pallas kernel (ops/verify_pallas.py) on TPU, the XLA form
        (ops/verify_stages.py) elsewhere; uploads are the dynamic points
        plus a COMPACT (lg+8)-scalar challenge block per proof (the device
        derives u^2, u^-2, t0, t0r itself -- H2D bytes floor the batch
        latency through a tunnel)."""
        n, m = self.n, self.m
        nm = n * m
        lg = nm.bit_length() - 1
        n_dyn_per = 4 + 2 * lg + m
        count = len(proofs)
        plen = 32 * (9 + 2 * lg)

        proofs_blob, vcs_blob, dyn_pts_arr = self._serialize(
            proofs, value_commitments, lg, n_dyn_per, plen)

        use_pallas = vec_msm.on_tpu()
        if use_pallas:
            step = settings.fused_verify_chunk or self._FUSED_CHUNK
            flags = []
            for lo in range(0, count, step):
                hi = min(lo + step, count)
                flags.append(self._fused_subbatch(
                    proofs_blob[lo * plen: hi * plen],
                    vcs_blob[lo * 32 * m: hi * 32 * m],
                    dyn_pts_arr[lo * n_dyn_per: hi * n_dyn_per],
                    transcripts[lo:hi], rng))
            oks = jax.device_get(flags)
            if not all(bool(np.asarray(ok).reshape(-1)[0]) for ok in oks):
                raise ProofError.verification()
            return

        from ..ops import verify_stages
        from ..ops import vec_scalar as VS
        valid_dev, dyn_pts, blk, pair_arr = self._prep_subbatch(
            proofs_blob, vcs_blob, dyn_pts_arr, transcripts, rng,
            reorder=False)
        dyn_sc, static_sc = verify_stages.emit_scalars(
            n, m, jnp.asarray(blk), jnp.asarray(pair_arr))
        all_pts = jnp.concatenate([self._static_dev, dyn_pts], axis=-1)
        all_sc = jnp.concatenate([static_sc, dyn_sc], axis=-1)
        sbytes = np.asarray(jax.device_get(VS.limbs_to_bytes33(all_sc)))
        flag = C._is_identity_jit(vec_msm.msm_lanes(all_pts, sbytes))
        all_valid, ok = jax.device_get((jnp.all(valid_dev), flag))
        if not (bool(all_valid) and bool(np.asarray(ok).reshape(-1)[0])):
            raise ProofError.verification()

    def _prep_subbatch(self, proofs_blob, vcs_blob, dyn_pts_arr, transcripts,
                       rng, reorder):
        """Shared sub-batch prep: dispatch device decompression FIRST (pure
        proof bytes; overlaps the C++ replay), then one C++ replay call ->
        (valid flags, decompressed points, challenge blocks, static pair).
        With reorder=True the point bytes are permuted to the Pallas emit
        kernel's [tile][slot][lane] order."""
        import ctypes

        n, m = self.n, self.m
        lg = (n * m).bit_length() - 1
        n_dyn_per = 4 + 2 * lg + m
        nblk = lg + 8                  # COMPACT challenge block
        plen = 32 * (9 + 2 * lg)
        count = len(transcripts)
        p_pad = -(-count // 256) * 256

        if reorder:
            from ..ops.verify_pallas import BLKP
            arr = np.zeros((p_pad, n_dyn_per, 32), np.uint8)
            arr[:count] = dyn_pts_arr.reshape(count, n_dyn_per, 32)
            raw = np.ascontiguousarray(
                arr.reshape(p_pad // BLKP, BLKP, n_dyn_per, 32)
                .transpose(0, 2, 1, 3)).reshape(-1, 32)
        else:
            raw = np.zeros((p_pad * n_dyn_per, 32), np.uint8)
            raw[: count * n_dyn_per] = dyn_pts_arr
        valid_dev, dyn_pts = C.decompress_device(jnp.asarray(raw))

        strobe_size = len(transcripts[0].strobe.buf.raw)
        strobes = ctypes.create_string_buffer(
            b"".join(t.strobe.buf.raw for t in transcripts),
            strobe_size * count)
        cr = rng.randbytes(128 * count)
        blocks = ctypes.create_string_buffer(32 * nblk * count)
        pair = ctypes.create_string_buffer(64)
        rc = _NATIVE_PREP.rangeproof_verify_replay_batch_c(
            strobes, ctypes.c_size_t(strobe_size),
            proofs_blob, ctypes.c_size_t(plen), vcs_blob,
            ctypes.c_uint64(n), ctypes.c_uint64(m), ctypes.c_uint64(count),
            cr, blocks, pair)
        if rc != 0:
            raise ProofError.verification()
        sraw = strobes.raw
        for i, t in enumerate(transcripts):
            t.strobe.buf.raw = sraw[i * strobe_size: (i + 1) * strobe_size]

        blk = np.zeros((p_pad * nblk, 32), np.uint8)
        blk[: count * nblk] = np.frombuffer(blocks.raw, np.uint8).reshape(-1, 32)
        pair_arr = np.frombuffer(pair.raw, np.uint8).reshape(2, 32)
        return valid_dev, dyn_pts, blk, pair_arr

    def _fused_subbatch(self, proofs_blob, vcs_blob, dyn_pts_arr, transcripts,
                        rng):
        """One sub-batch through the Pallas pipeline; returns the device
        accept flag WITHOUT synchronizing (the caller fetches all flags at
        once, so later sub-batches' host work overlaps this one's device
        tail)."""
        from ..ops import verify_pallas

        valid_dev, dyn_pts, blk, pair_arr = self._prep_subbatch(
            proofs_blob, vcs_blob, dyn_pts_arr, transcripts, rng,
            reorder=True)
        return verify_pallas.fused_tail(
            self.n, self.m, jnp.asarray(blk), jnp.asarray(pair_arr),
            self._static_dev, dyn_pts, valid_dev)

    # -- native pipelined path (mesh-sharded MSM) ------------------------------

    def _verify_native_chunked(self, proofs, value_commitments, transcripts,
                               rng):
        import ctypes

        n, m = self.n, self.m
        nm = n * m
        lg = nm.bit_length() - 1
        n_dyn_per = 4 + 2 * lg + m
        count = len(proofs)
        plen = 32 * (9 + 2 * lg)

        proofs_blob, vcs_blob, dyn_pts_arr = self._serialize(
            proofs, value_commitments, lg, n_dyn_per, plen)

        # 2. pipelined chunks: each chunk dispatches its decompression and
        #    partial dynamic MSM asynchronously, then the host preps the next
        #    chunk's scalars in C++ while the device crunches.  Uniform chunk
        #    shapes keep one compiled program across chunks and batch sizes.
        # Per-chunk dynamic-point budget: chosen so a chunk's device work
        # (batch decompression + partial MSM) roughly covers the host C++
        # prep of the NEXT chunk, keeping both sides busy.
        chunk_proofs = max(1, settings.verify_chunk_pts // n_dyn_per)
        chunk_pts = _pad_quantum(min(chunk_proofs, count) * n_dyn_per)
        one = np.zeros(33, np.uint8)
        one[0] = 1

        strobe_size = len(transcripts[0].strobe.buf.raw)
        static_buf = ctypes.create_string_buffer(32 * self._num_static)
        valid_parts, partials = [], []
        use_pallas = vec_msm.on_tpu()
        from ..ops import msm_pallas
        sharded = self.mesh is not None and self.mesh.devices.size > 1
        if sharded:
            from .sharded_msm import sharded_msm_lanes

        for lo in range(0, count, chunk_proofs):
            hi = min(lo + chunk_proofs, count)
            cnt = hi - lo
            n_dyn = cnt * n_dyn_per

            raw = np.zeros((chunk_pts, 32), np.uint8)
            raw[:n_dyn] = dyn_pts_arr[lo * n_dyn_per: hi * n_dyn_per]
            valid_dev, dyn_pts = C.decompress_device(jnp.asarray(raw))
            valid_parts.append(jnp.all(valid_dev))

            # host scalar prep (C++; overlaps the device work above and the
            # previous chunk's MSM below)
            strobes = ctypes.create_string_buffer(
                b"".join(t.strobe.buf.raw for t in transcripts[lo:hi]),
                strobe_size * cnt)
            cr = rng.randbytes(128 * cnt)
            dyn_out = ctypes.create_string_buffer(32 * n_dyn_per * cnt)
            rc = _NATIVE_PREP.rangeproof_verify_prep_batch(
                strobes, ctypes.c_size_t(strobe_size),
                proofs_blob[lo * plen: hi * plen], ctypes.c_size_t(plen),
                vcs_blob[lo * 32 * m: hi * 32 * m],
                ctypes.c_uint64(n), ctypes.c_uint64(m), ctypes.c_uint64(cnt),
                cr, dyn_out, static_buf)
            if rc != 0:
                raise ProofError.verification()
            # write the replayed transcript states back (reference semantics:
            # verification advances the caller's transcript)
            for i, t in enumerate(transcripts[lo:hi]):
                t.strobe.buf.raw = strobes.raw[i * strobe_size:
                                               (i + 1) * strobe_size]

            sbytes = np.zeros((chunk_pts, 33), np.uint8)
            sbytes[:n_dyn, :32] = np.frombuffer(dyn_out.raw,
                                                np.uint8).reshape(-1, 32)
            if sharded:
                partials.append(sharded_msm_lanes(dyn_pts, sbytes, self.mesh))
            elif use_pallas:
                partials.append(msm_pallas.msm_lanes(dyn_pts, sbytes))
            else:
                partials.append(vec_msm.msm_lanes(dyn_pts, sbytes))

        # 3. final fused MSM: static points (scalars accumulated across all
        #    proofs in C++) + the per-chunk partial results with scalar 1,
        #    then a single identity/validity fetch.
        all_points = jnp.concatenate(
            [self._static_dev] + partials, axis=-1)
        sbytes = np.zeros((self._num_static + len(partials), 33), np.uint8)
        sbytes[:self._num_static, :32] = np.frombuffer(
            static_buf.raw, np.uint8).reshape(-1, 32)
        sbytes[self._num_static:] = one

        if sharded:
            result = sharded_msm_lanes(all_points, sbytes, self.mesh)
            flag = C._is_identity_jit(result)
        elif use_pallas:
            _, flag = msm_pallas.msm_lanes_flag(all_points, sbytes, blk=128)
        else:
            result = vec_msm.msm_lanes(all_points, sbytes)
            flag = C._is_identity_jit(result)
        all_valid, ok = jax.device_get(
            (jnp.all(jnp.stack(valid_parts)), flag))
        if not (bool(all_valid) and bool(np.asarray(ok).reshape(-1)[0])):
            raise ProofError.verification()

    # -- pure-Python path (CPU tests / native lib unavailable) ---------------

    def _verify_python(self, proofs, value_commitments, transcripts, rng):
        dyn_ints = []
        dyn_bytes = []
        static_acc = [0] * self._num_static
        for proof, vcs, transcript in zip(proofs, value_commitments, transcripts):
            if len(vcs) != self.m:
                raise ProofError.verification()
            dyn_s, static_s, dyn_pts = proof.verification_scalars_ints(
                self.bp_gens, self.pc_gens, transcript, vcs, self.n, rng=rng)
            r = int.from_bytes(rng.randbytes(64), "little") % L
            dyn_ints.extend(r * s % L for s in dyn_s)
            dyn_bytes.extend(dyn_pts)
            for j, s in enumerate(static_s):
                static_acc[j] = (static_acc[j] + r * s) % L
        dyn_scalars = vec_msm.scalars_to_bytes(dyn_ints)[:, :32]
        dyn_pts_arr = np.frombuffer(b"".join(dyn_bytes), np.uint8).reshape(-1, 32)

        n_dyn = dyn_pts_arr.shape[0]
        padded = _pad_quantum(n_dyn)
        raw = np.zeros((padded, 32), np.uint8)
        raw[:n_dyn] = dyn_pts_arr
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


class _SystemRandom:
    @staticmethod
    def randbytes(n: int) -> bytes:
        return secrets.token_bytes(n)

# -- one-shot host verification reusing the fused C++ path -------------------

import weakref

_HOST_CTX = weakref.WeakKeyDictionary()


def host_verify_one(proof, bp_gens, pc_gens, transcript,
                    value_commitments, n, rng):
    """Verify ONE (possibly aggregated) range proof entirely in C++ --
    transcript replay, batch decompression, one Pippenger MSM -- reusing
    the batch verifier machinery with a cached per-generators context.
    Called by RangeProof.verify_multiple's off-TPU fast path."""
    m = len(value_commitments)
    per_gens = _HOST_CTX.get(bp_gens)
    if per_gens is None:
        per_gens = _HOST_CTX[bp_gens] = {}
    bv = per_gens.get((n, m))
    if bv is None or bv.pc_gens is not pc_gens:
        bv = BatchVerifier(bp_gens, pc_gens, n=n, m=m, prefer_host=True)
        per_gens[(n, m)] = bv
    bv.verify_batch([proof], [value_commitments], [transcript], rng=rng)
