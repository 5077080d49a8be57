"""Batched range proving: many proofs driven through the TPU at once.

The reference proves one statement at a time on the CPU
(src/range_proof/mod.rs:234-288, ~7.3 ms per 64-bit proof).  This driver is
the TPU-native counterpart: a host/device pipeline proving a whole batch of
single-party proofs (m = 1) together.

Split of labor (SURVEY.md §7 architecture principle):

* device (ops/fixed_msm.py + ops/prover_stages.py): every point operation,
  as batched fixed-base MSMs over [B, B~, G.., H..] -- commitments
  directly, and the IPP L_k/R_k via challenge-product coefficients over
  the ORIGINAL generators (no point folding; the prover-side mirror of
  `verification_scalars`) -- plus all mod-l vector math.  Everything
  between two Fiat-Shamir challenges is ONE fused jit launch
  (prover_stages.stage*_fused / round*_fused): through the device tunnel
  each dispatch costs tens of milliseconds of host time, so launch count,
  not device FLOPs, set the old wall-clock;
* host (native/prove_prep.cpp): Fiat-Shamir transcripts (Keccak/STROBE),
  one batched C++ call per protocol stage.  The host-oracle path (no TPU)
  additionally runs the scalar stages in C++.

Wire format and transcript semantics are identical to the single-proof
path: outputs verify with RangeProof.verify_single / BatchVerifier and are
bit-compatible with the reference crate.
"""

from __future__ import annotations

import ctypes
import secrets
from typing import List, Sequence, Tuple

import numpy as np

from ..core.scalar import Scalar
from ..errors import MPCError
from ..generators import BulletproofGens, PedersenGens
from ..ops import fixed_msm
from ..transcript import Transcript
from .ipp import InnerProductProof
from .rangeproof import RangeProof


# Exception types under which the fused device-transcript path may degrade
# to the per-stage pipeline: XLA compile/runtime failures and tunnel
# transport errors only.  Anything else is a logic bug and must propagate.
import jax.errors as _jax_errors

_FUSED_FALLBACK_ERRORS = (_jax_errors.JaxRuntimeError, OSError)
_fused_fallback_logged = False


def _log_fused_fallback(e):
    global _fused_fallback_logged
    if not _fused_fallback_logged:
        _fused_fallback_logged = True
        import logging
        logging.getLogger("bulletproofs_tpu").warning(
            "fused batch prover fell back to the per-stage pipeline: %r "
            "(logged once; subsequent fallbacks are silent)", e)


def _load_native():
    import os
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    so = os.path.join(here, "native", "libbptranscript.so")
    try:
        lib = ctypes.CDLL(so)
        lib.rp_state_size.restype = ctypes.c_uint64
        for fn in ("rp_prove_stage0", "rp_prove_stage1", "rp_prove_stage2",
                   "rp_prove_round_coefs", "rp_prove_round_absorb",
                   "rp_prove_finish"):
            getattr(lib, fn).restype = ctypes.c_int
        return lib
    except (OSError, AttributeError):
        return None


_NATIVE = _load_native()


def _check_rc(rc: int, what: str) -> None:
    """Native return-code check that survives `python -O` (a bare assert
    would be stripped, silently emitting proofs from uninitialized
    Fiat-Shamir buffers)."""
    if rc != 0:
        raise RuntimeError(f"native prove engine failed in {what} (rc={rc})")


class BatchProver:
    """Caches device tables for (n, m) and proves batches of range proofs.

    m = 1 (default) proves single-value statements; m > 1 proves
    AGGREGATED statements (m values per proof, the local trusted-dealer
    path of reference mod.rs:234-288) with all nm-length vector math
    batched on device."""

    def __init__(self, bp_gens: BulletproofGens, pc_gens: PedersenGens,
                 n: int, m: int = 1):
        if n not in (8, 16, 32, 64):
            raise MPCError(MPCError.INVALID_BITSIZE)
        if m == 0 or m & (m - 1):
            raise MPCError(MPCError.INVALID_AGGREGATION)
        if _NATIVE is None:
            raise RuntimeError("native prove engine unavailable "
                               "(build native/libbptranscript.so)")
        self.n = n
        self.m = m
        self.N = n * m
        self.bp_gens = bp_gens
        self.pc_gens = pc_gens
        bases = [pc_gens.B, pc_gens.B_blinding] + bp_gens.G(n, m) + bp_gens.H(n, m)
        self.nb = len(bases)
        self.tables = fixed_msm.FixedBaseTables(bases)
        self.tables_bb = fixed_msm.FixedBaseTables(bases[:2])
        self.force_device = False    # tests: exercise the device path on CPU
        self.fused = True            # ONE-program device prove (set False to
                                     # exercise the per-stage legacy pipeline)
        self.use_segmented = None    # None = auto: the 3-program segmented
                                     # rest for aggregated m > 1 on TPU
        from ..ops import prover_stages as PS
        # compact stage-0 streams: A touches only window 0 of each G/H
        # (coefficients in {0, +-1}); S drops the zero-coefficient B column
        self.a_tables = fixed_msm.StreamSubsetTables(
            self.tables, PS.a_stream_sel(self.N))
        self.s_tables = fixed_msm.SubsetTables(
            self.tables, PS.s_base_sel(self.N))
        # per-round active-base subset tables (device path): the L/R MSMs
        # touch half the G's plus the complementary half of the H's
        self.round_tables = {}
        nk = self.N
        while nk > 1:
            l_set, r_set = PS.round_base_sets(self.N, nk)
            self.round_tables[nk] = (
                fixed_msm.SubsetTables(self.tables, l_set),
                fixed_msm.SubsetTables(self.tables, r_set))
            nk //= 2

    def prove_batch(self, values: Sequence, blindings: Sequence,
                    transcripts: List[Transcript], rng=None
                    ) -> Tuple[List[RangeProof], List]:
        """Prove one n-bit statement (m = 1: a single value; m > 1: a list
        of m values) per transcript.  Returns (proofs, value_commitments);
        each proof verifies against its transcript label exactly like
        RangeProof.prove_single / prove_multiple's output.  For m > 1 each
        value-commitments entry is a list of m compressed points.

        On TPU the scalar vector math also runs on device (the tunnel's
        host bandwidth is the scarce resource); elsewhere the C++ stages
        feed the host MSM oracle."""
        rng = rng or _SystemRandom()
        count = len(values)
        assert count == len(blindings) == len(transcripts)
        if self.m == 1:
            values = [[int(v)] for v in values]
            blindings = [[b] for b in blindings]
        for vs in values:
            if len(vs) != self.m:
                raise ValueError(f"expected {self.m} values per statement")
            for v in vs:
                if v < 0 or v >> self.n:
                    raise ValueError(f"value out of range for {self.n}-bit proof")
        if fixed_msm._on_tpu() or self.force_device:
            # fused device-transcript path: two programs for m = 1 (the
            # throughput config); aggregated statements run the SEGMENTED
            # form (ops/prover_stages.prove_rest_segmented -- three
            # bounded-size executables with a shape-uniform round step),
            # since the one-scan program at N = n*m >= 256 exceeds what
            # the remote Mosaic compiler reliably digests
            if self.fused:
                # Snapshot the Fiat-Shamir states first: with interleaved
                # halves, one half may have written its advanced post-IPP
                # STROBE state back before the other half throws, and the
                # per-stage fallback must replay from the ORIGINAL states
                # or it silently emits unverifiable proofs for that half.
                snaps = [t.strobe.buf.raw for t in transcripts]
                try:
                    return self._prove_batch_device_fused(
                        values, blindings, transcripts, rng)
                except Exception as e:
                    for t, snap in zip(transcripts, snaps):
                        t.strobe.buf.raw = snap
                    # ONLY compile/dispatch failures degrade to the
                    # per-stage pipeline (e.g. the remote Mosaic compiler
                    # rejecting a program); logic bugs (ValueError,
                    # AssertionError, ...) must surface -- with the
                    # transcripts restored -- not silently manifest as a
                    # throughput mystery.
                    if self.force_device or \
                            not isinstance(e, _FUSED_FALLBACK_ERRORS):
                        raise
                    _log_fused_fallback(e)
            return self._prove_batch_device(values, blindings, transcripts, rng)
        if self.m > 1:
            # no C++ aggregated stage engine: use the protocol path (native
            # curve backend) per proof
            proofs, vcs = [], []
            for vs, bs, t in zip(values, blindings, transcripts):
                p, vc = RangeProof.prove_multiple(
                    self.bp_gens, self.pc_gens, t, vs, bs, self.n, rng=rng)
                proofs.append(p)
                vcs.append(vc)
            return proofs, vcs
        return self._prove_batch_host(
            [vs[0] for vs in values], [bs[0] for bs in blindings],
            transcripts, rng)

    # -- fused device path: two programs split at the y/z boundary ----------

    def _prove_batch_device_fused(self, values, blindings, transcripts, rng):
        """Two jit launches per half-batch: stage 0 (blinds + V/A/S
        commitments), ONE host Fiat-Shamir step (C++ rp_ts_yz -- the only
        transcript segment whose byte schedule depends on the caller's
        prior content), then everything else -- device transcripts
        (ops/transcript_device), all remaining MSMs, the scan-uniform IPP
        round loop, canonical output scalars -- in the second program.

        Large batches run as two interleaved halves so the host work
        (yz transcripts, proof-object assembly) of one half overlaps the
        device work of the other."""
        count = len(values)
        if count >= 2048 and count % 2 == 0:
            h = count // 2
            parts = [slice(0, h), slice(h, count)]
        else:
            parts = [slice(0, count)]
        gens = [self._prove_half_fused_gen(values[s], blindings[s],
                                           transcripts[s], rng)
                for s in parts]
        import jax
        pend = [next(g) for g in gens]          # all stage-0s dispatched
        results = [None] * len(gens)
        live = list(range(len(gens)))
        while live:
            for i in list(live):
                try:
                    pend[i] = gens[i].send(jax.device_get(pend[i]))
                except StopIteration as e:
                    results[i] = e.value
                    live.remove(i)
        proofs, vcs = [], []
        for r in results:
            proofs.extend(r[0])
            vcs.extend(r[1])
        return proofs, vcs

    def _prove_half_fused_gen(self, values, blindings, transcripts, rng):
        """Generator protocol: yields device arrays right after dispatching
        each program, so the driver can interleave halves (fetch A while
        the device crunches B)."""
        import jax
        import jax.numpy as jnp
        from ..ops import prover_stages as PS

        n, m, N, count = self.n, self.m, self.N, len(values)
        on_tpu = fixed_msm._on_tpu()

        v_bytes = jnp.asarray(np.frombuffer(
            b"".join(int(values[p][j]).to_bytes(32, "little")
                     for j in range(m) for p in range(count)),
            np.uint8).reshape(m * count, 32))
        vb_bytes = jnp.asarray(np.frombuffer(
            b"".join(blindings[p][j].to_bytes()
                     for j in range(m) for p in range(count)),
            np.uint8).reshape(m * count, 32))
        vals_np = np.array([[int(values[p][j]) for p in range(count)]
                            for j in range(m)], np.uint64)
        shifts = np.arange(n, dtype=np.uint64)
        bits_u8 = jnp.asarray(
            ((vals_np[:, None, :] >> shifts[None, :, None]) & 1)
            .reshape(N, count).astype(np.uint8))

        kn = np.zeros(11, np.uint32)
        kn[:8] = np.frombuffer(rng.randbytes(32), "<u4")
        niels = self.tables.ensure_niels()

        s0 = PS.stage0_fused_v2 if on_tpu else PS.stage0_eager
        vas_dev, red = s0(n, m, niels, jnp.asarray(kn), v_bytes, vb_bytes,
                          bits_u8)
        vas = np.asarray((yield vas_dev))

        # host Fiat-Shamir: dom-sep + V/A/S -> y, z (and 1/y)
        strobe_size = len(transcripts[0].strobe.buf.raw)
        strobes = ctypes.create_string_buffer(
            b"".join(t.strobe.buf.raw for t in transcripts),
            strobe_size * count)
        yz = ctypes.create_string_buffer(3 * count * 32)
        rc = _NATIVE.rp_ts_yz(ctypes.c_uint64(count), strobes,
                              ctypes.c_size_t(strobe_size),
                              ctypes.c_uint64(n), ctypes.c_uint64(m),
                              vas.tobytes(), yz)
        _check_rc(rc, "rp_ts_yz")
        # post-z states all sit at _ROUND_COUNTERS; upload the 200-byte
        # sponge states for the device transcript to continue
        states_z = np.frombuffer(strobes.raw, np.uint8).reshape(
            count, strobe_size)[:, :200].T.copy()
        yz_rows = jnp.asarray(np.frombuffer(yz.raw, np.uint8)
                              .reshape(3 * count, 32))

        use_seg = getattr(self, "use_segmented", None)
        if use_seg is None:
            use_seg = on_tpu and m > 1
        if use_seg:
            rest = PS.prove_rest_segmented
        elif on_tpu:
            rest = PS.prove_rest_fused
        else:
            rest = PS.prove_rest_eager
        rest_dev = rest(n, m, niels, jnp.asarray(states_z), red, bits_u8,
                        yz_rows, vb_bytes)
        tb, lr_all, fin, st = (np.asarray(x) for x in (yield rest_dev))

        posf, pbf, flf = PS._ROUND_COUNTERS
        for i, t in enumerate(transcripts):
            buf = bytearray(t.strobe.buf.raw)
            buf[:200] = st[:, i].tobytes()
            buf[200], buf[201], buf[202] = posf, pbf, flf
            t.strobe.buf.raw = bytes(buf)

        proofs, vcs = [], []
        for p in range(count):
            ipp = InnerProductProof(
                L_vec=[bytes(lr_all[k, p]) for k in range(lr_all.shape[0])],
                R_vec=[bytes(lr_all[k, count + p])
                       for k in range(lr_all.shape[0])],
                a=Scalar.from_canonical_bytes(fin[3, p].tobytes()),
                b=Scalar.from_canonical_bytes(fin[4, p].tobytes()))
            proofs.append(RangeProof(
                A=bytes(vas[m * count + p]),
                S=bytes(vas[(m + 1) * count + p]),
                T_1=bytes(tb[p]), T_2=bytes(tb[count + p]),
                t_x=Scalar.from_canonical_bytes(fin[0, p].tobytes()),
                t_x_blinding=Scalar.from_canonical_bytes(fin[1, p].tobytes()),
                e_blinding=Scalar.from_canonical_bytes(fin[2, p].tobytes()),
                ipp_proof=ipp))
            if m == 1:
                vcs.append(bytes(vas[p]))
            else:
                vcs.append([bytes(vas[j * count + p]) for j in range(m)])
        return proofs, vcs

    # -- device path: Fiat-Shamir on host, everything else on device --------

    def _prove_batch_device(self, values, blindings, transcripts, rng):
        """Drives the batch as two interleaved halves: each half's protocol
        generator yields a device array right after dispatching a stage, so
        while the driver fetches half A's points and runs its C++
        transcript stage, the device is already crunching half B's MSMs
        (Fiat-Shamir serializes stages WITHIN a half, not across halves)."""
        import jax

        count = len(values)
        if count >= 1024 and count % 2 == 0:
            h = count // 2
            parts = [slice(0, h), slice(h, count)]
        else:
            parts = [slice(0, count)]
        gens, pend = [], []
        for s in parts:
            g = self._prove_half_gen(values[s], blindings[s],
                                     transcripts[s], rng)
            gens.append(g)
            pend.append(next(g))        # primes: dispatches its stage 0
        results = [None] * len(gens)
        live = list(range(len(gens)))
        while live:
            for i in list(live):
                try:
                    pend[i] = gens[i].send(
                        np.asarray(jax.device_get(pend[i])))
                except StopIteration as e:
                    results[i] = e.value
                    live.remove(i)
        proofs, vcs = [], []
        for r in results:
            proofs.extend(r[0])
            vcs.extend(r[1])
        return proofs, vcs

    def _prove_half_gen(self, values, blindings, transcripts, rng):
        import jax
        import jax.numpy as jnp
        from ..ops import prover_stages as PS

        n, m, N, count = self.n, self.m, self.N, len(values)
        strobe_size = len(transcripts[0].strobe.buf.raw)
        strobes = ctypes.create_string_buffer(
            b"".join(t.strobe.buf.raw for t in transcripts),
            strobe_size * count)

        def byte_rows(raw: bytes, num: int) -> jnp.ndarray:
            return jnp.asarray(np.frombuffer(raw, np.uint8).reshape(num, 32))

        def canonical_rows(by, k):
            """fetched (k*P, 33) uint8 -> (k, P, 32) canonical rows (one
            C++ wide-reduce call; 33-byte values zero-pad to the 64-byte
            reduction input)."""
            wide = np.zeros((k * count, 64), np.uint8)
            wide[:, :33] = by
            out = ctypes.create_string_buffer(k * count * 32)
            rc = _NATIVE.rp_reduce_wide(ctypes.c_uint64(k * count),
                                        wide.tobytes(), out)
            _check_rc(rc, "rp_reduce_wide")
            return np.frombuffer(out.raw, np.uint8).reshape(k, count, 32)

        # blinding draws: [ab][sb][t1b][t2b] (count each) + [sl][sr] (N*count,
        # laid out i-major so a reshape gives (L, N, P)).  Expanded ON
        # DEVICE from one 256-bit seed (ops/chacha.py) -- uploading
        # host-drawn scalars costs 32 B x (4+2N) x P (~0.6 s of tunnel
        # time per 4096-proof batch at n = 64), vs 32 B total for the seed.
        n_draws = count * (4 + 2 * N)
        if getattr(self, "use_host_blinds", False):
            reduced = ctypes.create_string_buffer(n_draws * 32)
            rc = _NATIVE.rp_reduce_wide(ctypes.c_uint64(n_draws),
                                        rng.randbytes(n_draws * 64), reduced)
            _check_rc(rc, "rp_reduce_wide")
            from ..ops import vec_scalar as VS
            red = VS.from_bytes32(byte_rows(reduced.raw, n_draws))
        else:
            from ..ops import chacha
            red = chacha.random_scalars(rng.randbytes(32), n_draws)

        # party-major scalars (column j*count + p) and concatenated bits
        # (row k = j*n + i)
        v_bytes = byte_rows(b"".join(int(values[p][j]).to_bytes(32, "little")
                                     for j in range(m) for p in range(count)),
                            m * count)
        vb_bytes = byte_rows(b"".join(blindings[p][j].to_bytes()
                                      for j in range(m) for p in range(count)),
                             m * count)
        # bits (N, count): row k = j*n + i is bit i of party j's value
        vals_np = np.array([[int(values[p][j]) for p in range(count)]
                            for j in range(m)], np.uint64)    # (m, count)
        shifts = np.arange(n, dtype=np.uint64)
        bits_np = ((vals_np[:, None, :] >> shifts[None, :, None]) & 1) \
            .reshape(N, count).astype(np.int32)
        bits = jnp.asarray(bits_np)

        niels_bb = self.tables_bb.ensure_niels()
        niels_a = self.a_tables.ensure_niels()
        niels_s = self.s_tables.ensure_niels()

        # stage 0 (ONE launch): V_j rows over [B, B~], the compact A stream,
        # S over every non-B base, all compressed together
        vas = yield PS.stage0_fused(n, m, niels_bb, niels_a, niels_s, red,
                                    v_bytes, vb_bytes, bits)
        yz = ctypes.create_string_buffer(3 * count * 32)
        rc = _NATIVE.rp_ts_yz(ctypes.c_uint64(count), strobes,
                              ctypes.c_size_t(strobe_size),
                              ctypes.c_uint64(n), ctypes.c_uint64(m),
                              vas.tobytes(), yz)
        _check_rc(rc, "rp_ts_yz")

        # stage 1 (ONE launch): T_1, T_2 + the l/r polynomial state
        (tb_dev, l0, l1, r0, r1, t0, t1, t2, zz_zpow, yinv) = PS.stage1_fused(
            n, m, niels_bb, bits, red, byte_rows(yz.raw, 3 * count))
        tb = yield tb_dev
        x_buf = ctypes.create_string_buffer(count * 32)
        rc = _NATIVE.rp_ts_x(ctypes.c_uint64(count), strobes,
                             ctypes.c_size_t(strobe_size), tb.tobytes(), x_buf)
        _check_rc(rc, "rp_ts_x")

        # stage 2 (ONE launch): share scalars + IPP init (over N = n*m)
        (txs_dev, a, b, gw, hw, t_x, t_xb, e_b) = PS.stage2_fused(
            n, m, byte_rows(x_buf.raw, count), l0, l1, r0, r1, t0, t1, t2,
            zz_zpow, red, vb_bytes, yinv)
        txs = canonical_rows((yield txs_dev), 3)
        txs_blob = np.ascontiguousarray(
            txs.transpose(1, 0, 2).reshape(count, 96)).tobytes()
        w_buf = ctypes.create_string_buffer(count * 32)
        rc = _NATIVE.rp_ts_w(ctypes.c_uint64(count), strobes,
                             ctypes.c_size_t(strobe_size), ctypes.c_uint64(N),
                             txs_blob, w_buf)
        _check_rc(rc, "rp_ts_w")
        w_bytes = byte_rows(w_buf.raw, count)

        # IPP rounds, ONE launch each: the fold of round k-1 fuses into
        # round k's digit/MSM/compress program
        L_rows, R_rows = [], []
        u_bytes = ui_bytes = None
        nk = N
        while nk > 1:
            niels_l, niels_r = (t.ensure_niels() for t in self.round_tables[nk])
            if nk == N:
                lr_dev = PS.round_first_fused(N, niels_l, niels_r,
                                              a, b, gw, hw, w_bytes)
            else:
                lr_dev, a, b, gw, hw = PS.roundk_fused(
                    N, nk, niels_l, niels_r, a, b, gw, hw,
                    u_bytes, ui_bytes, w_bytes)
            lr = yield lr_dev
            L_rows.append(lr[:count])
            R_rows.append(lr[count:])
            u_buf = ctypes.create_string_buffer(count * 32)
            ui_buf = ctypes.create_string_buffer(count * 32)
            rc = _NATIVE.rp_ts_round(ctypes.c_uint64(count), strobes,
                                     ctypes.c_size_t(strobe_size),
                                     lr.tobytes(), u_buf, ui_buf)
            _check_rc(rc, "rp_ts_round")
            u_bytes = byte_rows(u_buf.raw, count)
            ui_bytes = byte_rows(ui_buf.raw, count)
            nk //= 2

        fin = canonical_rows((yield PS.final_fused(
            N, a, b, gw, hw, u_bytes, ui_bytes, t_x, t_xb, e_b)), 5)
        for i, t in enumerate(transcripts):
            t.strobe.buf.raw = strobes.raw[i * strobe_size: (i + 1) * strobe_size]

        proofs, vcs = [], []
        for p in range(count):
            ipp = InnerProductProof(
                L_vec=[bytes(Lr[p]) for Lr in L_rows],
                R_vec=[bytes(Rr[p]) for Rr in R_rows],
                a=Scalar.from_canonical_bytes(fin[3, p].tobytes()),
                b=Scalar.from_canonical_bytes(fin[4, p].tobytes()))
            proofs.append(RangeProof(
                A=bytes(vas[m * count + p]),
                S=bytes(vas[(m + 1) * count + p]),
                T_1=bytes(tb[p]), T_2=bytes(tb[count + p]),
                t_x=Scalar.from_canonical_bytes(fin[0, p].tobytes()),
                t_x_blinding=Scalar.from_canonical_bytes(fin[1, p].tobytes()),
                e_blinding=Scalar.from_canonical_bytes(fin[2, p].tobytes()),
                ipp_proof=ipp))
            if m == 1:
                vcs.append(bytes(vas[p]))
            else:
                vcs.append([bytes(vas[j * count + p]) for j in range(m)])
        return proofs, vcs

    # -- host-oracle path (CPU backends / tests) -----------------------------

    def _prove_batch_host(self, values, blindings, transcripts, rng):
        n, nb = self.n, self.nb
        count = len(values)

        state = ctypes.create_string_buffer(_NATIVE.rp_state_size(n) * count)
        strobe_size = len(transcripts[0].strobe.buf.raw)
        strobes = ctypes.create_string_buffer(
            b"".join(t.strobe.buf.raw for t in transcripts),
            strobe_size * count)

        # stage 0: blindings -> V/A/S coefficients -> device MSM + compress
        vals = (ctypes.c_uint64 * count)(*[int(v) for v in values])
        vblind = b"".join(b.to_bytes() for b in blindings)
        rand0 = rng.randbytes(count * (2 + 2 * n) * 64)
        coef0 = np.zeros((3 * count, nb, 32), np.uint8)
        rc = _NATIVE.rp_prove_stage0(
            ctypes.c_uint64(count), ctypes.c_uint64(n), vals, vblind, rand0,
            state, coef0.ctypes.data_as(ctypes.c_char_p))
        _check_rc(rc, "rp_prove_stage0")
        # V/A/S coefficients carry the witness (values, bits, blinds):
        # consttime rows, as the reference's MultiscalarMul would be
        vas = fixed_msm.msm_rows_compressed(self.tables, coef0,
                                            consttime=True)

        # stage 1: y, z; l/r polys; T1/T2 coefficients
        rand1 = rng.randbytes(count * 128)
        coef1 = np.zeros((2 * count, 2, 32), np.uint8)
        rc = _NATIVE.rp_prove_stage1(
            ctypes.c_uint64(count), ctypes.c_uint64(n), strobes,
            ctypes.c_size_t(strobe_size), vas.tobytes(), rand1, state,
            coef1.ctypes.data_as(ctypes.c_char_p))
        _check_rc(rc, "rp_prove_stage1")
        # T1/T2 coefficients are the secret t-polynomial: consttime rows
        tb = fixed_msm.msm_rows_compressed(self.tables_bb, coef1,
                                           consttime=True)

        # stage 2: x; share scalars; w; IPP init
        rc = _NATIVE.rp_prove_stage2(
            ctypes.c_uint64(count), ctypes.c_uint64(n), strobes,
            ctypes.c_size_t(strobe_size), tb.tobytes(), state)
        _check_rc(rc, "rp_prove_stage2")

        # IPP rounds
        L_rows, R_rows = [], []
        nk = n
        coefr = np.zeros((2 * count, nb, 32), np.uint8)
        while nk > 1:
            rc = _NATIVE.rp_prove_round_coefs(
                ctypes.c_uint64(count), ctypes.c_uint64(n),
                ctypes.c_uint64(nk), state,
                coefr.ctypes.data_as(ctypes.c_char_p))
            _check_rc(rc, "rp_prove_round_coefs")
            lr = fixed_msm.msm_rows_compressed(self.tables, coefr)
            L_rows.append(lr[:count])
            R_rows.append(lr[count:])
            rc = _NATIVE.rp_prove_round_absorb(
                ctypes.c_uint64(count), ctypes.c_uint64(n),
                ctypes.c_uint64(nk), strobes, ctypes.c_size_t(strobe_size),
                lr.tobytes(), state)
            _check_rc(rc, "rp_prove_round_absorb")
            nk //= 2

        scal = ctypes.create_string_buffer(count * 5 * 32)
        rc = _NATIVE.rp_prove_finish(ctypes.c_uint64(count),
                                     ctypes.c_uint64(n), state, scal)
        _check_rc(rc, "rp_prove_finish")

        # transcripts advanced in place (reference semantics)
        for i, t in enumerate(transcripts):
            t.strobe.buf.raw = strobes.raw[i * strobe_size: (i + 1) * strobe_size]

        proofs, vcs = [], []
        sraw = scal.raw
        for p in range(count):
            off = p * 160
            ipp = InnerProductProof(
                L_vec=[bytes(L_rows[k][p]) for k in range(len(L_rows))],
                R_vec=[bytes(R_rows[k][p]) for k in range(len(R_rows))],
                a=Scalar.from_canonical_bytes(sraw[off + 96: off + 128]),
                b=Scalar.from_canonical_bytes(sraw[off + 128: off + 160]))
            proofs.append(RangeProof(
                A=bytes(vas[count + p]), S=bytes(vas[2 * count + p]),
                T_1=bytes(tb[p]), T_2=bytes(tb[count + p]),
                t_x=Scalar.from_canonical_bytes(sraw[off: off + 32]),
                t_x_blinding=Scalar.from_canonical_bytes(sraw[off + 32: off + 64]),
                e_blinding=Scalar.from_canonical_bytes(sraw[off + 64: off + 96]),
                ipp_proof=ipp))
            vcs.append(bytes(vas[p]))
        return proofs, vcs


class _SystemRandom:
    @staticmethod
    def randbytes(n: int) -> bytes:
        return secrets.token_bytes(n)
