"""Device Keccak-f[1600] vs the host oracle (utils/keccak.f1600_state)."""

import numpy as np

from bulletproofs_tpu.utils.keccak import f1600_state
from bulletproofs_tpu.ops import keccak_device as KD


def test_f1600_matches_oracle_batch():
    rng = np.random.default_rng(7)
    P = 5
    states = rng.integers(0, 256, size=(P, 200), dtype=np.uint8)
    dev = np.asarray(KD.f1600_state_bytes(np.ascontiguousarray(states.T)))
    for p in range(P):
        want = f1600_state(states[p].tobytes())
        assert dev[:, p].tobytes() == want, f"lane {p} mismatch"


def test_f1600_zero_state():
    dev = np.asarray(KD.f1600_state_bytes(np.zeros((200, 1), np.uint8)))
    assert dev[:, 0].tobytes() == f1600_state(bytes(200))


def test_word_roundtrip():
    rng = np.random.default_rng(3)
    st = rng.integers(0, 256, size=(200, 3), dtype=np.uint8)
    back = np.asarray(KD.words_to_bytes(KD.bytes_to_words(st)))
    assert (back == st).all()
