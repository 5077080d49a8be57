"""Each example under examples/ runs to completion (smoke, small sizes).

Mirrors the reference's practice of doc examples doubling as tests
(src/lib.rs:6 runs README.md; the prove/verify doc examples are doctests).
"""

import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = [
    ("range_proof.py", []),
    ("mpc_aggregation.py", []),
    ("mpc_multiprocess.py", ["2"]),
    ("r1cs_gadget.py", ["4"]),
    ("batch_throughput.py", ["8"]),
]


@pytest.mark.parametrize("script,args", EXAMPLES,
                         ids=[s for s, _ in EXAMPLES])
def test_example_runs(script, args):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # examples must not need the TPU
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "examples", script)] + args,
        capture_output=True, timeout=900, text=True, env=env)
    assert proc.returncode == 0, (
        f"{script} failed:\n{proc.stdout}\n{proc.stderr}")
