#!/usr/bin/env python
"""Full test suite with process isolation for the XLA-heavy modules.

XLA-CPU JIT code pages accumulate mmap regions; one process running the
whole suite crosses vm.max_map_count (65530 on this box) and dies with a
segfault inside compiled code (see tests/conftest.py).  The per-module
cache clear bounds the growth for most modules, but the three heaviest
(batch verify + sharded + batch prover, each compiling multi-hundred-KLoC
XLA programs) can still blow the limit when combined.  This runner keeps
them in their own processes so the suite as a whole cannot be taken down:

    python tests/run_suite.py [extra pytest args]

Exit code is non-zero if ANY segment fails.
"""

import os
import subprocess
import sys

HEAVY = [
    "test_batch_prover.py",
    "test_batch_verify.py",
    "test_sharded.py",
]


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    extra = sys.argv[1:] or ["-q"]
    rc = 0

    light_cmd = [sys.executable, "-m", "pytest", here] + [
        f"--ignore={os.path.join(here, h)}" for h in HEAVY] + extra
    print("::", " ".join(light_cmd), flush=True)
    rc |= subprocess.call(light_cmd)

    for h in HEAVY:
        cmd = [sys.executable, "-m", "pytest", os.path.join(here, h)] + extra
        print("::", " ".join(cmd), flush=True)
        rc |= subprocess.call(cmd)
    return rc


if __name__ == "__main__":
    sys.exit(main())
