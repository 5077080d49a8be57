"""The README quick-start runs as a test (the reference wires its README
example in as a doctest, src/lib.rs:6 / README.md:93-147 — same strategy).

Extracts the first python code block from README.md and executes it with an
rng injected, so the documented example can never drift from the API.
"""

import os
import re


def test_readme_quick_start_runs(rng):
    readme = open(os.path.join(os.path.dirname(__file__), "..",
                               "README.md")).read()
    block = re.search(r"## Quick start\s+```python\n(.*?)```", readme,
                      re.S).group(1)
    # the README notes `rng` is any object with .randbytes(n); inject ours
    namespace = {"rng": rng}
    exec(compile(block, "README.md#quick-start", "exec"), namespace)
    # the example leaves a verified proof in scope
    assert "proof" in namespace and "committed_value" in namespace


def test_readme_quick_start_matches_reference_doctest_shape(rng):
    """The example mirrors the reference README doctest: n=32, value
    1037578891, transcript label b'doctest example'."""
    readme = open(os.path.join(os.path.dirname(__file__), "..",
                               "README.md")).read()
    block = re.search(r"## Quick start\s+```python\n(.*?)```", readme,
                      re.S).group(1)
    assert "1037578891" in block
    assert 'b"doctest example"' in block
