"""Smoke-run every example script (slow suite only: ~74 subprocesses).

The examples are the user-facing surface mirroring the reference's
examples/ programs; each asserts its own success criteria internally.
"""
import os
import pathlib
import subprocess
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parent.parent / "examples").glob("*_example.py"))
EXAMPLES += sorted(
    (pathlib.Path(__file__).parent.parent / "examples").glob(
        "sdr_capture_decode.py"))


@pytest.mark.slow
@pytest.mark.parametrize("script", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(script):
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run([sys.executable, str(script)], capture_output=True,
                       text=True, timeout=600, env=env)
    assert r.returncode == 0, (script.name, r.stdout[-800:], r.stderr[-800:])
