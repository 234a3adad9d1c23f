"""Bit-rot guard for scripts/: every driver must at least parse --help
(they are otherwise only run by hand on hardware)."""

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(glob.glob(os.path.join(REPO, "scripts", "*.py")))


@pytest.mark.parametrize("script", SCRIPTS, ids=os.path.basename)
def test_script_help_parses(script):
    out = subprocess.run(
        [sys.executable, script, "--help"],
        capture_output=True, text=True, timeout=240,
        env={**os.environ, "JAX_PLATFORMS": ""},
    )
    assert out.returncode == 0, out.stderr[-800:]
