"""Build and run the native plane's standalone self-test under
ASAN/UBSAN (SURVEY section 5 sanitizer coverage)."""

import os
import subprocess

import pytest


@pytest.mark.slow
def test_asan_selftest():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(["make", "asan"], cwd=root, capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "selftest passed" in r.stdout
