"""Multi-process (simulated multi-host) SPMD test — SURVEY §4c."""

import os
import subprocess
import sys

import pytest


def test_two_process_cluster_trains():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH="")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "multihost", "demo.py"),
         "--procs", "2"],
        capture_output=True, text=True, timeout=280, env=env,
    )
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-2000:])
    assert "multihost demo OK" in out.stdout
