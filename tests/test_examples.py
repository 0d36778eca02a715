"""Smoke tests for the runnable example scripts: each executes as a
subprocess with the smallest sensible arguments — the examples are
user-facing API surface, and an API change that breaks one should fail
in CI, not in a reader's terminal. (The training examples are excluded:
minutes of CPU optimization is benchmark territory, not CI.)"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args, timeout=480):
    env = dict(os.environ)
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", script), *args],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=ROOT,
    )


def test_adaptive_streaming_demo(tmp_path):
    r = _run("adaptive_streaming_demo.py", "--cpu", "--seconds", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "plays in ANY .acs decoder" in r.stdout


def test_lossy_transport_demo(tmp_path):
    r = _run("lossy_transport_demo.py", "--cpu", "--seconds", "4",
             "--chunk-blocks", "16", "--lose", "1")
    assert r.returncode == 0, r.stderr[-2000:]


def test_codec_demo(tmp_path):
    r = _run("codec_demo.py", "--cpu", "--bitrates", "96",
             "--out-dir", str(tmp_path), timeout=540)
    assert r.returncode == 0, r.stderr[-2000:]


def test_archival_demo(tmp_path):
    r = _run("archival_demo.py", "--cpu", "--seconds", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "bit-exact" in r.stdout
    assert "seekable=True" in r.stdout
