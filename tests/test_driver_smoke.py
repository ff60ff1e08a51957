"""Opt-in gate mirroring the correctness driver's session model.

The driver builds a BARE SparkSession (no engine confs) and calls every
registered query; round 2 lost scoreboard rows to confs that only the
engine session pinned.  ``scripts/bare_session_smoke.py`` is the
regression gate; this wraps it as a marked pytest so the habit survives:

    python -m pytest tests/test_driver_smoke.py -m driver_smoke -q

It is deselected by default (pytest.ini addopts) because it runs all
registered queries at sf0.01 in a subprocess (~minutes).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.driver_smoke
def test_every_query_runs_on_bare_session():
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "bare_session_smoke.py"), "all"],
        capture_output=True,
        text=True,
        cwd=_REPO,
        timeout=1800,
    )
    tail = "\n".join(proc.stdout.splitlines()[-8:])
    assert proc.returncode == 0, f"bare-session smoke failed:\n{tail}\n{proc.stderr[-2000:]}"
