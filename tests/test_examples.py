"""Smoke tests for the example walkthroughs (r4 verdict item #8):
each example runs end-to-end at the sf0.001 tier in its own
subprocess (they build their own SparkSession — isolating them keeps
the test session's JVM config untouched) so the documented entry
points can't rot. ~30-55 s each; the walkthroughs exercise the same
operators the driver contract checks query-by-query, composed."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize(
    "script, expect",
    [
        ("examples/run_pipeline.py", "dedup over extracted text"),
        ("examples/corpus_prep.py", "corpus prep walkthrough complete"),
    ],
)
def test_example_runs_clean(script, expect):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script)],
        capture_output=True,
        text=True,
        timeout=400,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert expect in proc.stdout
