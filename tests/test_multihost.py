"""Multi-host execution path: 2 jax.distributed CPU processes running the
sharded fusion step over one global mesh must reproduce the single-process
run bit-for-bit (SURVEY.md §2.7; BASELINE.md multi-host scaling row;
VERDICT r2 item 4).

Runs ``scripts/run_multihost.sh`` in subprocesses (the in-process test
session is single-controller by construction, so real multi-process needs
fresh interpreters)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("SKIP_MULTIHOST") == "1",
                    reason="SKIP_MULTIHOST=1")
def test_two_process_run_matches_single_process(tmp_path):
    env = dict(os.environ)
    # the workers must not inherit the test session's single-process
    # device-count forcing
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "run_multihost.sh"), "2",
         str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=420)
    sys.stderr.write(proc.stdout[-1500:] + proc.stderr[-1500:])
    assert proc.returncode == 0
    assert "bit-identical to baseline" in proc.stdout
