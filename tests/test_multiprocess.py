"""Multi-process mesh prove (scripts/mesh_multiprocess.py) as a test.

Runs 3 full k=10 proves (single-process golden + 2-process mesh), ~10
minutes on this box — opt in with HALO2_TPU_TEST_MULTIPROC=1. The
round-5 artifact MULTIPROC_r05.json records a passing run."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.environ.get("HALO2_TPU_TEST_MULTIPROC"),
                    reason="slow (3 full proves); set "
                           "HALO2_TPU_TEST_MULTIPROC=1")
def test_two_process_mesh_prove_transcript_parity():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # harness sets its own device counts
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "mesh_multiprocess.py")],
        env=env, capture_output=True, text=True, timeout=6000)
    data = None
    for line in (out.stdout or "").splitlines():
        if line.startswith("{"):
            data = json.loads(line)
    assert data is not None, out.stderr[-500:]
    assert data["ok"] and data["match"], data
