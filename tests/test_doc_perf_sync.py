"""Doc perf claims must track the recorded artifact (VERDICT r4 item 3).

r3 and r4 both found README/docs quoting perf figures 2-3x away from the
measured ``BENCH_full.json``. The managed figures are now owned by
``scripts/sync_doc_perf.py``; this test runs its ``--check`` mode so drift
beyond the stated tolerance fails the suite (fix = rerun the script without
``--check`` after a bench run).
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "sync_doc_perf.py")
ARTIFACT = os.path.join(REPO, "BENCH_full.json")


@pytest.mark.skipif(not os.path.exists(ARTIFACT), reason="no BENCH_full.json")
def test_doc_perf_claims_match_artifact():
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--check"], cwd=REPO,
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0, (
        "doc perf claims drifted from BENCH_full.json "
        "(run `python scripts/sync_doc_perf.py` to regenerate):\n"
        + proc.stderr
    )
