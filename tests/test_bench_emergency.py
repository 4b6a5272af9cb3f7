"""The bench's driver-facing contract (VERDICT r3 item 1): under ANY failure
mode — startup stall, worker crash, missing history — ``python bench.py``
must exit 0 with a parseable JSON headline as its last stdout line, carrying
a non-null measured value whenever one has ever been recorded.

These tests run the real ``bench.py`` in a subprocess using its test hooks
(``NFMC_BENCH_FAKE_STALL_S`` / ``NFMC_BENCH_FAKE_CRASH``); no device work
happens (the worker stalls/crashes before touching JAX devices), so they are
fast and CPU-safe.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(env_extra, timeout=120):
    env = dict(os.environ)
    env.update(env_extra)
    proc = subprocess.run(
        [sys.executable, BENCH], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert lines, f"no stdout; stderr tail: {proc.stderr[-500:]}"
    return proc.returncode, json.loads(lines[-1])


@pytest.fixture
def stale_file(tmp_path):
    p = tmp_path / "BENCH_full.json"
    p.write_text(json.dumps({
        "metric": "jump_mala ESS/sec (100 chains, 100-d Gaussian, RealNVP proposal)",
        "value": 1234567.8,
        "unit": "ESS/s",
        "vs_baseline": 179.79,
        "torch_cpu_baseline": {"ess_per_s": 6399.7},
    }))
    return str(p)


def test_startup_stall_emits_stale_headline_rc0(stale_file):
    """A multi-minute startup stall (round 3's recorded failure) must still
    produce rc=0 and the last MEASURED headline marked stale — not
    ``value: null`` and not an rc=124 overrun."""
    rc, rec = _run_bench({
        "NFMC_BENCH_FAKE_STALL_S": "600",
        "NFMC_BENCH_DEADLINE_S": "4",
        "NFMC_BENCH_STALE_PATH": stale_file,
    })
    assert rc == 0
    assert rec["value"] == 1234567.8
    assert rec["stale"] is True
    assert "stale_from" in rec
    assert rec["unit"] == "ESS/s"
    # ADVICE r4: a stale line must not present the previous run's ratio as
    # this run's vs_baseline — it moves to stale_vs_baseline
    assert rec["vs_baseline"] is None
    assert rec["stale_vs_baseline"] == 179.79


def test_worker_crash_emits_stale_headline_rc0(stale_file):
    rc, rec = _run_bench({
        "NFMC_BENCH_FAKE_CRASH": "1",
        "NFMC_BENCH_DEADLINE_S": "60",
        "NFMC_BENCH_STALE_PATH": stale_file,
    })
    assert rc == 0
    assert rec["value"] == 1234567.8
    assert rec["stale"] is True
    assert "error" in rec


def test_no_history_still_parseable_rc0(tmp_path):
    """With no prior BENCH_full.json there is nothing measured to report —
    the line is still parseable with the metric named and rc=0."""
    rc, rec = _run_bench({
        "NFMC_BENCH_FAKE_STALL_S": "600",
        "NFMC_BENCH_DEADLINE_S": "4",
        "NFMC_BENCH_STALE_PATH": str(tmp_path / "missing.json"),
    })
    assert rc == 0
    assert rec["value"] is None
    assert rec["metric"].startswith("jump_mala")
    assert "error" in rec
