"""bench.py failure-path tests (CPU-only, subprocess-driven).

The driver records whatever bench.py prints; these pin the *failure*
contracts so a broken TPU day produces diagnosable gate files instead of
silent timeouts (round-2 lesson: BENCH_r02.json was rc=124/parsed:null).
The success path needs the real chip and is exercised by the driver.
"""
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _run_bench(env_extra, timeout=120):
    env = dict(os.environ)
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=str(REPO))


def test_bench_injected_failure_exhausts_retry():
    """BENCH_FORCE_FAIL + BENCH_RETRIED: the retry wrapper gives up with
    rc=1 and an explicit message instead of looping forever."""
    r = _run_bench({"BENCH_FORCE_FAIL": "1", "BENCH_RETRIED": "1",
                    "BENCH_SKIP_PREFLIGHT": "1"})
    assert r.returncode == 1
    assert "failed again after retry" in r.stderr
    assert "injected failure" in r.stderr


def test_bench_preflight_timeout_fails_fast():
    """An unresponsive device layer (simulated by an impossible 1 s probe
    budget) exits rc=2 with a tunnel diagnosis in the tail — bounded,
    never hanging the driver's whole bench budget."""
    r = _run_bench({"BENCH_PREFLIGHT_TRIES": "1",
                    "BENCH_PREFLIGHT_SECS": "1",
                    "BENCH_PREFLIGHT_PROBE": "import time; time.sleep(30)"})
    assert r.returncode == 2
    assert "TPU tunnel unresponsive" in r.stderr
    assert "no measurement possible" in r.stderr
    assert r.stdout.strip() == ""  # no fake JSON record
