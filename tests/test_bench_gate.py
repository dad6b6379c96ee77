"""bench.py device-health gate: a degraded device must never produce a
headline number (the round-3 BENCH record incident).

Reference analogue: the autotuner's guard against unstable timings
(/root/reference/autotuner.cpp:35-50) — measurements taken in a regime the
code itself can detect as unstable are discarded, not recorded.
"""

import sys

import pytest

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import bench  # noqa: E402


@pytest.fixture
def fast_gate(monkeypatch):
    monkeypatch.setenv("BENCH_HEALTH_MIN_TFLOPS", "50")
    monkeypatch.setenv("BENCH_HEALTH_ATTEMPTS", "3")
    monkeypatch.setenv("BENCH_HEALTH_BACKOFF_S", "0")
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


def test_gate_refuses_degraded_device(fast_gate, monkeypatch):
    probes = []
    monkeypatch.setattr(bench, "device_health", lambda: probes.append(1) or 3.1)
    health, thr, ok = bench.gate_device_health()
    assert not ok
    assert health == 3.1
    assert thr == 50.0
    assert len(probes) == 3  # bounded retries, no infinite loop


def test_gate_passes_healthy_device(fast_gate, monkeypatch):
    monkeypatch.setattr(bench, "device_health", lambda: 130.0)
    health, thr, ok = bench.gate_device_health()
    assert ok and health == 130.0


def test_gate_recovers_after_retry(fast_gate, monkeypatch):
    seq = iter([4.0, 120.0])
    monkeypatch.setattr(bench, "device_health", lambda: next(seq))
    health, thr, ok = bench.gate_device_health()
    assert ok and health == 120.0


def test_gate_skips_non_tpu(monkeypatch):
    # CPU CI must not be blocked (and must not run the expensive probe).
    monkeypatch.setattr(
        bench, "device_health", lambda: pytest.fail("probe ran on CPU")
    )
    health, thr, ok = bench.gate_device_health()
    assert ok and thr is None


def test_gate_unknown_probe_passes(fast_gate, monkeypatch):
    # A probe that errors (returns None) must not hard-fail the bench.
    monkeypatch.setattr(bench, "device_health", lambda: None)
    health, thr, ok = bench.gate_device_health()
    assert ok and health is None


def test_watchdog_exits_on_wedge(tmp_path):
    """A wedged device op must not hang the bench forever: the watchdog
    force-exits with an explicit JSON error record."""
    import json
    import subprocess
    import sys as _sys

    repo = __file__.rsplit("/", 2)[0]
    r = subprocess.run(
        [_sys.executable, "-c",
         "import os, sys, time; sys.path.insert(0, %r); "
         "os.environ['BENCH_WATCHDOG_S'] = '0.3'; "
         "import bench; bench._arm_watchdog(); time.sleep(30)" % repo],
        capture_output=True, text=True, timeout=25,
    )
    assert r.returncode == 1
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["error"] == "bench_wedged"
    assert rec["value"] is None


def test_watchdog_disabled(monkeypatch):
    monkeypatch.setenv("BENCH_WATCHDOG_S", "0")
    assert bench._arm_watchdog() is None
