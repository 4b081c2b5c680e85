"""Regression tests for bench.py's driver-facing contract: exactly one
JSON line on stdout with the headline metric first, surviving every
secondary-workload failure mode (raise, hang, dead backend). The driver
records this line as the round's benchmark artifact, so losing it to a
flaky tunnel costs the whole round's measurement.
"""

import json
import os
import sys
import threading

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


class _FakeMusicMod:
    def measure_peak_matmul_tflops(self):
        return 167.0

    def analytic_matmul_flops(self):
        return 2.29e10


@pytest.fixture()
def stubbed(monkeypatch):
    """bench.main() with the device-touching pieces stubbed out."""
    monkeypatch.setattr(bench, "_discover_devices", lambda *a, **k: None)
    monkeypatch.setattr(bench, "measure_ours", lambda: (2990.0, 1.1e9))
    monkeypatch.setattr(bench, "measure_music", lambda: 1100.0)
    monkeypatch.setattr(bench, "music_bench_module", lambda: _FakeMusicMod())
    return monkeypatch


def _run_main(capsys):
    bench.main()
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 1, lines
    return json.loads(lines[0])


def test_full_json_line(stubbed, capsys):
    out = _run_main(capsys)
    assert out["metric"] == "dsprites_arvae_train_steps_per_sec_b128"
    assert out["value"] == 2990.0
    assert out["measure_vae_steps_per_sec_b256"] == 1100.0
    # roofline fields: step_ms / floor / ratio self-consistent
    assert out["measure_vae_vs_floor"] == pytest.approx(
        out["measure_vae_step_ms"] / out["measure_vae_matmul_floor_ms"],
        rel=0.01,
    )


def test_music_raise_keeps_headline(stubbed, capsys):
    def boom():
        raise RuntimeError("tunnel died mid-bench")

    stubbed.setattr(bench, "measure_music", boom)
    out = _run_main(capsys)
    assert out["value"] == 2990.0
    assert "tunnel died" in out["measure_vae_error"]
    assert "measure_vae_steps_per_sec_b256" not in out


def test_dead_backend_yields_error_line(stubbed, capsys):
    def probe_fail(*a, **k):
        raise TimeoutError("device discovery exceeded 300s")

    stubbed.setattr(bench, "_discover_devices", probe_fail)
    # Failure paths now exit nonzero so automation keying on exit
    # status sees the failure (ADVICE r3), while still printing the
    # one JSON error line.
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 1
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 1, lines
    out = json.loads(lines[0])
    assert out["value"] == 0.0
    assert "backend unavailable" in out["error"]


def test_music_hang_trips_watchdog(stubbed, monkeypatch, capsys):
    """A C-level block (sleep stands in) must still yield the headline
    line via the watchdog thread. The watchdog calls os._exit, which
    would kill pytest — intercept it and unwind instead."""
    hang = threading.Event()

    def hung_music():
        hang.wait(30.0)  # released by the intercepted exit
        raise RuntimeError("unblocked")

    def fake_exit(code):
        # The real os._exit never returns; returning here just lets the
        # watchdog thread end after its print and unblocks main.
        hang.set()

    monkeypatch.setattr(bench, "measure_music", hung_music)
    monkeypatch.setattr(os, "_exit", fake_exit)
    real_timer = threading.Timer
    monkeypatch.setattr(
        threading, "Timer", lambda t, fn: real_timer(0.5, fn)
    )

    # The watchdog fires on its own thread and prints the headline line;
    # intercepting its os._exit unblocks main (a real run is gone at
    # that point), so a second line follows here — the driver would
    # only ever see the first.
    bench.main()
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.strip()]
    first = json.loads(lines[0])
    assert first["value"] == 2990.0
    assert first["secondary_timeout"] is True


def test_headline_hang_trips_watchdog(stubbed, monkeypatch, capsys):
    """A transport hang DURING the headline measurement (before any
    result exists) must still yield the one JSON error line — the
    headline used to be the only unwatched TPU exposure."""
    hang = threading.Event()

    def hung_ours():
        hang.wait(30.0)
        raise RuntimeError("unblocked")

    def fake_exit(code):
        hang.set()

    monkeypatch.setattr(bench, "measure_ours", hung_ours)
    monkeypatch.setattr(os, "_exit", fake_exit)
    real_timer = threading.Timer
    monkeypatch.setattr(
        threading, "Timer", lambda t, fn: real_timer(0.5, fn)
    )

    # With the intercepted os._exit, main unwinds through the headline
    # except-path, which exits 1 (the suppressed duplicate emit keeps
    # stdout to one line).
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 1
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.strip()]
    assert len(lines) == 1, lines  # single-shot emit suppresses the rest
    out = json.loads(lines[0])
    assert out["value"] == 0.0
    assert "timed out" in out["error"]


def test_discover_devices_retries_then_succeeds(monkeypatch):
    """A first-attempt timeout (the round-3 failure mode) must not fail
    the bench: the probe retries with a longer timeout."""
    import subprocess

    calls = []

    def fake_run(cmd, timeout, **kw):
        calls.append(timeout)
        if len(calls) == 1:
            raise subprocess.TimeoutExpired(cmd, timeout)

        class P:
            returncode = 0
            stderr = ""

        return P()

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench._discover_devices((5, 10, 20))  # no raise
    assert calls == [5, 10]


def test_discover_devices_exhausts_and_raises(monkeypatch):
    import subprocess

    def fake_run(cmd, timeout, **kw):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    with pytest.raises(RuntimeError, match="attempt 3 timed out"):
        bench._discover_devices((1, 2, 3))
