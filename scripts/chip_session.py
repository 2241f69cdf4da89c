#!/usr/bin/env python
"""One scripted pass over everything that needs the real chip, for
harvesting a possibly-short good tunnel window: each step runs in its
own subprocess (a wedged client must not take the session down) with a
timeout, results land in /tmp/chip_session/<step>.{out,err}, and a
summary JSON prints at the end.  Steps, in value order:

  smoke    scripts/tpu_smoke.py          packed-payload parity on chip
  pred     tpu_smoke with HYDRIUM_PLPACK_PRED=1 (validates the Mosaic
           cond lowering; flip the bitpack.PRED default if green)
  profile  scripts/pack_profile.py       stage breakdown incl. the new
           lookup/hist/compact splits
  sweep    scripts/compact_sweep.py      (pre_levels, unroll) timings
  bench    bench.py 2                    budgeted end-to-end numbers

Usage: python scripts/chip_session.py [step ...]   (default: all)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/chip_session"

STEPS = [
    ("smoke", [sys.executable, "scripts/tpu_smoke.py"], {}, 420),
    ("pred", [sys.executable, "scripts/tpu_smoke.py"],
     {"HYDRIUM_PLPACK_PRED": "1"}, 420),
    ("profile", [sys.executable, "scripts/pack_profile.py", "30"], {}, 540),
    ("sweep", [sys.executable, "scripts/compact_sweep.py", "30"], {}, 540),
    ("bench", [sys.executable, "bench.py", "2"],
     {"HYDRIUM_BENCH_BUDGET_S": "900"}, 960),
    # last: longest and least wedge-tolerant; a short window can die
    # here without costing the measurements above
    ("artifacts", [sys.executable, "scripts/scale_artifacts.py"], {}, 2400),
]


def main(names):
    os.makedirs(OUT, exist_ok=True)
    summary = {}
    for name, cmd, env_extra, tmo in STEPS:
        if names and name not in names:
            continue
        env = dict(os.environ, **env_extra)
        t0 = time.monotonic()
        print(f"chip_session: {name} (timeout {tmo}s)...", flush=True)
        try:
            r = subprocess.run(cmd, cwd=REPO, env=env, timeout=tmo,
                               capture_output=True, text=True)
            rc, out, err = r.returncode, r.stdout, r.stderr
        except subprocess.TimeoutExpired as e:
            rc = -9
            out = e.stdout.decode() if isinstance(e.stdout, bytes) \
                else (e.stdout or "")
            err = e.stderr.decode() if isinstance(e.stderr, bytes) \
                else (e.stderr or "")
        dt = round(time.monotonic() - t0, 1)
        open(f"{OUT}/{name}.out", "w").write(out)
        open(f"{OUT}/{name}.err", "w").write(err)
        line = next((l for l in reversed(out.splitlines())
                     if l.startswith("{")), None)
        summary[name] = {"rc": rc, "s": dt,
                         "json": json.loads(line) if line else None}
        print(f"chip_session: {name}: rc={rc} in {dt}s "
              f"{'JSON ok' if line else 'no JSON'}", flush=True)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main(set(sys.argv[1:])))
