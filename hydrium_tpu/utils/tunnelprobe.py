"""Shared tunnel bandwidth probe (dev-rig diagnostic).

One copy of the probe child source so bench.py and
scripts/window_watch.py cannot drift: the probe MUST use random bytes
-- the axon tunnel's transport compression ships zeros ~20x faster than
real data (CLAUDE.md) -- and both consumers need the same JSON keys.

Keys: h2d, d2h (MB/s, random 4 MB payload), h2d_zeros (MB/s, 4 MB of
zeros -- the transport-compression ceiling), init_s (jax/device init).
"""

import contextlib
import os
import json
import subprocess
import sys

# one-TPU-client-at-a-time rig rule (CLAUDE.md): every probe child
# serializes on the same flock scripts/window_watch.py holds around its
# TPU children, so a manual `python bench.py` can never race the
# watcher's probe (ADVICE r4).
# Overridable for tests: the bench-harness suite spawns wedge-scenario
# bench parents whose children must not contend with a live watcher's
# probe holding the real rig lock (minutes during wedges).
TPU_LOCK = os.environ.get("HYDRIUM_TPU_LOCK", "/tmp/hydrium_tpu.lock")


@contextlib.contextmanager
def tpu_lock():
    """Hold the rig-wide TPU client flock.  Reentrant-unsafe by design
    (flock on a second fd in the same process blocks): callers must not
    nest it."""
    import fcntl

    with open(TPU_LOCK, "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        yield

PROBE_SRC = r"""
import time, json, numpy as np
from concurrent.futures import ThreadPoolExecutor
import jax
t0 = time.monotonic()
jax.devices()
up = np.frombuffer(np.random.default_rng(0).bytes(4 << 20),
                   np.uint32).copy()
zz = np.zeros(1 << 20, np.uint32)
t1 = time.monotonic()
a = jax.device_put(up); a.block_until_ready()
t2 = time.monotonic()
az = jax.device_put(zz); az.block_until_ready()
t2z = time.monotonic()
b = np.asarray(a)
t3 = time.monotonic()
# striped d2h mirrors the encoder's production fetch pattern
# (8 concurrent slice reads, encoder._fetch_range); the single-stream
# number above understates what payload fetches actually get
pool = ThreadPoolExecutor(max_workers=8)
n = a.shape[0] // 8
t3s = time.monotonic()
parts = list(pool.map(lambda i: np.asarray(a[i * n:(i + 1) * n]),
                      range(8)))
t4 = time.monotonic()
print(json.dumps({
    "init_s": round(t1 - t0, 2),
    "h2d": round(4.0 / max(t2 - t1, 1e-6), 1),
    "h2d_zeros": round(4.0 / max(t2z - t2, 1e-6), 1),
    "d2h": round(4.0 / max(t3 - t2z, 1e-6), 1),
    "d2h_striped": round(4.0 / max(t4 - t3s, 1e-6), 1)}))
"""


def run_probe(timeout: float = 150.0, lock: bool = True):
    """Run the probe in a fresh child process (a wedged client must not
    take the caller down); dict on success, None on wedge/failure.

    Holds the rig-wide TPU flock around the child unless lock=False
    (for callers that already hold it)."""
    try:
        with (tpu_lock() if lock else contextlib.nullcontext()):
            r = subprocess.run([sys.executable, "-c", PROBE_SRC],
                               capture_output=True, text=True,
                               timeout=timeout)
    except (subprocess.TimeoutExpired, OSError):
        return None
    if r.returncode != 0:
        return None
    line = next((l for l in reversed(r.stdout.splitlines())
                 if l.startswith("{")), None)
    try:
        return json.loads(line) if line else None
    except json.JSONDecodeError:
        return None
