#!/usr/bin/env python
"""Tunnel probe, round 3: emulate the encoder's REAL transfer pattern.

The encoder uploads per-LFG [2048,2048,3] u8 buffers (12.6 MB) striped
into row chunks + a jitted on-device concat, then fetches a ~2 MB/LFG
payload back.  earlier probe rounds swept flat fixed-total puts, which is not
the same thing (no concat, no row slicing, different concurrency tail).

Measures, on the real chip:
  1. one-LFG upload latency vs stripe size (incl. the concat + a
     dependent 1-word readback that proves completion);
  2. a 4-LFG back-to-back upload train (the bench's actual h2d volume);
  3. full duplex: a 12.6 MB upload concurrent with an 8 MB striped read
     (does d2h steal from h2d on this tunnel?).

Prints one JSON line.  Run: python scripts/tunnel_probe.py
"""

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe():
    import jax
    import jax.numpy as jnp

    out = {"backend": jax.default_backend()}
    pool = ThreadPoolExecutor(max_workers=16)
    probe_jit = jax.jit(lambda a: a[:1, 0, 0])

    px = np.random.randint(0, 255, (2048, 2048, 3), np.uint8)
    concats = {}

    def upload(stripe_bytes: int):
        """_upload_pixels replica with a parameterized stripe size;
        returns the device array after a dependent readback."""
        if stripe_bytes >= px.nbytes:
            d = jnp.asarray(px)
            np.asarray(probe_jit(d))
            return d
        row_bytes = px.nbytes // px.shape[0]
        rows = max(32, ((stripe_bytes // row_bytes) >> 5) << 5)
        starts = list(range(0, px.shape[0], rows))
        futs = [pool.submit(jax.device_put, px[s:s + rows]) for s in starts]
        chunks = [f.result() for f in futs]
        f = concats.get(rows)
        if f is None:
            f = jax.jit(lambda *cs: jnp.concatenate(cs, axis=0))
            concats[rows] = f
        d = f(*chunks)
        np.asarray(probe_jit(d))
        return d

    # warm the transfer path + each concat executable
    sweeps = [(1 << 20, "1MB"), (2 << 20, "2MB"), (3 << 20, "3MB"),
              (4 << 20, "4MB"), (6 << 20, "6MB"), (13 << 20, "whole")]
    for sb, _name in sweeps:
        upload(sb)

    for sb, name in sweeps:
        t0 = time.perf_counter()
        upload(sb)
        dt = time.perf_counter() - t0
        out[f"h2d_1lfg_{name}_MBps"] = round(px.nbytes / dt / 1e6, 1)

    # 4-LFG train at the two leading candidates
    for sb, name in [(2 << 20, "2MB"), (4 << 20, "4MB"), (13 << 20, "whole")]:
        t0 = time.perf_counter()
        for _ in range(4):
            upload(sb)
        dt = time.perf_counter() - t0
        out[f"h2d_4lfg_{name}_MBps"] = round(4 * px.nbytes / dt / 1e6, 1)

    # async train: does NOT block per LFG (dispatch all, then block on
    # each result's probe) -- the encoder's actual pattern, where the
    # main thread moves on and completion is observed by the fetch thread
    for sb, name in [(2 << 20, "2MB"), (4 << 20, "4MB")]:
        row_bytes = px.nbytes // px.shape[0]
        rows = max(32, ((sb // row_bytes) >> 5) << 5)
        t0 = time.perf_counter()
        devs = []
        for _ in range(4):
            starts = list(range(0, px.shape[0], rows))
            futs = [pool.submit(jax.device_put, px[s:s + rows])
                    for s in starts]
            devs.append(concats[rows](*[f.result() for f in futs]))
        for d in devs:
            np.asarray(probe_jit(d))
        dt = time.perf_counter() - t0
        out[f"h2d_4lfg_async_{name}_MBps"] = round(4 * px.nbytes / dt / 1e6, 1)

    # --- full duplex: 12.6 MB up concurrent with 8 MB down ---
    src = jnp.arange(2 << 20, dtype=jnp.uint32)  # 8 MB resident
    np.asarray(src[:16])
    slicer = jax.jit(lambda a, s0, n: jax.lax.dynamic_slice(a, (s0,), (n,)),
                     static_argnames=("n",))

    def d2h_read(total_bytes: int, stripe_bytes: int = 1 << 20):
        words = stripe_bytes // 4
        n = total_bytes // stripe_bytes
        futs = [pool.submit(lambda i=i: np.asarray(slicer(src, i * words,
                                                          words)))
                for i in range(n)]
        for f in futs:
            f.result()

    d2h_read(8 << 20)  # warm
    t0 = time.perf_counter()
    d2h_read(8 << 20)
    out["d2h_8MB_alone_MBps"] = round((8 << 20) / (time.perf_counter() - t0)
                                      / 1e6, 1)

    t0 = time.perf_counter()
    fu = pool.submit(upload, 4 << 20)
    fd = pool.submit(d2h_read, 8 << 20)
    fu.result()
    tu = time.perf_counter() - t0
    fd.result()
    td = time.perf_counter() - t0
    out["duplex_h2d_12.6MB_s"] = round(tu, 3)
    out["duplex_d2h_8MB_s"] = round(td, 3)
    out["duplex_total_MBps"] = round(((12.6 + 8) * 1e6 * 1.048)
                                     / max(tu, td) / 1e6, 1)

    print(json.dumps(out))
    return out


def parent() -> int:
    import subprocess

    for attempt in range(3):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                capture_output=True, text=True, timeout=600)
        except subprocess.TimeoutExpired:
            print(f"probe: attempt {attempt} timed out", file=sys.stderr)
            continue
        sys.stderr.write(r.stderr[-3000:])
        line = next((l for l in r.stdout.splitlines()
                     if l.startswith("{")), None)
        if r.returncode == 0 and line:
            print(line)
            return 0
        print(f"probe: attempt {attempt} rc={r.returncode}", file=sys.stderr)
    print(json.dumps({"error": "all attempts wedged"}))
    return 1


if __name__ == "__main__":
    if "--child" in sys.argv:
        probe()
    else:
        sys.exit(parent())
