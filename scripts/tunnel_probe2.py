#!/usr/bin/env python
"""Tunnel probe, round 2: stripe-size sweeps at fixed total bytes, to
pick the encoder's h2d/d2h chunking.  Prints one JSON line."""

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
    warm = jnp.asarray(np.zeros((1 << 20,), np.uint8))
    np.asarray(warm[:16])
    src = jnp.arange(16 << 20, dtype=jnp.uint32)  # 64 MB
    np.asarray(src[:16])

    slicer = jax.jit(lambda a, s0, n: jax.lax.dynamic_slice(a, (s0,), (n,)),
                     static_argnames=("n",))

    def d2h_read(start, words):
        return np.asarray(slicer(src, start, words))

    pool = ThreadPoolExecutor(max_workers=16)

    # --- d2h sweep: 16 MB total, stripe size varies ---
    total_w = (16 << 20) // 4
    for mb in (1, 2, 4, 8, 16):
        words = (mb << 20) // 4
        n = total_w // words
        d2h_read(0, words)
        t0 = time.perf_counter()
        futs = [pool.submit(d2h_read, i * words, words) for i in range(n)]
        for f in futs:
            f.result()
        dt = time.perf_counter() - t0
        out[f"d2h_16MB_{mb}MBstripe_MBps"] = round(16 / dt, 1)

    # --- d2h: typical payload fetch, 4.5 MB, stripe sweep ---
    total_w45 = int(4.5 * (1 << 20)) // 4
    for mb4 in (1, 2, 4):
        words = (mb4 << 20) // 4
        n = total_w45 // words
        rem = total_w45 - n * words
        d2h_read(0, words)
        if rem:
            d2h_read(0, rem)
        t0 = time.perf_counter()
        futs = [pool.submit(d2h_read, i * words, words) for i in range(n)]
        if rem:
            futs.append(pool.submit(d2h_read, n * words, rem))
        for f in futs:
            f.result()
        dt = time.perf_counter() - t0
        out[f"d2h_4.5MB_{mb4}MBstripe_MBps"] = round(4.5 / dt, 1)

    # --- h2d sweep: 24 MB total (the 4K pixel volume), stripe varies ---
    def h2d_put(buf):
        d = jax.device_put(buf)
        np.asarray(d[:1])
        return d

    for mb in (1, 2, 3, 4, 6, 8, 12):
        chunk = mb << 20
        n = (24 << 20) // chunk
        bufs = [np.random.randint(0, 255, (chunk,), np.uint8)
                for _ in range(n)]
        h2d_put(bufs[0])
        t0 = time.perf_counter()
        futs = [pool.submit(h2d_put, b) for b in bufs]
        for f in futs:
            f.result()
        dt = time.perf_counter() - t0
        out[f"h2d_24MB_{mb}MBstripe_MBps"] = round(24 / dt, 1)

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
        print(f"probe: attempt {attempt} rc={r.returncode}",
              file=sys.stderr)
    print(json.dumps({"error": "all attempts wedged"}))
    return 1


if __name__ == "__main__":
    if "--child" in sys.argv:
        probe()
    else:
        sys.exit(parent())
