#!/usr/bin/env python
"""Characterize the remote-TPU tunnel: h2d / d2h bandwidth vs stream
count and chunk size, and whether the two directions share capacity
(full duplex or not).  The e2e encoder is wire-bound on this rig, so
transfer scheduling decisions (stripe sizes, worker counts, overlap
strategy) must come from these numbers, not guesses.

Run as a child with a timeout (the tunnel wedges processes; see
CLAUDE.md).  Prints one JSON line.
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

    # --- warm the link (first-transfer penalty) ---
    warm = jnp.asarray(np.zeros((1 << 20,), np.uint8))
    np.asarray(warm[:16])

    # device-resident source for d2h reads: 32M u32 words (128 MB)
    src = jnp.arange(32 << 20, dtype=jnp.uint32)
    np.asarray(src[:16])

    slicer = jax.jit(lambda a, s0, n: jax.lax.dynamic_slice(a, (s0,), (n,)),
                     static_argnames=("n",))

    def d2h_read(start, words):
        return np.asarray(slicer(src, start, words))

    # --- d2h: single stream, chunk-size sweep ---
    for mb in (1, 4, 16):
        words = (mb << 20) // 4
        d2h_read(0, words)  # compile
        t0 = time.perf_counter()
        d2h_read(words, words)
        dt = time.perf_counter() - t0
        out[f"d2h_1stream_{mb}MB_MBps"] = round(mb / dt, 1)

    # --- d2h: stream-count sweep, 32 MB total ---
    total_words = (32 << 20) // 4
    for nstream in (4, 8, 16, 32):
        chunk = total_words // nstream
        pool = ThreadPoolExecutor(max_workers=nstream)
        d2h_read(0, chunk)  # compile this chunk size
        t0 = time.perf_counter()
        futs = [pool.submit(d2h_read, i * chunk, chunk)
                for i in range(nstream)]
        for f in futs:
            f.result()
        dt = time.perf_counter() - t0
        out[f"d2h_{nstream}stream_MBps"] = round(32 / dt, 1)
        pool.shutdown()

    # --- h2d: single stream, chunk-size sweep (u8) ---
    for mb in (1, 4, 16):
        buf = np.random.randint(0, 255, (mb << 20,), np.uint8)
        d = jax.device_put(buf)
        np.asarray(d[:1])  # warm shape
        buf2 = np.random.randint(0, 255, (mb << 20,), np.uint8)
        t0 = time.perf_counter()
        d = jax.device_put(buf2)
        np.asarray(d[:1])  # force completion
        dt = time.perf_counter() - t0
        out[f"h2d_1stream_{mb}MB_MBps"] = round(mb / dt, 1)

    # --- h2d: stream-count sweep, 32 MB total ---
    def h2d_put(buf):
        d = jax.device_put(buf)
        np.asarray(d[:1])
        return d

    for nstream in (4, 8, 16, 32):
        chunk = (32 << 20) // nstream
        bufs = [np.random.randint(0, 255, (chunk,), np.uint8)
                for _ in range(nstream)]
        h2d_put(bufs[0])  # warm shape
        pool = ThreadPoolExecutor(max_workers=nstream)
        t0 = time.perf_counter()
        futs = [pool.submit(h2d_put, b) for b in bufs]
        for f in futs:
            f.result()
        dt = time.perf_counter() - t0
        out[f"h2d_{nstream}stream_MBps"] = round(32 / dt, 1)
        pool.shutdown()

    # --- does completion-forcing matter? h2d without the probe read ---
    chunk = (32 << 20) // 8
    bufs = [np.random.randint(0, 255, (chunk,), np.uint8) for _ in range(8)]
    pool = ThreadPoolExecutor(max_workers=8)
    t0 = time.perf_counter()
    futs = [pool.submit(jax.device_put, b) for b in bufs]
    ds = [f.result() for f in futs]
    for d in ds:
        d.block_until_ready()
    dt = time.perf_counter() - t0
    out["h2d_8stream_block_MBps"] = round(32 / dt, 1)
    pool.shutdown()

    # --- duplex: 16 MB h2d + 16 MB d2h simultaneously (8+8 streams) ---
    chunk_h = (16 << 20) // 8
    chunk_d = (16 << 20) // 4 // 8
    bufs = [np.random.randint(0, 255, (chunk_h,), np.uint8)
            for _ in range(8)]
    h2d_put(bufs[0])
    d2h_read(0, chunk_d)
    pool = ThreadPoolExecutor(max_workers=16)
    t0 = time.perf_counter()
    futs = [pool.submit(h2d_put, b) for b in bufs]
    futs += [pool.submit(d2h_read, i * chunk_d, chunk_d) for i in range(8)]
    for f in futs:
        f.result()
    dt = time.perf_counter() - t0
    out["duplex_16+16MB_aggregate_MBps"] = round(32 / dt, 1)
    pool.shutdown()

    # serial reference for the same 32 MB
    t0 = time.perf_counter()
    pool = ThreadPoolExecutor(max_workers=8)
    futs = [pool.submit(h2d_put, b) for b in bufs]
    for f in futs:
        f.result()
    futs = [pool.submit(d2h_read, i * chunk_d, chunk_d) for i in range(8)]
    for f in futs:
        f.result()
    dt = time.perf_counter() - t0
    out["serial_16+16MB_aggregate_MBps"] = round(32 / dt, 1)
    pool.shutdown()

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
