"""Throughput benchmark: 4K RGB8 encode, end-to-end (pixels in, .jxl out).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference hydrium measured at 3.19 Mpixels/s on 4K noisy
content, 1 CPU core (BASELINE.md).  Runs on whatever accelerator JAX
exposes (the real TPU chip under the driver)."""

import json
import sys
import time

import numpy as np

BASELINE_MPPS = 3.19  # reference, 4K noisy, 1 core (BASELINE.md)


def make_4k_noisy(seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:2160, 0:3840]
    base = np.stack(
        [128 + 80 * np.sin(xx / 97.0) * np.cos(yy / 53.0),
         128 + 80 * np.cos(xx / 31.0) * np.sin(yy / 71.0),
         128 + 80 * np.sin((xx + yy) / 61.0)], axis=-1)
    img = base + rng.normal(0, 24, base.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    from hydrium_tpu import encode_image

    img = make_4k_noisy()
    pixels = img.shape[0] * img.shape[1]

    # warmup (compile)
    encode_image(img[:256, :256], tile_size_shift=-1, backend="jax")

    best = float("inf")
    data = b""
    for _ in range(int(sys.argv[1]) if len(sys.argv) > 1 else 2):
        t0 = time.perf_counter()
        data = encode_image(img, tile_size_shift=-1, backend="jax")
        best = min(best, time.perf_counter() - t0)

    assert data[:2] == b"\xff\x0a" or data[4:8] == b"JXL "
    mpps = pixels / best / 1e6
    print(json.dumps({
        "metric": "4K RGB8 one-frame encode throughput",
        "value": round(mpps, 3),
        "unit": "Mpixels/s",
        "vs_baseline": round(mpps / BASELINE_MPPS, 2),
    }))


if __name__ == "__main__":
    main()
