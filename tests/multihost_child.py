"""Child process for the real 2-process multi-host test
(tests/test_multihost.py): brings up jax.distributed on CPU, runs
encode_image_multihost on its preset-aligned LF-group slice, and (on
process 0) writes the assembled .jxl to the given path."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_image():
    import numpy as np

    rng = np.random.default_rng(42)
    h, w = 300, 4100
    yy = np.arange(h, dtype=np.float32)[:, None, None]
    xx = np.arange(w, dtype=np.float32)[None, :, None]
    base = 128 + 90 * np.sin(xx / 61.0) * np.cos(yy / 29.0)
    noise = rng.normal(0, 18, (h, w, 3)).astype(np.float32)
    return np.clip(base + noise, 0, 255).astype("uint8")


def main():
    port, pid, n, outpath = sys.argv[1:5]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=int(n), process_id=int(pid))
    from hydrium_tpu.parallel.multihost import encode_image_multihost

    data = encode_image_multihost(make_image())
    if data is not None:
        with open(outpath, "wb") as f:
            f.write(data)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
