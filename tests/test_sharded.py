"""Sharded encode over the virtual CPU mesh: bytes must match the
single-device Encoder exactly."""

import numpy as np
import pytest

import jax

from hydrium_tpu import encode_image
from hydrium_tpu.parallel import shard
from hydrium_tpu.parallel.driver import encode_image_sharded
from hydrium_tpu.utils import djxl


def make_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = 120 + 70 * np.sin(xx / 23.0)[..., None] * np.cos(
        np.stack([yy / 17.0, yy / 11.0, yy / 31.0], axis=-1))
    img += rng.normal(0, 8, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.slow
def test_sharded_matches_single_device():
    img = make_image(2200, 4100)  # 2x3 grid of LF groups, ragged edges
    mesh = shard.make_mesh(2)
    data = encode_image_sharded(img, mesh=mesh)
    single = encode_image(img, tile_size_shift=-1, backend="jax")
    assert data == single
    dec = djxl.decode(data)
    assert dec.shape == img.shape


def test_dryrun_multichip_entry():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_retry_wrapper_recovers():
    from hydrium_tpu.parallel.multihost import with_retry
    calls = []

    def flaky(x):
        calls.append(x)
        if len(calls) < 3:
            raise RuntimeError("transient")
        return x * 2

    assert with_retry(flaky, attempts=3, backoff=0)(21) == 42
    assert len(calls) == 3


def test_gather_bytes_single_process():
    from hydrium_tpu.parallel.multihost import gather_bytes_to_host0
    assert gather_bytes_to_host0(b"abc") == [b"abc"]
