"""Sanity checks for the test oracles themselves: the reference hydrium
build (differential oracle) and the libjxl decoder (conformance oracle).
If these fail, nothing else can be trusted."""

import numpy as np
import pytest

import ref_hydrium
from hydrium_tpu.utils import djxl


def make_smooth(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            128 + 100 * np.sin(xx / 37.0) * np.cos(yy / 23.0),
            128 + 100 * np.cos(xx / 11.0 + 1) * np.sin(yy / 41.0),
            128 + 100 * np.sin((xx + yy) / 31.0),
        ],
        axis=-1,
    )
    img += rng.normal(0, 2, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_reference_encode_decodes_with_libjxl_oneframe():
    img = make_smooth(256, 256)
    data = ref_hydrium.encode(img, tile_size_shift=-1)
    assert data[:2] == b"\xff\x0a"
    dec = djxl.decode(data)
    assert dec.shape == (256, 256, 3)
    p = djxl.psnr(img / 255.0, dec)
    assert p > 30, f"reference round-trip PSNR too low: {p}"


def test_reference_encode_decodes_with_libjxl_tiled():
    img = make_smooth(300, 520)
    data = ref_hydrium.encode(img, tile_size_shift=0)
    dec = djxl.decode(data)
    assert dec.shape == (300, 520, 3)
    p = djxl.psnr(img / 255.0, dec)
    assert p > 30, f"reference tiled round-trip PSNR too low: {p}"
