"""PXPACK v1: packed pixel uploads (cpp hyd_px_pack <-> ops/pipeline
_unpack_px_planes).  The pack must be lossless -- the jax backend's
output bytes may not depend on whether pixels crossed the wire raw or
packed -- and the packed form must actually shrink compressible content."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from hydrium_tpu.jxl import native
from hydrium_tpu.ops.pipeline import _unpack_px_planes

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _roundtrip(img: np.ndarray) -> float:
    """pack -> device unpack -> compare; returns packed/raw byte ratio."""
    r = native.px_pack(img, cap_ratio=100.0)
    assert r is not None
    hdr, base, words = r
    wpad = np.zeros(words.size + 4, np.uint32)
    wpad[:words.size] = words
    planar = np.asarray(_unpack_px_planes(
        jnp.asarray(wpad), jnp.asarray(hdr), jnp.asarray(base),
        img.shape[0], img.shape[1], img.dtype == np.uint16))
    rec = np.stack([planar[0], planar[1], planar[2]],
                   axis=-1).astype(img.dtype)
    np.testing.assert_array_equal(rec, img)
    return (hdr.nbytes + base.nbytes + words.nbytes) / img.nbytes


def test_roundtrip_random_u8():
    rng = np.random.default_rng(0)
    _roundtrip(rng.integers(0, 256, (70, 96, 3)).astype(np.uint8))


def test_roundtrip_random_u16():
    rng = np.random.default_rng(1)
    _roundtrip(rng.integers(0, 65536, (70, 96, 3)).astype(np.uint16))


def test_roundtrip_mixed_content_and_ratio():
    """Gradient + noise + constant regions in one buffer: per-block
    raw/delta mode selection must stay lossless, and the smooth and
    constant regions must actually pack small."""
    rng = np.random.default_rng(2)
    h, w = 96, 128
    img = np.empty((h, w, 3), np.uint8)
    xx = np.arange(w)[None, :, None]
    img[:32] = (xx * 2 % 256).astype(np.uint8)          # gradient
    img[32:64] = rng.integers(0, 256, (32, w, 3))        # noise
    img[64:] = 200                                       # constant
    ratio = _roundtrip(img)
    assert ratio < 0.6, ratio

    # width-2 delta blocks + 3 B/block headers floor out around 0.34
    smooth = np.broadcast_to(
        (128 + 60 * np.sin(np.arange(w, dtype=np.float32) / 211.0)
         ).astype(np.uint8)[None, :, None], (h, w, 3)).copy()
    assert _roundtrip(smooth) < 0.4


def test_roundtrip_extremes():
    for v in (0, 255):
        _roundtrip(np.full((32, 32, 3), v, np.uint8))
    for v in (0, 65535):
        _roundtrip(np.full((32, 32, 3), v, np.uint16))
    # alternating min/max: widest possible deltas, raw mode must win
    img = np.zeros((32, 64, 3), np.uint8)
    img[:, ::2] = 255
    _roundtrip(img)


def test_px_pack_rejects_incompressible():
    """Saturated noise must return None at the production cap ratio so
    the encoder uploads raw instead of a larger packed form."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    assert native.px_pack(img, cap_ratio=0.85) is None


def test_px_pack_rejects_unaligned_width():
    assert native.px_pack(np.zeros((32, 33, 3), np.uint8)) is None
    assert native.px_pack(np.zeros((32, 32, 3), np.float32)) is None


def _px2_roundtrip(img: np.ndarray):
    """px_pack2 -> double device unpack (mirroring
    encode_lfg_packed_px2's reconstruction) -> exact pixel compare.
    Returns the tag and total packed bytes."""
    r = native.px_pack2(img, cap_ratio=100.0)
    assert r is not None
    is16 = img.dtype == np.uint16
    if r[0] == "px2":
        _, words, hdr2, base2, words2, meta_h, meta_w = r
        w2pad = np.zeros(words2.size + 16, np.uint32)
        w2pad[:words2.size] = words2
        m = np.asarray(_unpack_px_planes(
            jnp.asarray(w2pad), jnp.asarray(hdr2), jnp.asarray(base2),
            meta_h, meta_w, is16))
        hdr = (m[0].reshape(-1) | ((m[2].reshape(-1) & 1) << 7))
        base = (m[1].reshape(-1) | ((m[2].reshape(-1) >> 1) << 8))
        total = words.nbytes + words2.nbytes + hdr2.nbytes + base2.nbytes
    else:
        _, words, hdr, base = r
        hdr = hdr.astype(np.int32)
        base = base.astype(np.int32)
        total = words.nbytes + hdr.nbytes + base.nbytes
    wpad = np.zeros(words.size + 16, np.uint32)
    wpad[:words.size] = words
    planar = np.asarray(_unpack_px_planes(
        jnp.asarray(wpad), jnp.asarray(hdr), jnp.asarray(base),
        img.shape[0], img.shape[1], is16))
    rec = np.stack([planar[0], planar[1], planar[2]],
                   axis=-1).astype(img.dtype)
    np.testing.assert_array_equal(rec, img)
    return r[0], total


@pytest.mark.parametrize("fmt", ["uint8", "uint16"])
def test_px2_roundtrip_and_meta_shrink(fmt):
    """Smooth content must take the two-level path, reconstruct exactly,
    and pack the (hdr, base) meta arrays well below their raw 3 B/block."""
    h, w = 96, 1024  # nb = 3*96*32 = 9216, meta_w = 1024
    xx = np.arange(w, dtype=np.float32)[None, :, None]
    yy = np.arange(h, dtype=np.float32)[:, None, None]
    phase = np.array([0.0, 1.3, 2.1], np.float32)
    img = np.clip(128 + 80 * np.sin(xx / 971.0 + phase)
                  * np.cos(yy / 533.0 - phase), 0, 255).astype(np.uint8)
    if fmt == "uint16":
        img = img.astype(np.uint16) * 257
    tag, total = _px2_roundtrip(img)
    assert tag == "px2"
    nb = 3 * h * (w >> 5)
    r1 = native.px_pack(img, cap_ratio=100.0)
    l1_total = r1[0].nbytes + r1[1].nbytes + r1[2].nbytes
    assert total < l1_total - nb  # meta at least 1/3 smaller


def test_px2_mixed_modes_and_noise():
    """Mode transitions (raw<->delta) inside one meta block must not
    break the reconstruction; noisy content still packs correctly at an
    unbounded cap."""
    rng = np.random.default_rng(7)
    h, w = 64, 1024
    img = np.empty((h, w, 3), np.uint8)
    xx = np.arange(w)[None, :, None]
    img[:16] = (xx % 256).astype(np.uint8)               # delta blocks
    img[16:32] = rng.integers(0, 256, (16, w, 3))        # raw blocks
    img[32:48] = 77                                      # width-0 blocks
    img[48:] = np.clip(128 + 9 * np.sin(xx / 13.0), 0, 255
                       ).astype(np.uint8)                # mixed
    tag, _ = _px2_roundtrip(img)
    assert tag == "px2"


def test_px2_unaligned_nb_falls_back_to_px1():
    """A block count with no 32-divisible power-of-two split cannot form
    a meta image; px_pack2 must still return the flat form."""
    img = np.zeros((34, 96, 3), np.uint8)  # nb = 306
    tag, _ = _px2_roundtrip(img)
    assert tag == "px1"


def test_px2_random_shape_sweep():
    """Seeded sweep over shapes (odd heights, minimal widths, non-1024
    meta widths), dtypes, and content kinds: pack -> double-unpack must
    reconstruct exactly for every combination."""
    rng = np.random.default_rng(42)
    shapes = [(32, 32), (34, 96), (40, 160), (64, 992), (96, 1024),
              (128, 2048), (33, 64), (256, 288)]
    for h, w in shapes:
        for dt in (np.uint8, np.uint16):
            lim = 256 if dt == np.uint8 else 65536
            kind = rng.integers(0, 3)
            if kind == 0:
                img = rng.integers(0, lim, (h, w, 3)).astype(dt)
            elif kind == 1:
                xx = np.arange(w, dtype=np.float32)[None, :, None]
                img = (np.clip(np.sin(xx / 53.0) * 0.4 + 0.5, 0, 1)
                       * (lim - 1)).astype(dt) * np.ones((h, 1, 3), dt)
            else:
                img = np.full((h, w, 3), rng.integers(0, lim), dt)
                img[h // 2:, :] = rng.integers(0, lim, (h - h // 2, w, 3))
            _px2_roundtrip(img)


def test_px2_respects_cap():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (64, 1024, 3)).astype(np.uint8)
    assert native.px_pack2(img, cap_ratio=0.5) is None


@pytest.mark.parametrize("fmt", ["uint8", "uint16"])
def test_e2e_bytes_identical_packed_vs_raw(fmt, monkeypatch):
    """The jax backend's encoded bytes must not depend on the upload
    path (PXPACK on vs off) -- pins the device unpack against the raw
    pixel path through the whole pipeline."""
    from hydrium_tpu.config import ImageMetadata, SampleFormat
    from hydrium_tpu.encoder import Encoder

    rng = np.random.default_rng(4)
    xx = np.arange(520, dtype=np.float32)[None, :, None]
    yy = np.arange(300, dtype=np.float32)[:, None, None]
    base = 128 + 80 * np.sin(xx / 97.0) * np.cos(yy / 53.0)
    img = np.clip(base + rng.normal(0, 3, (300, 520, 3)), 0,
                  255).astype(np.uint8)
    if fmt == "uint16":
        img = img.astype(np.uint16) * 257
    sf = SampleFormat.UINT16 if fmt == "uint16" else SampleFormat.UINT8

    outs = {}
    # face-value cap: this test pins the device unpack path, and the
    # wire estimate legitimately declines this marginal content at u16
    monkeypatch.setenv("HYDRIUM_PXPACK_WIRE_EST", "0")
    for flag in ("0", "1"):
        monkeypatch.setenv("HYDRIUM_PXPACK", flag)
        meta = ImageMetadata(width=img.shape[1], height=img.shape[0])
        enc = Encoder(meta, backend="jax")
        enc.send_tile(img, 0, 0, sample_fmt=sf)
        outs[flag] = enc.take_output()
        if flag == "1":
            assert enc.stats.counters.get("pxpack_lfgs", 0) == 1
    assert outs["0"] == outs["1"]
    assert len(outs["0"]) > 100


def test_px2_wire_estimate_declines_marginal_content(monkeypatch):
    """PXPACK's decline decision must compare against the estimated
    WIRE cost of the raw upload, not its face-value byte count: content
    that bitpacks to ~0.75x raw while the transport's byte-RLE gets
    ~0.51x on the raw form (flat with sparse +-30 spikes: long
    identical-byte runs, but 6-bit per-block delta widths) is a net
    wire LOSS to pack.  With the estimate
    disabled the old face-value cap must still accept it (regression
    guard for the forced-cap paths).  Smooth interleaved-RGB gradients
    -- whose adjacent bytes never repeat, so the transport gets almost
    nothing -- must KEEP packing (the zlib-proxy regression that
    uploaded 12.6 MB raw where 1.5 MB packed sufficed)."""
    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(5)
    h, w = 256, 1024
    px = np.full((h, w, 3), 128, np.uint8)
    # one +-30 spike per 32-pixel block: per-block delta width ~6 bits
    # (packs to ~0.75x raw), yet the wire sees long identical-byte runs
    spots = rng.integers(0, 32, (h, w // 32, 3))
    for c in range(3):
        rows = np.repeat(np.arange(h), w // 32)
        cols = (np.arange(w // 32)[None, :] * 32
                + spots[:, :, c]).reshape(-1)
        px[rows, cols, c] = 158
    est = native.wire_raw_estimate(px)
    assert est < 0.6 * px.nbytes          # byte-RLE loves this content
    monkeypatch.setenv("HYDRIUM_PXPACK_WIRE_EST", "1")
    assert native.px_pack2(px) is None    # declined: raw is cheaper
    monkeypatch.setenv("HYDRIUM_PXPACK_WIRE_EST", "0")
    got = native.px_pack2(px)
    assert got is not None                # face-value cap would pack
    packed = sum(a.nbytes for a in got[1:5] if hasattr(a, "nbytes"))
    assert 0.5 * px.nbytes < packed < 0.97 * px.nbytes
    # forced cap (smoke/tests) is never tightened by the estimate
    monkeypatch.setenv("HYDRIUM_PXPACK_WIRE_EST", "1")
    assert native.px_pack2(px, cap_ratio=100.0) is not None

    # smooth interleaved gradient: barely transport-compressible
    # (adjacent bytes cycle r,g,b), packs ~8x -- must stay packed
    xx = np.arange(w, dtype=np.float32)[None, :, None]
    yy = np.arange(h, dtype=np.float32)[:, None, None]
    smooth = np.clip(128 + 80 * np.sin(xx / 971.0) * np.cos(yy / 533.0)
                     + np.arange(3)[None, None, :], 0,
                     255).astype(np.uint8)
    est_s = native.wire_raw_estimate(smooth)
    assert est_s > 0.85 * smooth.nbytes
    assert native.px_pack2(smooth) is not None
