"""Memory-bounded streaming one-frame mode: per-preset eager ANS with
fixed log_alphabet_size; output must decode identically to the regular
path (bytes differ only in ANS bucket layout, sizes ~equal)."""

import numpy as np
import pytest

from hydrium_tpu.config import ImageMetadata, SampleFormat
from hydrium_tpu.encoder import Encoder
from hydrium_tpu.utils import djxl


def make_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = 120 + 70 * np.sin(xx / 23.0)[..., None] * np.cos(
        np.stack([yy / 17.0, yy / 11.0, yy / 31.0], axis=-1))
    img += rng.normal(0, 8, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def encode(img, streaming, spool_dir=None, backend="jax"):
    h, w = img.shape[:2]
    meta = ImageMetadata(width=w, height=h)
    enc = Encoder(meta, backend=backend, streaming=streaming,
                  spool_dir=spool_dir)
    for ty in range((h + 2047) // 2048):
        for tx in range((w + 2047) // 2048):
            enc.send_tile(img[ty * 2048:(ty + 1) * 2048,
                              tx * 2048:(tx + 1) * 2048], tx, ty,
                          sample_fmt=SampleFormat.UINT8)
    return enc.take_output()


def test_streaming_decodes_like_regular(tmp_path):
    img = make_image(2200, 4100, seed=7)  # 2x3 LF groups
    regular = encode(img, streaming=False)
    streamed = encode(img, streaming=True, spool_dir=str(tmp_path))
    d1 = djxl.decode(regular)
    d2 = djxl.decode(streamed)
    assert np.array_equal(d1, d2), "streaming mode changed decoded pixels"
    # size within a few bytes (same freqs, different alias layout)
    assert abs(len(streamed) - len(regular)) < 0.01 * len(regular) + 64


def test_streaming_no_spool():
    img = make_image(300, 2500, seed=8)  # 1x2 LF groups
    streamed = encode(img, streaming=True)
    regular = encode(img, streaming=False)
    assert np.array_equal(djxl.decode(streamed), djxl.decode(regular))


def test_streaming_sections_follow_arrival_order():
    """With lfg_per_preset > 1 and out-of-order arrival, presets flush
    out of arrival order; sections must still come out in global LFG
    arrival order (the TOC permutation's assumption)."""
    from hydrium_tpu.jxl.frame import StreamingHFStream

    hf = StreamingHFStream(2, [2, 2])
    tokens = np.zeros((4, 3, 64), np.uint16)
    clusters = np.zeros((4, 3, 64), np.uint8)
    residues = np.zeros((4, 3, 64), np.uint32)
    rbits = np.zeros((4, 3, 64), np.uint8)
    valid = np.ones((4, 3), np.int32)

    def add(preset, marker):
        t = tokens.copy()
        t[0, 0, 0] = marker  # distinguishes sections by content
        hf.add_group_padded(t, clusters, residues, rbits, valid, preset)

    # arrival order: preset1-LFG, preset1-LFG (flush), preset0, preset0
    add(1, 5); hf.finish_lfg(1)
    add(1, 6); hf.finish_lfg(1)   # preset 1 flushes FIRST
    add(0, 7); hf.finish_lfg(0)
    add(0, 8); hf.finish_lfg(0)   # preset 0 flushes second
    hf.encode_group_sections()
    keys = [k for k, _ in sorted(hf._sections, key=lambda kv: kv[0])]
    # arrival keys 0..3 in order, regardless of flush order
    assert [k[0] for k in keys] == [0, 1, 2, 3]
    secs = list(hf.iter_sections())
    assert len(secs) == 4


def test_spooled_streaming_bytes_equal_and_iter_output():
    """Spooling LF+HF sections to disk and draining via iter_output must
    produce exactly the in-RAM streaming bytes (bounded-output finalize
    is a transport change, not a format change)."""
    import tempfile

    import numpy as np

    from hydrium_tpu.config import ImageMetadata, SampleFormat
    from hydrium_tpu.encoder import Encoder

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (300, 4100, 3), dtype=np.uint8)
    meta = ImageMetadata(width=4100, height=300)

    def run(spool_dir, use_iter):
        enc = Encoder(meta, backend="jax", streaming=True,
                      spool_dir=spool_dir)
        for tx in range(3):
            enc.send_tile(img[:, tx * 2048:(tx + 1) * 2048], tx, 0,
                          sample_fmt=SampleFormat.UINT8)
        if use_iter:
            return b"".join(enc.iter_output(chunk_size=1 << 16))
        return enc.take_output()

    ram = run(None, False)
    with tempfile.TemporaryDirectory() as d:
        spooled = run(d, True)
    assert ram == spooled


def test_spool_dirs_removed_on_drain_and_close(tmp_path):
    """The per-encoder hydspool- temp subdirectories must disappear as
    soon as the finalize stream is fully drained, and Encoder.close()
    must remove them for an abandoned encode (ADVICE r3: __del__-only
    cleanup leaked them under reference cycles / crashes)."""
    import os

    img = make_image(300, 2500, seed=9)  # 1x2 LF groups
    meta = ImageMetadata(width=2500, height=300)

    def spool_dirs():
        return [d for d in os.listdir(tmp_path)
                if d.startswith("hydspool-")]

    # drained encode: dirs exist mid-encode, gone after the last chunk
    enc = Encoder(meta, backend="jax", streaming=True,
                  spool_dir=str(tmp_path))
    enc.send_tile(img[:, :2048], 0, 0, sample_fmt=SampleFormat.UINT8)
    enc.send_tile(img[:, 2048:], 1, 0, sample_fmt=SampleFormat.UINT8)
    assert spool_dirs(), "expected live spool dirs mid-encode"
    data = enc.take_output()
    assert data[:2] == b"\xff\x0a"
    assert not spool_dirs(), "drain must remove the spool dirs"

    # abandoned encode: close() cleans up without draining
    enc2 = Encoder(meta, backend="jax", streaming=True,
                   spool_dir=str(tmp_path))
    enc2.send_tile(img[:, :2048], 0, 0, sample_fmt=SampleFormat.UINT8)
    enc2.send_tile(img[:, 2048:], 1, 0, sample_fmt=SampleFormat.UINT8)
    assert spool_dirs()
    enc2.close()
    assert not spool_dirs(), "close() must remove the spool dirs"
