"""Streaming PNG reader (utils/pngio.py) vs PIL, and the streaming CLI
path end-to-end (strip-fed tiles, batched tiled mode)."""

import io
import struct
import zlib

import numpy as np
import pytest

from hydrium_tpu.utils.pngio import PNGReader, read_png


def _pil_png(arr, mode=None):
    from PIL import Image

    im = Image.fromarray(arr) if mode is None else \
        Image.fromarray(arr).convert(mode)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    buf.seek(0)
    return buf


def _raw_png(arr, bit_depth, color_type, filters=None):
    """Hand-rolled PNG writer (filter coverage + 16-bit RGB, which PIL
    cannot produce)."""
    h, w = arr.shape[:2]
    ch = 1 if arr.ndim == 2 else arr.shape[2]
    raw = bytearray()
    prev = None
    for y in range(h):
        row = arr[y]
        if bit_depth == 16:
            rb = row.astype(">u2").tobytes()
        else:
            rb = row.astype(np.uint8).tobytes()
        filt = 0 if filters is None else filters[y % len(filters)]
        if filt == 0:
            raw += bytes([0]) + rb
        else:
            # encode with Sub(1)/Up(2) filters to exercise the defilter
            cur = np.frombuffer(rb, np.uint8).astype(np.int16)
            bpp = ch * (bit_depth // 8)
            if filt == 1:
                shifted = np.concatenate([np.zeros(bpp, np.int16),
                                          cur[:-bpp]])
                enc = (cur - shifted) & 0xFF
            else:
                pr = (np.frombuffer(prev, np.uint8).astype(np.int16)
                      if prev is not None else np.zeros_like(cur))
                enc = (cur - pr) & 0xFF
            raw += bytes([filt]) + enc.astype(np.uint8).tobytes()
        prev = rb

    def chunk(ctype, data):
        c = struct.pack(">I", len(data)) + ctype + data
        return c + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, bit_depth,
                                      color_type, 0, 0, 0))
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return io.BytesIO(out)


def test_rgb8_matches_pil():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (77, 131, 3), dtype=np.uint8)
    got = read_png(_pil_png(arr))
    assert np.array_equal(got, arr)


def test_rgba_and_gray_and_palette():
    rng = np.random.default_rng(1)
    rgba = rng.integers(0, 256, (40, 50, 4), dtype=np.uint8)
    assert np.array_equal(read_png(_pil_png(rgba)), rgba[..., :3])
    gray = rng.integers(0, 256, (40, 50), dtype=np.uint8)
    got = read_png(_pil_png(gray))
    assert np.array_equal(got, np.stack([gray] * 3, axis=-1))
    pal = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
    from PIL import Image

    im = Image.fromarray(pal).quantize(64)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    buf.seek(0)
    got = read_png(buf)
    assert np.array_equal(got, np.asarray(im.convert("RGB")))


@pytest.mark.parametrize("filters", [[0], [1], [2], [0, 1, 2]])
def test_filter_coverage(filters):
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (33, 45, 3), dtype=np.uint8)
    got = read_png(_raw_png(arr, 8, 2, filters))
    assert np.array_equal(got, arr)


def test_paeth_average_via_pil():
    """PIL's optimizer picks Paeth/Average on gradient content."""
    yy, xx = np.mgrid[0:120, 0:90]
    arr = np.stack([(yy * 2) % 256, (xx * 3) % 256, (yy + xx) % 256],
                   axis=-1).astype(np.uint8)
    got = read_png(_pil_png(arr))
    assert np.array_equal(got, arr)


def test_rgb16():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 65536, (25, 31, 3), dtype=np.uint16)
    r = PNGReader(_raw_png(arr, 16, 2))
    assert r.fmt == "uint16"
    got = r.read_rows(25)
    assert np.array_equal(got, arr)


def test_incremental_rows_match_bulk():
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    r = PNGReader(_pil_png(arr))
    parts = [r.read_rows(10) for _ in range(7)]
    got = np.concatenate(parts, axis=0)
    assert np.array_equal(got, arr)


def test_pfm_row_reader_matches_bulk(tmp_path):
    from hydrium_tpu.utils.pfm import PFMRowReader, read_pfm, write_pfm

    rng = np.random.default_rng(8)
    img = rng.random((75, 60, 3), dtype=np.float32)
    p = tmp_path / "t.pfm"
    write_pfm(str(p), img)
    r = PFMRowReader(str(p))
    got = np.concatenate([r.read_rows(16) for _ in range(5)], axis=0)
    r.close()
    assert np.array_equal(got, read_pfm(str(p)))
    assert np.array_equal(got, img)


def test_cli_streams_pfm_byte_equal(tmp_path):
    from hydrium_tpu import cli, encode_image
    from hydrium_tpu.utils.pfm import write_pfm

    rng = np.random.default_rng(9)
    img = rng.random((300, 300, 3), dtype=np.float32)
    p = tmp_path / "t.pfm"
    write_pfm(str(p), img)
    out = tmp_path / "t.jxl"
    rc = cli.main([str(p), str(out), "--one-frame", "--backend", "jax"])
    assert rc == 0
    assert out.read_bytes() == encode_image(img, tile_size_shift=-1,
                                            backend="jax")


def test_cli_streams_png_byte_equal(tmp_path):
    """CLI (strip-streamed input, batched tiled mode) must produce the
    same bytes as the in-memory encode."""
    from hydrium_tpu import encode_image
    from hydrium_tpu import cli

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (300, 700, 3), dtype=np.uint8)
    png = tmp_path / "in.png"
    with open(png, "wb") as f:
        f.write(_pil_png(arr).read())

    for shift, argv_extra in ((-1, ["--one-frame"]), (0, ["--tile-size=0"])):
        out = tmp_path / f"out{shift}.jxl"
        rc = cli.main([str(png), str(out)] + argv_extra +
                      ["--backend", "jax"])
        assert rc == 0
        expect = encode_image(arr, tile_size_shift=shift, backend="jax")
        assert out.read_bytes() == expect
