"""End-to-end encoder tests: byte-parity with the reference encoder
(numpy conformance backend) and decodability/PSNR via libjxl."""

import numpy as np
import pytest

import ref_hydrium
from hydrium_tpu import encode_image
from hydrium_tpu.utils import djxl


def make_image(h, w, kind="noise", seed=0):
    rng = np.random.default_rng(seed)
    if kind == "noise":
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            128 + 100 * np.sin(xx / 37.0) * np.cos(yy / 23.0),
            128 + 100 * np.cos(xx / 11.0 + 1) * np.sin(yy / 41.0),
            128 + 100 * np.sin((xx + yy) / 31.0),
        ],
        axis=-1,
    )
    img += rng.normal(0, 6, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def check_parity(img, tile_size_shift):
    ref = ref_hydrium.encode(img, tile_size_shift=tile_size_shift)
    mine = encode_image(img, tile_size_shift=tile_size_shift)
    if mine != ref:
        diff = next((i for i, (a, b) in enumerate(zip(mine, ref))
                     if a != b), min(len(mine), len(ref)))
        raise AssertionError(
            f"byte mismatch: len {len(mine)} vs ref {len(ref)}, "
            f"first diff at {diff} "
            f"(mine={mine[max(0,diff-4):diff+8].hex()} "
            f"ref={ref[max(0,diff-4):diff+8].hex()})")


def check_decodes(img, tile_size_shift):
    """Decodability + equal-or-better PSNR vs the reference encoder."""
    mine = encode_image(img, tile_size_shift=tile_size_shift)
    dec = djxl.decode(mine)
    assert dec.shape == img.shape
    p = djxl.psnr(img / 255.0, dec)
    ref = ref_hydrium.encode(img, tile_size_shift=tile_size_shift)
    p_ref = djxl.psnr(img / 255.0, djxl.decode(ref))
    assert p >= p_ref - 0.01, f"PSNR {p} below reference {p_ref}"
    return p


@pytest.mark.parametrize("kind", ["noise", "smooth"])
def test_single_group_one_frame(kind):
    img = make_image(256, 256, kind)
    check_parity(img, -1)
    check_decodes(img, -1)


def test_partial_group_one_frame():
    img = make_image(100, 70, "smooth")
    check_parity(img, -1)
    check_decodes(img, -1)


def test_multi_group_one_frame():
    img = make_image(300, 520, "smooth", seed=3)
    check_parity(img, -1)
    check_decodes(img, -1)


@pytest.mark.parametrize("kind", ["noise", "smooth"])
def test_tiled_256(kind):
    img = make_image(300, 520, kind, seed=4)
    check_parity(img, 0)
    check_decodes(img, 0)


def test_tiled_512():
    img = make_image(520, 700, "smooth", seed=5)
    check_parity(img, 1)
    check_decodes(img, 1)


def test_odd_sizes():
    for h, w in [(8, 8), (1, 1), (7, 9), (256, 1), (1, 256), (257, 255)]:
        img = make_image(h, w, "smooth", seed=h * 100 + w)
        check_parity(img, -1)
        check_parity(img, 0)


def test_jax_backend_decodes():
    """The device pipeline's output must decode at >= reference PSNR."""
    img = make_image(300, 520, "smooth", seed=9)
    mine = encode_image(img, tile_size_shift=-1, backend="jax")
    dec = djxl.decode(mine)
    p = djxl.psnr(img / 255.0, dec)
    ref = ref_hydrium.encode(img, tile_size_shift=-1)
    p_ref = djxl.psnr(img / 255.0, djxl.decode(ref))
    assert p >= p_ref - 0.05, f"jax backend PSNR {p} vs reference {p_ref}"


def test_jax_backend_tiled_decodes():
    img = make_image(300, 300, "noise", seed=10)
    mine = encode_image(img, tile_size_shift=0, backend="jax")
    dec = djxl.decode(mine)
    p = djxl.psnr(img / 255.0, dec)
    ref = ref_hydrium.encode(img, tile_size_shift=0)
    p_ref = djxl.psnr(img / 255.0, djxl.decode(ref))
    assert p >= p_ref - 0.05, f"jax backend PSNR {p} vs reference {p_ref}"


def test_jax_packed_equals_reference_modes():
    """The packed-transfer jax path must produce valid streams at
    reference-or-better PSNR; and numpy-vs-jax differ only via FP."""
    img = make_image(300, 520, "noise", seed=11)
    mine = encode_image(img, tile_size_shift=-1, backend="jax")
    dec = djxl.decode(mine)
    ref = ref_hydrium.encode(img, tile_size_shift=-1)
    p = djxl.psnr(img / 255.0, dec)
    p_ref = djxl.psnr(img / 255.0, djxl.decode(ref))
    assert p >= p_ref - 0.05, (p, p_ref)


def test_jax_backend_deterministic():
    """Byte-identical re-encode (SURVEY section 5 determinism check)."""
    img = make_image(300, 520, "noise", seed=12)
    a = encode_image(img, tile_size_shift=-1, backend="jax")
    b = encode_image(img, tile_size_shift=-1, backend="jax")
    assert a == b


def test_u16_jax_backend():
    img8 = make_image(260, 300, "smooth", seed=13)
    img16 = ((img8.astype(np.uint16) << 8) | img8)
    mine = encode_image(img16, tile_size_shift=-1, backend="jax")
    dec = djxl.decode(mine)
    ref = ref_hydrium.encode(img16, tile_size_shift=-1,
                             sample_fmt=ref_hydrium.HYD_UINT16)
    p = djxl.psnr(img8 / 255.0, dec)
    p_ref = djxl.psnr(img8 / 255.0, djxl.decode(ref))
    assert p >= p_ref - 0.05, (p, p_ref)


def test_float32_jax_backend():
    img8 = make_image(128, 128, "smooth", seed=14)
    imgf = (img8 / 255.0).astype(np.float32)
    mine = encode_image(imgf, tile_size_shift=-1, backend="jax")
    dec = djxl.decode(mine)
    assert djxl.psnr(img8 / 255.0, dec) > 30


def test_tile_batch_equals_per_tile():
    """send_tile_batch must produce exactly the per-tile path's bytes."""
    from hydrium_tpu.config import ImageMetadata
    from hydrium_tpu.encoder import Encoder

    img = make_image(300, 700, "noise", seed=15)
    meta = ImageMetadata(width=700, height=300, tile_size_shift_x=0,
                         tile_size_shift_y=0)
    enc_a = Encoder(meta, backend="jax")
    entries = [(img[ty * 256:(ty + 1) * 256, tx * 256:(tx + 1) * 256],
                tx, ty)
               for ty in range(2) for tx in range(3)]
    enc_a.send_tile_batch(entries)
    batched = enc_a.take_output()

    enc_b = Encoder(meta, backend="jax")
    for px, tx, ty in entries:
        enc_b.send_tile(px, tx, ty)
    per_tile = enc_b.take_output()
    assert batched == per_tile


def test_tile_batch_multi_chunk_equals_per_tile():
    """>16 full 256-px tiles span several stacked dispatches, exercising
    the dispatch-ahead pipeline (chunk c+1 in flight during chunk c's
    fetch); bytes must still equal the per-tile path."""
    from hydrium_tpu.config import ImageMetadata
    from hydrium_tpu.encoder import Encoder

    img = make_image(512, 2400, "gradient", seed=16)
    meta = ImageMetadata(width=2400, height=512, tile_size_shift_x=0,
                         tile_size_shift_y=0)
    entries = [(img[ty * 256:(ty + 1) * 256, tx * 256:(tx + 1) * 256],
                tx, ty)
               for ty in range(2) for tx in range(10)]
    enc_a = Encoder(meta, backend="jax")
    enc_a.send_tile_batch(entries)
    batched = enc_a.take_output()

    enc_b = Encoder(meta, backend="jax")
    for px, tx, ty in entries:
        enc_b.send_tile(px, tx, ty)
    assert batched == enc_b.take_output()
