"""CLI end-to-end tests (PNG + PFM paths) and ICC tagging parity."""

import ctypes
import os
import subprocess
import sys

import numpy as np
import pytest

import ref_hydrium
from hydrium_tpu.utils import djxl
from hydrium_tpu.utils.pfm import read_pfm, write_pfm


def make_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = 128 + 80 * np.sin(xx / 19.0)[..., None] * np.cos(
        np.stack([yy / 13.0, yy / 7.0, yy / 29.0], axis=-1))
    img += rng.normal(0, 5, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def run_cli(args):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    code = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; from hydrium_tpu.cli import main; sys.exit(main())"
         ] + args,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True)
    assert code.returncode == 0, code.stderr
    return code


def test_cli_png_roundtrip(tmp_path):
    from PIL import Image

    img = make_image(120, 200)
    png = tmp_path / "in.png"
    Image.fromarray(img).save(png)
    out = tmp_path / "out.jxl"
    r = run_cli([str(png), str(out), "--backend", "numpy", "--verify",
                 "--stats"])
    assert "PSNR" in r.stderr
    dec = djxl.decode(out.read_bytes())
    assert dec.shape == (120, 200, 3)


def test_cli_pfm_tiled(tmp_path):
    img = make_image(100, 300)
    pfm = tmp_path / "in.pfm"
    write_pfm(pfm, img.astype(np.float32) / 255.0)
    back = read_pfm(str(pfm))
    assert np.allclose(back, img / 255.0, atol=1e-6)
    out = tmp_path / "out.jxl"
    run_cli([str(pfm), str(out), "--tile-size", "0", "--backend", "numpy"])
    dec = djxl.decode(out.read_bytes())
    assert dec.shape == (100, 300, 3)


def make_minimal_icc():
    """A tiny fake (but structurally plausible) ICC payload."""
    icc = bytearray(144)
    icc[0:4] = (144).to_bytes(4, "big")
    icc[8] = 4
    icc[12:24] = b"mntrRGB XYZ "
    icc[36:40] = b"acsp"
    icc[40:44] = b"APPL"
    icc[80:84] = icc[4:8]
    return bytes(icc)


def test_icc_tagging_matches_reference():
    img = make_image(64, 64, seed=3)
    icc = make_minimal_icc()

    # reference with ICC
    lib = ref_hydrium._load()
    lib.hyd_set_suggested_icc_profile.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
    ref = encode_ref_with_icc(lib, img, icc)

    from hydrium_tpu.config import ImageMetadata
    from hydrium_tpu.encoder import Encoder

    meta = ImageMetadata(width=64, height=64)
    enc = Encoder(meta, backend="numpy")
    enc.set_suggested_icc_profile(icc)
    enc.send_tile(img, 0, 0)
    mine = enc.take_output()
    assert mine == ref, (
        f"ICC path differs: {len(mine)} vs {len(ref)}; first diff "
        f"{next((i for i,(a,b) in enumerate(zip(mine,ref)) if a!=b), None)}")
    djxl.decode(mine)


def encode_ref_with_icc(lib, image, icc):
    h, w = image.shape[:2]
    image = np.ascontiguousarray(image, dtype=np.uint8)
    enc = lib.hyd_encoder_new()
    out = bytearray()
    try:
        meta = ref_hydrium._Metadata(w, h, 0, -1, -1)
        assert lib.hyd_set_metadata(enc, ctypes.byref(meta)) == 0
        assert lib.hyd_set_suggested_icc_profile(enc, icc, len(icc)) == 0
        bufsize = 1 << 20
        obuf = (ctypes.c_uint8 * bufsize)()
        assert lib.hyd_provide_output_buffer(enc, obuf, bufsize) == 0
        base = image.ctypes.data
        ptrs = (ctypes.c_void_p * 3)(base, base + 1, base + 2)
        ret = lib.hyd_send_tile(enc, ptrs, 0, 0, w * 3, 3, -1, 0)
        assert ret == 0, lib.hyd_error_message_get(enc)
        written = ctypes.c_size_t(0)
        lib.hyd_release_output_buffer(enc, ctypes.byref(written))
        out.extend(bytes(obuf[: written.value]))
        return bytes(out)
    finally:
        lib.hyd_encoder_destroy(ctypes.c_void_p(enc))
