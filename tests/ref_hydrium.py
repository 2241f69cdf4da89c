"""Differential-test oracle: drive the *reference* hydrium C library.

Builds /root/reference's libhydrium with plain gcc into a shared object
(the library has no dependencies beyond libc; SURVEY.md section 6) and
exposes an `encode()` helper via ctypes.  Used only by tests to produce
ground-truth bitstreams for byte-comparison and PSNR baselines.  No
reference code is copied into this repository; the reference tree is
compiled in a temp directory at test time.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

REF_SRC = "/root/reference"
_SO_PATH = os.path.join(tempfile.gettempdir(), "refbuild", "libhydrium_ref.so")

HYD_OK = 0
HYD_NEED_MORE_OUTPUT = -2
HYD_UINT8 = 0
HYD_UINT16 = 1
HYD_FLOAT32 = 2


class _Metadata(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_size_t),
        ("height", ctypes.c_size_t),
        ("linear_light", ctypes.c_int),
        ("tile_size_shift_x", ctypes.c_int),
        ("tile_size_shift_y", ctypes.c_int),
    ]


_lib: Optional[ctypes.CDLL] = None


def build() -> str:
    os.makedirs(os.path.dirname(_SO_PATH), exist_ok=True)
    if not os.path.exists(_SO_PATH):
        srcs = [
            os.path.join(REF_SRC, "src/libhydrium", f)
            for f in os.listdir(os.path.join(REF_SRC, "src/libhydrium"))
            if f.endswith(".c")
        ]
        subprocess.run(
            ["gcc", "-O2", "-std=c99", "-ffp-contract=fast", "-shared",
             "-fPIC", *srcs,
             f"-I{REF_SRC}/src/include", f"-I{REF_SRC}/src/libhydrium",
             "-o", _SO_PATH],
            check=True,
        )
    return _SO_PATH


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        lib.hyd_encoder_new.restype = ctypes.c_void_p
        lib.hyd_encoder_destroy.argtypes = [ctypes.c_void_p]
        lib.hyd_set_metadata.argtypes = [ctypes.c_void_p, ctypes.POINTER(_Metadata)]
        lib.hyd_provide_output_buffer.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
        lib.hyd_release_output_buffer.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t)]
        lib.hyd_send_tile.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p * 3, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_ssize_t, ctypes.c_ssize_t,
            ctypes.c_int, ctypes.c_int]
        lib.hyd_flush.argtypes = [ctypes.c_void_p]
        lib.hyd_error_message_get.restype = ctypes.c_char_p
        lib.hyd_error_message_get.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def encode(image: np.ndarray, tile_size_shift: int = -1,
           linear_light: bool = False,
           sample_fmt: int = HYD_UINT8) -> bytes:
    """Encode an [H, W, 3] image with the reference encoder.

    tile_size_shift: -1 => one-frame mode; 0..3 => tiled mode with
    256<<shift pixel tiles.  Returns the .jxl byte stream."""
    lib = _load()
    h, w = image.shape[:2]
    if sample_fmt == HYD_UINT8:
        image = np.ascontiguousarray(image, dtype=np.uint8)
        itemtype = ctypes.c_uint8
    elif sample_fmt == HYD_UINT16:
        image = np.ascontiguousarray(image, dtype=np.uint16)
        itemtype = ctypes.c_uint16
    else:
        image = np.ascontiguousarray(image, dtype=np.float32)
        itemtype = ctypes.c_float

    enc = lib.hyd_encoder_new()
    assert enc
    out = bytearray()
    try:
        meta = _Metadata(w, h, int(linear_light), tile_size_shift,
                         tile_size_shift)
        ret = lib.hyd_set_metadata(enc, ctypes.byref(meta))
        assert ret == HYD_OK, lib.hyd_error_message_get(enc)

        bufsize = 1 << 20
        obuf = (ctypes.c_uint8 * bufsize)()

        def provide():
            r = lib.hyd_provide_output_buffer(enc, obuf, bufsize)
            assert r == HYD_OK, lib.hyd_error_message_get(enc)

        def release():
            written = ctypes.c_size_t(0)
            lib.hyd_release_output_buffer(enc, ctypes.byref(written))
            out.extend(bytes(obuf[: written.value]))

        provide()

        tile_h = 2048 if tile_size_shift < 0 else 256 << tile_size_shift
        tile_w = tile_h
        tiles_y = (h + tile_h - 1) // tile_h
        tiles_x = (w + tile_w - 1) // tile_w
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                y0, x0 = ty * tile_h, tx * tile_w
                th = min(tile_h, h - y0)
                tw = min(tile_w, w - x0)
                tile = np.ascontiguousarray(image[y0:y0 + th, x0:x0 + tw])
                base = tile.ctypes.data
                ptrs = (ctypes.c_void_p * 3)(
                    base, base + ctypes.sizeof(itemtype),
                    base + 2 * ctypes.sizeof(itemtype))
                ret = lib.hyd_send_tile(enc, ptrs, tx, ty, tw * 3, 3, -1,
                                        sample_fmt)
                while ret == HYD_NEED_MORE_OUTPUT:
                    release()
                    provide()
                    ret = lib.hyd_flush(enc)
                assert ret == HYD_OK, (ret, lib.hyd_error_message_get(enc))
        release()
        return bytes(out)
    finally:
        lib.hyd_encoder_destroy(ctypes.c_void_p(enc))
