"""Portable FloatMap (PFM) read/write.

Capability twin of the reference CLI's hand-rolled PFM parser
(src/hydrium.c:192-252): 'PF' color maps, arbitrary whitespace in the
header, scale sign giving endianness, bottom-up row order."""

from __future__ import annotations

import numpy as np


def read_pfm(path_or_file) -> np.ndarray:
    """Read a color PFM into float32 [H, W, 3] (top-down)."""
    f = (open(path_or_file, "rb")
         if isinstance(path_or_file, (str, bytes)) else path_or_file)
    close = isinstance(path_or_file, (str, bytes))
    try:
        magic = f.read(2)
        if magic != b"PF":
            raise ValueError("not a color PFM (expected 'PF')")

        def token():
            # skip whitespace, read one token
            t = b""
            while True:
                c = f.read(1)
                if not c:
                    raise ValueError("truncated PFM header")
                if c.isspace():
                    if t:
                        return t
                    continue
                t += c

        width = int(token())
        height = int(token())
        scale = float(token())
        # exactly one whitespace byte after the scale was consumed by token()
        data = f.read(width * height * 3 * 4)
        if len(data) != width * height * 3 * 4:
            raise ValueError("truncated PFM data")
        dt = "<f4" if scale < 0 else ">f4"
        img = np.frombuffer(data, dtype=dt).reshape(height, width, 3)
        return np.ascontiguousarray(img[::-1]).astype(np.float32)
    finally:
        if close:
            f.close()


def write_pfm(path, image: np.ndarray) -> None:
    image = np.asarray(image, dtype=np.float32)
    h, w = image.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n%d %d\n-1.0\n" % (w, h))
        f.write(np.ascontiguousarray(image[::-1]).astype("<f4").tobytes())
