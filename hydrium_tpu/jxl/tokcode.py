"""Transport prefix code for the device->host token stream.

The device pipeline ships HF hybrid-uint tokens (alphabet 0..63 under
config (4,1,0)) over the interconnect.  Shipping them as flat 6-bit
fields costs ~2x their entropy on real content, so the packed payload
(ops/pipeline.py encode_lfg_packed) Huffman-codes them with a *transport*
code that never appears in the .jxl bitstream: the host picks code
lengths from the previous LF group's token histogram (shipped back in
the aux payload), sends the 64-entry codeword table to the device with
the next dispatch, and the C++ walker (cpp/serializer.cc) decodes with a
4096-entry LUT.  Decodability is unconditional -- every symbol always
has a code (add-one smoothing), so a distribution mismatch only costs
compression, never correctness.

Reuses the depth-limited Huffman + canonical bit-reversed code
construction already validated byte-exactly against the reference
(jxl/entropy.py, entropy.c:592-707)."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .entropy import build_huffman_lengths, build_prefix_table

ALPHABET = 64
MAX_LEN = 12          # bounds the device-side stream buffer at 12 bits/slot
LUT_BITS = 12


def _default_prior() -> np.ndarray:
    """Generic skewed-to-zero token prior for the first LF group (real
    content concentrates mass on small tokens; entropy.c hybridize)."""
    t = np.arange(ALPHABET, dtype=np.float64)
    f = np.maximum(1, (4000.0 * 0.72 ** t)).astype(np.int64)
    return f


def build_tables(freqs: np.ndarray) -> Tuple[np.ndarray, np.ndarray,
                                             np.ndarray]:
    """freqs[64] -> (lengths i32[64], codewords u32[64] LSB-first,
    decode LUT u16[4096] with entry = symbol | (length << 8))."""
    smoothed = np.asarray(freqs, np.int64) + 1
    lengths = build_huffman_lengths([int(v) for v in smoothed], ALPHABET,
                                    MAX_LEN)
    table = build_prefix_table(lengths, ALPHABET)
    lens = np.zeros(ALPHABET, np.int32)
    codes = np.zeros(ALPHABET, np.uint32)
    lut = np.zeros(1 << LUT_BITS, np.uint16)
    for sym, (cw, ln) in enumerate(table):
        assert 1 <= ln <= MAX_LEN, (sym, ln)
        lens[sym] = ln
        codes[sym] = cw
        idx = cw + (np.arange(1 << (LUT_BITS - ln), dtype=np.uint32) << ln)
        lut[idx] = sym | (ln << 8)
    return lens, codes, lut


class TokenCodec:
    """Adaptive transport code: updated from each LF group's device-side
    token histogram, applied to the next dispatch."""

    __slots__ = ("freqs", "_tables")

    def __init__(self) -> None:
        self.freqs = _default_prior()
        self._tables = None

    def update(self, hist64: np.ndarray) -> None:
        """Fold in one LF group's exact token histogram (aux payload).
        Exponential decay keeps the code tracking content changes."""
        h = np.asarray(hist64, np.int64)
        if h.sum() <= 0:
            return
        self.freqs = self.freqs // 2 + h
        self._tables = None

    def tables(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        if self._tables is None:
            self._tables = build_tables(self.freqs)
        return self._tables
