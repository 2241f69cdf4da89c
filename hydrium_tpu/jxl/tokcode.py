"""Transport prefix code for the device->host token stream.

The device pipeline ships HF hybrid-uint tokens (alphabet 0..63 under
config (4,1,0)) over the interconnect.  Shipping them as flat 6-bit
fields costs ~2x their entropy on real content, so the packed payload
(ops/pipeline.py encode_lfg_packed) Huffman-codes them with a *transport*
code that never appears in the .jxl bitstream.

The code is CONTEXT-SPLIT: each symbol's table is selected by its
within-preset cluster id (0..8 -- the same 9-way context clustering the
final ANS stream uses, encoder.c:855-901).  Both sides know the cluster
before the token is decoded (contexts depend only on previously decoded
symbols -- that is exactly how the C++ walker reconstructs clusters), so
per-cluster tables cost nothing in decodability and close most of the
gap between a single global Huffman table and the context-modeled ANS
size (~30% on noisy 4K content).

The host picks code lengths from the previous LF group's per-class token
histogram (shipped back in the aux payload), sends the 9x64 codeword
table to the device with the next dispatch, and the C++ walker decodes
with one 256-entry LUT per class.  Decodability is unconditional --
every symbol always has a code in every class (add-one smoothing), so a
distribution mismatch only costs compression, never correctness.

Reuses the depth-limited Huffman + canonical bit-reversed code
construction already validated byte-exactly against the reference
(jxl/entropy.py, entropy.c:592-707)."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .entropy import build_prefix_table

ALPHABET = 64
NCLASS = 9            # within-preset clusters (tables.hf_cluster_map)
# 8-bit cap: lets the device pack FOUR tokens per scatter update (4*8 <=
# 32 bits; the bitpack scatter is the pipeline's dominant device cost)
# and shrinks each decode LUT to 256 entries.  Optimal package-merge
# lengths at depth 8 still land within ~0.1 b/sym of unlimited Huffman
# on real token distributions.
MAX_LEN = 8
LUT_BITS = 8


def package_merge_lengths(freqs, max_len: int):
    """Optimal length-limited prefix code lengths (package-merge).

    The reference's in-array depth-limited Huffman (entropy.c:592-662,
    kept bit-exact in jxl/entropy.py for the .jxl streams) over-
    constrains at small depth caps; the transport code never appears in
    the bitstream, so it is free to use the optimal algorithm."""
    A = len(freqs)
    assert all(f > 0 for f in freqs)
    singles = sorted((int(f), (i,)) for i, f in enumerate(freqs))
    packages: list = []
    for _level in range(max_len - 1):
        merged = sorted(singles + packages)
        packages = [
            (merged[k][0] + merged[k + 1][0],
             merged[k][1] + merged[k + 1][1])
            for k in range(0, len(merged) - 1, 2)
        ]
    # the optimal solution takes the 2A-2 cheapest items of the last
    # merged list; a symbol's code length = its occurrence count there
    lengths = [0] * A
    for _w, syms in sorted(singles + packages)[:2 * (A - 1)]:
        for s in syms:
            lengths[s] += 1
    return lengths


def _default_prior() -> np.ndarray:
    """Generic skewed-to-zero token prior for the first LF group (real
    content concentrates mass on small tokens; entropy.c hybridize)."""
    t = np.arange(ALPHABET, dtype=np.float64)
    f = np.maximum(1, (4000.0 * 0.72 ** t)).astype(np.int64)
    return np.tile(f, (NCLASS, 1))


def build_tables(freqs: np.ndarray) -> Tuple[np.ndarray, np.ndarray,
                                             np.ndarray]:
    """freqs[NCLASS, 64] -> (lengths i32[NCLASS*64],
    codewords u32[NCLASS*64] LSB-first, decode LUTs u16[NCLASS, 256]
    with entry = symbol | (length << 8)); index = class*64 + token."""
    freqs = np.asarray(freqs, np.int64).reshape(NCLASS, ALPHABET)
    lens = np.zeros(NCLASS * ALPHABET, np.int32)
    codes = np.zeros(NCLASS * ALPHABET, np.uint32)
    lut = np.zeros((NCLASS, 1 << LUT_BITS), np.uint16)
    for k in range(NCLASS):
        smoothed = freqs[k] + 1
        lengths = package_merge_lengths([int(v) for v in smoothed],
                                        MAX_LEN)
        table = build_prefix_table(lengths, ALPHABET)
        for sym, (cw, ln) in enumerate(table):
            assert 1 <= ln <= MAX_LEN, (k, sym, ln)
            lens[k * ALPHABET + sym] = ln
            codes[k * ALPHABET + sym] = cw
            idx = cw + (np.arange(1 << (LUT_BITS - ln),
                                  dtype=np.uint32) << ln)
            lut[k, idx] = sym | (ln << 8)
    return lens, codes, lut


class TokenCodec:
    """Adaptive transport code: updated from each LF group's device-side
    per-class token histogram, applied to the next dispatch.

    `cold` is True until the first real histogram arrives; a cold codec
    only has the generic prior, which costs ~1 b/sym on real content --
    cold dispatches therefore bootstrap with a cheap aux-only fetch
    (encoder._JaxDispatch.prefetch) before pulling the big payload.

    State optionally persists across processes (load/save): a stale code
    only costs compression until adaptation catches up, never
    correctness, so warm-starting fresh CLI/bench processes is free."""

    __slots__ = ("freqs", "_tables", "cold")

    def __init__(self, cache_path=None) -> None:
        self.freqs = _default_prior()
        self._tables = None
        self.cold = True
        if cache_path:
            self.load(cache_path)

    def load(self, path) -> None:
        try:
            import os

            if os.path.exists(path):
                f = np.load(path)["freqs"]
                if f.shape == (NCLASS, ALPHABET) and f.sum() > 0:
                    self.freqs = f.astype(np.int64)
                    self._tables = None
                    self.cold = False
        except Exception:
            pass

    def save(self, path) -> None:
        try:
            import os

            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                np.savez(f, freqs=self.freqs)
            os.replace(tmp, path)
        except Exception:
            pass

    def update(self, hist: np.ndarray) -> None:
        """Fold in one LF group's exact [NCLASS, 64] token histogram
        (aux payload).  Exponential decay keeps the code tracking
        content changes."""
        h = np.asarray(hist, np.int64).reshape(NCLASS, ALPHABET)
        if h.sum() <= 0:
            return
        self.freqs = self.freqs // 2 + h
        self._tables = None
        self.cold = False

    def tables(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        # read into a local: update() (prefetch worker thread) may null
        # the cache concurrently, and returning self._tables directly
        # could then yield None
        t = self._tables
        if t is None:
            t = build_tables(self.freqs)
            self._tables = t
        return t
