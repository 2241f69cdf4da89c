"""The Pallas merge-tree bitpack must be bit-identical to the one-hot
MXU form (ops/pipeline._onehot_pack_chunks) for every chunk whose bits
fit the chunk buffer; overflow chunks only need exact chunk_bits (both
forms produce garbage words by contract, caller's ok flag rejects)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hydrium_tpu.ops import pipeline as P
from hydrium_tpu.ops.pallas import bitpack


def _ref_chunks(vals, widths, ch, ow, cap):
    lanes, qbits = P._quad_fields(jnp.asarray(vals), jnp.asarray(widths),
                                  cap)
    chunks, cbits, _ok = P._onehot_pack_chunks(lanes, qbits, ch // 4, ow)
    return np.asarray(chunks), np.asarray(cbits)


def _pl_chunks(vals, widths, ch, ow, cap):
    lanes, qbits = P._quad_fields(jnp.asarray(vals), jnp.asarray(widths),
                                  cap)
    chunks, cbits = bitpack.merge_pack_chunks(lanes, qbits, ch, ow, cap,
                                              interpret=True)
    return np.asarray(chunks), np.asarray(cbits)


@pytest.mark.parametrize("ch,ow,cap,p", [
    (P.TOK_CHUNK, P.TOK_OW, P.TOK_MAX_LEN, 0.45),
    (P.RES_CHUNK, P.RES_OW_FAST, P.RES_CAP_FAST, 0.6),
    (P.RES_CHUNK, P.RES_OW_WIDE, P.RES_CAP_WIDE, 0.9),
])
def test_merge_pack_matches_onehot(ch, ow, cap, p):
    rng = np.random.default_rng(int(ch) ^ int(cap))
    R = 3
    F = R * ch
    widths = np.minimum(rng.geometric(p, F), cap).astype(np.int32)
    widths[rng.random(F) < 0.3] = 0          # zero-width fields are legal
    widths[:8] = cap                         # full-cap fields up front
    vals = (rng.integers(0, 1 << 31, F, dtype=np.int64)
            & ((1 << widths.astype(np.int64)) - 1)).astype(np.uint32)
    a_chunks, a_bits = _ref_chunks(vals, widths, ch, ow, cap)
    b_chunks, b_bits = _pl_chunks(vals, widths, ch, ow, cap)
    assert np.array_equal(a_bits, b_bits)
    fits = a_bits <= (ow - 4) * 32
    assert fits.all()                         # this case has no overflow
    assert np.array_equal(a_chunks, b_chunks)


def test_merge_pack_predicated_barrel_identical(monkeypatch):
    """The PRED form (deep barrel passes skipped via a scalar cond on
    the actual max shift) must produce the exact same chunks as the
    always-execute form."""
    ch, ow, cap = P.TOK_CHUNK, P.TOK_OW, P.TOK_MAX_LEN
    rng = np.random.default_rng(77)
    F = 2 * ch
    # realistic sparse widths: most fields 2-5 bits, so the actual max
    # shift sits far below the cap bound and many passes get skipped
    widths = np.minimum(rng.geometric(0.4, F), cap).astype(np.int32)
    vals = (rng.integers(0, 1 << 31, F, dtype=np.int64)
            & ((1 << widths.astype(np.int64)) - 1)).astype(np.uint32)
    base_chunks, base_bits = _pl_chunks(vals, widths, ch, ow, cap)
    monkeypatch.setattr(bitpack, "PRED", True)
    pred_chunks, pred_bits = _pl_chunks(vals, widths, ch, ow, cap)
    assert np.array_equal(base_bits, pred_bits)
    assert np.array_equal(base_chunks, pred_chunks)


def test_merge_pack_overflow_chunk_bits_exact():
    """A residue chunk past the fast budget: words are garbage on both
    paths, but chunk_bits (which drives the ok flag) must stay exact."""
    ch, ow, cap = P.RES_CHUNK, P.RES_OW_FAST, P.RES_CAP_FAST
    rng = np.random.default_rng(5)
    F = 2 * ch
    widths = np.full(F, cap, np.int32)       # 15*2048 bits >> fast budget
    vals = (rng.integers(0, 1 << 15, F, dtype=np.int64)).astype(np.uint32)
    _a, a_bits = _ref_chunks(vals, widths, ch, ow, cap)
    _b, b_bits = _pl_chunks(vals, widths, ch, ow, cap)
    assert np.array_equal(a_bits, b_bits)
    assert (a_bits > (ow - 2) * 32).all()


def test_merge_pack_stream_roundtrip():
    """Decode the packed words field-by-field and compare to inputs."""
    ch, ow, cap = P.TOK_CHUNK, P.TOK_OW, P.TOK_MAX_LEN
    rng = np.random.default_rng(11)
    F = ch
    widths = np.minimum(rng.geometric(0.5, F), cap).astype(np.int32)
    vals = (rng.integers(0, 1 << 31, F, dtype=np.int64)
            & ((1 << widths.astype(np.int64)) - 1)).astype(np.uint32)
    chunks, cbits = _pl_chunks(vals, widths, ch, ow, cap)
    words = chunks[0]
    bitpos = 0
    for i in range(F):
        w = int(widths[i])
        got = 0
        for k in range(w):
            bit = (words[(bitpos + k) >> 5] >> ((bitpos + k) & 31)) & 1
            got |= int(bit) << k
        assert got == int(vals[i]), i
        bitpos += w
    assert bitpos == int(cbits[0])
