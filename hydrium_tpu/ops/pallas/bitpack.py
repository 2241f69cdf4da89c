"""VMEM-resident bitpack: variable-width fields -> word-aligned chunks,
replacing ops/pipeline._onehot_pack_chunks' HBM-bound one-hot matmuls
(measured 8.4 + 8.2 ms of the 34 ms packed pipeline per 2048^2 LF
group; the one-hot form is XLA-locally-optimal -- scatter 270 ms, int8
matmuls 82 ms, chunk-size sweep flat -- so further gains need the merge
tree to stay on-chip, which is what this kernel does).

Algorithm: a binary MERGE TREE over each chunk's fields.  Level k holds
segments of 2^k fields as [words, segment-columns] u32 state; merging
two adjacent segments is `left | (right << bits(left))` -- a
per-column variable shift.  Mosaic-friendliness comes from three
structural choices:

1. The first three levels (fields -> quads -> octs) run in plain XLA
   (the existing _quad_fields plus _oct_fields here): they are cheap
   lane-parallel shift/or work, and entering the kernel at the oct
   level gives the VMEM state a healthy [4-8, cols] shape instead of a
   sublane-wasting [1, cols].
2. BIT-REVERSED oct order (the FFT trick): octs enter the kernel with
   their index bits reversed, so the adjacent-pair merge at every level
   becomes "left = first half of the columns, right = second half" --
   a STATIC slice, never a stride-2 shuffle.  The pre-pass permutation
   runs once in XLA outside the kernel.
3. Chunk-batched columns: CB chunks ride side by side (column =
   segment * CB + chunk), so deep levels (few segments, many words)
   keep all lanes busy, and the word-shift barrel (static row shifts
   via concat-of-slices, selected per column) never mixes chunks.

Bit-identical to _onehot_pack_chunks / the scatter form by construction
(LSB-first concatenation is associative); pinned by
tests/test_pallas_bitpack.py (interpret mode, CPU) and the on-chip
check in scripts/pack_profile.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# chunks per kernel program: deep merge levels have segments*CB columns.
# CB = 128 keeps every half-slice 128-lane-ALIGNED (Mosaic rejects
# concats whose operands carry lane offsets from unaligned slices) and
# all lanes busy at the deepest level; peak VMEM ~10 MB per program.
CB = 128

import os as _os

# predicate dead deep-barrel passes on the actual max shift (see the
# kernel body); default ON since scripts/tpu_smoke.py validated the
# Mosaic cond lowering on real hardware (2026-08-20 chip session:
# byte-identical payload, 46085 words, with and without PRED).
# HYDRIUM_PLPACK_PRED=0 is the kill switch.
PRED = _os.environ.get("HYDRIUM_PLPACK_PRED", "1") == "1"


def _bitrev_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def _oct_fields(lanes, qbits: jnp.ndarray, cap: int):
    """Merge adjacent QUAD pairs (from pipeline._quad_fields) into octs
    of 8 fields: plain XLA lane work, [M/512, 512] views with lane
    strides (the layout discipline _quad_fields documents).

    lanes: tuple of Lq [M] u32 (quad words); qbits [M] i32.
    Returns (oct lane tuple of Lo [M/2] u32, oct bits [M/2] i32) with
    Lo = ceil(cap*8/32) + 1 (the +1 catches the shift spill, mirroring
    the one-hot path's spill contribution)."""
    W = 512
    Lq = len(lanes)
    lv = [l.reshape(-1, W) for l in lanes]
    qb = qbits.reshape(-1, W)
    le = [l[:, 0::2] for l in lv]
    ro = [l[:, 1::2] for l in lv]
    bl = qb[:, 0::2].astype(jnp.int32)
    br = qb[:, 1::2].astype(jnp.int32)
    Lo = (cap * 8 + 31) // 32 + 1
    w = (bl >> 5).astype(jnp.int32)
    b = (bl & 31).astype(jnp.uint32)
    inv = (jnp.uint32(32) - b) & jnp.uint32(31)
    z = jnp.zeros_like(bl).astype(jnp.uint32)

    def rlane(j):
        return ro[j] if 0 <= j < Lq else z

    # w = bl >> 5 is bounded by the LEFT quad's bits (<= 4*cap), far
    # tighter than the oct lane count; fields beyond cap produce
    # garbage words by contract (the caller's ok flag rejects them)
    max_wv = ((cap * 4) >> 5) + 1
    out = []
    for j in range(Lo):
        acc = le[j] if j < Lq else z
        # right quad shifted by bl bits: word part w, bit part b;
        # lane j receives rlane(j - w) << b | carry
        rs = z
        for wv in range(min(Lo, max_wv)):
            hit = (w == wv)
            lo = rlane(j - wv) << b
            hi = jnp.where(b > 0, rlane(j - wv - 1) >> inv, z)
            rs = jnp.where(hit, lo | hi, rs)
        out.append((acc | rs).reshape(-1))
    return tuple(out), (bl + br).reshape(-1)


def _row_shift_down(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Rows shifted toward higher indices by static d, zero-filled.

    Inside the kernel this must be pltpu.roll + an iota mask: the
    concat-of-slices form trips Mosaic ("result/input offset mismatch
    on non-concat dimension") once operands carry sublane offsets from
    earlier slices."""
    if d == 0:
        return x
    rolled = pltpu.roll(x, d, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows >= d, rolled, jnp.zeros((), x.dtype))


def _pad_rows(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    if x.shape[0] == rows:
        return x
    z = jnp.zeros((rows - x.shape[0], x.shape[1]), x.dtype)
    return jnp.concatenate([x, z], axis=0)


def _merge_pack_kernel(vals_ref, bits_ref, out_ref, cb_ref, *, ch: int,
                       cap: int, ow: int, l_in: int):
    """One program: CB chunks, state entering at the OCT level.

    vals_ref: [1, 8, (ch/8)*CB] u32 -- rows 0..l_in-1 = oct words,
              column = bit-reversed oct index * CB + chunk.
    bits_ref: [1, 8, (ch/8)*CB] i32 -- row 0 = oct bits.
    out_ref:  [1, ow, CB] u32 packed words (column = chunk).
    cb_ref:   [1, 8, CB] i32, all rows = total chunk bits."""
    x = vals_ref[0][:l_in]
    b = bits_ref[0][:1].astype(jnp.int32)
    segs = ch // 8
    seg_fields = 8
    while segs > 1:
        half = (segs // 2) * CB
        left, right = x[:, :half], x[:, half:]
        bl, br = b[:, :half], b[:, half:]
        seg_fields *= 2
        rows_next = (cap * seg_fields + 31) // 32 + 1
        l = _pad_rows(left, rows_next)
        r = _pad_rows(right, rows_next)
        # word part of the shift: log-barrel of static row shifts,
        # selected per column (bl <= cap*seg_fields/2).  The static
        # bound covers cap bits per field, but real content packs a
        # fraction of that, so with PRED each step is predicated on the
        # ACTUAL max shift across columns (scalar lax.cond -- Mosaic
        # branches around the whole vector op, making dead deep-barrel
        # passes ~free; bit-identical by construction since a skipped
        # step has no selected column).  PRED defaults OFF until the
        # on-chip smoke validates the Mosaic lowering of the
        # value-returning cond (interpret-mode equality is pinned
        # either way by tests/test_pallas_bitpack.py).
        w = bl >> 5
        mx = jnp.max(w)
        max_w = (cap * (seg_fields // 2)) >> 5
        t = 0
        while (1 << t) <= max_w:
            step = 1 << t

            def _shift(rr, _s=step, _t=t, _w=w):
                return jnp.where(((_w >> _t) & 1) > 0,
                                 _row_shift_down(rr, _s), rr)

            if PRED:
                r = jax.lax.cond(mx >= step, _shift, lambda rr: rr, r)
            else:
                r = _shift(r)
            t += 1
        # bit part: per-column shift with the inter-word carry
        bb = (bl & 31).astype(jnp.uint32)
        r_dn = _row_shift_down(r, 1)
        hi = jnp.where(bb > 0,
                       r_dn >> ((jnp.uint32(32) - bb) & jnp.uint32(31)),
                       jnp.uint32(0))
        r = (r << bb) | hi
        x = l | r
        b = bl + br
        segs //= 2
    # x: [rows_final, CB]; clip/pad to ow (a chunk whose bits exceed
    # ow*32 is garbage by contract -- the caller's ok flag rejects it)
    if x.shape[0] >= ow:
        out_ref[0] = x[:ow]
    else:
        out_ref[0] = _pad_rows(x, ow)
    cb_ref[0] = jnp.broadcast_to(b.astype(jnp.int32), (8, CB))


def merge_pack_chunks(lanes, qbits: jnp.ndarray, ch: int, ow: int,
                      cap: int, interpret: bool = False):
    """(quad lanes, quad bits) -> (chunks [R, ow] u32, chunk_bits [R]).

    Same input contract as pipeline._onehot_pack_chunks (the output of
    _quad_fields): lanes tuple of [M] u32, qbits [M] i32, M = F/4 with
    F = R*ch fields.  ch and ow are the FORMAT's chunk geometry
    (pipeline.TOK_CHUNK/TOK_OW etc.); cap is the per-field bit cap."""
    M = qbits.shape[0]
    R = (M * 4) // ch
    assert R * ch == M * 4
    octs, obits = _oct_fields(lanes, qbits, cap)
    Lo = len(octs)
    opc = ch // 8                    # octs per chunk
    # pad the chunk count to a CB multiple with zero-width chunks
    Rp = ((R + CB - 1) // CB) * CB
    if Rp != R:
        pad = (Rp - R) * opc
        octs = tuple(jnp.concatenate([o, jnp.zeros((pad,), o.dtype)])
                     for o in octs)
        obits = jnp.concatenate([obits, jnp.zeros((pad,), obits.dtype)])
    B = Rp // CB
    rev = _bitrev_indices(opc)
    cols = opc * CB

    def to_cols(a):
        # [B, chunk, oct] -> bit-reverse octs -> [B, oct_rev, chunk]
        return a.reshape(B, CB, opc)[:, :, rev].transpose(0, 2, 1) \
                .reshape(B, 1, cols)

    # block row count: >= Lo (the wide-residue cap 30 gives 9-row octs)
    # and a multiple of 8 for clean sublane tiling
    rows_in = ((max(Lo, 8) + 7) // 8) * 8
    vals = jnp.concatenate(
        [to_cols(o.astype(jnp.uint32)) for o in octs]
        + [jnp.zeros((B, rows_in - Lo, cols), jnp.uint32)], axis=1)
    bits = jnp.concatenate(
        [to_cols(obits.astype(jnp.int32)),
         jnp.zeros((B, rows_in - 1, cols), jnp.int32)], axis=1)

    kern = partial(_merge_pack_kernel, ch=ch, cap=cap, ow=ow, l_in=Lo)
    chunks_t, cbits = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows_in, cols), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, rows_in, cols), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, ow, CB), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, CB), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, ow, CB), jnp.uint32),
            jax.ShapeDtypeStruct((B, 8, CB), jnp.int32),
        ],
        interpret=interpret,
    )(vals, bits)
    chunks = chunks_t.transpose(0, 2, 1).reshape(Rp, ow)[:R]
    chunk_bits = cbits[:, 0, :].reshape(Rp)[:R]
    return chunks, chunk_bits
