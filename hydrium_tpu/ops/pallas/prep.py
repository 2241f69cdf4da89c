"""VMEM-resident transport-prep kernel: the front's [N, 64] token/
residue tensors -> flat [M]-order transport-coded streams in one pass.

Replaces ops/pipeline._hf_transport_streams' XLA mask/flatten/where
chains + one-hot code/len matmuls, measured on chip (2026-08-20,
scripts/transport_slices.py) at ~12 ms composed per 2048^2 LF group:
XLA:TPU prices every formulation of the per-slot table lookup at
7-11 ms (it materializes the [M,64+] one-hot or the [M,27] f32
intermediate) and a single masked [N,64]->[M] flatten at ~2.5 ms.
All of it is near-bandwidth-free arithmetic once VMEM-resident.

Kernel stages (per grid program, TR=1024 block-channel rows):

1. inputs arrive as TWO pre-packed arrays (pack_p16 builds the p16
   field word t_idx | cls<<6 | mask<<10 | rbits<<11 and the caller
   pre-masks residues INSIDE the front's fused elementwise chain --
   each extra [N,64] store out of that chain costs ~0.8 ms in XLA's
   codegen, so five logical inputs collapse to two).
2. flat-order row build: three concat+roll doubling levels turn row r
   into [X[r], .., X[r+7]] (512 lanes); row 8k is then exactly flat
   slots [512k, 512k+512).  No matmul, stays integer.
3. batched-row lookup (TR/8/RB iters of RB=16 rows): slice rows 8k,
   transport lookup via a [128, RB*256] token one-hot (sublane axis =
   token value, two slot-halves sharing the contraction) against the
   block-diagonal packed table [36, 128] on the MXU (operands < 256,
   bf16-exact; f32 accumulation), per-class select of the two 8-bit
   halves, code/len unpack, masked emit.  Residue words/bit-widths
   for the same rows are sliced from their own doubled tensor.

Bit-identical to the XLA/CPU branch by construction; pinned by
tests/test_pallas_prep.py (interpret mode vs the production CPU
expressions) and on-chip by scripts/tpu_smoke.py (payload parity).
Reference contrast: replaces the reference's per-block tokenize hot
loop (/root/reference/src/libhydrium/entropy.c:427-444, :502-524).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR = 1024          # block-channel rows per program; divides N = G*3072
OR_ = TR // 8      # output rows (512 slots each) per program


def _mod_mulshift(x, m: int):
    """Exact x % m for i32 x in [0, 256), static m in {1, 2, 3, 9}
    without integer division (Mosaic-safe)."""
    if m == 1:
        return jnp.zeros_like(x)
    if m == 2:
        return x & 1
    if m == 3:
        q = (x * 1366) >> 12          # exact floor(x/3) for x < 4096
        return x - 3 * q
    if m == 9:
        q = (x * 456) >> 12           # exact floor(x/9) for x <= 255
        return x - 9 * q
    raise ValueError(m)


def _double3(x):
    """[TR, 64] -> [TR, 512]: row r becomes [x[r], .., x[r+7]] (rows
    r > TR-8 hold wrapped garbage; only rows 8k < TR-7 are consumed)."""
    c = x
    w = 64
    for k in range(3):
        up = pltpu.roll(c, TR - (1 << k), axis=0)   # up[r] = c[r + 2^k]
        c = jnp.concatenate([c, up], axis=1)
        w *= 2
    return c


def _prep_kernel(tab_ref, p16_ref, res_ref, tcode_ref, tbits_ref,
                 rflat_ref, rbout_ref, p512_ref, r512_ref, *,
                 tok_classes: int, debug_stage: int = 0):
    # debug_stage (scripts/prep_profile.py only): 1 = stop after the
    # input load (stage 1), 2 = + doubling, 3 = + row emit without the
    # lookup dot/selects; 0 = full production kernel.
    # ---- stage 1: inputs arrive pre-packed (pipeline.py builds p16 =
    # t_idx | cls<<6 | mask<<10 | rbits<<11 and pre-masked residues in
    # the front's fused elementwise chain -- materializing TWO arrays
    # instead of five; the XLA-side stores of [N,64] tensors measured
    # ~0.8 ms each on this toolchain) ----
    p16 = p16_ref[...].astype(jnp.int32)
    res = res_ref[...]
    if debug_stage == 1:
        tcode_ref[...] = jnp.broadcast_to(
            jnp.sum(p16, axis=1, keepdims=True)[:OR_], (OR_, 512))
        tbits_ref[...] = jnp.zeros((OR_, 512), jnp.int32)
        rflat_ref[...] = jnp.broadcast_to(
            jnp.sum(res.astype(jnp.int32), axis=1,
                    keepdims=True)[:OR_], (OR_, 512)).astype(jnp.uint32)
        rbout_ref[...] = jnp.zeros((OR_, 512), jnp.int32)
        return

    # ---- stage 2: flat-order doubling (into VMEM scratch: the loop
    # below slices rows dynamically, which Mosaic only supports on
    # REFS via pl.ds, not on values) ----
    p512_ref[...] = _double3(p16)                  # [TR, 512] i32
    r512_ref[...] = _double3(res)                  # [TR, 512] u32
    if debug_stage == 2:
        tcode_ref[...] = p512_ref[:OR_, :]
        tbits_ref[...] = jnp.zeros((OR_, 512), jnp.int32)
        rflat_ref[...] = r512_ref[:OR_, :]
        rbout_ref[...] = jnp.zeros((OR_, 512), jnp.int32)
        return

    # ---- stage 3: batched-row lookup + emit ----
    # tab_ref: [36, 128] bf16 block-diagonal of two copies of the
    # per-class packed table (rows 2c / 2c+1 = low/high 8-bit half of
    # code | len<<12 for class c).  Two slot-HALVES ride one dot: K-rows
    # 0..63 one-hot the batch's first-half slots, 64..127 the second
    # half, so the matmul runs [36,128]@[128,RB*256] -- 4x the MXU
    # utilization of the naive [18,64] form (M and K both double; the
    # halves are STATIC lane slices, no stride games).  RB output rows
    # per iteration keep the Mosaic loop trip count low (a row-at-a-time
    # loop measured ~8 ms of per-iteration overhead per 2048^2 LFG).
    RB = 16
    H = RB * 256
    tab = tab_ref[...]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (128, H), 0)
    row_lo = row_iota & 63
    row_is0 = row_iota < 64

    def body(i, _):
        r = i * RB
        prows = [p512_ref[pl.ds((r + j) * 8, 1), :] for j in range(RB)]
        pcat = jnp.concatenate(prows, axis=1)         # [1, RB*512]
        h0, h1 = pcat[:, :H], pcat[:, H:]
        if debug_stage == 3:      # emit loop without the lookup math
            halves = [((hx & 4095), (hx >> 10) & 1, (hx >> 11) & 31)
                      for hx in (h0, h1)]
            half = RB // 2
            for j in range(RB):
                code, bits, rbo = halves[0] if j < half else halves[1]
                off = (j if j < half else j - half) * 512
                s = slice(off, off + 512)
                tcode_ref[pl.ds(r + j, 1), :] = code[:, s]
                tbits_ref[pl.ds(r + j, 1), :] = bits[:, s]
                rbout_ref[pl.ds(r + j, 1), :] = rbo[:, s]
                rflat_ref[pl.ds(r + j, 1), :] = r512_ref[
                    pl.ds((r + j) * 8, 1), :]
            return 0
        t2 = jnp.where(row_is0, jnp.broadcast_to(h0 & 63, (128, H)),
                       jnp.broadcast_to(h1 & 63, (128, H)))
        oh = (row_lo == t2).astype(jnp.bfloat16)      # [128, H]
        R = jax.lax.dot_general(
            tab, oh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [36, H]
        c0 = (h0 >> 6) & 15
        c1 = (h1 >> 6) & 15
        lo0 = jnp.zeros((1, H), jnp.float32)
        hi0 = jnp.zeros((1, H), jnp.float32)
        lo1 = jnp.zeros((1, H), jnp.float32)
        hi1 = jnp.zeros((1, H), jnp.float32)
        for c in range(tok_classes):
            s0 = (c0 == c).astype(jnp.float32)
            s1 = (c1 == c).astype(jnp.float32)
            lo0 = lo0 + R[2 * c:2 * c + 1, :] * s0
            hi0 = hi0 + R[2 * c + 1:2 * c + 2, :] * s0
            lo1 = lo1 + R[18 + 2 * c:19 + 2 * c, :] * s1
            hi1 = hi1 + R[19 + 2 * c:20 + 2 * c, :] * s1
        # f32 -> i32 (Mosaic has no f32 -> u32 cast; values < 2^16, so
        # i32 is exact and the caller bitcasts to u32 outside).  The
        # halves stay SEPARATE through the emit: concatenating values
        # that carry lane offsets trips Mosaic's concat restriction,
        # and every 512-lane output row sits entirely inside one half
        # (H = RB/2 * 512).
        halves = []
        for hx, lox, hix in ((h0, lo0, hi0), (h1, lo1, hi1)):
            vx = lox.astype(jnp.int32) | (hix.astype(jnp.int32) << 8)
            mx = (hx >> 10) & 1
            halves.append((jnp.where(mx > 0, vx & 4095, 0),
                           (vx >> 12) * mx, (hx >> 11) & 31))
        half = RB // 2
        for j in range(RB):
            code, bits, rbo = halves[0] if j < half else halves[1]
            off = (j if j < half else j - half) * 512
            s = slice(off, off + 512)
            tcode_ref[pl.ds(r + j, 1), :] = code[:, s]
            tbits_ref[pl.ds(r + j, 1), :] = bits[:, s]
            rbout_ref[pl.ds(r + j, 1), :] = rbo[:, s]
            rflat_ref[pl.ds(r + j, 1), :] = r512_ref[
                pl.ds((r + j) * 8, 1), :]
        return 0

    jax.lax.fori_loop(0, OR_ // RB, body, 0)


def _packed_tab(tok_len: jnp.ndarray, tok_code: jnp.ndarray) -> jnp.ndarray:
    """[18, 64] bf16: rows 2c/2c+1 = low/high byte of code | len<<12
    for class c (all halves < 256, bf16-exact)."""
    codes = tok_code.reshape(-1, 64)[:9].astype(jnp.uint32)
    lens = tok_len.reshape(-1, 64)[:9].astype(jnp.uint32)
    v = (codes & jnp.uint32(4095)) | (lens << 12)        # [9, 64]
    lohi = jnp.stack([v & 255, v >> 8], axis=1)           # [9, 2, 64]
    return lohi.reshape(18, 64).astype(jnp.bfloat16)


def pack_p16(tokens, clusters, valid_len, residue_bits,
             tok_classes: int):
    """The kernel's packed 16-bit field word, built in XLA so it fuses
    into the front's elementwise chain: t_idx | cls<<6 | mask<<10 |
    rbits<<11 (u16 [N, 64]).  Shared by the kernel input and the
    sampled-histogram slices in pipeline._hf_transport_streams."""
    valid = (jnp.arange(64)[None, :] < valid_len[:, None])
    t_idx = jnp.where(valid, jnp.minimum(tokens, 63), 0).astype(jnp.int32)
    cls = clusters.astype(jnp.int32) % tok_classes
    rb = jnp.where(valid, residue_bits, 0).astype(jnp.int32)
    return (t_idx | (cls << 6) | (valid.astype(jnp.int32) << 10)
            | (rb << 11)).astype(jnp.uint16)


@partial(jax.jit, static_argnames=("tok_classes", "interpret",
                                   "debug_stage"))
def transport_prep(p16: jnp.ndarray, resm: jnp.ndarray,
                   tok_len: jnp.ndarray, tok_code: jnp.ndarray, *,
                   tok_classes: int = 9, interpret: bool = False,
                   debug_stage: int = 0):
    """(p16 u16 [N,64] from pack_p16, resm u32 [N,64] pre-masked
    residues, tok_len/tok_code [10*64]) -> (t_flat u32 [M], t_bits i32
    [M], r_flat u32 [M], r_bits i32 [M]) in flat slot order,
    bit-identical to the _hf_transport_streams CPU expressions."""
    N = p16.shape[0]
    assert N % TR == 0, N
    g = N // TR
    tab18 = _packed_tab(tok_len, tok_code)
    z = jnp.zeros((18, 64), jnp.bfloat16)
    tab = jnp.concatenate(
        [jnp.concatenate([tab18, z], axis=1),
         jnp.concatenate([z, tab18], axis=1)], axis=0)   # [36, 128]
    kern = partial(_prep_kernel, tok_classes=tok_classes,
                   debug_stage=debug_stage)
    rows = N // 8
    tcode, tbits, rflat, rbits = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((36, 128), lambda i: (0, 0)),
            pl.BlockSpec((TR, 64), lambda i: (i, 0)),
            pl.BlockSpec((TR, 64), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((OR_, 512), lambda i: (i, 0)),
            pl.BlockSpec((OR_, 512), lambda i: (i, 0)),
            pl.BlockSpec((OR_, 512), lambda i: (i, 0)),
            pl.BlockSpec((OR_, 512), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, 512), jnp.int32),
            jax.ShapeDtypeStruct((rows, 512), jnp.int32),
            jax.ShapeDtypeStruct((rows, 512), jnp.uint32),
            jax.ShapeDtypeStruct((rows, 512), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TR, 512), jnp.int32),
            pltpu.VMEM((TR, 512), jnp.uint32),
        ],
        interpret=interpret,
    )(tab, p16, resm)
    M = N * 64
    return (tcode.astype(jnp.uint32).reshape(M), tbits.reshape(M),
            rflat.reshape(M), rbits.reshape(M))
