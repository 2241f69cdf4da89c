"""JAX device pipeline: the TPU production path.

One jitted function carries pixels of an LF group all the way to
serializer-ready integer arrays, batched over every 256x256 group at
once (the reference processes one 8x8 block at a time; SURVEY.md section
7 maps its per-tile loops onto this batched design):

  pixels [H, W, 3]
    -> XYB (color rotation + biased cube root)              VPU
    -> 8x8 DCT via two MXU matmul passes                    MXU
    -> LF quantization + clamped-gradient residuals         VPU
    -> HF quantization (dead zone), zig-zag gather          VPU
    -> nonzero counts, context ids, cluster map gather      VPU
    -> hybrid-uint tokens/residues                          VPU
    -> per-cluster histograms (scatter-add)

Numerics: the device path uses direct float math (polynomial sRGB
linearization, exact cube root) instead of the reference's fixed-point
LUTs and bit-hack cbrt (format.c:21-56).  Quantized integers agree with
the conformance numpy pipeline for the overwhelming majority of
coefficients; outputs are validated by decode + equal-or-better PSNR,
not byte equality (BASELINE.json: "equal or better PSNR" for lossy
paths).  The DCT uses the same rounded basis constants as the reference
(tables.COSINE_LUT) so quantization decisions stay aligned.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import tables

# ---------------------------------------------------------------------------
# color
# ---------------------------------------------------------------------------


def _linearize(x: jnp.ndarray) -> jnp.ndarray:
    """sRGB EOTF cubic approximation (format.c:15-19)."""
    lo = 0.07739938080495357 * x
    hi = 0.003094300919832 + x * (
        -0.009982599 + x * (0.72007737769 + 0.2852804880 * x))
    return jnp.where(x <= 0.0404482362771082, lo, hi)


def _bias_cbrt(x: jnp.ndarray) -> jnp.ndarray:
    """cbrt(x + bias) - 0.155954 (format.c:29-31), exact cube root."""
    return jnp.cbrt(x + 0.0037930732552754493) - 0.155954


def rgb_to_xyb(rgb: jnp.ndarray, linear_light: bool) -> jnp.ndarray:
    """[..., 3] float32 RGB in 0..1 -> XYB (format.c:38-46)."""
    if not linear_light:
        rgb = _linearize(rgb)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    lgamma = _bias_cbrt(0.3 * r + 0.622 * g + 0.078 * b)
    mgamma = _bias_cbrt(0.23 * r + 0.692 * g + 0.078 * b)
    sgamma = _bias_cbrt(0.243423 * r + 0.204767 * g + 0.55181 * b)
    y = (lgamma + mgamma) * 0.5
    x = y - mgamma
    bb = sgamma - y
    return jnp.stack([x, y, bb], axis=-1)


# DCT-II basis with the reference's rounded constants: row 0 is the DC
# mean row (0.125), rows 1..7 the cosine rows (encoder.c:32-40,:639-658).
_DCT_BASIS = np.concatenate(
    [np.full((1, 8), 0.125, np.float32), tables.COSINE_LUT], axis=0)


def forward_dct(xyb: jnp.ndarray) -> jnp.ndarray:
    """[vh*8, vw*8, 3] -> [vh, vw, 8(ky), 8(kx), 3] via two matmuls."""
    h, w, c = xyb.shape
    vh, vw = h // 8, w // 8
    basis = jnp.asarray(_DCT_BASIS)
    blocks = xyb.reshape(vh, 8, vw, 8, c).transpose(0, 2, 1, 3, 4)
    # contract x: t[..., y, kx, c]; then y: F[..., ky, kx, c]
    t = jnp.einsum("abyxc,kx->abykc", blocks, basis,
                   preferred_element_type=jnp.float32)
    f = jnp.einsum("abykc,my->abmkc", t, basis,
                   preferred_element_type=jnp.float32)
    return f


# ---------------------------------------------------------------------------
# quantization
# ---------------------------------------------------------------------------


def quantize_hf(zz: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dead-zone HF quantization (encoder.c:802-818).

    zz: [..., 64, 3] float32 -> (q int32 with slot 0 zeroed, nz [..., 3])."""
    w = jnp.asarray(tables.HF_QUANT_WEIGHTS.T.astype(np.float32))
    q = ((zz * w) * np.float32(tables.HF_MULT)).astype(jnp.int32)
    q = jnp.where(jnp.abs(q) < 2, 0, q)
    q = q.at[..., 0, :].set(0)
    nz = jnp.sum((q != 0).astype(jnp.int32), axis=-2)
    return q, nz


def quantize_lf(dc: jnp.ndarray) -> jnp.ndarray:
    return (dc * jnp.asarray(tables.LF_SHIFT)).astype(jnp.int32)


def lf_residuals(lf_q: jnp.ndarray) -> jnp.ndarray:
    """Clamped-gradient prediction residuals (encoder.c:583-591).
    [vh, vw, 3] int32 -> packed uint32 residual symbols."""
    v = lf_q
    left = jnp.pad(v[:, :-1], ((0, 0), (1, 0), (0, 0)))
    up = jnp.pad(v[:-1], ((1, 0), (0, 0), (0, 0)))
    upleft = jnp.pad(v[:-1, :-1], ((1, 0), (1, 0), (0, 0)))
    vh, vw, _ = v.shape
    has_x = jnp.arange(vw)[None, :, None] > 0
    has_y = jnp.arange(vh)[:, None, None] > 0
    w = jnp.where(has_x, left, jnp.where(has_y, up, 0))
    n = jnp.where(has_y, up, w)
    nw = jnp.where(has_x & has_y, upleft, w)
    pred = jnp.clip(w + n - nw, jnp.minimum(w, n), jnp.maximum(w, n))
    return pack_signed(v - pred)


def pack_signed(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(v >= 0, v << 1, (-v << 1) - 1).astype(jnp.uint32)


# ---------------------------------------------------------------------------
# HF tokenization (batched over groups)
# ---------------------------------------------------------------------------


def _fllog2_u32(x: jnp.ndarray) -> jnp.ndarray:
    return 31 - jax.lax.clz(x.astype(jnp.int32))


def hybridize(values: jnp.ndarray):
    """Vectorized hybrid-uint, config (4,1,0) (entropy.c:427-444)."""
    v = values.astype(jnp.int32)
    small = v < 16
    x = jnp.maximum(v, 16)
    n = _fllog2_u32(x) - 1
    residue_bits = jnp.where(small, 0, n).astype(jnp.uint8)
    residue = jnp.where(small, 0, x & ((1 << n) - 1)).astype(jnp.uint32)
    high = (x >> n) & 1
    token = jnp.where(small, v, 16 + (high | ((n - 3) << 1)))
    return token.astype(jnp.uint16), residue, residue_bits


def predicted_nonzeroes(nz: jnp.ndarray) -> jnp.ndarray:
    """[G, 32, 32, 3] per-group neighbor prediction (encoder.c:670-678)."""
    above = jnp.pad(nz[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    left = jnp.pad(nz[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0)))
    pred = (above + left + 1) >> 1
    gbh, gbw = nz.shape[1], nz.shape[2]
    row0 = jnp.arange(gbh)[None, :, None, None] == 0
    col0 = jnp.arange(gbw)[None, None, :, None] == 0
    first_col_prev_row = jnp.pad(nz[:, :-1, :1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    pred = jnp.where(row0, left, pred)
    pred = jnp.where(col0, jnp.broadcast_to(first_col_prev_row, pred.shape),
                     pred)
    pred = jnp.where(row0 & col0, 32, pred)
    return pred


def tokenize_groups(hf_q: jnp.ndarray, nz: jnp.ndarray,
                    presets: jnp.ndarray, cluster_map: jnp.ndarray):
    """Batched HF tokenization (encoder.c:689-750).

    hf_q: [G, 32, 32, 64, 3] int32 zig-zag coefficients (padded groups)
    nz:   [G, 32, 32, 3]
    presets: [G] int32 preset per group
    Returns dict of [G, 32, 32, 3, 64] arrays + valid_len [G, 32, 32, 3].
    """
    q = hf_q[..., jnp.asarray([1, 0, 2])].transpose(0, 1, 2, 4, 3)
    nzc = nz[..., jnp.asarray([1, 0, 2])]

    base = (presets * tables.CONTEXTS_PER_PRESET)[:, None, None, None]
    block_ctx = jnp.arange(3, dtype=jnp.int32)[None, None, None, :]

    pred = predicted_nonzeroes(nzc)
    p64 = jnp.minimum(pred, 64)
    nz_ctx = jnp.where(pred < 8, pred, 4 + (p64 >> 1))
    count_ctx = base + 3 * nz_ctx + block_ctx

    nonzero = (q[..., 1:] != 0).astype(jnp.int32)
    cum = jnp.cumsum(nonzero, axis=-1)
    remaining = nzc[..., None] - jnp.pad(cum[..., :-1],
                                         [(0, 0)] * 4 + [(1, 0)])
    prev = jnp.concatenate(
        [(nzc <= 4).astype(jnp.int32)[..., None], nonzero[..., :-1]], axis=-1)
    hist = base + tables.COEFF_CONTEXTS_PER_BLOCK_CTX * block_ctx + 111
    cnzc = jnp.asarray(tables.COEFF_NUM_NONZERO_CONTEXT)
    cfc = jnp.asarray(tables.COEFF_FREQ_CONTEXT)
    coeff_ctx = (hist[..., None] + prev
                 + ((cnzc[jnp.clip(remaining, 0, 63)]
                     + cfc[jnp.arange(1, 64)]) << 1))

    j_idx = jnp.arange(1, 64)
    last_nz = jnp.max(jnp.where(nonzero > 0, j_idx, 0), axis=-1)
    valid_len = (1 + last_nz).astype(jnp.int32)

    values = jnp.concatenate(
        [nzc[..., None].astype(jnp.uint32), pack_signed(q[..., 1:])], axis=-1)
    contexts = jnp.concatenate([count_ctx[..., None], coeff_ctx], axis=-1)

    tokens, residues, residue_bits = hybridize(values)
    clusters = cluster_map[contexts].astype(jnp.uint8)
    return {
        "tokens": tokens,
        "clusters": clusters,
        "residues": residues,
        "residue_bits": residue_bits,
        "valid_len": valid_len,
    }


def cluster_histograms(tok: Dict[str, jnp.ndarray], num_clusters: int,
                       alphabet_cap: int = 128) -> jnp.ndarray:
    """Per-cluster token histogram over the valid symbol prefix."""
    mask = (jnp.arange(64)[None, None, None, None, :]
            < tok["valid_len"][..., None])
    c = tok["clusters"].astype(jnp.int32).ravel()
    t = jnp.minimum(tok["tokens"].astype(jnp.int32), alphabet_cap - 1).ravel()
    m = mask.astype(jnp.int32).ravel()
    hist = jnp.zeros((num_clusters, alphabet_cap), jnp.int32)
    return hist.at[c, t].add(m)


# ---------------------------------------------------------------------------
# full LF-group pipeline
# ---------------------------------------------------------------------------


def _group_pad(x: np.ndarray, gcy: int, gcx: int, blocks: int = 32):
    """Reshape a [vh, vw, ...] block grid into padded [G, 32, 32, ...]."""
    vh, vw = x.shape[0], x.shape[1]
    padded = jnp.zeros((gcy * blocks, gcx * blocks) + x.shape[2:], x.dtype)
    padded = padded.at[:vh, :vw].set(x)
    g = padded.reshape((gcy, blocks, gcx, blocks) + x.shape[2:])
    return g.transpose((0, 2, 1, 3) + tuple(range(4, g.ndim))).reshape(
        (gcy * gcx, blocks, blocks) + x.shape[2:])


@partial(jax.jit, static_argnames=("height", "width", "linear_light",
                                   "num_clusters", "sample_kind"))
def encode_lfg(pixels: jnp.ndarray, presets: jnp.ndarray,
               cluster_map: jnp.ndarray, *, height: int, width: int,
               linear_light: bool, num_clusters: int,
               sample_kind: str) -> Dict[str, jnp.ndarray]:
    """Full device pipeline for one LF group (or one tile-frame).

    pixels: [height, width, 3] (u8/u16 int or f32), unpadded.
    presets: [G] preset index per group (raster order).
    Returns serializer-ready arrays (still on device)."""
    vh, vw = (height + 7) >> 3, (width + 7) >> 3
    gcy, gcx = (height + 255) >> 8, (width + 255) >> 8

    if sample_kind == "uint8":
        rgb = pixels.astype(jnp.float32) * np.float32(1.0 / 255.0)
    elif sample_kind == "uint16":
        rgb = pixels.astype(jnp.float32) * np.float32(1.0 / 65535.0)
    else:
        rgb = pixels.astype(jnp.float32)
    xyb = rgb_to_xyb(rgb, linear_light)
    xyb = jnp.pad(xyb, ((0, vh * 8 - height), (0, vw * 8 - width), (0, 0)))

    coeffs = forward_dct(xyb)
    zz = coeffs[:, :, jnp.asarray(tables.ZIGZAG_KY),
                jnp.asarray(tables.ZIGZAG_KX), :]
    hf_q, nz = quantize_hf(zz)
    lf_q = quantize_lf(coeffs[:, :, 0, 0, :])
    lf_res = lf_residuals(lf_q)

    hf_g = _group_pad(hf_q, gcy, gcx)
    nz_g = _group_pad(nz, gcy, gcx)
    tok = tokenize_groups(hf_g, nz_g, presets, cluster_map)

    # blocks outside the valid varblock grid of each group emit nothing
    gbh = jnp.minimum(vh - jnp.arange(gcy) * 32, 32)
    gbw = jnp.minimum(vw - jnp.arange(gcx) * 32, 32)
    gbh_g = jnp.repeat(gbh, gcx)
    gbw_g = jnp.tile(gbw, gcy)
    valid_block = ((jnp.arange(32)[None, :, None]
                    < gbh_g[:, None, None])
                   & (jnp.arange(32)[None, None, :]
                      < gbw_g[:, None, None]))
    tok["valid_len"] = jnp.where(valid_block[..., None], tok["valid_len"], 0)

    hist = cluster_histograms(tok, num_clusters)
    return {"lf_q": lf_q, "lf_res": lf_res, "hist": hist, **tok}
