"""Fused Pallas frontend: RGB -> XYB -> 8x8 DCT -> LF/HF quantization in
one VMEM-resident pass per 256x256 group.

The XLA path (ops/pipeline.py) materializes the XYB image and the DCT
coefficients in HBM between fusions; this kernel streams a group
(196 KB of u8 in, ~1 MB of int32 out) through VMEM once -- the standard
bandwidth-bound fusion recipe for TPU.

Mosaic has no general reshapes/gathers, so all data movement rides the
MXU: the per-plane 8x8 DCT *and* the (by,ky)->(ky,by) coefficient
rearrangement are folded into two constant [256, 256] matrices,

    F'' = (P_perm @ blockdiag(B)) @ plane @ (P_perm @ blockdiag(B))^T

after which coefficient (ky, kx) of every block lives in the contiguous
32x32 tile F''[32ky:, 32kx:]: the zig-zag scan becomes a fori_loop of
dynamic 32x32 slices driven by SMEM-resident index tables (full
unrolling spills registers; a loop keeps live ranges tiny).  Outputs use
a [3, 64, 32, 32] tile-major layout; the XLA caller transposes to the
pipeline's [blocks, 3, 64] emission layout.

Grid: one program per 256x256 group; input is channel-major
[G, 3, 256, 256] (a minor dim of 3 forces pathological lane padding).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables

_EMIT_TO_STORE = np.array([1, 0, 2], dtype=np.int32)
_DCT_BASIS = np.concatenate(
    [np.full((1, 8), 0.125, np.float32), tables.COSINE_LUT], axis=0)
# weight premultiplied by hf_mult, in emission channel order [3, 64]
_HF_W_SCALED = (tables.HF_QUANT_WEIGHTS[_EMIT_TO_STORE].astype(np.float32)
                * np.float32(tables.HF_MULT))


def _dct_rearrange_matrix() -> np.ndarray:
    """(P_perm @ blockdiag(B)) as one [256, 256] float32 constant."""
    mb = np.zeros((256, 256), np.float32)
    for b in range(32):
        mb[b * 8:(b + 1) * 8, b * 8:(b + 1) * 8] = _DCT_BASIS
    perm = np.zeros((256, 256), np.float32)
    for ky in range(8):
        for by in range(32):
            perm[ky * 32 + by, by * 8 + ky] = 1.0
    return perm @ mb


_DCT_L = _dct_rearrange_matrix()          # [256, 256]

# one-hot column selectors: _CSEL[kx] @ picks columns kx*32..kx*32+31
_CSEL = np.zeros((8, 256, 32), np.float32)
for _kx in range(8):
    for _b in range(32):
        _CSEL[_kx, _kx * 32 + _b, _b] = 1.0


def _cbrt(x):
    """Cube root for x > -bias (holds: bias added first, light >= 0).
    Mosaic has no cbrt primitive; exp(log(x)/3) matches jnp.cbrt well
    within the quantizer's dead zone."""
    return jnp.exp(jnp.log(jnp.maximum(x, 1e-35)) * (1.0 / 3.0))


def _kernel(zky_ref, zkx_ref, wq_ref, pixels_ref, dctl_ref, csel_ref,
            q_out_ref, dc_out_ref, fscratch_ref, *, linear_light: bool,
            sample_scale: float, integer_samples: bool):
    if integer_samples:
        # Mosaic lacks a direct u8/u16->f32 cast; hop through int32
        px = (pixels_ref[0].astype(jnp.int32).astype(jnp.float32)
              * sample_scale)
    else:
        px = pixels_ref[0].astype(jnp.float32) * sample_scale
    if not linear_light:
        lo = 0.07739938080495357 * px
        hi = 0.003094300919832 + px * (
            -0.009982599 + px * (0.72007737769 + 0.2852804880 * px))
        px = jnp.where(px <= 0.0404482362771082, lo, hi)
    r, g, b = px[0], px[1], px[2]
    bias = 0.0037930732552754493
    lgamma = _cbrt(0.3 * r + 0.622 * g + 0.078 * b + bias) - 0.155954
    mgamma = _cbrt(0.23 * r + 0.692 * g + 0.078 * b + bias) - 0.155954
    sgamma = _cbrt(0.243423 * r + 0.204767 * g + 0.55181 * b + bias) - 0.155954
    y = (lgamma + mgamma) * 0.5
    planes_store = (y - mgamma, y, sgamma - y)  # X, Y, B

    dctl = dctl_ref[...]

    def transform(plane):
        t1 = jnp.dot(dctl, plane, preferred_element_type=jnp.float32)
        return jnp.dot(t1, dctl.T, preferred_element_type=jnp.float32)

    lf_shift = [float(v) for v in tables.LF_SHIFT]
    for c in range(3):
        f = transform(planes_store[c])
        fscratch_ref[c] = f
        dc_out_ref[0, c] = (f[0:32, 0:32]
                            * np.float32(lf_shift[c])).astype(jnp.int32)

    for ce in range(3):             # emission order Y, X, B
        cs = (1, 0, 2)[ce]
        q_out_ref[0, ce, 0] = jnp.zeros((32, 32), jnp.int32)

        def body(j, _):
            ky = zky_ref[j]
            kx = zkx_ref[j]
            w = wq_ref[ce * 64 + j]
            # dynamic offsets on the lane (minor) dim must be 128-aligned
            # in Mosaic, so select the 32 columns with a one-hot matmul
            half = fscratch_ref[cs, pl.ds(ky * 32, 32), :]      # [32, 256]
            tile = jnp.dot(half, csel_ref[kx],
                           preferred_element_type=jnp.float32)  # [32, 32]
            q = (tile * w).astype(jnp.int32)
            q = jnp.where(jnp.abs(q) < 2, 0, q)
            q_out_ref[0, ce, pl.ds(j, 1)] = q[None]
            return 0

        jax.lax.fori_loop(1, 64, body, 0)


@partial(jax.jit, static_argnames=("linear_light", "sample_kind",
                                   "interpret"))
def frontend_groups(pixels: jnp.ndarray, *, linear_light: bool,
                    sample_kind: str, interpret: bool = False):
    """pixels [G, 256, 256, 3] -> (q [G, 1024, 3, 64] i32 emission order,
    dc [G, 32, 32, 3] i32 storage order)."""
    g = pixels.shape[0]
    scale = {"uint8": 1.0 / 255.0, "uint16": 1.0 / 65535.0,
             "float32": 1.0}[sample_kind]
    kernel = partial(_kernel, linear_light=linear_light, sample_scale=scale,
                     integer_samples=sample_kind != "float32")
    px_cm = pixels.transpose(0, 3, 1, 2)   # channel-major
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 3, 256, 256), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((256, 256), lambda i, *_: (0, 0)),
            pl.BlockSpec((8, 256, 32), lambda i, *_: (0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, 64, 32, 32), lambda i, *_: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, 3, 32, 32), lambda i, *_: (i, 0, 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((3, 256, 256), jnp.float32)],
    )
    q_t, dc_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((g, 3, 64, 32, 32), jnp.int32),
            jax.ShapeDtypeStruct((g, 3, 32, 32), jnp.int32),
        ),
        interpret=interpret,
    )(jnp.asarray(tables.ZIGZAG_KY.astype(np.int32)),
      jnp.asarray(tables.ZIGZAG_KX.astype(np.int32)),
      jnp.asarray(_HF_W_SCALED.reshape(-1)),
      px_cm, jnp.asarray(_DCT_L), jnp.asarray(_CSEL))
    # tile-major -> emission layout (XLA transposes outside the kernel)
    q = q_t.transpose(0, 3, 4, 1, 2).reshape(g, 1024, 3, 64)
    dc = dc_t.transpose(0, 2, 3, 1)
    return q, dc
