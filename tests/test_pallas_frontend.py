"""Pallas fused frontend vs the XLA pipeline (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from hydrium_tpu.ops import pipeline, tables
from hydrium_tpu.ops.pallas.frontend import frontend_groups


def test_pallas_frontend_matches_xla():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, 256, 256, 3), dtype=np.uint8)
    q, dc = frontend_groups(jnp.asarray(img), linear_light=False,
                            sample_kind="uint8", interpret=True)
    q, dc = np.array(q), np.array(dc)

    cm = tables.hf_cluster_map(1)
    for gi in range(2):
        out = pipeline.encode_lfg(
            jnp.asarray(img[gi]), 256, 256, jnp.zeros(1, jnp.int32),
            jnp.asarray(cm), buf_h=256, buf_w=256, linear_light=False,
            num_clusters=9, sample_kind="uint8")
        lf_ref = np.array(out["lf_q"])
        # LF: identical up to the cbrt implementation (exp/log vs cbrt);
        # quantized ints may differ by at most 1 on a tiny fraction
        d = np.abs(dc[gi].astype(np.int64) - lf_ref)
        assert np.mean(d > 1) == 0 and np.mean(d == 1) < 0.02

        # HF: compare against re-derived tokens -- the valid prefix is
        # content-dependent, so compare quantized ints agreement rate
        toks_ref = np.array(out["tokens"]).reshape(1024, 3, 64)
        vl_ref = np.array(out["valid_len"]).reshape(1024, 3)
        # re-tokenize pallas q through the flat tokenizer
        nz = (q[gi] != 0).sum(axis=-1).astype(np.int32)
        agree = np.mean(
            q[gi] == _ref_q_from_tokens(toks_ref, np.array(out["residues"])
                                        .reshape(1024, 3, 64), vl_ref))
        assert agree > 0.999, f"HF quant agreement {agree}"


def _ref_q_from_tokens(tokens, residues, valid_len):
    """Decode quantized values back from the XLA pipeline's tokens."""
    t = tokens.astype(np.int64)
    n = np.where(t < 16, 0, ((t - 16) >> 1) + 3)
    high = np.where(t < 16, 0, (t - 16) & 1)
    v = np.where(t < 16, t, ((2 | high) << n) | residues)
    # unpack zig-zag signed
    q = np.where(v & 1, -((v + 1) >> 1), v >> 1)
    mask = np.arange(64)[None, None, :] < valid_len[..., None]
    q = np.where(mask, q, 0)
    q[..., 0] = 0
    return q
