"""Opt-in on-chip packed-payload parity smoke (VERDICT round-2 item 7).

Runs ONE 256x256 LF group on the real TPU through BOTH device paths --
the packed pipeline (MXU one-hot transport-code lookup + histogram +
one-hot bitpack + hybrid LF pack; the `jax.default_backend() == "tpu"`
branches of ops/pipeline.py that the CPU-only CI suite never executes)
and the unpacked pipeline -- then asserts:

  1. the walked packed token stream serializes to byte-identical HF ANS
     sections as the unpacked tensors (same chip, same math, so the
     tokens must agree -- any difference is a packing/walking bug), and
  2. the format-v4 LF residual stream decodes to exactly the unpacked
     path's lf_res.

Cross-BACKEND payload equality (TPU vs host CPU) is deliberately NOT
asserted: the MXU's matmul rounding shifts a handful of near-dead-zone
quantization decisions, so the token streams legitimately differ between
backends (measured: ~0.4% of symbols on noise).  The packed-vs-unpacked
invariant on one backend is the real contract, and CI already pins it on
CPU (tests/test_pipeline_jax.py::test_packed_walk_class_count_contract).

Usage: python scripts/tpu_smoke.py   (needs the real chip; ~40 s cold)
Exit 0 = parity; nonzero = mismatch or no TPU.
"""

import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    import jax

    if jax.default_backend() != "tpu":
        print("tpu_smoke: no TPU backend available", file=sys.stderr)
        return 2
    import jax.numpy as jnp

    from hydrium_tpu.encoder import _parse_packed, packed_verify
    from hydrium_tpu.jxl.frame import HFStream, LFGroupGeometry
    from hydrium_tpu.jxl.tokcode import LF_CLASS, TokenCodec
    from hydrium_tpu.ops import pipeline, tables

    cm = tables.hf_cluster_map(1)
    lens, codes, lut = TokenCodec().tables()
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    kwargs = dict(buf_h=256, buf_w=256, linear_light=False,
                  num_clusters=9, sample_kind="uint8")
    args = (jnp.asarray(img), 256, 256, jnp.zeros((1,), jnp.int32),
            jnp.asarray(cm), jnp.asarray(lens), jnp.asarray(codes))

    out_p = pipeline.encode_lfg_packed(*args, tok_classes=9, **kwargs)
    combined = np.asarray(out_p["combined"])
    out_u = pipeline.encode_lfg(args[0], 256, 256, args[3], args[4],
                                clusters_per_preset=9, **kwargs)

    A = pipeline.packed_aux_len(256, 256)
    aux = np.ascontiguousarray(combined[:A]).view(np.int32)
    if not bool(aux[0] & 1):
        print(f"tpu_smoke: packed overflow on chip (ok={int(aux[0])})",
              file=sys.stderr)
        return 3
    if not packed_verify(aux, combined[A:], 256, 256):
        print("tpu_smoke: payload checksum mismatch", file=sys.stderr)
        return 4
    geom = LFGroupGeometry(x=0, y=0, width=256, height=256,
                           tile_count_x=1, tile_count_y=1)
    parsed = _parse_packed(aux, combined[A:], 256, 256, geom,
                           lut[LF_CLASS])
    if parsed is None:
        print("tpu_smoke: LF stream decode failed", file=sys.stderr)
        return 5

    # 1b. PXPACK v2 upload path: the double-unpack is exact integer
    # work, so feeding the same pixels through the packed-pixel
    # executable must produce a bit-identical combined payload on the
    # same backend
    from hydrium_tpu.jxl import native

    pxp = native.px_pack2(img, cap_ratio=100.0)
    if pxp is not None and pxp[0] == "px2":
        _, words, hdr2, base2, words2, meta_h, meta_w = pxp
        wpad = np.zeros(words.size + 16, np.uint32)
        wpad[:words.size] = words
        w2pad = np.zeros(words2.size + 16, np.uint32)
        w2pad[:words2.size] = words2
        out_px = pipeline.encode_lfg_packed_px2(
            jnp.asarray(wpad), jnp.asarray(hdr2), jnp.asarray(base2),
            jnp.asarray(w2pad), 256, 256, args[3], args[4], args[5],
            args[6], ubuf_h=256, ubuf_w=256, meta_h=meta_h, meta_w=meta_w,
            tok_classes=9, **kwargs)
        if not np.array_equal(np.asarray(out_px["combined"]), combined):
            print("tpu_smoke: PX2 UPLOAD PAYLOAD MISMATCH",
                  file=sys.stderr)
            return 8
    else:
        print("tpu_smoke: px_pack2 did not take the px2 path "
              "(native lib missing?)", file=sys.stderr)
        return 9

    # 2. LF residuals: packed stream must decode to the unpacked tensor
    lf_u = np.asarray(out_u["lf_res"])[:32, :32]
    if not np.array_equal(parsed["lf_res"], lf_u):
        bad = int(np.flatnonzero(parsed["lf_res"] != lf_u)[0])
        print(f"tpu_smoke: LF RESIDUAL MISMATCH at flat index {bad}",
              file=sys.stderr)
        return 6

    # 1. HF sections: walked packed stream vs unpacked tensors
    hf_a = HFStream(1)
    hf_a.add_lfg_packed(parsed["tok_words"], parsed["res_words"], lut[:9],
                        0, (1, 1), (32, 32), parsed["tok_off"],
                        parsed["res_off"], parsed["gs"])
    hf_a.encode_group_sections()
    hf_b = HFStream(1)
    hf_b.add_group_padded(
        np.asarray(out_u["tokens"]).reshape(1024, 3, 64),
        np.asarray(out_u["clusters"]).reshape(1024, 3, 64),
        np.asarray(out_u["residues"]).reshape(1024, 3, 64),
        np.asarray(out_u["residue_bits"]).reshape(1024, 3, 64),
        np.asarray(out_u["valid_len"]).reshape(1024, 3), 0)
    hf_b.encode_group_sections()
    a = [w.finalize() for w in hf_a.group_sections]
    b = [w.finalize() for w in hf_b.group_sections]
    if a != b:
        print("tpu_smoke: HF SECTION MISMATCH (packed walk != unpacked)",
              file=sys.stderr)
        return 7
    print(json.dumps({"tpu_smoke": "ok",
                      "payload_words": int(A + parsed["need_words"]),
                      "hf_section_bytes": sum(len(x) for x in a),
                      "symbols": int(parsed["gs"].sum())}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
