#!/usr/bin/env python
"""On-chip breakdown of the packed pipeline's device time (the gap
between the 4.3 ms unpacked front and the ~34 ms packed pipeline on a
2048^2 LF group -- ARTIFACTS.json device_plane).

Times each stage with the same on-device fori-loop trick bench.py's
device_plane uses (host timing of async dispatches is meaningless over
the axon tunnel).  Prints one JSON line of ms-per-LFG per stage.

Usage: python scripts/pack_profile.py [iters]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main(iters: int = 30) -> dict:
    import jax
    import jax.numpy as jnp

    from hydrium_tpu.jxl.tokcode import TokenCodec
    from hydrium_tpu.ops import tables
    from hydrium_tpu.ops import pipeline as P

    rng = np.random.default_rng(0)
    h = w = 2048
    base = 128 + 80 * np.sin(np.arange(w, dtype=np.float32) / 97.0)
    img = np.clip(base[None, :, None]
                  + rng.normal(0, 24, (h, w, 3)), 0, 255).astype(np.uint8)
    cm = tables.hf_cluster_map(1)
    lens, codes, _ = TokenCodec().tables()
    px = jnp.asarray(img)
    presets = jnp.zeros(64, jnp.int32)
    cm_d = jnp.asarray(cm)
    lens_d, codes_d = jnp.asarray(lens), jnp.asarray(codes)
    kw = dict(buf_h=2048, buf_w=2048, linear_light=False, num_clusters=9,
              sample_kind="uint8", use_pallas=False)

    # representative token-stream shapes: F fields of ~geometric widths
    F = 2048 * 2048 * 3  # one field per coefficient slot
    widths = np.minimum(1 + rng.geometric(0.45, F), 12).astype(np.int32)
    vals = (rng.integers(0, 1 << 30, F, dtype=np.int64)
            & ((1 << widths.astype(np.int64)) - 1)).astype(np.uint32)
    vals_d, widths_d = jnp.asarray(vals), jnp.asarray(widths)

    out = {"metric": "packed-pipeline stage breakdown, 2048^2 LFG",
           "unit": "ms", "backend": jax.default_backend(), "iters": iters}

    def timeit(name, fn, *args):
        # fn(carry, *args) MUST thread the carry into its inputs, so the
        # loop body stays loop-carried (else XLA hoists it out and the
        # measurement collapses to ~0); the sum-probe keeps the whole
        # result live (element-0 probes let XLA dead-code the stage).
        @jax.jit
        def loop(n, *a):
            def body(_i, carry):
                r = fn(carry, *a)
                probe = jnp.sum(r.astype(jnp.float32)).astype(jnp.uint32)
                return (probe >> jnp.uint32(31)).astype(jnp.int32)
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        np.asarray(loop(1, *args))
        # min-of-3 for both the overhead and the timed loop: a single
        # slow tunnel readback otherwise contaminates the subtraction
        overhead = min(_t(lambda: np.asarray(loop(1, *args)))
                       for _ in range(3))
        total = min(_t(lambda: np.asarray(loop(iters, *args)))
                    for _ in range(3))
        ms = max(total - overhead, 0.0) / max(iters - 1, 1) * 1e3
        out[name + "_ms"] = round(ms, 3)
        print(f"  {name}: {ms:.3f} ms", file=sys.stderr, flush=True)

    # full packed pipeline and unpacked front, for reference
    timeit("full_packed", lambda c, p: P.encode_lfg_packed(
        p, 2048 + c, 2048, presets, cm_d, lens_d, codes_d,
        **kw)["combined"], px)
    timeit("front_unpacked", lambda c, p: P.encode_lfg(
        p, 2048 + c, 2048, presets, cm_d, **kw)["tokens"], px)

    # token-shaped bitpack: MXU one-hot form vs scatter form
    TOK_OW = P.TOK_OW
    timeit("tok_pack_mxu", lambda c, v, nb: P._bitpack_v3(
        v ^ c.astype(jnp.uint32), nb, P.TOK_CHUNK, TOK_OW,
        (F * 13) // 32, True, 12)[0], vals_d, widths_d)
    timeit("tok_pack_scatter", lambda c, v, nb: P._bitpack_v3(
        v ^ c.astype(jnp.uint32), nb, P.TOK_CHUNK, TOK_OW,
        (F * 13) // 32, False, 12)[0], vals_d, widths_d)

    # pack WITHOUT the final compaction: one-hot chunks only
    def chunks_only(c, v, nb):
        lanes, qbits = P._quad_fields(v ^ c.astype(jnp.uint32), nb, 12)
        chunks, chunk_bits, _ok = P._onehot_pack_chunks(
            lanes, qbits, P.TOK_CHUNK // 4, TOK_OW)
        return chunks

    timeit("tok_onehot_chunks", chunks_only, vals_d, widths_d)

    def quads_only(c, v, nb):
        lanes, qbits = P._quad_fields(v ^ c.astype(jnp.uint32), nb, 12)
        return lanes[0]

    timeit("tok_quad_fields", quads_only, vals_d, widths_d)

    # the merge kernel's XLA-side input prep: quad -> oct -> bit-reversed
    # column layout (ops/pallas/bitpack.merge_pack_chunks' pre-kernel
    # work); attributes how much of tok_pack_mxu is NOT the kernel
    def merge_input_prep(c, v, nb):
        from hydrium_tpu.ops.pallas import bitpack as B

        lanes, qbits = P._quad_fields(v ^ c.astype(jnp.uint32), nb, 12)
        octs, obits = B._oct_fields(lanes, qbits, 12)
        opc = P.TOK_CHUNK // 8
        R_ = obits.shape[0] // opc
        CB = B.CB
        Rp = ((R_ + CB - 1) // CB) * CB
        if Rp != R_:
            pad = (Rp - R_) * opc
            octs = tuple(jnp.concatenate([o, jnp.zeros((pad,), o.dtype)])
                         for o in octs)
            obits = jnp.concatenate([obits,
                                     jnp.zeros((pad,), obits.dtype)])
        Bn = Rp // CB
        rev = B._bitrev_indices(opc)
        cols = opc * CB

        def to_cols(a):
            return a.reshape(Bn, CB, opc)[:, :, rev].transpose(
                0, 2, 1).reshape(Bn, 1, cols)

        vals = jnp.concatenate([to_cols(o.astype(jnp.uint32))
                                for o in octs], axis=1)
        return vals

    timeit("tok_merge_input_prep", merge_input_prep, vals_d, widths_d)

    # residue-shaped pack (fast budget: 15-bit fields, 2048-slot chunks)
    rw = np.minimum(widths, 10)
    rv = vals & ((1 << rw.astype(np.int64)) - 1).astype(np.uint32)
    timeit("res_pack_mxu", lambda c, v, nb: P._bitpack_v3(
        v ^ c.astype(jnp.uint32), nb, P.RES_CHUNK, P.RES_OW_FAST,
        (F // P.RES_CHUNK) * (P.RES_OW_FAST - P.RES_LANES_FAST), True,
        P.RES_CAP_FAST)[0], jnp.asarray(rv), jnp.asarray(rw))

    # token one-hot code lookup + per-class histogram (the MXU branch of
    # encode_lfg_packed's transport coding)
    t_idx = jnp.asarray((vals % 64).astype(np.int32))
    cls9 = jnp.asarray((vals % 9).astype(np.int32))

    def lookup(c, ti, cl):
        ti = (ti + c) % 64
        oh_tok = (ti[:, None] == jnp.arange(64, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
        oh_cls = (cl[:, None] == jnp.arange(9, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
        tab = jnp.ones((64, 27), jnp.bfloat16)
        R_ = jnp.dot(oh_tok, tab, preferred_element_type=jnp.float32)
        oh_f32 = oh_cls.astype(jnp.float32)
        lo = jnp.sum(R_[:, :9] * oh_f32, axis=1)
        hist = jnp.dot(oh_cls.T, oh_tok, preferred_element_type=jnp.float32)
        return lo.astype(jnp.uint32) + hist.astype(jnp.uint32).sum()

    timeit("tok_code_lookup_hist", lookup, t_idx, cls9)

    # the same two pieces separately: the code/len lookup dot alone,
    # and the [9,M]x[M,64] histogram contraction alone -- which one to
    # move into a kernel depends on this split
    def lookup_only(c, ti, cl):
        ti = (ti + c) % 64
        oh_tok = (ti[:, None] == jnp.arange(64, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
        oh_cls = (cl[:, None] == jnp.arange(9, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
        tab = jnp.ones((64, 27), jnp.bfloat16)
        R_ = jnp.dot(oh_tok, tab, preferred_element_type=jnp.float32)
        oh_f32 = oh_cls.astype(jnp.float32)
        lo = jnp.sum(R_[:, :9] * oh_f32, axis=1)
        hi = jnp.sum(R_[:, 9:18] * oh_f32, axis=1)
        ln = jnp.sum(R_[:, 18:] * oh_f32, axis=1)
        return (lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << 6)
                | ln.astype(jnp.uint32))

    timeit("tok_lookup_only", lookup_only, t_idx, cls9)

    def hist_only(c, ti, cl):
        ti = (ti + c) % 64
        oh_tok = (ti[:, None] == jnp.arange(64, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
        oh_cls = (cl[:, None] == jnp.arange(9, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
        hist = jnp.dot(oh_cls.T, oh_tok, preferred_element_type=jnp.float32)
        return hist.astype(jnp.uint32)

    timeit("tok_hist_only", hist_only, t_idx, cls9)

    # compaction alone: token-shaped chunks -> contiguous words
    def compact_only(c, v, nb):
        lanes, qbits = P._quad_fields(v ^ c.astype(jnp.uint32), nb, 12)
        if jax.devices()[0].platform == "tpu" and os.environ.get(
                "HYDRIUM_PLPACK", "1") != "0":
            from hydrium_tpu.ops.pallas.bitpack import merge_pack_chunks

            chunks, chunk_bits = merge_pack_chunks(lanes, qbits,
                                                   P.TOK_CHUNK, TOK_OW, 12)
        else:
            chunks, chunk_bits, _ok = P._onehot_pack_chunks(
                lanes, qbits, P.TOK_CHUNK // 4, TOK_OW)
        nw = (chunk_bits + 31) >> 5
        return P._overwrite_compact(chunks, nw, (F * 13) // 32)

    timeit("tok_pack_with_compact", compact_only, vals_d, widths_d)

    # hybridize + LF pack shapes (the remaining packed-pipeline pieces)
    lfv = jnp.asarray(rng.integers(0, 1 << 12, 256 * 256 * 3,
                                   dtype=np.int64).astype(np.uint32))

    def lf_shape(c, v):
        v = v ^ c.astype(jnp.uint32)
        tok, res, rb8 = P.hybridize(v)
        nb = jnp.minimum(tok, 63) + rb8.astype(jnp.int32)
        w, t, _ = P._bitpack_mxu((res,), jnp.minimum(nb, 32),
                                 v.shape[0] + v.shape[0] // 2, ch=2048,
                                 max_field_bits=32)
        return w

    timeit("lf_pack_shape", lf_shape, lfv)

    # --- cumulative composition of the REAL production stage helpers
    # (the pure-code-motion split of encode_lfg_packed; cache keys
    # unchanged).  Deltas between consecutive rows attribute the FULL
    # pipeline's composed cost -- fusion effects included -- which the
    # standalone stages above cannot: full_packed has historically run
    # ~10 ms above the sum of the isolated stages.
    def cum_front(c, p):
        o = P.encode_lfg(p, 2048 + c, 2048, presets, cm_d,
                         clusters_per_preset=9, **kw)
        return (jnp.sum(o["tokens"].astype(jnp.float32))
                + jnp.sum(o["residues"].astype(jnp.float32))
                + jnp.sum(o["lf_res"].astype(jnp.float32)))

    timeit("cum1_front", cum_front, px)

    def cum_transport(c, p):
        o = P.encode_lfg(p, 2048 + c, 2048, presets, cm_d,
                         clusters_per_preset=9, **kw)
        t_flat, t_bits, h64, r_flat, r_bits, ok = P._hf_transport_streams(
            o, lens_d, codes_d, 9)
        return (jnp.sum(t_flat.astype(jnp.float32))
                + jnp.sum(t_bits.astype(jnp.float32))
                + jnp.sum(h64.astype(jnp.float32))
                + jnp.sum(r_flat.astype(jnp.float32))
                + jnp.sum(r_bits.astype(jnp.float32))
                + ok.astype(jnp.float32)
                + jnp.sum(o["lf_res"].astype(jnp.float32)))

    timeit("cum2_transport", cum_transport, px)

    def cum_packs(c, p):
        o = P.encode_lfg(p, 2048 + c, 2048, presets, cm_d,
                         clusters_per_preset=9, **kw)
        t_flat, t_bits, h64, r_flat, r_bits, ok = P._hf_transport_streams(
            o, lens_d, codes_d, 9)
        M_ = t_flat.shape[0]
        (tw_, tn_, rw_, rn_, rcb_, tt_, rt_, rok_, _tc,
         _rc) = P._hf_pack_streams(t_flat, t_bits, r_flat, r_bits, M_,
                                   False)
        return (jnp.sum(tw_.astype(jnp.float32))
                + jnp.sum(rw_.astype(jnp.float32))
                + jnp.sum(h64.astype(jnp.float32))
                + tt_.astype(jnp.float32) + rt_.astype(jnp.float32)
                + rok_.astype(jnp.float32)
                + jnp.sum(o["lf_res"].astype(jnp.float32)))

    timeit("cum3_packs", cum_packs, px)

    def cum_lf(c, p):
        o = P.encode_lfg(p, 2048 + c, 2048, presets, cm_d,
                         clusters_per_preset=9, **kw)
        t_flat, t_bits, h64, r_flat, r_bits, ok = P._hf_transport_streams(
            o, lens_d, codes_d, 9)
        M_ = t_flat.shape[0]
        (tw_, tn_, rw_, rn_, rcb_, tt_, rt_, rok_, _tc,
         _rc) = P._hf_pack_streams(t_flat, t_bits, r_flat, r_bits, M_,
                                   False)
        (lw_, lt_, hlf_, lok_, lff_, lfw_, _lc) = P._lf_pack_stream(
            o, lens_d, codes_d, False)
        return (jnp.sum(tw_.astype(jnp.float32))
                + jnp.sum(rw_.astype(jnp.float32))
                + jnp.sum(h64.astype(jnp.float32))
                + jnp.sum(lw_.astype(jnp.float32))
                + jnp.sum(hlf_.astype(jnp.float32))
                + lt_.astype(jnp.float32))

    timeit("cum4_lf", cum_lf, px)
    # delta(full_packed - cum4_lf) = per-group sums + ok/aux/checksums +
    # the combined-buffer assembly

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    it = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    main(it)
