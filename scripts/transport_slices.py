#!/usr/bin/env python
"""Fine-grained on-chip attribution of the packed pipeline's composed
transport-prep cost (cum2 - cum1 in scripts/pack_profile.py, ~13 ms vs
~2 ms isolated).  Slices:

  s0_front      encode_lfg alone
  s1_flats      + the flat i8/u32 mask/flatten chains (production exprs)
  s2_lookup     + the one-hot transport code/len matmuls
  s3_hist       + the sampled per-class histogram (== cum2_transport)
  s4_noflat     VARIANT: lookup/hist computed in [N,64] layout via
                einsum (no [M] flatten before the matmuls); only the
                four pack inputs flatten at the end
  s5_relayout1  front + ONE [N,64]u16 -> [M]i8 masked flatten (unit
                cost of a single relayout chain)

Usage: python scripts/transport_slices.py [iters]
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


def main(iters: int = 20) -> dict:
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
              sample_kind="uint8", use_pallas=False,
              clusters_per_preset=9)

    out = {"metric": "transport-prep composed slices, 2048^2 LFG",
           "unit": "ms", "backend": jax.default_backend(), "iters": iters,
           "barrier": P.TRANSPORT_BARRIER}

    only = (set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None)

    def timeit(name, fn, *args):
        if only is not None and name not in only:
            return

        @jax.jit
        def loop(n, *a):
            def body(_i, carry):
                r = fn(carry, *a)
                probe = jnp.sum(r.astype(jnp.float32)).astype(jnp.uint32)
                return (probe >> jnp.uint32(31)).astype(jnp.int32)
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        np.asarray(loop(1, *args))
        overhead = min(_t(lambda: np.asarray(loop(1, *args)))
                       for _ in range(3))
        total = min(_t(lambda: np.asarray(loop(iters, *args)))
                    for _ in range(3))
        ms = max(total - overhead, 0.0) / max(iters - 1, 1) * 1e3
        out[name + "_ms"] = round(ms, 3)
        print(f"  {name}: {ms:.3f} ms", file=sys.stderr, flush=True)

    def front(c, p):
        return P.encode_lfg(p, 2048 + c, 2048, presets, cm_d, **kw)

    def flats(o):
        """The production TPU-branch flat chains (pipeline.py
        _hf_transport_streams; keep in sync)."""
        tokens, residues = o["tokens"], o["residues"]
        residue_bits, valid_len = o["residue_bits"], o["valid_len"]
        N = valid_len.shape[0]
        M = N * 64
        valid = (jnp.arange(64)[None, :] < valid_len[:, None])
        t_i8 = jnp.where(valid, jnp.minimum(tokens, 63), 0).astype(
            jnp.int8).reshape(M)
        cls8 = (o["clusters"].astype(jnp.int32) % 9).astype(
            jnp.int8).reshape(M)
        mask8 = valid.astype(jnp.int8).reshape(M)
        r_flat = jnp.where(valid, residues, 0).reshape(M)
        rb8 = jnp.where(valid, residue_bits, 0).reshape(M)
        return jax.lax.optimization_barrier((t_i8, cls8, mask8, r_flat,
                                             rb8))

    def s0(c, p):
        o = front(c, p)
        return (jnp.sum(o["tokens"].astype(jnp.float32))
                + jnp.sum(o["residues"].astype(jnp.float32)))

    timeit("s0_front", s0, px)

    def s1(c, p):
        o = front(c, p)
        t_i8, cls8, mask8, r_flat, rb8 = flats(o)
        return (jnp.sum(t_i8.astype(jnp.float32))
                + jnp.sum(cls8.astype(jnp.float32))
                + jnp.sum(mask8.astype(jnp.float32))
                + jnp.sum(r_flat.astype(jnp.float32))
                + jnp.sum(rb8.astype(jnp.float32)))

    timeit("s1_flats", s1, px)

    def lookup(t_idx, cls, mask_i32):
        oh_tok = (t_idx[:, None] == jnp.arange(64, dtype=jnp.int32)[None,
                  :]).astype(jnp.bfloat16)
        oh_cls = (cls[:, None] == jnp.arange(9, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
        codes9 = codes_d.reshape(-1, 64)[:9]
        tab_lo = (codes9 & 63).T.astype(jnp.bfloat16)
        tab_hi = (codes9 >> 6).T.astype(jnp.bfloat16)
        tab_len = lens_d.reshape(-1, 64)[:9].T.astype(jnp.bfloat16)
        R = jnp.dot(oh_tok, jnp.concatenate([tab_lo, tab_hi, tab_len],
                                            axis=1),
                    preferred_element_type=jnp.float32)
        oh_f32 = oh_cls.astype(jnp.float32)
        lo_f = jnp.sum(R[:, :9] * oh_f32, axis=1)
        hi_f = jnp.sum(R[:, 9:18] * oh_f32, axis=1)
        len_f = jnp.sum(R[:, 18:] * oh_f32, axis=1)
        code_u = lo_f.astype(jnp.uint32) | (hi_f.astype(jnp.uint32) << 6)
        t_flat = jnp.where(mask_i32 > 0, code_u, 0)
        t_bits = len_f.astype(jnp.int32) * mask_i32
        return t_flat, t_bits, oh_tok, oh_cls

    def s2(c, p):
        o = front(c, p)
        t_i8, cls8, mask8, r_flat, rb8 = flats(o)
        t_flat, t_bits, _, _ = lookup(t_i8.astype(jnp.int32),
                                      cls8.astype(jnp.int32),
                                      mask8.astype(jnp.int32))
        return (jnp.sum(t_flat.astype(jnp.float32))
                + jnp.sum(t_bits.astype(jnp.float32))
                + jnp.sum(r_flat.astype(jnp.float32))
                + jnp.sum(rb8.astype(jnp.float32)))

    timeit("s2_lookup", s2, px)

    def s3(c, p):
        o = front(c, p)
        t_flat, t_bits, h64, r_flat, r_bits, ok = P._hf_transport_streams(
            o, lens_d, codes_d, 9)
        return (jnp.sum(t_flat.astype(jnp.float32))
                + jnp.sum(t_bits.astype(jnp.float32))
                + jnp.sum(h64.astype(jnp.float32))
                + jnp.sum(r_flat.astype(jnp.float32))
                + jnp.sum(r_bits.astype(jnp.float32))
                + ok.astype(jnp.float32))

    timeit("s3_hist_cum2", s3, px)

    def s4(c, p):
        """No-flatten variant: one-hots and histogram in [N,64] layout;
        only the four pack inputs reshape to [M] at the end."""
        o = front(c, p)
        tokens, residues = o["tokens"], o["residues"]
        residue_bits, valid_len = o["residue_bits"], o["valid_len"]
        N = valid_len.shape[0]
        M = N * 64
        valid = (jnp.arange(64)[None, :] < valid_len[:, None])
        t_idx = jnp.where(valid, jnp.minimum(tokens, 63),
                          0).astype(jnp.int32)          # [N, 64]
        cls = o["clusters"].astype(jnp.int32) % 9       # [N, 64]
        mask = valid.astype(jnp.int32)
        oh_tok = (t_idx[:, :, None]
                  == jnp.arange(64, dtype=jnp.int32)).astype(jnp.bfloat16)
        oh_cls = (cls[:, :, None]
                  == jnp.arange(9, dtype=jnp.int32)).astype(jnp.bfloat16)
        codes9 = codes_d.reshape(-1, 64)[:9]
        tab = jnp.concatenate([(codes9 & 63).T.astype(jnp.bfloat16),
                               (codes9 >> 6).T.astype(jnp.bfloat16),
                               lens_d.reshape(-1, 64)[:9].T.astype(
                                   jnp.bfloat16)], axis=1)
        R = jnp.einsum("nst,tk->nsk", oh_tok, tab,
                       preferred_element_type=jnp.float32)
        oh_f32 = oh_cls.astype(jnp.float32)
        lo_f = jnp.sum(R[:, :, :9] * oh_f32, axis=2)
        hi_f = jnp.sum(R[:, :, 9:18] * oh_f32, axis=2)
        len_f = jnp.sum(R[:, :, 18:] * oh_f32, axis=2)
        code_u = lo_f.astype(jnp.uint32) | (hi_f.astype(jnp.uint32) << 6)
        t_flat = jnp.where(mask > 0, code_u, 0).reshape(M)
        t_bits = (len_f.astype(jnp.int32) * mask).reshape(M)
        HS = 4
        hist = jnp.einsum("nsc,nst->ct",
                          (oh_cls * mask.astype(jnp.bfloat16)[..., None]
                           )[::HS],
                          oh_tok[::HS],
                          preferred_element_type=jnp.float32)
        h64 = (hist.astype(jnp.int32) * HS).reshape(-1)
        r_flat = jnp.where(valid, residues, 0).reshape(M)
        r_bits = jnp.where(valid, residue_bits.astype(jnp.int32),
                           0).reshape(M)
        return (jnp.sum(t_flat.astype(jnp.float32))
                + jnp.sum(t_bits.astype(jnp.float32))
                + jnp.sum(h64.astype(jnp.float32))
                + jnp.sum(r_flat.astype(jnp.float32))
                + jnp.sum(r_bits.astype(jnp.float32)))

    timeit("s4_noflat", s4, px)

    def s5(c, p):
        o = front(c, p)
        valid = (jnp.arange(64)[None, :]
                 < o["valid_len"][:, None])
        t_i8 = jnp.where(valid, jnp.minimum(o["tokens"], 63), 0).astype(
            jnp.int8).reshape(-1)
        (t_i8,) = jax.lax.optimization_barrier((t_i8,))
        return jnp.sum(t_i8.astype(jnp.float32))

    timeit("s5_relayout1", s5, px)

    def packed16(o):
        """All five per-slot transport fields in ONE u16 [N,64] array:
        token(6) | cls(4) | mask(1) | rbits(5) -- elementwise, so it
        fuses into the front; only TWO arrays then cross the
        [N,64]->[M] relayout (this + residues)."""
        valid = (jnp.arange(64)[None, :] < o["valid_len"][:, None])
        t_idx = jnp.where(valid, jnp.minimum(o["tokens"], 63), 0)
        cls = (o["clusters"].astype(jnp.int32) % 9).astype(jnp.uint16)
        p16 = (t_idx.astype(jnp.uint16) | (cls << 6)
               | (valid.astype(jnp.uint16) << 10)
               | (jnp.where(valid, o["residue_bits"], 0)
                  .astype(jnp.uint16) << 11))
        r_flat = jnp.where(valid, o["residues"], 0).reshape(-1)
        return jax.lax.optimization_barrier((p16.reshape(-1), r_flat))

    def s6(c, p):
        """packed16 full replacement: 2 relayouts + unpack + lookup +
        sampled hist (the candidate production form)."""
        o = front(c, p)
        p16, r_flat = packed16(o)
        pi = p16.astype(jnp.int32)
        t_idx = pi & 63
        cls = (pi >> 6) & 15
        mask_i32 = (pi >> 10) & 1
        r_bits = (pi >> 11) & 31
        t_flat, t_bits, oh_tok, oh_cls = lookup(t_idx, cls, mask_i32)
        N = o["valid_len"].shape[0]
        HS = 4
        t_h = t_idx.reshape(N, 64)[::HS].reshape(-1)
        c_h = cls.reshape(N, 64)[::HS].reshape(-1)
        m_h = mask_i32.reshape(N, 64)[::HS].reshape(-1)
        oh_tok_h = (t_h[:, None] == jnp.arange(64, dtype=jnp.int32)[None,
                    :]).astype(jnp.bfloat16)
        oh_cls_h = (c_h[:, None] == jnp.arange(9, dtype=jnp.int32)[None,
                    :]).astype(jnp.bfloat16)
        hist64 = jnp.dot((oh_cls_h * m_h[:, None].astype(jnp.bfloat16)).T,
                         oh_tok_h, preferred_element_type=jnp.float32)
        h64 = (hist64.astype(jnp.int32) * HS).reshape(-1)
        return (jnp.sum(t_flat.astype(jnp.float32))
                + jnp.sum(t_bits.astype(jnp.float32))
                + jnp.sum(h64.astype(jnp.float32))
                + jnp.sum(r_flat.astype(jnp.float32))
                + jnp.sum(r_bits.astype(jnp.float32)))

    timeit("s6_packed16", s6, px)

    def s7(c, p):
        """Single u16 relayout (dtype effect vs s5's i8)."""
        o = front(c, p)
        p16, r_flat = packed16(o)
        return (jnp.sum(p16.astype(jnp.float32))
                + jnp.sum(r_flat.astype(jnp.float32)))

    timeit("s7_packed16_flats", s7, px)

    def s8(c, p):
        """PURE reshape [N,64]u16 -> [M] (no mask/where/cast): is the
        relayout itself or the masked-where chain the cost?"""
        o = front(c, p)
        t = o["tokens"].reshape(-1)
        (t,) = jax.lax.optimization_barrier((t,))
        return jnp.sum(t.astype(jnp.float32))

    timeit("s8_reshape_only", s8, px)

    def s9(c, p):
        """Masked where in [N,64] WITHOUT reshape (mask cost alone)."""
        o = front(c, p)
        valid = (jnp.arange(64)[None, :] < o["valid_len"][:, None])
        t = jnp.where(valid, jnp.minimum(o["tokens"], 63), 0).astype(
            jnp.uint16)
        (t,) = jax.lax.optimization_barrier((t,))
        return jnp.sum(t.astype(jnp.float32))

    timeit("s9_mask_only", s9, px)

    def s10(c, p):
        """Lookup fed from FRESH iota-derived flat arrays inside the
        same jit as the front (matmul cost with clean operands while
        composed -- distinguishes layout poisoning from plain
        composition effects)."""
        o = front(c, p)
        M = o["valid_len"].shape[0] * 64
        base = (jnp.arange(M, dtype=jnp.int32)
                + jnp.sum(o["valid_len"]))       # depends on front
        t_idx = base & 63
        cls = (base >> 6) % 9
        mask = (base >> 1) & 1
        t_flat, t_bits, _, _ = lookup(t_idx, cls, mask)
        return (jnp.sum(t_flat.astype(jnp.float32))
                + jnp.sum(t_bits.astype(jnp.float32)))

    timeit("s10_lookup_clean", s10, px)

    def _packed_tab():
        """tab[cls,tok] -> lo|hi<<6|len<<12 (16 bits), split into two
        8-bit halves (bf16-exact)."""
        codes9 = codes_d.reshape(-1, 64)[:9]
        lens9 = lens_d.reshape(-1, 64)[:9]
        val = ((codes9 & 63) | (((codes9 >> 6) & 63) << 6)
               | (lens9 << 12)).astype(jnp.uint32)      # [9, 64]
        v = val.reshape(-1)                             # [576] cls*64+tok
        return (jnp.stack([(v & 255).astype(jnp.bfloat16),
                           (v >> 8).astype(jnp.bfloat16)], axis=1))

    def s11(c, p):
        """Single 576-wide one-hot dot, values/mask unmasked (beyond-
        valid slots are structurally zero), packed 2-halves table."""
        o = front(c, p)
        N = o["valid_len"].shape[0]
        M = N * 64
        valid = (jnp.arange(64)[None, :] < o["valid_len"][:, None])
        t_idx = jnp.minimum(o["tokens"], 63).astype(jnp.int32).reshape(M)
        cls = (o["clusters"].astype(jnp.int32) % 9).reshape(M)
        mask_i32 = valid.astype(jnp.int32).reshape(M)
        idx576 = cls * 64 + t_idx
        oh = (idx576[:, None] == jnp.arange(576, dtype=jnp.int32)[None, :]
              ).astype(jnp.bfloat16)
        R2 = jnp.dot(oh, _packed_tab(),
                     preferred_element_type=jnp.float32)      # [M, 2]
        v = (R2[:, 0].astype(jnp.uint32)
             | (R2[:, 1].astype(jnp.uint32) << 8))
        code_u = v & 4095
        lenb = (v >> 12).astype(jnp.int32)
        t_flat = jnp.where(mask_i32 > 0, code_u, 0)
        t_bits = lenb * mask_i32
        return (jnp.sum(t_flat.astype(jnp.float32))
                + jnp.sum(t_bits.astype(jnp.float32)))

    timeit("s11_dot576", s11, px)

    def s12(c, p):
        """Two-stage with packed halves: [M,64]oh dot [64,18] -> class
        select of 2 halves (intermediate [M,18] bf16-exact)."""
        o = front(c, p)
        N = o["valid_len"].shape[0]
        M = N * 64
        valid = (jnp.arange(64)[None, :] < o["valid_len"][:, None])
        t_idx = jnp.minimum(o["tokens"], 63).astype(jnp.int32).reshape(M)
        cls = (o["clusters"].astype(jnp.int32) % 9).reshape(M)
        mask_i32 = valid.astype(jnp.int32).reshape(M)
        tab2 = _packed_tab().reshape(9, 64, 2)           # [cls, tok, 2]
        tab18 = tab2.transpose(1, 0, 2).reshape(64, 18)  # tok -> (cls,2)
        oh_tok = (t_idx[:, None] == jnp.arange(64, dtype=jnp.int32)[None,
                  :]).astype(jnp.bfloat16)
        R = jnp.dot(oh_tok, tab18,
                    preferred_element_type=jnp.float32)  # [M, 18]
        oh_cls = (cls[:, None] == jnp.arange(9, dtype=jnp.int32)[None, :]
                  ).astype(jnp.float32)
        Rv = R.reshape(-1, 9, 2)
        lo8 = jnp.sum(Rv[:, :, 0] * oh_cls, axis=1)
        hi8 = jnp.sum(Rv[:, :, 1] * oh_cls, axis=1)
        v = lo8.astype(jnp.uint32) | (hi8.astype(jnp.uint32) << 8)
        code_u = v & 4095
        lenb = (v >> 12).astype(jnp.int32)
        t_flat = jnp.where(mask_i32 > 0, code_u, 0)
        t_bits = lenb * mask_i32
        return (jnp.sum(t_flat.astype(jnp.float32))
                + jnp.sum(t_bits.astype(jnp.float32)))

    timeit("s12_dot18", s12, px)

    def s13(c, p):
        """Materialize the prep kernel's five RAW inputs (no masks, no
        casts, no flatten): the cost of the front handing its tensors
        to a pallas_call."""
        o = front(c, p)
        t, cl, rs, rb, vl = jax.lax.optimization_barrier(
            (o["tokens"], o["clusters"], o["residues"],
             o["residue_bits"], o["valid_len"]))
        return (jnp.sum(t.astype(jnp.float32))
                + jnp.sum(cl.astype(jnp.float32))
                + jnp.sum(rs.astype(jnp.float32))
                + jnp.sum(rb.astype(jnp.float32))
                + jnp.sum(vl.astype(jnp.float32)))

    timeit("s13_raw_inputs", s13, px)

    if jax.devices()[0].platform == "tpu":
        from hydrium_tpu.ops.pallas.prep import transport_prep

        def s15(c, p):
            """front + prep kernel only (no hist, no tok_ok): the
            production composition minus the XLA remnants."""
            o = front(c, p)
            t_flat, t_bits, r_flat, r_bits = transport_prep(
                o["tokens"], o["clusters"], o["valid_len"],
                o["residues"], o["residue_bits"], lens_d, codes_d,
                tok_classes=9)
            return (jnp.sum(t_flat.astype(jnp.float32))
                    + jnp.sum(t_bits.astype(jnp.float32))
                    + jnp.sum(r_flat.astype(jnp.float32))
                    + jnp.sum(r_bits.astype(jnp.float32)))

        timeit("s15_front_kernel", s15, px)

        def s16(c, p):
            """front + sampled hist + tok_ok only (no kernel)."""
            o = front(c, p)
            HS = 4
            tok_s = o["tokens"][::HS]
            cls_s = o["clusters"][::HS]
            vl_s = o["valid_len"][::HS]
            valid_s = (jnp.arange(64)[None, :] < vl_s[:, None])
            t_h = jnp.where(valid_s, jnp.minimum(tok_s, 63), 0).astype(
                jnp.int32).reshape(-1)
            c_h = (cls_s.astype(jnp.int32) % 9).reshape(-1)
            m_h = valid_s.astype(jnp.int32).reshape(-1)
            oh_tok_h = (t_h[:, None] == jnp.arange(
                64, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
            oh_cls_h = (c_h[:, None] == jnp.arange(
                9, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
            hist64 = jnp.dot(
                (oh_cls_h * m_h[:, None].astype(jnp.bfloat16)).T,
                oh_tok_h, preferred_element_type=jnp.float32)
            valid = (jnp.arange(64)[None, :] < o["valid_len"][:, None])
            ok = jnp.all(jnp.where(valid, o["tokens"], 0) < 64)
            return (jnp.sum(hist64) + ok.astype(jnp.float32))

        timeit("s16_front_hist_ok", s16, px)

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    it = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    main(it)
