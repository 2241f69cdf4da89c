"""Interpret-mode equality of the transport-prep kernel
(ops/pallas/prep.py) against the production CPU expressions in
ops/pipeline._hf_transport_streams: t_flat/t_bits/r_flat/r_bits must be
bit-identical for randomized token/cluster/valid_len/residue content,
across tok_classes rules and including degenerate valid_len values."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from hydrium_tpu.ops.pallas.prep import (TR, _mod_mulshift, pack_p16,
                                          transport_prep)


def _reference(tokens, clusters, valid_len, residues, residue_bits,
               tok_len, tok_code, tok_classes):
    """The CPU branch of _hf_transport_streams, verbatim semantics."""
    N = valid_len.shape[0]
    M = N * 64
    valid = np.arange(64)[None, :] < valid_len[:, None]
    t_idx = np.where(valid, np.minimum(tokens, 63), 0).astype(
        np.int64).reshape(M)
    mask = valid.astype(np.int64).reshape(M)
    cls = (clusters.astype(np.int64) % tok_classes).reshape(M)
    ct = cls * 64 + t_idx
    t_flat = np.where(mask > 0, tok_code[ct].astype(np.uint32), 0)
    t_bits = tok_len[ct].astype(np.int64) * mask
    r_flat = np.where(valid, residues, 0).reshape(M)
    r_bits = np.where(valid, residue_bits.astype(np.int64), 0).reshape(M)
    return t_flat, t_bits, r_flat, r_bits


def _mk_tables(rng):
    lens = rng.integers(1, 13, 10 * 64).astype(np.int32)
    codes = np.empty(10 * 64, np.int32)
    for i, L in enumerate(lens):
        codes[i] = rng.integers(0, 1 << L)
    return lens, codes


@pytest.mark.parametrize("tok_classes", [9, 3, 2, 1])
def test_prep_kernel_interpret_exact(tok_classes):
    rng = np.random.default_rng(41 + tok_classes)
    N = TR  # one grid program
    tokens = rng.integers(0, 64, (N, 64)).astype(np.uint16)
    clusters = rng.integers(0, 9 * 3, (N, 64)).astype(np.uint8)
    valid_len = rng.integers(0, 65, N).astype(np.int32)
    valid_len[:7] = [0, 1, 64, 64, 0, 33, 1]
    residues = rng.integers(0, 1 << 32, (N, 64), dtype=np.uint64).astype(
        np.uint32)
    residue_bits = rng.integers(0, 31, (N, 64)).astype(np.uint8)
    # structural invariant of the pipeline: beyond-valid slots carry
    # zeroed hybridize outputs (the kernel masks anyway; keep the
    # random content there to prove the masking itself)
    lens, codes = _mk_tables(rng)

    p16 = pack_p16(jnp.asarray(tokens), jnp.asarray(clusters),
                   jnp.asarray(valid_len), jnp.asarray(residue_bits),
                   tok_classes)
    valid = np.arange(64)[None, :] < valid_len[:, None]
    resm = jnp.asarray(np.where(valid, residues, 0).astype(np.uint32))
    got = transport_prep(p16, resm, jnp.asarray(lens),
                         jnp.asarray(codes), tok_classes=tok_classes,
                         interpret=True)
    want = _reference(tokens, clusters, valid_len, residues,
                      residue_bits, lens, codes, tok_classes)
    names = ("t_flat", "t_bits", "r_flat", "r_bits")
    for g, w, n in zip(got, want, names):
        np.testing.assert_array_equal(np.asarray(g).astype(np.int64),
                                      np.asarray(w).astype(np.int64),
                                      err_msg=n)


def test_prep_kernel_multi_program():
    """Two grid programs (N = 2*TR): block indexing must tile."""
    rng = np.random.default_rng(7)
    N = 2 * TR
    tokens = rng.integers(0, 80, (N, 64)).astype(np.uint16)  # some >= 64
    clusters = rng.integers(0, 9, (N, 64)).astype(np.uint8)
    valid_len = rng.integers(0, 65, N).astype(np.int32)
    residues = rng.integers(0, 1 << 30, (N, 64)).astype(np.uint32)
    residue_bits = rng.integers(0, 31, (N, 64)).astype(np.uint8)
    lens, codes = _mk_tables(rng)
    p16 = pack_p16(jnp.asarray(tokens), jnp.asarray(clusters),
                   jnp.asarray(valid_len), jnp.asarray(residue_bits), 9)
    valid = np.arange(64)[None, :] < valid_len[:, None]
    resm = jnp.asarray(np.where(valid, residues, 0).astype(np.uint32))
    got = transport_prep(p16, resm, jnp.asarray(lens),
                         jnp.asarray(codes), tok_classes=9,
                         interpret=True)
    want = _reference(tokens, clusters, valid_len, residues,
                      residue_bits, lens, codes, 9)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g).astype(np.int64),
                                      np.asarray(w).astype(np.int64))


def test_mod_mulshift_exact():
    x = jnp.arange(256, dtype=jnp.int32)
    for m in (1, 2, 3, 9):
        np.testing.assert_array_equal(np.asarray(_mod_mulshift(x, m)),
                                      np.arange(256) % m)
