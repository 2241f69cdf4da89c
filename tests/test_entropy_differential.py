"""Byte-exact differential tests: hydrium_tpu.jxl.entropy vs the reference
hydrium entropy coder (driven through tests/entropy_shim.c).

Covers hybrid-uint tokenization, LZ77 RLE, cluster maps (simple + nested
MTF), depth-limited Huffman, simple/complex prefix headers, ANS frequency
normalization, alias tables, and the backwards rANS emission."""

import ctypes
import os
import subprocess
import tempfile

import numpy as np
import pytest

import ref_hydrium
from hydrium_tpu.jxl.bitwriter import BitWriter
from hydrium_tpu.jxl.entropy import EntropyStream

_SHIM_PATH = os.path.join(tempfile.gettempdir(), "refbuild", "entropy_shim.so")
_shim = None


def get_shim():
    global _shim
    if _shim is None:
        ref_hydrium.build()
        os.makedirs(os.path.dirname(_SHIM_PATH), exist_ok=True)
        src = os.path.join(os.path.dirname(__file__), "entropy_shim.c")
        subprocess.run(
            ["gcc", "-O2", "-std=c99", "-shared", "-fPIC", src,
             "-I/root/reference/src/libhydrium",
             "-I/root/reference/src/include",
             ref_hydrium._SO_PATH, "-o", _SHIM_PATH],
            check=True)
        lib = ctypes.CDLL(_SHIM_PATH)
        for fn in (lib.shim_prefix, lib.shim_ans):
            fn.restype = ctypes.c_long
            fn.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_uint32, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t,
            ]
        _shim = lib
    return _shim


def ref_encode(kind, cluster_map, num_dists, dists, symbols,
               custom_config=None, lz77_min_symbol=0, modular=False):
    lib = get_shim()
    dists = np.asarray(dists, dtype=np.uint32)
    symbols = np.asarray(symbols, dtype=np.uint32)
    cap = max(4096, len(symbols) * 16)
    out = (ctypes.c_uint8 * cap)()
    cm = bytes(cluster_map)
    cfg = custom_config or (0, 0, 0)
    fn = lib.shim_prefix if kind == "prefix" else lib.shim_ans
    ret = fn(cm, num_dists, 1 if custom_config else 0, cfg[0], cfg[1], cfg[2],
             lz77_min_symbol, 1 if modular else 0,
             dists.ctypes.data, symbols.ctypes.data, len(symbols), out, cap)
    assert ret >= 0, f"reference shim failed: {ret}"
    return bytes(out[:ret])


def my_encode(kind, cluster_map, num_dists, dists, symbols,
              custom_config=None, lz77_min_symbol=0, modular=False):
    stream = EntropyStream(cluster_map, num_dists,
                           custom_configs=custom_config is not None,
                           lz77_min_symbol=lz77_min_symbol, modular=modular)
    if custom_config:
        stream.set_hybrid_config(0, 0, *custom_config)
    for d, s in zip(dists, symbols):
        stream.send_symbol(int(d), int(s))
    bw = BitWriter()
    if kind == "prefix":
        stream.prefix_finalize(bw)
    else:
        stream.ans_finalize(bw)
    return bw.finalize()


def compare(kind, cluster_map, num_dists, dists, symbols, **kw):
    ref = ref_encode(kind, cluster_map, num_dists, dists, symbols, **kw)
    mine = my_encode(kind, cluster_map, num_dists, dists, symbols, **kw)
    assert mine == ref, (
        f"{kind} mismatch: len {len(mine)} vs {len(ref)}; "
        f"first diff at "
        f"{next((i for i, (a, b) in enumerate(zip(mine, ref)) if a != b), None)}")


# ---------------------------------------------------------------------------


def test_prefix_single_dist_small():
    symbols = [0, 1, 2, 3, 4, 5, 1, 1, 1, 2, 2, 0]
    compare("prefix", [0], 1, [0] * len(symbols), symbols)


def test_prefix_single_symbol_stream():
    compare("prefix", [0], 1, [0] * 10, [7] * 10)


def test_prefix_two_symbols():
    compare("prefix", [0], 1, [0] * 20, [3, 5] * 10)


def test_prefix_multi_dist_simple_cluster():
    cluster_map = [0, 1, 0, 1, 2, 2]
    rng = np.random.default_rng(1)
    dists = rng.integers(0, 6, 200)
    symbols = rng.integers(0, 20, 200)
    compare("prefix", cluster_map, 6, dists, symbols)


def test_prefix_large_alphabet_complex_code():
    rng = np.random.default_rng(2)
    symbols = (rng.pareto(1.0, 3000) * 3).astype(np.uint32)
    compare("prefix", [0], 1, [0] * len(symbols), symbols)


def test_prefix_lz77_rle():
    # long runs trigger the repeat path (entropy.c:473-524)
    symbols = [5] * 50 + [1, 2, 3] + [7] * 200 + [0] * 4
    compare("prefix", [0], 1, [0] * len(symbols), symbols,
            lz77_min_symbol=224, modular=True)


def test_prefix_lz77_short_runs_not_compressed():
    symbols = [4, 4, 4, 2, 2, 9, 9, 9, 9]
    compare("prefix", [0], 1, [0] * len(symbols), symbols,
            lz77_min_symbol=224, modular=True)


def test_prefix_custom_config():
    rng = np.random.default_rng(3)
    symbols = rng.integers(0, 100000, 500)
    compare("prefix", [0], 1, [0] * len(symbols), symbols,
            custom_config=(7, 1, 1), lz77_min_symbol=1 << 14, modular=True)


def test_prefix_nested_cluster_map():
    # >8 clusters forces the MTF + nested-prefix cluster map path
    num_dists = 40
    cluster_map = [i % 12 for i in range(num_dists)]
    rng = np.random.default_rng(4)
    n = 2000
    dists = rng.integers(0, num_dists, n)
    symbols = rng.integers(0, 30, n)
    compare("prefix", cluster_map, num_dists, dists, symbols)


def test_ans_basic():
    rng = np.random.default_rng(5)
    symbols = rng.integers(0, 40, 5000)
    compare("ans", [0], 1, [0] * len(symbols), symbols)


def test_ans_skewed():
    rng = np.random.default_rng(6)
    symbols = (rng.pareto(0.7, 8000)).astype(np.uint32)
    compare("ans", [0], 1, [0] * len(symbols), symbols)


def test_ans_single_symbol():
    compare("ans", [0], 1, [0] * 100, [9] * 100)


def test_ans_two_symbols():
    compare("ans", [0], 1, [0] * 300, [2, 6] * 150)


def test_ans_multi_cluster():
    cluster_map = [0, 1, 2, 0, 1, 2, 3, 3]
    rng = np.random.default_rng(7)
    n = 4000
    dists = rng.integers(0, 8, n)
    symbols = rng.integers(0, 64, n)
    compare("ans", cluster_map, 8, dists, symbols)


def test_ans_large_alphabet():
    rng = np.random.default_rng(8)
    symbols = rng.integers(0, 100000, 3000)
    compare("ans", [0], 1, [0] * len(symbols), symbols,
            custom_config=(4, 1, 0))


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_prefix(seed):
    rng = np.random.default_rng(100 + seed)
    num_dists = int(rng.integers(1, 16))
    num_clusters = int(rng.integers(1, num_dists + 1))
    cluster_map = [int(rng.integers(0, num_clusters)) for _ in range(num_dists)]
    # ensure every cluster id below max appears (contiguity like hydrium's maps)
    cluster_map[:num_clusters] = list(range(num_clusters))
    n = int(rng.integers(1, 800))
    dists = rng.integers(0, num_dists, n)
    symbols = (rng.pareto(1.2, n) * rng.integers(1, 50)).astype(np.uint32)
    compare("prefix", cluster_map, num_dists, dists, symbols)


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_ans(seed):
    rng = np.random.default_rng(200 + seed)
    num_dists = int(rng.integers(1, 16))
    num_clusters = int(rng.integers(1, num_dists + 1))
    cluster_map = [int(rng.integers(0, num_clusters)) for _ in range(num_dists)]
    cluster_map[:num_clusters] = list(range(num_clusters))
    n = int(rng.integers(1, 3000))
    dists = rng.integers(0, num_dists, n)
    symbols = (rng.pareto(1.2, n) * rng.integers(1, 50)).astype(np.uint32)
    compare("ans", cluster_map, num_dists, dists, symbols)
