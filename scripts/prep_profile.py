#!/usr/bin/env python
"""On-chip stage attribution INSIDE the transport-prep kernel
(ops/pallas/prep.py): times transport_prep isolated at debug_stage
1 (field pack) / 2 (+doubling) / 3 (+emit loop, no lookup) / 0 (full),
plus the XLA composition overhead (production cum2 - front - kernel).

Usage: python scripts/prep_profile.py [iters]
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

    from hydrium_tpu.ops.pallas.prep import pack_p16, transport_prep

    rng = np.random.default_rng(0)
    N = 64 * 3072                       # one 2048^2 LFG
    tokens = jnp.asarray(rng.integers(0, 40, (N, 64)).astype(np.uint16))
    clusters = jnp.asarray(rng.integers(0, 9, (N, 64)).astype(np.uint8))
    vl = jnp.asarray(rng.integers(0, 65, N).astype(np.int32))
    residues = jnp.asarray(rng.integers(0, 1 << 10, (N, 64)).astype(
        np.uint32))
    rbits = jnp.asarray(rng.integers(0, 11, (N, 64)).astype(np.uint8))
    lens = jnp.asarray(np.minimum(1 + rng.integers(0, 12, 640), 12)
                       .astype(np.int32))
    codes = jnp.asarray(rng.integers(0, 1 << 12, 640).astype(np.int32))

    out = {"metric": "transport-prep kernel stage attribution",
           "unit": "ms", "backend": jax.default_backend(), "iters": iters}

    p16 = pack_p16(tokens, clusters, vl, rbits, 9)
    valid = (jnp.arange(64)[None, :] < vl[:, None])
    resm = jnp.where(valid, residues, 0)

    def timeit(name, stage):
        @jax.jit
        def loop(n, tk):
            def body(_i, carry):
                r = transport_prep(tk + carry.astype(jnp.uint16),
                                   resm, lens,
                                   codes, tok_classes=9,
                                   debug_stage=stage)
                probe = (jnp.sum(r[0].astype(jnp.float32))
                         + jnp.sum(r[2].astype(jnp.float32)))
                return (probe.astype(jnp.uint32)
                        >> jnp.uint32(31)).astype(jnp.uint16)
            return jax.lax.fori_loop(0, n, body, jnp.uint16(0))

        np.asarray(loop(1, p16))
        overhead = min(_t(lambda: np.asarray(loop(1, p16)))
                       for _ in range(3))
        total = min(_t(lambda: np.asarray(loop(iters, p16)))
                    for _ in range(3))
        ms = max(total - overhead, 0.0) / max(iters - 1, 1) * 1e3
        out[name] = round(ms, 3)
        print(f"  {name}: {ms:.3f} ms", file=sys.stderr, flush=True)

    timeit("k1_fieldpack_ms", 1)
    timeit("k2_doubling_ms", 2)
    timeit("k3_emit_nolookup_ms", 3)
    timeit("k0_full_ms", 0)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
