#!/usr/bin/env python
"""On-chip sweep of _overwrite_compact's (pre_levels, unroll) space on
the token- and residue-shaped chunk streams of a 2048^2 LF group.

The compaction is the post-merge-kernel XLA stage: pre_levels pairwise
barrel merges (jnp.roll is HBM traffic, so each extra level costs a
bandwidth pass over the merged rows) followed by a dynamic_update_slice
scan (per-step dispatch overhead ~2.5 us).  The sweet spot is a
hardware measurement, not a calculation -- this prints one JSON line of
ms per configuration.  Exactness across configs is pinned on CPU by
tests/test_pipeline_jax.py::test_overwrite_compact_levels_exact.

Usage: python scripts/compact_sweep.py [iters]
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

    from hydrium_tpu.ops import pipeline as P

    rng = np.random.default_rng(0)
    out = {"metric": "_overwrite_compact sweep, 2048^2 LFG shapes",
           "unit": "ms", "backend": jax.default_backend(), "iters": iters}

    # token-shaped: 3072 chunks x TOK_OW words, ~450 used words each;
    # residue-shaped: 6144 chunks x RES_OW_FAST, ~200 used words each
    shapes = [("tok", 3072, P.TOK_OW, 450), ("res", 6144, P.RES_OW_FAST, 200)]
    for name, R, OW, used in shapes:
        chunks = jnp.asarray(
            rng.integers(0, 1 << 32, (R, OW), dtype=np.uint64)
            .astype(np.uint32))
        nw = jnp.asarray(np.minimum(
            rng.poisson(used, R), OW - 4).astype(np.int32))
        num_words = R * used + 4096

        for pre in (2, 3, 4, 5):
            for unroll in (4, 8):
                @jax.jit
                def loop(n, ch, w):
                    def body(_i, carry):
                        r = P._overwrite_compact(
                            ch.at[0, 0].set(carry.astype(jnp.uint32)), w,
                            num_words, pre_levels=pre, unroll=unroll)
                        probe = jnp.sum(r.astype(jnp.float32)).astype(
                            jnp.uint32)
                        return (probe >> jnp.uint32(31)).astype(jnp.int32)
                    return jax.lax.fori_loop(0, n, body, jnp.int32(0))

                np.asarray(loop(1, chunks, nw))
                overhead = min(_t(lambda: np.asarray(loop(1, chunks, nw)))
                               for _ in range(3))
                total = min(_t(lambda: np.asarray(loop(iters, chunks, nw)))
                            for _ in range(3))
                ms = max(total - overhead, 0.0) / max(iters - 1, 1) * 1e3
                key = f"{name}_pre{pre}_u{unroll}_ms"
                out[key] = round(ms, 3)
                print(f"  {key}: {ms:.3f}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
