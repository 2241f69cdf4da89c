"""Multi-host encoding: jax.distributed glue + cross-host bitstream
gather + per-shard failure recovery.

SURVEY.md sections 2/5 map hydrium's structural decompositions onto a
pod slice: LF groups scatter across hosts (DCN for input pixels, ICI for
collectives), per-preset histograms are the only cross-shard reduction,
and the variable-length per-group sections gather to process 0, ordered
by the TOC permutation.  Groups are idempotent -- any shard's sections
can be recomputed from its input tiles, which is the whole failure-
recovery story (`with_retry`)."""

from __future__ import annotations

import time
from typing import Callable, Optional, Sequence

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed (no-op when single-process)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def with_retry(fn: Callable, attempts: int = 3, backoff: float = 0.5):
    """Idempotent-shard retry wrapper: group/LFG encoding has no side
    effects until its sections are appended, so transient device or
    tunnel failures are recoverable by recomputation (the analog of the
    reference's defensive status-code discipline, SURVEY.md section 5)."""

    def wrapped(*args, **kwargs):
        last = None
        for i in range(attempts):
            try:
                return fn(*args, **kwargs)
            except Exception as e:  # noqa: BLE001 - deliberate broad retry
                last = e
                if i + 1 < attempts:
                    time.sleep(backoff * (2 ** i))
        raise last

    return wrapped


def gather_bytes_to_host0(payload: bytes) -> Optional[list]:
    """All-gather variable-length byte strings across processes; returns
    the list on process 0, None elsewhere.  Uses a fixed-width padded
    u8 array + length vector over the global mesh (DCN)."""
    import jax

    if jax.process_count() == 1:
        return [payload]
    from jax.experimental import multihost_utils

    n = jax.process_count()
    lengths = multihost_utils.process_allgather(
        np.array([len(payload)], np.int64))
    cap = int(lengths.max())
    buf = np.zeros(cap, np.uint8)
    buf[:len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = multihost_utils.process_allgather(buf)
    if jax.process_index() != 0:
        return None
    return [bytes(gathered[i][:int(lengths[i][0])].tobytes())
            for i in range(n)]


def encode_image_multihost(image_shard: np.ndarray, shard_lfg_ids: Sequence[int],
                           full_width: int, full_height: int) -> Optional[bytes]:
    """Sketch of the N-host flow (exercised degenerately single-process;
    real pods need jax.distributed.initialize first):

    1. every host runs the device pipeline on its own LF groups
       (parallel.driver-style, packed payloads);
    2. per-preset histograms need no exchange when presets align with
       host boundaries (lfg_per_preset LFGs per preset; SURVEY section 5),
       otherwise psum them over the global mesh;
    3. each host serializes its LF + HF group sections locally;
    4. process 0 gathers the section payloads (gather_bytes_to_host0),
       assembles headers/TOC in raster order, and emits the .jxl.

    Single-process callers should use parallel.driver.encode_image_sharded
    or the plain Encoder instead."""
    raise NotImplementedError(
        "multi-host assembly lands once a real multi-process pod is "
        "available; the single-host sharded path is parallel.driver")
