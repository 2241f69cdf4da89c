"""Per-encode observability: stage timers, section sizes, throughput.

The reference has none of this beyond stderr prints (SURVEY.md section
5); here every encode can carry an EncodeStats that stages report into,
and `jax.profiler` tracing can wrap the device pipeline."""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class EncodeStats:
    pixels: int = 0
    bytes_out: int = 0
    hf_symbols: int = 0
    stage_seconds: Dict[str, float] = field(default_factory=lambda: defaultdict(float))
    section_sizes: List[int] = field(default_factory=list)
    counters: Dict[str, int] = field(default_factory=lambda: defaultdict(int))
    last_error: Optional[str] = None
    # counters/stages are updated from prefetch worker threads too
    _lock: threading.Lock = field(default_factory=threading.Lock,
                                  repr=False, compare=False)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.stage_seconds[name] += dt

    def count(self, name: str, n: int = 1) -> None:
        with self._lock:
            self.counters[name] += n

    @property
    def mpixels_per_sec(self) -> float:
        total = sum(self.stage_seconds.values())
        return self.pixels / total / 1e6 if total else 0.0

    def summary(self) -> str:
        lines = [f"pixels={self.pixels} bytes={self.bytes_out} "
                 f"bpp={8*self.bytes_out/max(self.pixels,1):.3f} "
                 f"symbols={self.hf_symbols}"]
        for k, v in sorted(self.stage_seconds.items(),
                           key=lambda kv: -kv[1]):
            lines.append(f"  {k:<24} {v*1e3:9.1f} ms")
        for k, v in sorted(self.counters.items()):
            lines.append(f"  {k:<24} {v}")
        if self.last_error:
            lines.append(f"  last_error: {self.last_error}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Wrap a region in a jax.profiler trace when log_dir is given."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
