"""Structured per-stage timing and profiling.

Upgrades the reference's ad-hoc prints (SURVEY.md §5.1;
reference: pero_ocr/decoding/decoding_itf.py:107-137 TimeLogger,
page_parser.py:147-156 counters, cnn_layout_engine.py:109-111 map-time
prints) into one registry:

- ``stage_timer(name)`` context manager accumulates wall time + call
  counts per stage;
- ``timing_report()`` returns/prints the aggregate table;
- ``jax_profile(path)`` wraps ``jax.profiler.trace`` for device traces.
"""

from __future__ import annotations

import contextlib
import logging
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

logger = logging.getLogger(__name__)


class StageStats:
    __slots__ = ("total_seconds", "calls")

    def __init__(self):
        self.total_seconds = 0.0
        self.calls = 0


class TimingRegistry:
    """Thread-safe accumulator of per-stage wall times."""

    def __init__(self):
        self._lock = threading.Lock()
        self._stats: Dict[str, StageStats] = defaultdict(StageStats)

    @contextlib.contextmanager
    def timer(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            with self._lock:
                s = self._stats[name]
                s.total_seconds += elapsed
                s.calls += 1

    def add(self, name: str, seconds: float, calls: int = 1) -> None:
        with self._lock:
            s = self._stats[name]
            s.total_seconds += seconds
            s.calls += calls

    def get(self, name: str) -> StageStats:
        with self._lock:
            return self._stats[name]

    def reset(self) -> None:
        with self._lock:
            self._stats.clear()

    def report(self) -> str:
        with self._lock:
            items = sorted(
                self._stats.items(), key=lambda kv: -kv[1].total_seconds
            )
        if not items:
            return "no timed stages"
        width = max(len(k) for k, _ in items)
        lines = [f"{'stage':{width}}  total_s   calls   ms/call"]
        for name, s in items:
            per_call = 1000.0 * s.total_seconds / max(s.calls, 1)
            lines.append(
                f"{name:{width}}  {s.total_seconds:7.3f}  {s.calls:6d}  {per_call:8.2f}"
            )
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            return {
                k: {"total_seconds": v.total_seconds, "calls": v.calls}
                for k, v in self._stats.items()
            }


GLOBAL_TIMING = TimingRegistry()


def stage_timer(name: str):
    """Module-level convenience: time a stage into the global registry."""
    return GLOBAL_TIMING.timer(name)


def timing_report() -> str:
    return GLOBAL_TIMING.report()


def reset_timing() -> None:
    GLOBAL_TIMING.reset()


@contextlib.contextmanager
def jax_profile(log_dir: Optional[str]):
    """Capture a device trace with jax.profiler when `log_dir` is set;
    no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


class DecodingCounters:
    """The decoding_summary counters API
    (reference: pero_ocr/document_ocr/page_parser.py:100-156)."""

    def __init__(self):
        self.lines_examined = 0
        self.lines_decoded = 0
        self.seconds_decoding = 0.0
        self.continuation_cache_hits = 0

    def summary(self) -> str:
        decoded = max(self.lines_decoded, 1)
        return (
            f"Lines examined: {self.lines_examined}, "
            f"lines decoded: {self.lines_decoded}, "
            f"avg decoding time: {1000.0 * self.seconds_decoding / decoded:.1f} ms/line"
        )
