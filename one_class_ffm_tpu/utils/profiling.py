"""Tracing / profiling utilities.

The reference has no timers at all (SURVEY.md §5: performance was assessed by
wall-clock of grid jobs).  Here: lightweight per-phase wall timers with
throughput accounting, plus a context manager around ``jax.profiler`` for
full XLA traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class PhaseTimer:
    """Accumulates wall time per named phase.

    with timer.phase("epoch"):
        ...
    timer.summary() -> {"epoch": {"seconds": ..., "calls": ...}, ...}
    """

    def __init__(self):
        self._tot: Dict[str, float] = defaultdict(float)
        self._cnt: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._tot[name] += time.perf_counter() - t0
            self._cnt[name] += 1

    def add(self, name: str, seconds: float) -> None:
        self._tot[name] += seconds
        self._cnt[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"seconds": self._tot[k], "calls": self._cnt[k]}
            for k in sorted(self._tot)
        }

    def report(self, echo=print) -> None:
        for name, s in self.summary().items():
            avg = s["seconds"] / max(s["calls"], 1)
            echo(f"[timing] {name:>16}: {s['seconds']:8.3f}s total, "
                 f"{int(s['calls'])} calls, {avg:8.4f}s avg")


@contextlib.contextmanager
def trace_profile(log_dir: Optional[str]) -> Iterator[None]:
    """XLA profiler trace around a block (no-op when log_dir is falsy)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
