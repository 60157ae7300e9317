"""Tracing/profiling hooks (SURVEY §5.1 — the reference has none).

Phase timers around host-side pipeline stages plus a jax.profiler trace
wrapper for device work; results accumulate into a dict and print as a
table or jsonl record.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class PhaseTimer:
    """Accumulating wall-clock phase timer.

    with timer.phase("vae_encode"): ...
    print(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        rows = [
            f"{name:24s} {self.totals[name]:8.3f}s x{self.counts[name]}"
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return "\n".join(rows)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)

    def jsonl(self) -> str:
        return json.dumps({"phases": self.as_dict()})


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace (TensorBoard-compatible) around a region; no-op
    when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
