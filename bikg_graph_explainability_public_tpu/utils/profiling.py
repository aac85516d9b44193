"""Tracing / profiling hooks.

The reference has no profiling subsystem (SURVEY §5: only pytest
``--durations`` and notebook wall-clocks).  Here per-phase timing and
``jax.profiler`` traces are first-class.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase (host-side; device work is
    synchronised at phase exit)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None) -> Iterator[None]:
        """Context manager timing one named phase."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        """Dict of phase -> seconds."""
        lines = ["phase                          total_s   calls"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(f"{name:<30} {total:8.3f}   {self.counts[name]}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace."""
    with jax.profiler.TraceAnnotation(name):
        yield
