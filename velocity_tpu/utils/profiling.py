"""Profiling and observability.

The reference's profiling is vestigial (commented @profile decorators and
manual wall-clock prints, SURVEY.md §5). Here: structured per-stage timers
plus a jax.profiler trace context for device timelines (view in TensorBoard
or xprof).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulating wall-clock stage timer.

    with timer.stage("track"): ...
    print(timer.report())
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                # ensure device work attributed to this stage has finished
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = [f"{'stage':<24}{'total_s':>10}{'calls':>8}{'ms/call':>10}"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            tot = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name:<24}{tot:>10.3f}{n:>8d}{1e3 * tot / n:>10.2f}")
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {
            k: {"total_s": self.totals[k], "calls": self.counts[k]}
            for k in self.totals
        }


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Device profiler trace context (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
