"""First-class profiling/tracing hooks (SURVEY.md §5: absent in the reference).

- `trace(logdir)`: context manager wrapping `jax.profiler.trace` — produces a
  TensorBoard-loadable XPlane trace of device execution.
- `annotate(name)`: TraceAnnotation for host-side phases.
- `Stopwatch`: named phase timers aggregated into a report (per-phase totals,
  counts, means) — the timing backbone used by the engine's `timer` dict.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


@contextlib.contextmanager
def trace(logdir: str):
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax
    return jax.profiler.TraceAnnotation(name)


class Stopwatch:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name:24s} total {t:8.3f}s  n={n:5d}  mean {t/max(n,1)*1000:8.2f}ms")
        return "\n".join(lines)
