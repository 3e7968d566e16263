"""Per-stage timing + JAX profiler integration.

The reference's only observability is printf tracing (SURVEY.md 5.1).  This
module provides a first-class timing subsystem: `StageTimer` wraps pipeline
stages with device-synchronized wall timing and aggregates per-stage stats;
`trace()` wraps a region with the XLA profiler for TensorBoard traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import jax


class StageTimer:
    """Accumulates per-stage wall times (device-synchronized).

    >>> timer = StageTimer()
    >>> with timer("tracking"):
    ...     out = tracking_step(...)
    >>> timer.summary()
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.times: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def __call__(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                # flush the async dispatch queue so the stage's device work
                # is attributed to it
                jax.effects_barrier()
            self.times[stage].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for k, v in self.times.items():
            arr = sorted(v)
            n = len(arr)
            out[k] = {
                "count": n,
                "total_s": sum(arr),
                "mean_ms": 1000 * sum(arr) / n,
                "p50_ms": 1000 * arr[n // 2],
                "p95_ms": 1000 * arr[min(n - 1, int(0.95 * n))],
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':<24}{'count':>7}{'mean ms':>10}{'p50 ms':>10}"
                 f"{'p95 ms':>10}{'total s':>10}"]
        for k, s in sorted(self.summary().items(),
                           key=lambda kv: -kv[1]["total_s"]):
            lines.append(f"{k:<24}{s['count']:>7}{s['mean_ms']:>10.2f}"
                         f"{s['p50_ms']:>10.2f}{s['p95_ms']:>10.2f}"
                         f"{s['total_s']:>10.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler region -> TensorBoard trace in `log_dir`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
