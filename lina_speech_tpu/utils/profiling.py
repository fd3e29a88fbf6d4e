"""Profiling & observability helpers (first-class, unlike the reference —
SURVEY §5.1: the torch code has no profiler hooks at all).

- :func:`trace`: context manager around ``jax.profiler`` traces (view in
  TensorBoard / Perfetto).
- :class:`StepTimer`: wall-clock + tokens/sec accounting for train loops.
- :func:`annotate`: named TraceAnnotation for device timeline grouping.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Dict, Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Track step wall time and throughput with warmup skipping."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.n = 0
        self.total = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.record(dt)

    def record(self, dt: float):
        """Record one step's wall time directly (context-manager-free use:
        async dispatch loops that only sync at log points)."""
        self.n += 1
        if self.n > self.warmup:
            self.total += dt
        self.last = dt

    @property
    def mean(self) -> float:
        steps = max(self.n - self.warmup, 1)
        return self.total / steps


class MetricsLogger:
    """JSONL metrics log + console line (the reference logs through
    Lightning/TensorBoard; this is the dependency-free equivalent)."""

    def __init__(self, path: Optional[str] = None, print_every: int = 1):
        self.path = path
        self.print_every = print_every
        self._fh = open(path, "a") if path else None

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        rec = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if step % self.print_every == 0:
            parts = " ".join(f"{k}={float(v):.4g}" for k, v in metrics.items())
            print(f"[step {step}] {parts}", flush=True)

    def close(self):
        if self._fh:
            self._fh.close()
