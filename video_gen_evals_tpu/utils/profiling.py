"""Tracing / profiling hooks (SURVEY §5.1 rebuild plan).

The reference has no profiler (one unused ``time.time()`` pair); here every
pipeline phase can be annotated with ``jax.profiler`` trace contexts and a
whole run captured to a Perfetto/TensorBoard trace directory via
``VGE_TRACE_DIR`` or the :func:`trace` context manager.
"""

from __future__ import annotations

import contextlib
import os
import time
import typing as T

import jax


def annotate(name: str):
    """Named trace span (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(trace_dir: T.Optional[str] = None):
    """Capture a device trace for the enclosed block.

    ``trace_dir`` defaults to ``$VGE_TRACE_DIR``; when neither is set this is
    a no-op so pipelines can wrap their hot phases unconditionally.
    """
    trace_dir = trace_dir or os.environ.get("VGE_TRACE_DIR")
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Step-time / throughput counter for the metrics stream."""

    def __init__(self):
        self._t0 = time.perf_counter()
        self.steps = 0
        self.items = 0

    def tick(self, items: int = 1) -> None:
        self.steps += 1
        self.items += items

    def rates(self) -> T.Dict[str, float]:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return {
            "seconds": dt,
            "steps_per_sec": self.steps / dt,
            "items_per_sec": self.items / dt,
        }
