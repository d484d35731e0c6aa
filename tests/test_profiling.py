"""Profiling utilities: no-op trace without a directory, counters."""

import time

from video_gen_evals_tpu.utils.profiling import StepTimer, annotate, trace


def test_trace_noop_without_dir(monkeypatch):
    monkeypatch.delenv("VGE_TRACE_DIR", raising=False)
    with trace():   # must not start a profiler
        with annotate("phase"):
            pass


def test_step_timer():
    t = StepTimer()
    t.tick(10)
    t.tick(10)
    time.sleep(0.01)
    rates = t.rates()
    assert rates["items_per_sec"] > 0
    assert rates["steps_per_sec"] > 0
    assert t.items == 20 and t.steps == 2
