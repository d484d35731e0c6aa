"""Profiling utilities: no-op trace without a directory, counters."""

import os
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


def test_enable_compile_cache(tmp_path, monkeypatch):
    """enable_compile_cache points jax at the requested (or env-provided)
    directory, creates it, and is idempotent."""
    import jax

    from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache

    d1 = str(tmp_path / "cache1")
    assert enable_compile_cache(d1) == d1
    assert os.path.isdir(d1)
    assert jax.config.jax_compilation_cache_dir == d1

    d2 = str(tmp_path / "cache2")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", d2)
    assert enable_compile_cache() == d2          # env honored
    assert enable_compile_cache(d1) == d1        # explicit arg wins, idempotent
