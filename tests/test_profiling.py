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
    directory, creates it, and is idempotent. Restores the jax config after
    — the suite must keep persistent caching OFF (compile_cache.py docs)."""
    import jax

    from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache

    saved = {
        k: getattr(jax.config, k)
        for k in (
            "jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes",
        )
    }
    try:
        d1 = str(tmp_path / "cache1")
        assert enable_compile_cache(d1) == d1
        assert os.path.isdir(d1)
        assert jax.config.jax_compilation_cache_dir == d1

        d2 = str(tmp_path / "cache2")
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", d2)
        assert enable_compile_cache() == d2      # env honored
        assert enable_compile_cache(d1) == d1    # explicit arg wins
    finally:
        for k, v in saved.items():
            jax.config.update(k, v)
