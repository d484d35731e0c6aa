"""Persistent XLA compilation cache.

TPU compiles through the axon tunnel cost 45-600 s per program; the
persistent cache cuts a warm second process to seconds (measured: the full
config-4 pipeline's first pass dropped 550 s -> 184 s on the first cached
rerun). Enabled by every CLI/bench entry point; tests keep it off (the CPU
backend compiles in milliseconds).
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/video_gen_evals_tpu/xla")


def enable_compile_cache(path: str | None = None) -> str:
    """Point jax at a persistent compilation cache directory.

    Honors an explicit ``JAX_COMPILATION_CACHE_DIR`` if the user already set
    one. Safe to call before or after jax initialization, multiple times.
    """
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every program, even fast-compiling ones (tunnel latency dominates)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
