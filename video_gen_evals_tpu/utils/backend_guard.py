"""Fail-fast (and bounded-retry) backend initialization for TPU harnesses.

Through the axon tunnel, ``jax.devices()`` can block INDEFINITELY during a
relay outage (observed rounds 4-5: processes stuck 45+ min with zero CPU
time before any compile starts). Every benchmark/study entry point calls
:func:`require_backend` first so an outage produces a loud bounded failure
— or a clean in-process re-exec retry — instead of a silent hang that eats
the harness timeout. Moved here from ``bench.py`` (round 5) so every
harness shares one implementation.

Once ``jax.devices()`` has been *attempted*, the half-initialized backend
client is stuck in the current process; retrying requires a fresh process,
hence the ``os.execve`` re-exec rather than a sleep-and-retry loop.
"""

from __future__ import annotations

import os
import sys
import time


def require_backend(
    timeout_s: int | None = None,
    retries_env: str = "BENCH_INIT_RETRIES_LEFT",
) -> None:
    """Block until ``jax.devices()`` answers, or fail/retry loudly.

    Honors ``BENCH_BACKEND_TIMEOUT`` (seconds, default 180) and re-execs
    the current argv up to ``$BENCH_INIT_RETRIES_LEFT`` times (default 2)
    with a 120 s pause — a transient tunnel blip at launch time then costs
    one pause, not the whole run.
    """
    import threading

    import jax

    if timeout_s is None:
        timeout_s = int(os.environ.get("BENCH_BACKEND_TIMEOUT", "180"))

    ok: list = []
    t = threading.Thread(target=lambda: ok.append(jax.devices()), daemon=True)
    t.start()
    t.join(timeout_s)
    if ok:
        return
    retries = int(os.environ.get(retries_env, "2"))
    if retries > 0:
        print(
            f"{os.path.basename(sys.argv[0])}: backend init timed out after "
            f"{timeout_s}s (tunnel outage?) — {retries} re-exec retr"
            f"{'y' if retries == 1 else 'ies'} left, sleeping 120s",
            file=sys.stderr,
        )
        sys.stderr.flush()
        time.sleep(120)
        env = dict(os.environ)
        env[retries_env] = str(retries - 1)
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
    print(
        f"{os.path.basename(sys.argv[0])}: jax backend init did not complete "
        f"within {timeout_s}s (TPU tunnel outage?) — aborting",
        file=sys.stderr,
    )
    os._exit(3)
