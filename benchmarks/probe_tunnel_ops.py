"""Measure per-op tunnel costs that shape host<->device pipeline design:
blocking upload (device_put) of small index arrays, blocking fetch of a
[B, 256] f32 batch output, and chained dispatch latency.

These are the per-batch overheads of WindowEncoder.encode_bank's loop; the
numbers decide whether per-batch round-trips need restructuring (deferred
fetch / pre-uploaded index matrix) or are already negligible.

Timing discipline per CLAUDE.md: vary inputs so the relay can't
short-circuit, end every measured region with a real value fetch.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    dev = jax.devices()[0]
    print("backend:", jax.default_backend(), dev)

    B = 256
    rng = np.random.default_rng(0)

    # warm the tiny programs
    x = jnp.asarray(rng.integers(0, 100, B, dtype=np.int32))
    y = x + 1
    _ = float(y[0])

    # 1) blocking upload of [B] i32 (two arrays, like vi/st per batch)
    ts = []
    for i in range(20):
        a = rng.integers(0, 100, B, dtype=np.int32) + i
        b = rng.integers(0, 100, B, dtype=np.int32) + i
        t0 = time.perf_counter()
        ad = jax.device_put(a, dev)
        bd = jax.device_put(b, dev)
        ts.append(time.perf_counter() - t0)
        _ = float((ad[0] + bd[0]))  # keep live, vary
    ts = np.array(ts[2:]) * 1e3
    print(f"upload 2x[{B}] i32: median {np.median(ts):.2f} ms  p90 {np.percentile(ts, 90):.2f}")

    # 2) blocking fetch of [B, 256] f32 (one seq batch)
    mats = [
        jnp.asarray(rng.normal(size=(B, 256)).astype(np.float32)) for _ in range(12)
    ]
    ts = []
    for m in mats:
        mm = m * 1.000001  # fresh value each time
        t0 = time.perf_counter()
        _ = np.asarray(mm)
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts[2:]) * 1e3
    print(f"fetch [{B},256] f32: median {np.median(ts):.2f} ms  p90 {np.percentile(ts, 90):.2f}")

    # 3) fetch of a small [B] f32 (tc batch)
    ts = []
    for i in range(12):
        v = mats[i % len(mats)][:, 0] * (1.0 + 1e-6 * i)
        t0 = time.perf_counter()
        _ = np.asarray(v)
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts[2:]) * 1e3
    print(f"fetch [{B}] f32: median {np.median(ts):.2f} ms  p90 {np.percentile(ts, 90):.2f}")

    # 4) chained dispatch latency (no host sync inside)
    f = jax.jit(lambda a: a * 1.000001 + 1e-7)
    c = mats[0]
    _ = np.asarray(f(c))  # compile
    t0 = time.perf_counter()
    for _ in range(50):
        c = f(c)
    _ = float(c[0, 0])
    dt = (time.perf_counter() - t0) / 50 * 1e3
    print(f"chained dispatch: {dt:.2f} ms/call")

    # 5) device_get of a LIST of arrays (does the tunnel pipeline them?)
    outs = [m * 1.0000001 for m in mats[:8]]
    t0 = time.perf_counter()
    _ = jax.device_get(outs)
    dt = (time.perf_counter() - t0) * 1e3
    print(f"device_get list of 8x[{B},256]: {dt:.2f} ms total ({dt/8:.2f}/item)")


if __name__ == "__main__":
    main()
