"""Split the ~30 s flagship resume-checkpoint cost (BENCH_NOTES config-5)
into its parts: device->host fetch of the train state vs orbax
StandardCheckpointer write vs flat-npz write (the multi-process format
``restore_train_state`` already reads).

Decides whether the async saver (round 4) is hiding a transfer cost or a
serializer cost — and whether the single-process resume format should be
npz. Run on the real TPU through the tunnel; timing discipline per
CLAUDE.md (value-fetch fences; state built fresh per pass).

    timeout 1200 python benchmarks/probe_ckpt_cost.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from video_gen_evals_tpu.models import EncoderConfig
    from video_gen_evals_tpu.models.fusion_encoder import init_encoder
    from video_gen_evals_tpu.train.step import make_optimizer

    def emit(tag, **kw):
        print(json.dumps({"tag": tag, **kw}), flush=True)

    emit("backend", platform=jax.default_backend())

    # flagship geometry (BASELINE config 5): input_dim 2596, d_model 256
    dims_raw = {"vit": 1024, "global": 9, "pose": 207, "beta": 10, "kp2d": 120}
    dims_diff = {"vit": 1024, "global": 3, "pose": 69, "beta": 10, "kp2d": 120}
    cfg = EncoderConfig.create(dims_raw, dims_diff, d_model=256,
                               time_layers=4, time_heads=8)
    model, params = init_encoder(cfg, jax.random.key(0), clip_len=32)
    tx = make_optimizer(3e-4, total_steps=300)
    opt_state = tx.init(params)
    state = {
        "params": params,
        "opt_state": opt_state,
        "step": jnp.zeros((), jnp.int32),
        "epoch": jnp.zeros((), jnp.int32),
        "best_eval_loss": jnp.zeros((), jnp.float32),
    }
    leaves = jax.tree_util.tree_leaves(state)
    nbytes = sum(l.size * l.dtype.itemsize for l in leaves)
    emit("state", n_leaves=len(leaves), mb=round(nbytes / 1e6, 1))

    # warm any transfer paths once
    _ = jax.device_get(state)

    # 1) device->host fetch (the async saver's hidden cost)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        host = jax.device_get(state)
        ts.append(time.perf_counter() - t0)
    emit("device_get", s=[round(t, 2) for t in ts],
         mb_per_s=round(nbytes / 1e6 / min(ts), 1))

    root = tempfile.mkdtemp(prefix="ckptprobe_")

    # 2) orbax StandardCheckpointer write of the HOST tree (no fetch in the
    # timed region)
    import orbax.checkpoint as ocp

    ts = []
    for i in range(3):
        path = os.path.join(root, f"orbax_{i}")
        ckptr = ocp.StandardCheckpointer()
        t0 = time.perf_counter()
        ckptr.save(path, host)
        ckptr.wait_until_finished()
        ts.append(time.perf_counter() - t0)
    emit("orbax_write", s=[round(t, 2) for t in ts])

    # 3) flat npz write of the same host tree (the multi-process format)
    from video_gen_evals_tpu.train.checkpoint import _flatten_with_paths

    ts = []
    for i in range(3):
        path = os.path.join(root, f"flat_{i}.npz")
        t0 = time.perf_counter()
        np.savez(path, **_flatten_with_paths(host))
        ts.append(time.perf_counter() - t0)
    emit("npz_write", s=[round(t, 2) for t in ts])

    # 4) combined: what save_train_state actually costs end to end today
    from video_gen_evals_tpu.train.checkpoint import save_train_state

    t0 = time.perf_counter()
    save_train_state(os.path.join(root, "combined"), state)
    emit("save_train_state", s=round(time.perf_counter() - t0, 2))

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
