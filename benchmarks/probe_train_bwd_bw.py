"""Probe: trainable conv kernel backward block size 16 vs 32 (round 3).

The bwd kernel's block cap is 16 ("backward holds more live VMEM"); the
mm-first tap conversion removed two of its padded-scratch uses, so 32 may
now fit. Monkeypatches the cap and times the full train step both ways
(BENCH_NOTES timing discipline).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache


def main() -> None:
    enable_compile_cache()
    from video_gen_evals_tpu.models import EncoderConfig
    from video_gen_evals_tpu.models.fusion_encoder import init_encoder
    from video_gen_evals_tpu.ops import conv_kernel_train as ckt
    from video_gen_evals_tpu.train.step import (
        TrainState, make_optimizer, make_train_step,
    )

    DIMS_RAW = {"vit": 1024, "global": 9, "pose": 207, "beta": 10, "kp2d": 120}
    DIMS_DIFF = {"vit": 1024, "global": 3, "pose": 69, "beta": 10, "kp2d": 120}
    # batch MUST be a multiple of 32: _pick_block(240, 32) silently falls
    # back to 16 (240 % 32 != 0), which would make the cap-32 arm compile
    # the identical bw=16 kernel and measure nothing
    batch, clip_len, iters = 256, 32, 12

    cfg = EncoderConfig.create(DIMS_RAW, DIMS_DIFF, conv_impl="kernel")
    model, params = init_encoder(cfg, jax.random.key(0), clip_len=clip_len)
    tx = make_optimizer(3e-4, 1000)
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.normal(size=(batch, clip_len, cfg.input_dim))
                    .astype(np.float32))
        for _ in range(3)
    ]
    labels = jnp.asarray(
        np.tile(np.arange(10), -(-batch // 10))[:batch].astype(np.int32)
    )
    key = jax.random.key(1)
    orig_pick = ckt._pick_block

    for cap in (16, 32):
        ckt._pick_block = (
            orig_pick if cap == 16
            else (lambda B, c: orig_pick(B, 32 if c == 16 else c))
        )
        try:
            # FRESH param buffers per arm: the train step donates the state
            # (donate_argnums), so reusing `params` across arms would raise
            # buffer-donated errors masquerading as kernel failures
            p0 = jax.tree_util.tree_map(lambda a: jnp.array(np.asarray(a)),
                                        params)
            state = TrainState(p0, tx.init(p0), jnp.zeros((), jnp.int32))
            step = make_train_step(model, tx)
            state, m = step(state, feats[0], labels, key)
            float(m["total"])
            for _pass in range(2):
                t0 = time.perf_counter()
                for i in range(iters):
                    state, m = step(state, feats[i % 3], labels, key)
                final = float(m["total"])
                dt = (time.perf_counter() - t0) / iters
            print(json.dumps({
                "bwd_cap": cap, "steps_per_sec": round(1.0 / dt, 3),
                "loss_finite": bool(np.isfinite(final)),
            }), flush=True)
        except Exception as e:  # VMEM blowout is an expected outcome
            print(json.dumps({"bwd_cap": cap, "error": repr(e)[:300]}),
                  flush=True)
        finally:
            ckt._pick_block = orig_pick


if __name__ == "__main__":
    main()
