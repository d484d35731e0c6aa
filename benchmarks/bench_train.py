"""Training-step benchmark (BASELINE config 5): the fused 4-forward jitted
train step (clean + shuffle/reverse/static corruptions, TCL + hard-negative
losses, AdamW) at the reference batch geometry (P=10 x K=24 = 240 windows),
full flagship dims. Prints one JSON line with optimizer steps/sec and
window-forwards/sec (4 forwards per window per step).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from video_gen_evals_tpu.models import EncoderConfig
from video_gen_evals_tpu.models.fusion_encoder import init_encoder
from video_gen_evals_tpu.train.step import TrainState, make_optimizer, make_train_step

DIMS_RAW = {"vit": 1024, "global": 9, "pose": 207, "beta": 10, "kp2d": 120}
DIMS_DIFF = {"vit": 1024, "global": 3, "pose": 69, "beta": 10, "kp2d": 120}


def main() -> None:
    from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=240)  # P=10 x K=24 (ref)
    p.add_argument("--clip-len", type=int, default=32)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--conv-impl", default="module",
                   choices=["module", "kernel"],
                   help="'kernel' = fused Pallas conv stages w/ custom VJP")
    args = p.parse_args()

    cfg = EncoderConfig.create(DIMS_RAW, DIMS_DIFF, conv_impl=args.conv_impl)
    model, params = init_encoder(cfg, jax.random.key(0), clip_len=args.clip_len)
    tx = make_optimizer(3e-4, 1000)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx)

    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(
            rng.normal(size=(args.batch, args.clip_len, cfg.input_dim)).astype(np.float32)
        )
        for _ in range(3)
    ]
    labels = jnp.asarray(np.tile(np.arange(10), args.batch // 10 + 1)[: args.batch].astype(np.int32))
    key = jax.random.key(1)

    state, m = step(state, feats[0], labels, key)  # compile
    float(m["total"])
    # Steps chain through the train state; ending each pass with a real value
    # fetch is the completion barrier (block_until_ready does not reliably
    # block through the execution tunnel). Two passes, report the second.
    for _pass in range(2):
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, m = step(state, feats[i % 3], labels, key)
        final = float(m["total"])
        dt = (time.perf_counter() - t0) / args.iters

    from video_gen_evals_tpu.utils.hostload import snapshot

    load = snapshot()
    print(json.dumps({
        "metric": "train_steps_per_sec",
        "value": round(1.0 / dt, 3),
        "unit": "steps/sec",
        "batch": args.batch,
        "conv_impl": args.conv_impl,
        "window_forwards_per_sec": round(4 * args.batch / dt, 1),
        "loss_finite": bool(np.isfinite(final)),
        "host_load1": load["load1"],
        "host_contended": load["contended"],
    }))


if __name__ == "__main__":
    main()
