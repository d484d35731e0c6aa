"""Extraction-path benchmarks (BASELINE.json configs 2 and 3):

- config 2: DWPose-equivalent whole-body pose net batched over person-crop
  stacks (SimCC head, 133 kpts);
- config 3: TokenHMR-equivalent mesh extraction (ViT-H backbone + SMPL token
  decoder head) on crop batches.

Prints one JSON line per config with frames/sec on the default backend.
The reference runs the detector per frame and TokenHMR at batch 8 on a GPU
(ref ``mesh_generator.py:103-146``); here the whole frame stack is one
batched forward.

Usage: python benchmarks/bench_extract.py [--batch 32] [--iters 3] [--bf16]
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

from video_gen_evals_tpu.models.pose2d import PoseNetConfig, SimCCPoseNet
from video_gen_evals_tpu.models.smpl_head import SMPLHeadConfig, SMPLTokenDecoderHead
from video_gen_evals_tpu.models.vit import ViTBackbone, ViTConfig


def _load_fields() -> dict:
    """Host-contention fields for the output JSON (round-5 discipline)."""
    from video_gen_evals_tpu.utils.hostload import snapshot

    s = snapshot()
    return {"host_load1": s["load1"], "host_contended": s["contended"]}


def _time(fn, params, xs, iters=16):
    """Honest steady-state timing through the execution tunnel: iterations
    are CHAINED via a data dependency (call i+1's input depends on call i's
    output) and each pass ends with a real value fetch — block_until_ready
    does not reliably block through the relay, and independent calls can be
    absorbed by the dispatch queue. Two passes, report the second."""
    carry = jnp.zeros((), xs[0].dtype)
    out = fn(params, xs[0] + carry)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32))
    for _pass in range(2):
        carry = jnp.zeros((), xs[0].dtype)
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(params, xs[i % len(xs)] + carry * 0)
            carry = jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(xs[0].dtype) * 0
        float(carry.astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters
    return dt


def bench_pose(batch: int, iters: int, dtype) -> None:
    cfg = PoseNetConfig()  # 256x192 crops, 133 kpts (DWPose-equivalent)
    net = SimCCPoseNet(cfg)
    x = jnp.zeros((batch, *cfg.input_hw, 3), dtype)
    params = jax.jit(lambda k: net.init(k, x)["params"])(jax.random.key(0))
    if dtype == jnp.bfloat16:
        params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
    fwd = jax.jit(lambda p, x: net.apply({"params": p}, x))
    xs = [x + jnp.asarray(i, dtype) for i in range(4)]
    dt = _time(fwd, params, xs, iters=iters)
    print(json.dumps({
        "metric": "dwpose_equiv_pose_frames_per_sec",
        "value": round(batch / dt, 2),
        "unit": "frames/sec",
        "batch": batch,
        "dtype": str(dtype.__name__),
        **_load_fields(),
    }))


def bench_mesh(batch: int, iters: int, dtype, depth: int) -> None:
    vit_cfg = ViTConfig(depth=depth)  # ViT-H geometry (1280 x 32 by default)
    head_cfg = SMPLHeadConfig()
    vit = ViTBackbone(vit_cfg)
    head = SMPLTokenDecoderHead(head_cfg)
    x = jnp.zeros((batch, *vit_cfg.img_size, 3), dtype)
    vp = jax.jit(lambda k: vit.init(k, x)["params"])(jax.random.key(0))
    ctx0 = jnp.zeros((batch, vit_cfg.num_patches, vit_cfg.embed_dim), dtype)
    hp = jax.jit(lambda k: head.init(k, ctx0)["params"])(jax.random.key(1))
    if dtype == jnp.bfloat16:
        vp = jax.tree_util.tree_map(lambda a: a.astype(dtype), vp)
        hp = jax.tree_util.tree_map(lambda a: a.astype(dtype), hp)

    def fwd(params, x):
        vp, hp = params
        tokens, _ = vit.apply({"params": vp}, x)
        return head.apply({"params": hp}, tokens)["token_out"]

    jfwd = jax.jit(fwd)
    xs = [x + jnp.asarray(i, dtype) for i in range(4)]
    dt = _time(jfwd, (vp, hp), xs, iters=iters)
    print(json.dumps({
        "metric": "tokenhmr_equiv_mesh_frames_per_sec",
        "value": round(batch / dt, 2),
        "unit": "frames/sec",
        "batch": batch,
        "vit_depth": depth,
        "dtype": str(dtype.__name__),
        **_load_fields(),
    }))


def main() -> None:
    from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--vit-depth", type=int, default=32)
    p.add_argument("--only", choices=["pose", "mesh"], default=None)
    args = p.parse_args()
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.only in (None, "pose"):
        bench_pose(args.batch, args.iters, dtype)
    if args.only in (None, "mesh"):
        bench_mesh(args.batch, args.iters, dtype, args.vit_depth)


if __name__ == "__main__":
    main()
