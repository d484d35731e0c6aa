"""On-chip breakdown of the config-4 mesh stage: upstream crop warp vs
ViT-H backbone vs SMPL head, at the production chunk size and doubled.

The config-4 probe shows the mesh stage at ~7 ms/frame while the standalone
ViT-H extraction bench ran ~2.8 ms/frame (bf16) — this isolates where the
difference lives and whether frame_batch 32 -> 64 buys MXU utilization.

Run in background with a long timeout (fresh compiles possible).
Usage: python benchmarks/probe_mesh_stage.py [--batch 32] [--skip-crop]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_pass(fn, *args, iters: int = 8, fetch=lambda out: None):
    """Chained-iteration timing with a terminal value fetch (CLAUDE.md
    discipline: the dispatch queue absorbs leading calls; identical calls
    can short-circuit — vary inputs via the carry)."""
    out = fn(*args)
    _ = fetch(out)  # compile + drain
    t0 = time.perf_counter()
    carry = 0.0
    for i in range(iters):
        out = fn(*args, jitter=np.float32(1e-6 * (i + 1) + carry))
        carry = float(fetch(out)) * 1e-9
    return (time.perf_counter() - t0) / iters


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--hw", default="240x320")
    args = p.parse_args()
    H, W = (int(x) for x in args.hw.split("x"))
    B = args.batch

    from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from video_gen_evals_tpu.ops.upstream_crops import vitdet_mesh_crop
    from video_gen_evals_tpu.pipelines.extract import Extractor, ExtractorConfig
    from video_gen_evals_tpu.models.vit import ViTConfig

    cfg = ExtractorConfig(vit=ViTConfig(depth=32), keep_all_frames=True,
                          frame_batch=B)
    ex = Extractor(cfg)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        ex.params,
    )

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, (B, H, W, 3), np.uint8).astype(np.float32)
    )
    boxes = jnp.asarray(
        np.stack(
            [
                np.full(B, 40.0),
                np.full(B, 20.0),
                np.full(B, 280.0) + rng.uniform(0, 4, B),
                np.full(B, 230.0) + rng.uniform(0, 4, B),
            ],
            axis=1,
        ).astype(np.float32)
    )

    prec = cfg.matmul_precision

    @jax.jit
    def crop_only(f, b, jitter=np.float32(0)):
        with jax.default_matmul_precision(prec):
            return vitdet_mesh_crop(
                f + jitter, b, out_hw=cfg.vit.img_size,
                rescale_factor=cfg.vitdet_rescale,
                antialias=cfg.vitdet_antialias,
            )

    # params are jit ARGUMENTS: closing over them bakes ~2 GB of weights
    # into the HLO as constants, which the tunnel's remote-compile endpoint
    # rejects (broken pipe / HTTP 413 class — CLAUDE.md; bit this probe in
    # round 5)
    @jax.jit
    def backbone_only(pv, crops, jitter=np.float32(0)):
        with jax.default_matmul_precision(prec):
            tokens, _ = ex.backbone.apply({"params": pv}, crops + jitter)
            return tokens

    @jax.jit
    def head_only(ph, tokens, jitter=np.float32(0)):
        with jax.default_matmul_precision(prec):
            return ex.head.apply({"params": ph}, tokens + jitter)

    @jax.jit
    def full_mesh(pv, ph, f, b, jitter=np.float32(0)):
        with jax.default_matmul_precision(prec):
            crops = vitdet_mesh_crop(
                f + jitter, b, out_hw=cfg.vit.img_size,
                rescale_factor=cfg.vitdet_rescale,
                antialias=cfg.vitdet_antialias,
            )
            tokens, _ = ex.backbone.apply({"params": pv}, crops)
            return ex.head.apply({"params": ph}, tokens)

    crops = crop_only(frames, boxes)
    t_crop = timed_pass(
        lambda f, b, jitter=np.float32(0): crop_only(f, b, jitter),
        frames, boxes, fetch=lambda o: float(o[0, 0, 0, 0]),
    )
    print(f"crop warp      [{B}]: {t_crop*1e3:8.2f} ms  ({t_crop/B*1e3:.2f}/frame)")

    tokens = backbone_only(params["vit"], crops)
    t_bb = timed_pass(
        lambda c, jitter=np.float32(0): backbone_only(
            params["vit"], c, jitter
        ),
        crops, fetch=lambda o: float(o[0, 0, 0]),
    )
    print(f"ViT-H backbone [{B}]: {t_bb*1e3:8.2f} ms  ({t_bb/B*1e3:.2f}/frame)")

    t_head = timed_pass(
        lambda t, jitter=np.float32(0): head_only(params["head"], t, jitter),
        tokens, fetch=lambda o: float(o["betas"][0, 0]),
    )
    print(f"SMPL head      [{B}]: {t_head*1e3:8.2f} ms  ({t_head/B*1e3:.2f}/frame)")

    t_full = timed_pass(
        lambda f, b, jitter=np.float32(0): full_mesh(
            params["vit"], params["head"], f, b, jitter
        ),
        frames, boxes, fetch=lambda o: float(o["betas"][0, 0]),
    )
    print(f"fused mesh fwd [{B}]: {t_full*1e3:8.2f} ms  ({t_full/B*1e3:.2f}/frame)")
    print(f"sum of parts: {(t_crop+t_bb+t_head)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
