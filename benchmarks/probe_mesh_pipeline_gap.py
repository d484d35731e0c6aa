"""Why does the IN-PIPELINE mesh stage measure ~7 ms/frame when the fused
mesh probe measures ~3.3 (bf16, same chunk/geometry)? (round-5 follow-up to
the BENCH_NOTES mesh-stage split)

Times, on identical device-resident inputs and the same bf16-cast params:

  A. production path: ``Extractor._batched(_mesh_forward)`` exactly as
     ``pipelines/full.py`` drives it (chunked, fetch=False, one terminal
     fetch) — the number the config-4 steady state actually pays;
  B. the same ``_mesh_forward`` dispatched directly per 32-chunk (no
     ``_batched`` slicing/padding machinery);
  C. a probe-style plain ``jax.jit`` of crop+backbone+head (no sjit
     sharding wrappers) per 32-chunk;
  D. the breakdown-style call (``fetch=True`` per iteration) that produced
     the 448 ms/video figure, for methodology comparison.

    BENCH_REQUIRE_IDLE=1 timeout 3000 python benchmarks/probe_mesh_pipeline_gap.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from video_gen_evals_tpu.utils.backend_guard import require_backend
    from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    require_backend()

    import jax
    import jax.numpy as jnp

    from video_gen_evals_tpu.models.vit import ViTConfig
    from video_gen_evals_tpu.ops.upstream_crops import vitdet_mesh_crop
    from video_gen_evals_tpu.pipelines.extract import Extractor, ExtractorConfig
    from video_gen_evals_tpu.utils.hostload import guard

    host_load = guard("probe_mesh_pipeline_gap")
    T_frames = int(os.environ.get("PROBE_FRAMES", "64"))
    H, W = 240, 320
    iters = int(os.environ.get("PROBE_ITERS", "6"))

    cfg = ExtractorConfig(vit=ViTConfig(depth=32), keep_all_frames=True)
    ex = Extractor(cfg)
    # --bf16 benchmark-mode cast, as bench_full applies it
    ex.params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        ex.params,
    )

    rng = np.random.default_rng(3)
    frames_u8 = rng.integers(0, 255, (T_frames, H, W, 3), np.uint8)
    fd = ex._upload_frames(frames_u8)
    boxes_np = np.stack(
        [
            rng.uniform(20, 60, T_frames),
            rng.uniform(10, 40, T_frames),
            rng.uniform(240, 300, T_frames),
            rng.uniform(190, 235, T_frames),
        ],
        axis=1,
    ).astype(np.float32)
    boxes = jnp.asarray(boxes_np)

    pv, ph_ = ex.params["vit"], ex.params["head"]

    def timed(label, fn, results, per_frame_n):
        fn(np.float32(0.0))  # warm/compile
        t0 = time.perf_counter()
        carry = np.float32(0.0)
        for i in range(iters):
            carry = np.float32(1e-7 * float(fn(carry)))
        dt = (time.perf_counter() - t0) / iters
        results[label] = {
            "ms": round(dt * 1e3, 1),
            "ms_per_frame": round(dt / per_frame_n * 1e3, 3),
        }
        # emit incrementally: a tunnel failure in a later variant must not
        # lose the earlier measurements
        print(json.dumps({label: results[label]}), flush=True)

    results: dict = {}

    # A: production form (fetch=False + terminal value fetch)
    def run_pipeline(jitter):
        out = ex._batched(
            lambda f, b: ex._mesh_forward(pv, ph_, f + jitter, b),
            fd, boxes, fetch=False,
        )
        return float(out["betas"][0, 0])

    timed("A_batched_nofetch", run_pipeline, results, T_frames)

    # B: _mesh_forward dispatched per chunk directly (no _batched machinery)
    B_ = cfg.frame_batch
    chunks = [(fd[lo:lo + B_], boxes[lo:lo + B_])
              for lo in range(0, T_frames, B_)]

    def run_direct(jitter):
        outs = [ex._mesh_forward(pv, ph_, f + jitter, b) for f, b in chunks]
        return float(outs[-1]["betas"][0, 0])

    timed("B_mesh_forward_direct", run_direct, results, T_frames)

    # C: plain jit, probe-style fused program (no sjit wrapper). Params are
    # ARGUMENTS — closing over them bakes 2 GB of HLO constants and blows
    # the tunnel's remote-compile request (CLAUDE.md; observed here).
    @jax.jit
    def fused(pv_, ph2, f, b, jitter):
        with jax.default_matmul_precision(cfg.matmul_precision):
            crops = vitdet_mesh_crop(
                f + jitter, b, out_hw=cfg.vit.img_size,
                rescale_factor=cfg.vitdet_rescale,
                antialias=cfg.vitdet_antialias,
            )
            tokens, _ = ex.backbone.apply({"params": pv_}, crops)
            return ex.head.apply({"params": ph2}, tokens)

    def run_plain(jitter):
        outs = [fused(pv, ph_, f, b, jitter) for f, b in chunks]
        return float(outs[-1]["betas"][0, 0])

    timed("C_plain_jit", run_plain, results, T_frames)

    # D: breakdown-style (fetch=True inside the timed region)
    def run_breakdown(jitter):
        out = ex._batched(
            lambda f, b: ex._mesh_forward(pv, ph_, f + jitter, b),
            fd, boxes,
        )
        return float(out["betas"][0, 0])

    timed("D_batched_fetch", run_breakdown, results, T_frames)

    print(json.dumps({
        "metric": "mesh_pipeline_gap",
        "frames": T_frames,
        "chunk": B_,
        **results,
        "host_load1": host_load["load1"],
        "host_contended": host_load["contended"],
    }))


if __name__ == "__main__":
    main()
