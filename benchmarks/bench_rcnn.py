"""Faster R-CNN X101-FPN detect-stage throughput on TPU (round 3).

Times the full rcnn mesh-detector stage exactly as the extractor runs it
(`pipelines/extract.py::detect_rcnn`): 240x320 RGB frames -> DefaultPredictor
preprocessing (resize to 800x1067, BGR, mean-subtract, pad to 800x1088) ->
backbone/FPN/RPN -> 1000 proposals -> ROIAlign -> box head -> class NMS ->
single-person boxes. Random weights (throughput is weight-independent).

Comparison point: the reference runs this same detector once per frame via
detectron2's DefaultPredictor (ref ``mesh_generator.py:103-117``); the d2
model zoo lists X101-32x8d-FPN-3x at ~0.098 s/im on V100 (~10 f/s).

    BENCH_BATCHES=8,16 BENCH_PREC=high,default python benchmarks/bench_rcnn.py

BENCH_NOTES timing discipline: chained data deps, varied inputs, second
pass, value-fetch barrier.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from video_gen_evals_tpu.models.rcnn import RCNNConfig
    from video_gen_evals_tpu.pipelines.extract import Extractor, ExtractorConfig

    import dataclasses

    iters = int(os.environ.get("BENCH_ITERS", "6"))
    batches = [int(b) for b in os.environ.get("BENCH_BATCHES", "8,16").split(",")]
    precs = os.environ.get("BENCH_PREC", "high,default").split(",")
    impls = os.environ.get("BENCH_IMPL", "block_diag").split(",")
    rng = np.random.default_rng(0)

    for prec in precs:
      for impl in impls:
        base = (
            RCNNConfig.fast()
            if os.environ.get("BENCH_PRESET") == "fast"
            else RCNNConfig.x101_32x8d()
        )
        width = int(os.environ.get("BENCH_WIDTH", base.grouped_conv_width))
        roi_impl = os.environ.get("BENCH_ROI", base.roi_impl)
        ex = Extractor(
            ExtractorConfig(
                mesh_detector="rcnn",
                rcnn=dataclasses.replace(
                    base, grouped_conv_impl=impl, grouped_conv_width=width,
                    roi_impl=roi_impl,
                ),
                matmul_precision=prec,
                keep_all_frames=True,
            )
        )
        # the detect stage only needs the rcnn params; freeing the mesh/pose
        # nets keeps the whole bench inside HBM (a resident ViT-H pushed the
        # first run of this harness into RESOURCE_EXHAUSTED)
        for k in ("vit", "head", "pose"):
            ex.params.pop(k, None)
        for B in batches:
            frames = jnp.asarray(
                rng.integers(0, 255, size=(B, 240, 320, 3)).astype(np.float32)
            )
            carry = jnp.zeros((), jnp.float32)
            box1, single, _present = ex._detect_rcnn(ex.params["rcnn"], frames)
            _ = float(jnp.sum(box1).astype(jnp.float32))  # compile barrier
            for _pass in range(2):
                t0 = time.perf_counter()
                for i in range(iters):
                    fi = frames + (carry * 0 + jnp.float32(i))
                    box1, single, _present = ex._detect_rcnn(ex.params["rcnn"], fi)
                    carry = jnp.sum(box1).astype(jnp.float32) + jnp.sum(
                        single.astype(jnp.float32)
                    )
                _ = float(carry)
                ms = (time.perf_counter() - t0) / iters * 1e3
            from video_gen_evals_tpu.utils.hostload import snapshot

            load = snapshot()
            print(
                json.dumps(
                    {
                        "prec": prec,
                        "impl": impl,
                        "roi_impl": roi_impl,
                        "batch": B,
                        "ms_per_batch": round(ms, 2),
                        "frames_per_sec": round(B / ms * 1e3, 1),
                        "host_load1": load["load1"],
                        "host_contended": load["contended"],
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
