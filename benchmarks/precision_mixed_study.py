"""Mixed-precision extraction study (round-4 directive #7; PARITY.md).

The round-3 study measured the all-or-nothing matmul classes: `high`
(bf16_3x) holds the 1e-3 AC/TC budget at 159 f/s on the ViT-H mesh stage,
`default` (single-pass bf16) runs 351 f/s but breaks it. This probe asks
the finer question: WHICH of the 32 ViT-H blocks' matmuls actually move
token_out past the budget? Per-block schedules (ViTConfig.block_precision)
run a prefix/suffix of blocks at `default` and the rest at `high`, and each
schedule's features propagate through the production scoring pipeline
(stats/centroids fixed from the `highest` baseline) to AC/TC drift —
exactly the round-3 methodology.

Run on the real TPU chip (background, long timeout):
    python benchmarks/precision_mixed_study.py [--videos 8] [--frames 32]

Prints a markdown table; paste into PARITY.md. Random-init weights (no
checkpoints in this image): measures the pipeline's numeric sensitivity.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    p = argparse.ArgumentParser()
    p.add_argument("--videos", type=int, default=8)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--hw", default="240x320")
    args = p.parse_args()
    H, W = (int(x) for x in args.hw.split("x"))

    import jax
    import jax.numpy as jnp

    from _study_common import (
        CLASSES,
        extract_with_boxes,
        person_boxes,
        score_drift,
        score_tree,
        synth_frames,
        write_tree,
    )
    from video_gen_evals_tpu.models import EncoderConfig
    from video_gen_evals_tpu.models.fusion_encoder import init_encoder
    from video_gen_evals_tpu.models.vit import ViTConfig
    from video_gen_evals_tpu.pipelines.extract import Extractor, ExtractorConfig
    from video_gen_evals_tpu.pipelines.score import WindowEncoder

    rng = np.random.default_rng(1337)
    videos = {}
    for i in range(args.videos):
        cls = CLASSES[i % len(CLASSES)]
        videos[f"{cls}/v{i:02d}"] = (
            synth_frames(args.frames, H, W, rng),
            person_boxes(args.frames, H, W, rng),
        )

    base_ex = Extractor(ExtractorConfig(matmul_precision="highest",
                                        keep_all_frames=True))
    f32_params = base_ex.params
    npose = f32_params["head"]["init_body_pose"].shape[-1]
    mean6d = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 1.0, 0], jnp.float32), npose // 6)
    f32_params["head"]["init_body_pose"] = mean6d[None, :]

    depth = ViTConfig().depth

    def sched(n_default_prefix=0, n_default_suffix=0):
        pre = ("default",) * n_default_prefix
        suf = ("default",) * n_default_suffix
        mid = ("high",) * (depth - len(pre) - len(suf))
        return pre + mid + suf

    # schedules: which k blocks run single-pass bf16 (`default`), rest `high`
    modes = [
        ("all_high", None, "high"),
        ("first8_default", sched(n_default_prefix=8), "high"),
        ("first16_default", sched(n_default_prefix=16), "high"),
        ("first24_default", sched(n_default_prefix=24), "high"),
        ("last8_default", sched(n_default_suffix=8), "high"),
        ("last16_default", sched(n_default_suffix=16), "high"),
        ("all_default", None, "default"),
    ]

    raw_out = {}
    times = {}
    # `highest` baseline for drift
    per_video = {}
    for vid, (frames, boxes) in videos.items():
        per_video[vid] = extract_with_boxes(base_ex, frames, boxes,
                                            with_pose=False)
    raw_out["highest"] = per_video
    print("[extracted] highest baseline", flush=True)

    for mode, blocks, stage_prec in modes:
        ex = Extractor(
            ExtractorConfig(
                vit=ViTConfig(block_precision=blocks),
                matmul_precision=stage_prec,
                keep_all_frames=True,
            ),
            params=f32_params,
        )
        pv = {}
        # warm pass (compile), then a timed pass over all videos
        for vid, (frames, boxes) in videos.items():
            pv[vid] = extract_with_boxes(ex, frames, boxes, with_pose=False)
        t0 = time.time()
        for vid, (frames, boxes) in videos.items():
            pv[vid] = extract_with_boxes(ex, frames, boxes, with_pose=False)
        _ = float(pv[vid][0]["vit"].sum())
        times[mode] = time.time() - t0
        raw_out[mode] = pv
        print(f"[extracted] {mode} in {times[mode]:.1f}s", flush=True)

    n_frames_total = sum(f.shape[0] for f, _ in videos.values())

    def rel(a, b):
        d = np.abs(a.astype(np.float64) - b.astype(np.float64))
        return d.max(), d.max() / max(np.abs(b).max(), 1e-12)

    base = raw_out["highest"]

    # ---- propagate to AC/TC with fixed baseline artifacts -----------------
    enc_dims_raw = {"vit": 1024, "global": 9, "pose": 207, "beta": 10}
    enc_dims_diff = {"vit": 1024, "global": 3, "pose": 69, "beta": 10}
    enc_cfg = EncoderConfig.create(enc_dims_raw, enc_dims_diff)
    model, params = init_encoder(enc_cfg, jax.random.key(0))
    encoder = WindowEncoder(model, params, batch_size=32, clip_len=32)

    rows = []
    with tempfile.TemporaryDirectory() as td:
        mesh_root, kp_root = write_tree(
            os.path.join(td, "highest"), raw_out["highest"]
        )
        base_scores, stats, centroids, _ = score_tree(
            mesh_root, None, encoder
        )
        for mode, _blocks, _sp in modes:
            tok = [rel(raw_out[mode][k][0]["vit"], base[k][0]["vit"])
                   for k in videos]
            mr, _ = write_tree(os.path.join(td, mode), raw_out[mode])
            scores, _, _, _ = score_tree(
                mr, None, encoder, stats=stats, centroids=centroids
            )
            dac, dtc = score_drift(base_scores, scores)
            rows.append(
                (mode, max(t[0] for t in tok), max(t[1] for t in tok),
                 dac, dtc, n_frames_total / times[mode])
            )
            print(f"[scored] {mode}: dAC={dac:.2e} dTC={dtc:.2e}", flush=True)

    print("\n### Mixed-precision ViT-H schedules "
          f"({args.videos} videos x {args.frames} frames, random init; "
          "deltas vs `highest`, budget 1e-3)\n")
    print("| schedule | token_out max|d| | rel | max dAC | max dTC "
          "| mesh f/s |")
    print("|---|---|---|---|---|---|")
    for mode, tok_abs, tok_rel, dac, dtc, fps in rows:
        print(f"| {mode} | {tok_abs:.2e} | {tok_rel:.2e} | {dac:.2e} "
              f"| {dtc:.2e} | {fps:.0f} |")


if __name__ == "__main__":
    main()
