"""Detector box-sensitivity study (round-3 judge directive #3; PARITY.md).

The reference's mesh crops come from Faster R-CNN X101 boxes
(ref ``mesh_generator.py:69-74``); the rebuild's come from YOLOX. This study
quantifies how sensitive the downstream features and AC/TC scores are to box
provenance: systematic scale (x0.90..x1.10) and shift (1..10% of box size)
perturbations of the MESH-crop boxes, everything else (keypoints, stats,
centroids, encoder) held fixed from the unjittered baseline.

Run on the real TPU chip:
    python benchmarks/box_sensitivity_study.py [--videos 8] [--frames 32]

Prints a markdown table; paste into PARITY.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

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

    from _study_common import (
        CLASSES,
        extract_with_boxes,
        jitter_boxes,
        person_boxes,
        score_drift,
        score_tree,
        synth_frames,
        write_tree,
    )
    from video_gen_evals_tpu.models import EncoderConfig
    from video_gen_evals_tpu.models.fusion_encoder import init_encoder
    from video_gen_evals_tpu.pipelines.extract import Extractor, ExtractorConfig
    from video_gen_evals_tpu.pipelines.score import WindowEncoder

    rng = np.random.default_rng(7)
    videos = {}
    for i in range(args.videos):
        cls = CLASSES[i % len(CLASSES)]
        videos[f"{cls}/v{i:02d}"] = (
            synth_frames(args.frames, H, W, rng),
            person_boxes(args.frames, H, W, rng),
        )

    ex = Extractor(ExtractorConfig(keep_all_frames=True))  # precision "high"

    variants = [("baseline", 1.0, 0.0)]
    variants += [(f"scale x{s:.2f}", s, 0.0)
                 for s in (0.99, 1.01, 0.98, 1.02, 0.95, 1.05, 0.90, 1.10)]
    variants += [(f"shift {int(f*100)}%", 1.0, f) for f in (0.01, 0.02, 0.05, 0.10)]

    raw_out = {}
    for name, scale, shift in variants:
        per_video = {}
        for vid, (frames, boxes) in videos.items():
            b = jitter_boxes(boxes, scale=scale, shift_frac=shift)
            mesh, kp = extract_with_boxes(ex, frames, b, with_pose=(name == "baseline"))
            per_video[vid] = (mesh, kp)
        raw_out[name] = per_video
        print(f"[extracted] {name}", flush=True)

    # variants reuse the baseline keypoints (kp boxes come from the SAME
    # detector family in reference and rebuild — only mesh boxes differ)
    base_kp = {vid: raw_out["baseline"][vid][1] for vid in videos}
    for name, _, _ in variants[1:]:
        raw_out[name] = {
            vid: (raw_out[name][vid][0], base_kp[vid]) for vid in videos
        }

    enc_cfg = EncoderConfig.create(
        {"vit": 1024, "global": 9, "pose": 207, "beta": 10, "kp2d": 120},
        {"vit": 1024, "global": 3, "pose": 69, "beta": 10, "kp2d": 120},
    )
    model, params = init_encoder(enc_cfg, jax.random.key(0))
    encoder = WindowEncoder(model, params, batch_size=32, clip_len=32)

    def tokdiff(name):
        b = raw_out["baseline"]
        v = raw_out[name]
        return max(
            float(np.abs(v[k][0]["vit"] - b[k][0]["vit"]).max()) for k in videos
        )

    def rank_stability(base, variant):
        """Spearman of per-video AC and TC orderings, baseline vs variant —
        the quantity TAG's headline metric (rank correlation with human MOS)
        actually depends on."""
        from scipy.stats import spearmanr

        keys = sorted(base)
        ac = spearmanr([base[k]["ac"] for k in keys],
                       [variant[k]["ac"] for k in keys]).statistic
        tc = spearmanr([base[k]["tc"] for k in keys],
                       [variant[k]["tc"] for k in keys]).statistic
        return float(ac), float(tc)

    rows = []
    with tempfile.TemporaryDirectory() as td:
        mr, kr = write_tree(os.path.join(td, "baseline"), raw_out["baseline"])
        base_scores, stats, centroids, _ = score_tree(mr, kr, encoder)
        for name, scale, shift in variants[1:]:
            mr, kr = write_tree(
                os.path.join(td, name.replace(" ", "_").replace("%", "")),
                raw_out[name],
            )
            scores, _, _, _ = score_tree(
                mr, kr, encoder, stats=stats, centroids=centroids
            )
            dac, dtc = score_drift(base_scores, scores)
            rs_ac, rs_tc = rank_stability(base_scores, scores)
            rows.append((name, tokdiff(name), dac, dtc, rs_ac, rs_tc))
            print(f"[scored] {name}: dAC={dac:.2e} dTC={dtc:.2e} "
                  f"rankAC={rs_ac:.2f} rankTC={rs_tc:.2f}", flush=True)

    ac_mag = np.mean([abs(s["ac"]) for s in base_scores.values()])
    tc_mag = np.mean([abs(s["tc"]) for s in base_scores.values()])
    print("\n### Box-sensitivity study "
          f"({args.videos} videos x {args.frames} frames, ViT-H random init, "
          "extraction precision 'high')\n")
    print("| mesh-box perturbation | token_out max|d| | max dAC | max dTC "
          "| rank-Spearman AC | rank-Spearman TC |")
    print("|---|---|---|---|---|---|")
    for name, td_, dac, dtc, rs_ac, rs_tc in rows:
        print(f"| {name} | {td_:.2e} | {dac:.2e} | {dtc:.2e} "
              f"| {rs_ac:.2f} | {rs_tc:.2f} |")
    print(f"\nbaseline score magnitudes: mean|AC|={ac_mag:.3f} "
          f"mean|TC|={tc_mag:.3f}; parity budget 1e-3.")


if __name__ == "__main__":
    main()
