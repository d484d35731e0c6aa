"""Extraction-precision study (round-3 judge directive #4; PARITY.md).

Measures bf16 / default / high(bf16_3x) / highest matmul classes through the
FULL extraction stack — ViT-H (32 pre-LN blocks) + SMPL token head + pose
net, with the crop matmuls always pinned HIGHEST — and propagates each mode's
features through the production scoring pipeline (stats/centroids fixed from
the `highest` baseline) to AC/TC drift, mirroring the scoring-precision
methodology in benchmarks/BENCH_NOTES.md.

Run on the real TPU chip (background, long timeout):
    python benchmarks/precision_extraction_study.py [--videos 8] [--frames 32]

Prints a markdown table; paste into PARITY.md. Weights are random inits
(no checkpoints in this image) — the study measures the pipeline's numeric
sensitivity, which is the quantity the parity budget needs.
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
    p.add_argument("--time", action="store_true",
                   help="also time mesh-stage frames/s per mode (needs an "
                        "otherwise idle host)")
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

    # one shared f32 random init; each mode re-derives from it
    base_ex = Extractor(ExtractorConfig(matmul_precision="highest",
                                        keep_all_frames=True))
    f32_params = base_ex.params
    # condition the IEF mean-pose buffer like a real checkpoint: random init
    # leaves it at zero, and rot6d_to_rotmat of near-zero 6d vectors is
    # ill-conditioned — precision noise would flip whole rotations, which a
    # trained model (mean_params magnitudes ~O(1)) never sees
    npose = f32_params["head"]["init_body_pose"].shape[-1]
    mean6d = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 1.0, 0], jnp.float32), npose // 6)
    f32_params["head"]["init_body_pose"] = mean6d[None, :]

    modes = [
        ("highest", dict(matmul_precision="highest", param_dtype="float32")),
        ("high", dict(matmul_precision="high", param_dtype="float32")),
        ("default", dict(matmul_precision="default", param_dtype="float32")),
        ("bf16", dict(matmul_precision="default", param_dtype="bfloat16")),
    ]

    raw_out = {}       # mode -> {vid: (mesh, kp120)}
    times = {}
    for mode, kw in modes:
        ex = Extractor(
            ExtractorConfig(keep_all_frames=True, **kw), params=f32_params
        )
        per_video = {}
        t0 = time.time()
        for vid, (frames, boxes) in videos.items():
            per_video[vid] = extract_with_boxes(ex, frames, boxes)
        # end with a real value fetch (tunnel discipline)
        _ = float(per_video[vid][0]["vit"].sum())
        times[mode] = time.time() - t0
        raw_out[mode] = per_video
        print(f"[extracted] {mode} in {times[mode]:.1f}s", flush=True)

    # ---- raw feature deltas vs highest -----------------------------------
    def rel(a, b):
        d = np.abs(a.astype(np.float64) - b.astype(np.float64))
        return d.max(), d.max() / max(np.abs(b).max(), 1e-12)

    base = raw_out["highest"]
    raw_rows = []
    for mode, _ in modes[1:]:
        v = raw_out[mode]
        tok = [rel(v[k][0]["vit"], base[k][0]["vit"]) for k in videos]
        pos = [rel(v[k][0]["pose"], base[k][0]["pose"]) for k in videos]
        kp = [rel(v[k][1], base[k][1]) for k in videos]
        raw_rows.append(
            (mode,
             max(t[0] for t in tok), max(t[1] for t in tok),
             max(t[0] for t in pos),
             max(t[0] for t in kp))
        )

    # ---- propagate to AC/TC with fixed baseline artifacts -----------------
    enc_dims_raw = {"vit": 1024, "global": 9, "pose": 207, "beta": 10, "kp2d": 120}
    enc_dims_diff = {"vit": 1024, "global": 3, "pose": 69, "beta": 10, "kp2d": 120}
    enc_cfg = EncoderConfig.create(enc_dims_raw, enc_dims_diff)
    model, params = init_encoder(enc_cfg, jax.random.key(0))
    encoder = WindowEncoder(model, params, batch_size=32, clip_len=32)

    score_rows = []
    mod_rows = {}
    with tempfile.TemporaryDirectory() as td:
        mesh_root, kp_root = write_tree(
            os.path.join(td, "highest"), raw_out["highest"]
        )
        base_scores, stats, centroids, _ = score_tree(
            mesh_root, kp_root, encoder
        )
        # per-modality attribution: normalized (z-scored) bank deltas
        from video_gen_evals_tpu.data import (
            ModalityPaths, build_feature_bank, scan_class_tree,
        )

        def bank_of(root_dir, kp_dir):
            m = scan_class_tree(root_dir)
            return build_feature_bank(
                m.items, ModalityPaths(keypoint_dir=kp_dir, layout="real"),
                stats, min_rows=40,
            )

        base_bank = bank_of(mesh_root, kp_root)
        mods_list = stats.modalities
        dims_r, dims_d = stats.dims_map_raw(), stats.dims_map_diff()
        slices = {}
        off = 0
        for m in mods_list:
            slices[f"{m}.raw"] = slice(off, off + dims_r[m]); off += dims_r[m]
        for m in mods_list:
            slices[f"{m}.diff"] = slice(off, off + dims_d[m]); off += dims_d[m]

        for mode, _ in modes[1:]:
            mr, kr = write_tree(os.path.join(td, mode), raw_out[mode])
            scores, _, _, _ = score_tree(
                mr, kr, encoder, stats=stats, centroids=centroids
            )
            dac, dtc = score_drift(base_scores, scores)
            score_rows.append((mode, dac, dtc))
            vb = bank_of(mr, kr)
            mod_rows[mode] = {
                k: float(np.abs(vb.bank[:, s] - base_bank.bank[:, s]).max())
                for k, s in slices.items()
            }
            print(f"[scored] {mode}: dAC={dac:.2e} dTC={dtc:.2e}", flush=True)

    ac_mag = np.mean([abs(s["ac"]) for s in base_scores.values()])
    tc_mag = np.mean([abs(s["tc"]) for s in base_scores.values()])

    print("\n### Extraction precision study "
          f"({args.videos} videos x {args.frames} frames, ViT-H random init)\n")
    print("| mode | token_out max|d| | token_out rel | pose rotmat max|d| "
          "| kp120 max|d| | max dAC | max dTC |")
    print("|---|---|---|---|---|---|---|")
    for (mode, tok_abs, tok_rel, pos_abs, kp_abs), (m2, dac, dtc) in zip(
        raw_rows, score_rows
    ):
        assert mode == m2
        print(f"| {mode} | {tok_abs:.2e} | {tok_rel:.2e} | {pos_abs:.2e} "
              f"| {kp_abs:.2e} | {dac:.2e} | {dtc:.2e} |")
    print(f"\nbaseline score magnitudes: mean|AC|={ac_mag:.3f} "
          f"mean|TC|={tc_mag:.3f}; parity budget 1e-3.")

    some = next(iter(mod_rows.values()))
    print("\nPer-modality normalized (z-scored) bank max|d| vs highest:\n")
    print("| mode | " + " | ".join(some) + " |")
    print("|---|" + "---|" * len(some))
    for mode, row in mod_rows.items():
        print("| " + mode + " | "
              + " | ".join(f"{v:.1e}" for v in row.values()) + " |")
    if args.time:
        print("\nextract wall-times (incl. compile on first mode):")
        for mode, t in times.items():
            print(f"  {mode}: {t:.1f}s")


if __name__ == "__main__":
    main()
