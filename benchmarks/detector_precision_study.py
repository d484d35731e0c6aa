"""Detector-stage precision sensitivity (round-5 directive #2).

The parity preset runs the ENTIRE extraction chain — including the Faster
R-CNN X101-FPN detect stage, ~50% of parity config-4 wall clock — at matmul
class ``high``. But the detector only contributes BOXES; if cheaper detector
matmuls move the regressed boxes far less than the ±1% jitter that PARITY.md
measured to cost 2-6e-2 AC/TC, the detect stage can be flipped to the cheap
class inside ``ExtractorConfig.parity()`` with a measured justification.

Method (composing the round-3 machinery per the verdict):

1. One shared random-weight extractor param set; per arm, an Extractor whose
   ``matmul_precision`` differs ONLY for the jitted R-CNN detect stage
   (mesh/pose stages are driven with explicit boxes at ``high`` via
   ``_study_common.extract_with_boxes``, so every arm's downstream is
   identical).
2. Per arm: per-frame box drift vs the ``high`` baseline, split into
   (a) coordinate drift relative to box size on frames where BOTH arms
   selected the same detection (the regression-numerics signal), and
   (b) the selection-flip rate (argmax over scores picking a different
   detection — near-threshold ties; random weights make ties far more
   common than trained ones, so this is a pessimistic bound, recorded
   separately so it can't masquerade as regression drift).
3. End-to-end: score trees built from each arm's boxes with shared stats +
   centroids from the baseline arm -> max |dAC| / |dTC|.

Caveat (as in every PARITY.md study in this image): random weights — no
checkpoints available. Box-coordinate drift measures numeric sensitivity of
the conv/FPN/head chain; the flip rate is weight-dependent and pessimistic.

    timeout 3000 python benchmarks/detector_precision_study.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _study_common import (  # noqa: E402
    CLASSES,
    extract_with_boxes,
    person_boxes,
    score_drift,
    score_tree,
    synth_frames,
    write_tree,
)


def main() -> None:
    from video_gen_evals_tpu.utils.backend_guard import require_backend
    from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    require_backend()

    import jax
    import jax.numpy as jnp

    from video_gen_evals_tpu.models import EncoderConfig
    from video_gen_evals_tpu.models.fusion_encoder import init_encoder
    from video_gen_evals_tpu.pipelines.extract import Extractor, ExtractorConfig
    from video_gen_evals_tpu.utils.hostload import guard

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    host_load = guard("detector_precision_study")
    emit(tag="backend", platform=jax.default_backend(), **{
        "host_load1": host_load["load1"],
        "host_contended": host_load["contended"],
    })

    Tlen = int(os.environ.get("STUDY_FRAMES", "48"))
    H, W = 240, 320
    vids_per_class = int(os.environ.get("STUDY_VIDEOS", "2"))
    arms = os.environ.get("STUDY_ARMS", "default,bf16_params").split(",")

    rng = np.random.default_rng(7)
    videos = {}
    for cls in CLASSES:
        for i in range(vids_per_class):
            videos[f"{cls}/vid{i}"] = (
                synth_frames(Tlen, H, W, rng),
                person_boxes(Tlen, H, W, rng),
            )

    # baseline extractor: detect at "high" — shared weights for every arm
    base_cfg = ExtractorConfig(
        mesh_detector="rcnn", keep_all_frames=True, matmul_precision="high"
    )
    ex_high = Extractor(base_cfg)

    def rcnn_boxes(ex, frames_u8):
        fd = ex._upload_frames(frames_u8)
        box1, single, _present = ex._batched(
            lambda f: ex._detect_rcnn(ex.params["rcnn"], f),
            fd,
            fetch=False,
            batch=ex.cfg.rcnn_frame_batch,
        )
        return np.asarray(box1), np.asarray(single)

    # detector scores/indices for flip detection: re-run the stage fetching
    # the argmax winner's identity via the box values themselves — two arms
    # "selected the same detection" iff their boxes differ by < 5% of size
    # (regression drift is orders smaller; flips jump to a different object)
    def split_drift(b_ref, b_arm):
        wh_ref = np.maximum(
            np.stack([b_ref[:, 2] - b_ref[:, 0], b_ref[:, 3] - b_ref[:, 1]],
                     axis=1),
            1.0,
        )
        d = np.abs(b_arm - b_ref) / np.repeat(wh_ref, 2, axis=1)
        per_frame = d.max(axis=1)
        flipped = per_frame > 0.05
        same = ~flipped
        stats = {
            "flip_rate": float(flipped.mean()),
            "n_frames": int(len(per_frame)),
        }
        if same.any():
            stats["box_drift_rel_p50"] = float(np.median(per_frame[same]))
            stats["box_drift_rel_p95"] = float(
                np.percentile(per_frame[same], 95)
            )
            stats["box_drift_rel_max"] = float(per_frame[same].max())
        return stats, flipped

    boxes_high = {}
    for vid, (frames, _gt) in videos.items():
        b, _s = rcnn_boxes(ex_high, frames)
        boxes_high[vid] = b
    emit(tag="baseline_boxes_done", arm="high")

    # baseline tree + scores (downstream fixed at high for every arm)
    enc_cfg = EncoderConfig.create(
        {"vit": 1024, "global": 9, "pose": 207, "beta": 10, "kp2d": 120},
        {"vit": 1024, "global": 3, "pose": 69, "beta": 10, "kp2d": 120},
    )
    model, params = init_encoder(enc_cfg, jax.random.key(0))
    from video_gen_evals_tpu.pipelines.score import WindowEncoder

    encoder = WindowEncoder(model, params, 64, 32, "high")

    with tempfile.TemporaryDirectory() as td:
        per_video = {}
        for vid, (frames, _gt) in videos.items():
            per_video[vid] = extract_with_boxes(
                ex_high, frames, boxes_high[vid]
            )
        mesh_root, kp_root = write_tree(os.path.join(td, "base"), per_video)
        base_scores, stats, centroids, _ = score_tree(
            mesh_root, kp_root, encoder, clip_len=32, stride=8
        )
        emit(tag="baseline_scores_done", n_videos=len(base_scores))

        for arm in arms:
            if arm == "bf16_params":
                cfg = dataclasses.replace(
                    base_cfg, matmul_precision="default",
                    param_dtype="bfloat16",
                )
            else:
                cfg = dataclasses.replace(base_cfg, matmul_precision=arm)
            # share the high-arm f32 params; the ctor casts for bf16 arms
            ex_arm = Extractor(cfg, params=dict(ex_high.params))

            drift_all, flips_all = [], []
            per_video_arm = {}
            for vid, (frames, _gt) in videos.items():
                b_arm, _s = rcnn_boxes(ex_arm, frames)
                stats_v, flipped = split_drift(boxes_high[vid], b_arm)
                drift_all.append(stats_v)
                flips_all.append(flipped)
                per_video_arm[vid] = extract_with_boxes(
                    ex_high, frames, b_arm
                )
            mesh_a, kp_a = write_tree(
                os.path.join(td, f"arm_{arm}"), per_video_arm
            )
            arm_scores, _, _, _ = score_tree(
                mesh_a, kp_a, encoder, stats=stats, centroids=centroids,
                clip_len=32, stride=8,
            )
            dac, dtc = score_drift(base_scores, arm_scores)
            agg = {
                "flip_rate": float(
                    np.mean([d["flip_rate"] for d in drift_all])
                ),
                "box_drift_rel_p95": float(
                    np.max([
                        d.get("box_drift_rel_p95", 0.0) for d in drift_all
                    ])
                ),
                "box_drift_rel_max": float(
                    np.max([
                        d.get("box_drift_rel_max", 0.0) for d in drift_all
                    ])
                ),
            }
            emit(tag="arm", arm=arm, dAC=float(dac), dTC=float(dtc), **agg)

    # ------------------------------------------------------------------
    # Fixed-proposal ROI-head numerics (selection-free; round-5 addendum).
    #
    # With random weights the end-to-end arms above live in an argmax-flip
    # regime (score near-ties everywhere -> ~94% of frames pick a DIFFERENT
    # detection per precision arm), so their dAC/dTC measure selection
    # noise, not numerics. This section pins the proposals: identical
    # boxes/levels into ``FasterRCNN.box_forward`` per arm, production
    # DefaultPredictor preprocessing (shortest-edge-800 BGR canvas), and
    # compares (a) person-class REFINED boxes after ``apply_deltas`` —
    # drift relative to box size, against the PARITY box-sensitivity
    # threshold (±1% of size costs 2-6e-2 AC/TC), and (b) raw class-logit
    # drift — a selection flip requires logit drift to exceed the score
    # MARGIN between the top two detections, so the two numbers bound the
    # trained-weight flip risk without random-weight tie artifacts.
    if os.environ.get("STUDY_ROIHEAD", "1") == "1":
        import jax

        from video_gen_evals_tpu.models.rcnn import (
            PIXEL_MEAN_BGR,
            apply_deltas,
            pad_to_divisible,
            resize_shortest_edge,
        )
        from video_gen_evals_tpu.ops.image import resize_pil_matmul
        from video_gen_evals_tpu.ops.roi_align import assign_fpn_levels

        rc = ex_high.cfg.rcnn
        model = ex_high.rcnn
        rparams = ex_high.params["rcnn"]

        # 8 frames from distinct videos; GT person boxes + jittered copies
        frames_list, boxes_list = [], []
        rng2 = np.random.default_rng(17)
        for vid, (frames, gt) in list(videos.items())[:8]:
            t = int(rng2.integers(0, len(frames)))
            frames_list.append(frames[t])
            b = gt[t].astype(np.float32)
            w, h = b[2] - b[0], b[3] - b[1]
            jit_boxes = [b]
            for _ in range(7):
                j = b + rng2.uniform(-0.08, 0.08, 4) * np.array([w, h, w, h])
                jit_boxes.append(j.astype(np.float32))
            boxes_list.append(np.stack(jit_boxes))
        frames_u8 = np.stack(frames_list)          # [8, H, W, 3]
        B = frames_u8.shape[0]

        rh, rw = resize_shortest_edge((H, W), rc.min_size_test, rc.max_size_test)
        ch_, cw_ = pad_to_divisible((rh, rw))
        sx, sy = rw / W, rh / H
        boxes_canvas = np.stack(boxes_list) * np.array(
            [sx, sy, sx, sy], np.float32
        )                                          # [8, 8, 4] canvas coords
        levels = np.asarray(
            assign_fpn_levels(jnp.asarray(boxes_canvas.reshape(-1, 4)))
        ).reshape(B, -1)

        def canvas(frames_f32):
            resized = jax.vmap(
                lambda f: resize_pil_matmul(f, (rh, rw))
            )(frames_f32)
            bgr = resized[..., ::-1] - jnp.asarray(PIXEL_MEAN_BGR)
            return jnp.pad(
                bgr, ((0, 0), (0, ch_ - rh), (0, cw_ - rw), (0, 0))
            )

        def roihead(prec: str, param_dtype=None):
            p = rparams
            f32 = jnp.asarray(frames_u8, jnp.float32)
            if param_dtype is not None:
                p = jax.tree_util.tree_map(
                    lambda a: a.astype(param_dtype)
                    if a.dtype == jnp.float32 else a, p
                )

            @jax.jit
            def run(p, f32):
                with jax.default_matmul_precision(prec):
                    cv = canvas(f32)
                    return model.apply(
                        {"params": p}, cv, jnp.asarray(boxes_canvas),
                        jnp.asarray(levels), method=model.box_forward,
                    )
            cls_logits, deltas = run(p, f32)
            return np.asarray(cls_logits, np.float64), np.asarray(
                deltas, np.float64
            )

        cls_hi, del_hi = roihead("high")
        # person = class 0; refined person boxes via the production
        # Box2BoxTransform weights
        def person_boxes_refined(deltas):
            d = deltas.reshape(B, -1, deltas.shape[-1] // 4, 4)[:, :, 0, :]
            return np.asarray(
                apply_deltas(
                    jnp.asarray(d), jnp.asarray(boxes_canvas),
                    rc.box_reg_weights,
                )
            )

        ref_boxes = person_boxes_refined(del_hi)
        size = np.maximum(
            np.stack(
                [
                    boxes_canvas[..., 2] - boxes_canvas[..., 0],
                    boxes_canvas[..., 3] - boxes_canvas[..., 1],
                ],
                axis=-1,
            ),
            1.0,
        )                                           # [8, 8, 2]
        # baseline person-score margin (context for logit drift): gap
        # between the best and second-best PERSON logit across proposals
        pl = cls_hi[..., 0]
        srt = np.sort(pl, axis=1)
        margin = srt[:, -1] - srt[:, -2]
        for arm in arms:
            if arm == "bf16_params":
                cls_a, del_a = roihead("default", param_dtype=jnp.bfloat16)
            else:
                cls_a, del_a = roihead(arm)
            arm_boxes = person_boxes_refined(del_a)
            rel = np.abs(arm_boxes - ref_boxes) / np.repeat(size, 2, axis=-1)
            emit(
                tag="roihead",
                arm=arm,
                refined_box_rel_p50=float(np.median(rel)),
                refined_box_rel_p95=float(np.percentile(rel, 95)),
                refined_box_rel_max=float(rel.max()),
                person_logit_drift_max=float(np.abs(cls_a - cls_hi).max()),
                baseline_person_margin_p50=float(np.median(margin)),
                n_images=int(B),
                n_rois=int(boxes_canvas.shape[1]),
            )


if __name__ == "__main__":
    main()
