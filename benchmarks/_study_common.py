"""Shared scaffolding for the round-3 extraction studies (PARITY.md):

- extraction-precision study (bf16 / default / high / highest through
  ViT-H + SMPL head + pose net, propagated to AC/TC), and
- detector box-sensitivity study (scale/shift jitter through the mesh crop
  chain, propagated to AC/TC).

Both drive the PRODUCTION extraction stages (`Extractor._mesh_forward` /
`_pose_forward` / `_kp_post`) with explicit boxes — bypassing the detector so
every variant sees identical box inputs — then write reference-contract npz
trees and score them with the production scoring pipeline (stats -> bank ->
WindowEncoder -> AC/TC). Weights are random (no checkpoints in this image);
the studies measure the NUMERIC sensitivity of the pipeline, and PARITY.md
records that caveat.
"""

from __future__ import annotations

import os
import typing as T

import numpy as np


CLASSES = ("JumpingJack", "PushUps")


def synth_frames(
    Tlen: int, H: int, W: int, rng: np.random.Generator
) -> np.ndarray:
    """Structured synthetic video: gradient background + a moving textured
    'person' blob (uint8 RGB). Smooth in time so deltas behave."""
    yy = np.linspace(0, 1, H, dtype=np.float32)[:, None]
    xx = np.linspace(0, 1, W, dtype=np.float32)[None, :]
    bg = np.stack([60 + 80 * yy + 0 * xx, 60 + 80 * xx + 0 * yy,
                   np.full((H, W), 90, np.float32)], axis=-1)
    tex = rng.uniform(0, 80, size=(64, 48, 3)).astype(np.float32)
    frames = np.empty((Tlen, H, W, 3), np.uint8)
    cx0, cy0 = rng.uniform(0.3, 0.7) * W, rng.uniform(0.3, 0.7) * H
    vx, vy = rng.uniform(-1.5, 1.5), rng.uniform(-1.5, 1.5)
    bw, bh = int(0.22 * W), int(0.55 * H)
    for t in range(Tlen):
        f = bg.copy()
        cx = int(np.clip(cx0 + vx * t, bw // 2 + 1, W - bw // 2 - 1))
        cy = int(np.clip(cy0 + vy * t, bh // 2 + 1, H - bh // 2 - 1))
        y0, x0 = cy - bh // 2, cx - bw // 2
        patch = np.kron(tex, np.ones((bh // 64 + 1, bw // 48 + 1, 1), np.float32))
        f[y0 : y0 + bh, x0 : x0 + bw] += patch[:bh, :bw]
        frames[t] = np.clip(f, 0, 255).astype(np.uint8)
    return frames


def person_boxes(Tlen: int, H: int, W: int, rng: np.random.Generator) -> np.ndarray:
    """Smooth per-frame person boxes [T, 4] xyxy (pixels)."""
    cx = W * (0.5 + 0.15 * np.sin(np.linspace(0, 2, Tlen) + rng.uniform(0, 6)))
    cy = H * (0.5 + 0.10 * np.cos(np.linspace(0, 2, Tlen) + rng.uniform(0, 6)))
    w = W * 0.25 * (1 + 0.05 * np.sin(np.linspace(0, 3, Tlen)))
    h = H * 0.6 * (1 + 0.05 * np.cos(np.linspace(0, 3, Tlen)))
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1).astype(
        np.float32
    )


def jitter_boxes(
    boxes: np.ndarray, scale: float = 1.0, shift_frac: float = 0.0,
    rng: T.Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Systematic box perturbation: scale about the center and/or shift by a
    fraction of the box size (direction random per frame if rng given, else
    +x+y)."""
    x0, y0, x1, y1 = boxes.T
    cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
    w, h = (x1 - x0) * scale, (y1 - y0) * scale
    if shift_frac:
        if rng is not None:
            ang = rng.uniform(0, 2 * np.pi, size=len(boxes))
            dx, dy = np.cos(ang) * shift_frac * w, np.sin(ang) * shift_frac * h
        else:
            dx, dy = shift_frac * w, shift_frac * h
        cx, cy = cx + dx, cy + dy
    return np.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1
    ).astype(np.float32)


def extract_with_boxes(ex, frames_u8: np.ndarray, boxes: np.ndarray,
                       with_pose: bool = True):
    """Run the production mesh (+pose) stages with explicit boxes."""
    import jax
    import jax.numpy as jnp

    frames_f32 = ex._upload_frames(frames_u8)
    _, H, W, _ = frames_u8.shape
    wh = (jnp.float32(W), jnp.float32(H))
    out = ex._batched(
        lambda f, b: ex._mesh_forward(ex.params["vit"], ex.params["head"], f, b),
        frames_f32,
        jnp.asarray(boxes),
        fetch=False,
    )
    kp120 = None
    if with_pose:
        kps134, sc134 = ex._batched(
            lambda f, b: ex._pose_forward(ex.params["pose"], f, b, wh),
            frames_f32,
            jnp.asarray(boxes),
            fetch=False,
        )
        kp120, _valid = ex._kp_post(kps134, sc134, wh)
        kp120 = np.asarray(kp120)
    out = jax.tree_util.tree_map(np.asarray, out)
    mesh = {
        "pose": out["body_pose"],
        "betas": out["betas"],
        "global_orient": out["global_orient"],
        "vit": out["token_out"],
        "frame_idx": np.arange(frames_u8.shape[0], dtype=np.int32),
    }
    return mesh, kp120


def write_tree(
    root: str, per_video: T.Dict[str, T.Tuple[dict, T.Optional[np.ndarray]]]
) -> T.Tuple[str, str]:
    """Write {name: (mesh, kp120)} as a real-layout mesh/kp tree. Video names
    must be '<cls>/<stem>'."""
    from video_gen_evals_tpu.utils.io import save_video_npz

    mesh_root = os.path.join(root, "meshes")
    kp_root = os.path.join(root, "kps")
    for vid, (mesh, kp120) in per_video.items():
        save_video_npz(mesh_root, vid, mesh["pose"], mesh["betas"],
                       mesh["global_orient"], mesh["vit"], mesh["frame_idx"])
        if kp120 is not None:
            cls, stem = vid.split("/")
            kp_path = os.path.join(kp_root, cls, stem, "keypoints.npy")
            os.makedirs(os.path.dirname(kp_path), exist_ok=True)
            np.save(kp_path, kp120)
    return mesh_root, kp_root


def score_tree(
    mesh_root: str,
    kp_root: str,
    encoder,
    stats=None,
    centroids=None,
    clip_len: int = 32,
    stride: int = 8,
):
    """Production scoring path on a feature tree. Returns
    (per-video {'ac','tc'}, stats, centroids, seqs) — stats/centroids are
    computed from THIS tree when not supplied (the baseline call), and reused
    verbatim for variant trees (fixed train artifacts)."""
    import jax.numpy as jnp

    from video_gen_evals_tpu.data import (
        ModalityPaths,
        build_feature_bank,
        compute_stats,
        enumerate_windows,
        scan_class_tree,
    )
    from video_gen_evals_tpu.metrics.scores import (
        build_centroids,
        video_ac_scores,
        video_tc_scores,
    )

    manifest = scan_class_tree(mesh_root)
    paths = ModalityPaths(keypoint_dir=kp_root, layout="real")
    if stats is None:
        stats = compute_stats(manifest.items, paths)
    bank = build_feature_bank(manifest.items, paths, stats, min_rows=clip_len + 8)
    windows = enumerate_windows(manifest, clip_len, stride)
    seqs, window_tc, win_video = encoder.encode_bank(bank, windows)

    label_dict = manifest.label_dict()
    labels = np.array([label_dict[bank.classes[v]] for v in win_video], np.int32)
    if centroids is None:
        centroids, _ = build_centroids(
            jnp.asarray(seqs), jnp.asarray(labels), len(label_dict)
        )
        centroids = np.asarray(centroids)

    num_videos = len(manifest.items)
    video_label = np.array([label_dict[c] for c in bank.classes], np.int32)
    tc_v = np.asarray(
        video_tc_scores(jnp.asarray(window_tc), jnp.asarray(win_video), num_videos)
    )
    ac_v = np.asarray(
        video_ac_scores(
            jnp.asarray(seqs), jnp.asarray(win_video),
            jnp.asarray(video_label), jnp.asarray(centroids),
        )
    )
    scores = {
        os.path.splitext(it.name)[0]: {"ac": float(ac_v[v]), "tc": float(tc_v[v])}
        for v, it in enumerate(manifest.items)
    }
    return scores, stats, centroids, seqs


def score_drift(base: dict, variant: dict) -> T.Tuple[float, float]:
    """(max |dAC|, max |dTC|) over videos."""
    dac = max(abs(variant[v]["ac"] - base[v]["ac"]) for v in base)
    dtc = max(abs(variant[v]["tc"] - base[v]["tc"]) for v in base)
    return dac, dtc
