"""Benchmark: end-to-end TAG scoring throughput (clips/sec) on the default
JAX backend (the real TPU chip under the driver; CPU if forced).

Measures the full serve path from device-resident precomputed features:
window gather -> fusion encoder (full flagship dims) -> per-window TC +
CLS embeddings -> per-video segment reductions (AC distances). This is
BASELINE.json config 1 scaled up, with the same architecture the reference
scores with (d_model 256, 4 transformer layers, 5 modalities, clip_len 32).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the ratio against the stored reference-equivalent torch-CPU
measurement (BENCH_BASELINE.json, produced by scripts/measure_baseline.py).

Matmuls run at "highest" precision (true f32 on the MXU) so the measured
configuration is the one that holds 1e-3 score parity with the reference.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from video_gen_evals_tpu.data.features import gather_windows
from video_gen_evals_tpu.metrics.scores import (
    build_centroids,
    tc_per_window,
    video_ac_scores,
    video_tc_scores,
)
from video_gen_evals_tpu.models import EncoderConfig
from video_gen_evals_tpu.models.fusion_encoder import init_encoder

DIMS_RAW = {"vit": 1024, "global": 9, "pose": 207, "beta": 10, "kp2d": 120}
DIMS_DIFF = {"vit": 1024, "global": 3, "pose": 69, "beta": 10, "kp2d": 120}
CLIP_LEN = 32
STRIDE = 8


def build_synthetic_bank(num_videos: int, frames: int, dim: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    heights = np.full(num_videos, frames, np.int32)
    offsets = (np.arange(num_videos) * (frames + 1)).astype(np.int32)
    bank = rng.normal(size=(num_videos * (frames + 1), dim)).astype(np.float32)
    return bank, offsets, heights


def main() -> None:
    num_videos = int(os.environ.get("BENCH_VIDEOS", "64"))
    frames = int(os.environ.get("BENCH_FRAMES", "120"))
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))

    cfg = EncoderConfig.create(DIMS_RAW, DIMS_DIFF)
    model, params = init_encoder(cfg, jax.random.key(0), clip_len=CLIP_LEN)
    D = cfg.input_dim
    one_pass_raw = cfg.one_pass_raw

    bank_np, offsets_np, heights_np = build_synthetic_bank(num_videos, frames, D)
    bank = jnp.asarray(bank_np)
    offsets = jnp.asarray(offsets_np)
    heights = jnp.asarray(heights_np)
    z0 = jnp.zeros(D - one_pass_raw, jnp.float32)

    starts_all, vids_all = [], []
    for v in range(num_videos):
        for s in range(0, frames - CLIP_LEN + 1, STRIDE):
            vids_all.append(v)
            starts_all.append(s)
    vids_all = np.array(vids_all, np.int32)
    starts_all = np.array(starts_all, np.int32)
    n_windows = len(vids_all)

    @jax.jit
    def score_batch(params, vi, st):
        with jax.default_matmul_precision("highest"):
            w = gather_windows(
                bank, offsets, heights, z0, one_pass_raw, vi, st, CLIP_LEN
            )
            seq, frames_emb, _ = model.apply({"params": params}, w, deterministic=True)
            return seq, tc_per_window(frames_emb)

    @jax.jit
    def reduce_videos(seqs, tcs, win_video, video_label, centroids):
        ac = video_ac_scores(seqs, win_video, video_label, centroids)
        tc = video_tc_scores(tcs, win_video, num_videos)
        return ac, tc

    # batches (pad last)
    batches = []
    for lo in range(0, n_windows, batch):
        vi = vids_all[lo : lo + batch]
        st = starts_all[lo : lo + batch]
        pad = batch - len(vi)
        if pad:
            vi = np.concatenate([vi, np.repeat(vi[-1:], pad)])
            st = np.concatenate([st, np.repeat(st[-1:], pad)])
        batches.append((jnp.asarray(vi), jnp.asarray(st)))

    # warmup / compile
    seq, tc = score_batch(params, *batches[0])
    seq.block_until_ready()

    t0 = time.perf_counter()
    outs = []
    for _ in range(iters):
        for b in batches:
            outs.append(score_batch(params, *b))
    outs[-1][0].block_until_ready()
    dt = time.perf_counter() - t0

    # one reduction pass (not in the timed loop denominator: negligible, but
    # run it so the full path executes)
    seqs = jnp.concatenate([o[0] for o in outs[: len(batches)]])[:n_windows]
    tcs = jnp.concatenate([o[1] for o in outs[: len(batches)]])[:n_windows]
    labels = jnp.asarray(np.zeros(num_videos, np.int32))
    cen, _ = build_centroids(seqs, jnp.asarray(vids_all) % 8, 8)
    ac, tcv = reduce_videos(seqs, tcs, jnp.asarray(vids_all), labels, cen[:1])
    ac.block_until_ready()

    clips_per_sec = n_windows * iters / dt

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("windows_per_sec"):
            vs_baseline = clips_per_sec / float(base["windows_per_sec"])

    print(
        json.dumps(
            {
                "metric": "tag_scoring_clips_per_sec",
                "value": round(clips_per_sec, 2),
                "unit": "clips/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
