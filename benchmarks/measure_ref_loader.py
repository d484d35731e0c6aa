"""Measure the reference's per-window data-loading cost (config-1 GPU
estimate, BENCH_NOTES): times the reference's OWN WindowDataset.__getitem__
(npz mmap + slice + delta ops incl. the per-frame Procrustes SVD Python loop
+ z-score + concat, ref ``utils.py:345-523``) on this host's CPU, per window.

The reference eval.py feeds its GPU through this exact code with
``num_workers=4`` (ref ``eval.py:414``) — so windows/s = 4x the single-core
rate bounds the reference pipeline's throughput regardless of GPU speed.

    python benchmarks/measure_ref_loader.py [--windows 200]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_DIR = "/root/reference"


def _load_ref(name, filename):
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", os.path.join(REF_DIR, filename)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--windows", type=int, default=200)
    p.add_argument("--frames", type=int, default=90, help="UCF101-ish length")
    p.add_argument("--vit-dim", type=int, default=1024)
    args = p.parse_args()

    from video_gen_evals_tpu.data.fixtures import make_fixture_tree

    ref_utils = _load_ref("utils", "utils.py")

    with tempfile.TemporaryDirectory() as td:
        mesh_root, kp_root = make_fixture_tree(
            td, ["JumpingJack", "PushUps"], videos_per_class=4,
            frames=(args.frames,), vit_dim=args.vit_dim, seed=0,
        )
        ds = ref_utils.NpzVideoDataset(
            mesh_root, filter_classes=["JumpingJack", "PushUps"]
        )
        stats = ref_utils.compute_stats_from_npz(ds.items, kp_root)
        samples = ref_utils.sample_all_windows_npz(ds, clip_len=32, stride=8)
        wd = ref_utils.WindowDataset(
            samples, clip_len=32, keypoint_dir=kp_root, stats=stats
        )
        n = min(args.windows, len(wd))
        # warm (page cache, torch init)
        for i in range(min(8, n)):
            wd[i % len(wd)]
        t0 = time.perf_counter()
        for i in range(n):
            wd[i % len(wd)]
        dt = time.perf_counter() - t0
        per = dt / n
        print({
            "windows_timed": n,
            "ms_per_window_1core": round(per * 1e3, 2),
            "windows_per_sec_1core": round(1.0 / per, 1),
            "windows_per_sec_4workers_est": round(4.0 / per, 1),
            "frames": args.frames,
            "vit_dim": args.vit_dim,
        })


if __name__ == "__main__":
    main()
