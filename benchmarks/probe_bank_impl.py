"""File-backed feature-bank build: host vs device impl on the real backend.

The serve path's in-memory A/B (BENCH_NOTES round 5) measured the HOST
builder faster on the tunneled v5e-1 — but the file-backed build
(``build_feature_bank``, used by centroid construction and the generated
sweep in ``pipelines/score.py``) has a different data flow: the host impl
assembles on host and uploads the finished raw+diff bank (~2x the raw
bytes), while the device impl uploads only the raw npz streams and runs
diffs/normalize/concat on device. This probe times both warm at flagship
vit width so ``_resolve_bank_impl``'s "auto" choice is measured, not
assumed.

    BENCH_REQUIRE_IDLE=1 timeout 2400 python benchmarks/probe_bank_impl.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from video_gen_evals_tpu.utils.backend_guard import require_backend
    from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    require_backend()
    import jax
    import numpy as np

    from video_gen_evals_tpu.data import (
        ModalityPaths,
        build_feature_bank,
        compute_stats,
        scan_class_tree,
    )
    from video_gen_evals_tpu.data.fixtures import make_fixture_tree
    from video_gen_evals_tpu.utils.hostload import guard

    n_videos = int(os.environ.get("PROBE_VIDEOS", "16"))
    frames = int(os.environ.get("PROBE_FRAMES", "64"))
    vit_dim = int(os.environ.get("PROBE_VIT_DIM", "1024"))
    iters = int(os.environ.get("PROBE_ITERS", "4"))

    with tempfile.TemporaryDirectory() as td:
        mesh_root, kp_root = make_fixture_tree(
            td,
            ["JumpingJack", "PushUps"],
            videos_per_class=n_videos // 2,
            frames=(frames,),
            vit_dim=vit_dim,
            kp_shorter_by=2,
            seed=11,
        )
        manifest = scan_class_tree(mesh_root)
        paths = ModalityPaths(keypoint_dir=kp_root, layout="real")
        stats = compute_stats(manifest.items, paths)

        host_load = guard("probe_bank_impl")
        results = {}
        for impl in ("host", "device", "host", "device"):
            # warm pass (compiles + page cache), then timed passes
            bank = build_feature_bank(
                manifest.items, paths, stats, min_rows=40, impl=impl
            )
            # completion barrier: touch a value so pending device work is done
            _ = float(np.asarray(bank.bank[0, 0]))
            t0 = time.perf_counter()
            for _i in range(iters):
                bank = build_feature_bank(
                    manifest.items, paths, stats, min_rows=40, impl=impl
                )
                _ = float(np.asarray(bank.bank[-1, -1]))
            dt = (time.perf_counter() - t0) / iters
            # keep the best of the two rounds per impl (ABAB ordering)
            prev = results.get(impl)
            results[impl] = dt if prev is None else min(prev, dt)

        rows = int(bank.bank.shape[0])
        dim = int(bank.bank.shape[1])
        print(
            json.dumps(
                {
                    "metric": "file_backed_bank_build_sec",
                    "videos": n_videos,
                    "frames": frames,
                    "bank_shape": [rows, dim],
                    "bank_mb": round(rows * dim * 4 / 1e6, 1),
                    "host_sec": round(results["host"], 3),
                    "device_sec": round(results["device"], 3),
                    "backend": jax.default_backend(),
                    "host_load1": host_load["load1"],
                    "host_contended": host_load["contended"],
                }
            )
        )


if __name__ == "__main__":
    main()
