"""BASELINE config 5 on-chip: the FULL "train then sweep" path —
``Experiment.run()`` with epochs, all four eval passes (centroids, test
loss, centroid distances, human-correlation monitor), best-checkpoint saves
and per-epoch resume checkpoints — executed end-to-end on the real TPU
through the tunnel (round-4 directive #5: this exact path is where 45-600 s
compiles and retrace hazards bite, and it had never been demonstrated
on-chip as a whole).

Short geometry, FLAGSHIP dims: 10 action classes x 6 synthetic videos
(~100 frames, vit 1024 / 5 modalities / input_dim 2596), the reference's
batch geometry (P=10, K=24 -> batch 240, d_model 256, 4 transformer
layers), 3 epochs, plus a restore-and-continue leg exercising exact resume.

Reports one JSON line per phase: wall-clock, steady-state steps/s,
per-eval-pass seconds, and jit cache sizes after the run (a cache size
> 1 per jitted step fn = an unintended retrace).

    timeout 3000 python benchmarks/bench_config5.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax

    from video_gen_evals_tpu.core.config import PathsConfig, TrainConfig
    from video_gen_evals_tpu.data.fixtures import (
        make_fixture_tree,
        write_keypoints,
        write_mesh_npz,
    )
    from video_gen_evals_tpu.train.experiment import Experiment
    from video_gen_evals_tpu.utils.names import ACTION_CLASSES

    def emit(tag, **kw):
        print(json.dumps({"tag": tag, **kw}), flush=True)

    from video_gen_evals_tpu.utils.hostload import guard

    load = guard("bench_config5.py")
    emit("backend", platform=jax.default_backend(),
         device=str(jax.devices()[0]),
         host_load1=load["load1"], host_contended=load["contended"])

    root = tempfile.mkdtemp(prefix="cfg5_")
    rng = np.random.default_rng(11)
    t0 = time.perf_counter()
    classes = list(ACTION_CLASSES)
    mesh_root, kp_root = make_fixture_tree(
        root, classes, videos_per_class=6,
        frames=(104, 88, 96, 112, 80, 100), vit_dim=1024, seed=5,
    )
    gen_dir = os.path.join(root, "generated_meshes")
    gen_kp = os.path.join(root, "generated_kps")
    names = []
    for i, cls in enumerate(classes + classes[:5]):
        stem = f"GenModel{i % 3}_{cls}_{i:02d}"
        write_mesh_npz(os.path.join(gen_dir, f"{stem}.npz"), 60, 1024, rng)
        write_keypoints(os.path.join(gen_kp, stem, "keypoints.npy"), 60, rng)
        names.append(stem)
    human_path = os.path.join(root, "human.json")
    with open(human_path, "w") as f:
        json.dump(
            {f"{n}.mp4": {"ac": float(i), "tc": float(-i)}
             for i, n in enumerate(names)},
            f,
        )
    emit("fixture_built", s=round(time.perf_counter() - t0, 1))

    cfg = TrainConfig(
        paths=PathsConfig(
            real_meshes_dir=mesh_root,
            real_kp_dir=kp_root,
            generated_meshes_dir=gen_dir,
            gen_kp_dir=gen_kp,
            human_scores=human_path,
        ),
        epochs=int(os.environ.get("BENCH_EPOCHS", "3")),
        save_dir=os.path.join(root, "SAVE"),
        filter_classes=classes,
        # BENCH_SYNC_CKPT (any of 1/true/yes) pins the blocking checkpoint
        # path for an A/B against the round-4 background saver
        # (TrainConfig default: async)
        async_checkpoint=os.environ.get("BENCH_SYNC_CKPT", "0").lower()
        not in {"1", "true", "yes"},
    )

    t0 = time.perf_counter()
    exp = Experiment(cfg)
    emit(
        "experiment_init",  # host data pass: scan + stats + banks
        s=round(time.perf_counter() - t0, 1),
        train_windows=len(exp.train_windows),
        steps_per_epoch=len(exp.sampler),
        input_dim=exp.enc_cfg.input_dim,
        batch=cfg.batch_size,
    )

    # time every phase run() touches, without changing its control flow
    phase_times: dict = {}

    def timed_method(name):
        orig = getattr(exp, name)

        def wrapper(*a, **k):
            t = time.perf_counter()
            out = orig(*a, **k)
            phase_times.setdefault(name, []).append(
                round(time.perf_counter() - t, 2)
            )
            return out

        setattr(exp, name, wrapper)

    for m in (
        "train_one_epoch",
        "evaluate_centroids",
        "evaluate_test_loss",
        "evaluate_centroid_distance",
        "evaluate_human_corr",
        "save_resume_checkpoint",
        # with async_checkpoint the per-epoch save returns ~instantly and
        # run()'s finally drains the worker — the drain time is the part of
        # the fetch+write the overlap could NOT hide
        "wait_for_checkpoints",
    ):
        timed_method(m)

    t0 = time.perf_counter()
    exp.run()
    total = time.perf_counter() - t0
    steps = len(exp.sampler)
    epoch_times = phase_times.get("train_one_epoch", [])
    steady = min(epoch_times[1:]) if len(epoch_times) > 1 else epoch_times[0]
    emit(
        "run_complete",
        total_s=round(total, 1),
        epochs=cfg.epochs,
        epoch_s=epoch_times,
        steady_steps_per_s=round(steps / steady, 2),
        eval_centroids_s=phase_times.get("evaluate_centroids"),
        eval_test_loss_s=phase_times.get("evaluate_test_loss"),
        eval_centroid_dist_s=phase_times.get("evaluate_centroid_distance"),
        eval_human_corr_s=phase_times.get("evaluate_human_corr"),
        resume_ckpt_s=phase_times.get("save_resume_checkpoint"),
        ckpt_drain_s=phase_times.get("wait_for_checkpoints"),
        # the EFFECTIVE mode (cfg flag AND process_count()==1), not the raw
        # cfg flag — they differ in multi-process runs
        async_checkpoint=exp._async_saves,
    )

    # retrace detector: each jitted step fn should have compiled ONCE per
    # distinct input shape; the train step sees exactly one shape
    caches = {}
    for label, fn in (
        ("train_step", exp.train_step),
        ("eval_loss", exp.eval_loss),
        ("gather", exp._gather),
    ):
        try:
            caches[label] = fn._cache_size()
        except Exception:
            caches[label] = None
    emit("jit_cache_sizes", **caches)

    # monitor sanity: human corr must have produced numbers (not swallowed)
    with open(exp.metrics_path) as f:
        events = [json.loads(l) for l in f]
    hc = [e for e in events if e["event"] == "human_corr"]
    fails = [e for e in events if e["event"] == "human_corr_failed"]
    emit("human_corr_events", ok=len(hc), failed=len(fails),
         last=hc[-1] if hc else None)

    # ---- exact resume: restore the epoch-1 checkpoint into a FRESH
    # Experiment and continue — the continued params must match running
    # straight through (the resume test's on-chip leg)
    t0 = time.perf_counter()
    ckpts = sorted(
        p for p in os.listdir(exp.save_dir) if p.startswith("resume_")
    )
    exp2 = Experiment(cfg)
    start = exp2.restore_resume_checkpoint(
        os.path.join(exp.save_dir, ckpts[-2])
    )
    emit("resume_restore", s=round(time.perf_counter() - t0, 1),
         start_epoch=start)
    t0 = time.perf_counter()
    exp2.run(start_epoch=start)
    emit("resume_continue_s", s=round(time.perf_counter() - t0, 1))

    a = jax.tree_util.tree_leaves(exp.state.params)
    b = jax.tree_util.tree_leaves(exp2.state.params)
    max_d = max(
        float(np.max(np.abs(np.asarray(x) - np.asarray(y)))) if np.asarray(x).size else 0.0
        for x, y in zip(a, b)
    )
    emit("resume_param_max_abs_diff", val=max_d)


if __name__ == "__main__":
    main()
