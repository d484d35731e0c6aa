"""Fault-injection / exact-resume test (SURVEY §5.3): kill training after
epoch 0, restore the full train state in a fresh process-equivalent
Experiment, continue — the final parameters must match the uninterrupted run
exactly (deterministic per-epoch sampler seeding + step-folded RNG)."""

import os

import numpy as np
import jax
import pytest

from video_gen_evals_tpu.core.config import PathsConfig, TrainConfig
from video_gen_evals_tpu.data.fixtures import make_fixture_tree
from video_gen_evals_tpu.train.experiment import Experiment


def _cfg(root, mesh_root, kp_root, tag):
    return TrainConfig(
        paths=PathsConfig(
            real_meshes_dir=mesh_root,
            real_kp_dir=kp_root,
            generated_meshes_dir=os.path.join(root, "none"),
            human_scores=os.path.join(root, "none.json"),
        ),
        epochs=2,
        clip_len=16,
        stride=8,
        P=2,
        K=4,
        d_model=32,
        time_layers=1,
        time_heads=4,
        filter_classes=None,
        save_dir=os.path.join(root, f"SAVE_{tag}"),
    )


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("resume"))
    mesh_root, kp_root = make_fixture_tree(
        root, ["JumpingJack", "PushUps"], videos_per_class=3, frames=(60, 48, 40), seed=9
    )
    return root, mesh_root, kp_root


def test_resume_reproduces_uninterrupted_run(data):
    root, mesh_root, kp_root = data

    # uninterrupted 2-epoch run
    exp_a = Experiment(_cfg(root, mesh_root, kp_root, "a"), eval_batch=16)
    exp_a.run()
    final_a = jax.device_get(exp_a.state.params)

    # interrupted: epoch 0, checkpoint, "crash", fresh Experiment, resume
    exp_b = Experiment(_cfg(root, mesh_root, kp_root, "b"), eval_batch=16)
    exp_b.train_one_epoch(0)
    ckpt = exp_b.save_resume_checkpoint(0)
    del exp_b

    exp_c = Experiment(_cfg(root, mesh_root, kp_root, "c"), eval_batch=16)
    start = exp_c.restore_resume_checkpoint(ckpt)
    assert start == 1
    exp_c.train_one_epoch(1)
    final_c = jax.device_get(exp_c.state.params)

    for a, c in zip(
        jax.tree_util.tree_leaves(final_a), jax.tree_util.tree_leaves(final_c)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_sigkill_mid_run_resume_matches_uninterrupted(data):
    """TRUE fault injection (SURVEY §5.3): run the real train CLI in a
    subprocess, SIGKILL it the moment the epoch-0 resume checkpoint lands
    (no atexit, no flushes — a hard crash mid-epoch-1), then resume from the
    checkpoint in a fresh process. The resumed run's epoch-1 training loss
    must match the uninterrupted run's bitwise-deterministically."""
    import glob
    import json
    import signal
    import subprocess
    import sys
    import time

    root, mesh_root, kp_root = data
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU tunnel

    cfg_path = os.path.join(root, "kill_cfg.json")
    _cfg(root, mesh_root, kp_root, "unused").to_json(cfg_path)

    def run_cli(save_dir, extra=(), wait=True):
        proc = subprocess.Popen(
            [sys.executable, "-m", "video_gen_evals_tpu.pipelines.train_cli",
             "--config", cfg_path, "--save-dir", save_dir, *extra],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        if not wait:
            return proc
        out, _ = proc.communicate(timeout=900)
        assert proc.returncode == 0, out
        return proc

    def epoch_losses(save_dir):
        (metrics,) = glob.glob(os.path.join(save_dir, "*", "metrics.jsonl"))
        losses = {}
        with open(metrics) as f:
            for line in f:
                e = json.loads(line)
                if e.get("event") == "train_epoch":
                    losses[e["epoch"]] = e["loss"]
        return losses

    # A: uninterrupted 2-epoch run
    save_a = os.path.join(root, "KILL_a")
    run_cli(save_a)
    losses_a = epoch_losses(save_a)
    assert set(losses_a) == {0, 1}

    # B: same run, SIGKILLed right after the epoch-0 resume checkpoint lands
    save_b = os.path.join(root, "KILL_b")
    proc = run_cli(save_b, wait=False)
    ckpt = None
    deadline = time.time() + 600
    try:
        while time.time() < deadline:
            hits = glob.glob(os.path.join(save_b, "*", "resume_epoch000"))
            if hits:
                ckpt = hits[0]
                break
            if proc.poll() is not None:
                raise AssertionError(
                    f"train CLI exited before checkpointing: "
                    f"{proc.stdout.read()}"
                )
            time.sleep(0.2)
        assert ckpt is not None, "epoch-0 resume checkpoint never appeared"
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)

    # C: fresh process resumes from the killed run's checkpoint
    save_c = os.path.join(root, "KILL_c")
    run_cli(save_c, extra=["--resume", ckpt])
    losses_c = epoch_losses(save_c)
    assert set(losses_c) == {1}, f"resume should run epoch 1 only: {losses_c}"
    np.testing.assert_allclose(losses_c[1], losses_a[1], rtol=1e-6)


def test_npz_params_restore_without_template(tmp_path):
    """Multi-process runs save params as a flat path-keyed npz (process-0
    write); restore_params must rebuild the nested dict WITHOUT a `like`
    template so e.g. the score CLI can load multi-host-trained checkpoints."""
    from video_gen_evals_tpu.train import checkpoint as C

    params = {
        "enc": {
            "stem": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "bias": np.ones(3, np.float32),
        },
        "head": {"w": np.full((4,), 2.5, np.float32)},
    }
    np.savez(str(tmp_path / "p.npz"), **C._flatten_with_paths(params))
    out = C.restore_params(str(tmp_path / "p"))
    assert set(out) == {"enc", "head"}
    np.testing.assert_array_equal(out["enc"]["stem"]["kernel"],
                                  params["enc"]["stem"]["kernel"])
    np.testing.assert_array_equal(out["enc"]["bias"], params["enc"]["bias"])
    np.testing.assert_array_equal(out["head"]["w"], params["head"]["w"])

    # non-dict nodes (e.g. optimizer tuples) still demand a template
    flat = C._flatten_with_paths({"a": (np.zeros(1), np.ones(1))})
    np.savez(str(tmp_path / "t.npz"), **flat)
    with pytest.raises(ValueError, match="non-dict pytree node"):
        C.restore_params(str(tmp_path / "t"))
