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
