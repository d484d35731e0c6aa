"""Async checkpointing (TrainConfig.async_checkpoint): the Experiment.run
loop hands checkpoint writes to a background worker so the device_get +
disk write (~30 s/epoch through the axon tunnel, BENCH_NOTES config-5)
overlaps the next epoch's compute. These tests pin the three hazards:
donation (train_step donates its input state — saves must snapshot first),
durability (run() returns only after every promised file is on disk and
byte-equivalent to the sync path), and error propagation (a failed
background save must surface, never vanish)."""

import os

import numpy as np
import jax
import pytest

from video_gen_evals_tpu.core.config import PathsConfig, TrainConfig
from video_gen_evals_tpu.data.fixtures import make_fixture_tree
from video_gen_evals_tpu.train.checkpoint import AsyncSaver
from video_gen_evals_tpu.train.experiment import Experiment


def _cfg(root, mesh_root, kp_root, tag, **kw):
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
        **kw,
    )


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("async_ckpt"))
    mesh_root, kp_root = make_fixture_tree(
        root, ["JumpingJack", "PushUps"], videos_per_class=3,
        frames=(60, 48, 40), seed=11,
    )
    return root, mesh_root, kp_root


def test_async_save_decouples_from_donation(data):
    """A non-blocking save snapshots the state on device, so the next
    (donating) train step cannot corrupt the bytes being written: the
    restored params must equal the state AT SAVE TIME, not after."""
    root, mesh_root, kp_root = data
    exp = Experiment(_cfg(root, mesh_root, kp_root, "don"), eval_batch=16)
    exp.train_one_epoch(0)
    at_save = jax.device_get(exp.state.params)
    ckpt = exp.save_resume_checkpoint(0, block=False)
    # donate the live state buffers while the background save is in flight
    exp.train_one_epoch(1)
    after = jax.device_get(exp.state.params)
    exp.wait_for_checkpoints()

    fresh = Experiment(_cfg(root, mesh_root, kp_root, "don2"), eval_batch=16)
    start = fresh.restore_resume_checkpoint(ckpt)
    assert start == 1
    got = jax.device_get(fresh.state.params)
    for a, g in zip(jax.tree_util.tree_leaves(at_save),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(g))
    # sanity: the donating step really changed the live params
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(at_save),
                        jax.tree_util.tree_leaves(after))
    )
    assert changed


def test_run_async_matches_sync_run(data):
    """run() with async_checkpoint=True produces the same files with the
    same bytes-level content (losses AND final resume state) as the
    blocking path, and every file exists when run() returns."""
    from video_gen_evals_tpu.train.checkpoint import restore_params

    root, mesh_root, kp_root = data
    runs = {}
    for tag, flag in (("sync", False), ("async", True)):
        exp = Experiment(
            _cfg(root, mesh_root, kp_root, tag, async_checkpoint=flag),
            eval_batch=16,
        )
        exp.run()
        resume = [
            f for f in sorted(os.listdir(exp.save_dir))
            if f.startswith("resume_epoch")
        ]
        assert resume == ["resume_epoch000", "resume_epoch001"]
        assert exp.best_ckpt is not None and os.path.exists(exp.best_ckpt)
        runs[tag] = (
            jax.device_get(exp.state.params),
            restore_params(exp.best_ckpt),
        )
    for (a, b) in zip(
        jax.tree_util.tree_leaves(runs["sync"]),
        jax.tree_util.tree_leaves(runs["async"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_saver_error_propagates():
    s = AsyncSaver()

    def boom():
        raise OSError("disk on fire")

    s.submit(boom)
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        s.wait()
    # the error is consumed: the saver is reusable afterwards
    done = []
    s.submit(lambda: done.append(1))
    s.wait()
    assert done == [1]


def test_async_saver_fifo_order():
    s = AsyncSaver()
    seen = []
    for i in range(16):
        s.submit(lambda i=i: seen.append(i))
    s.wait()
    assert seen == list(range(16))
