"""Train CLI argv plumbing: a tiny 1-epoch run through main()."""

import json
import os

import numpy as np

from video_gen_evals_tpu.data.fixtures import make_fixture_tree
from video_gen_evals_tpu.pipelines import train_cli


def test_train_cli_main(tmp_path, capsys):
    mesh_root, kp_root = make_fixture_tree(
        str(tmp_path), ["JumpingJack", "PushUps"], videos_per_class=3,
        frames=(40, 48, 36), seed=11,
    )
    cfg_path = str(tmp_path / "cfg.json")
    from video_gen_evals_tpu.core.config import PathsConfig, TrainConfig

    TrainConfig(
        paths=PathsConfig(
            real_meshes_dir=mesh_root,
            real_kp_dir=kp_root,
            generated_meshes_dir=str(tmp_path / "none"),
            human_scores=str(tmp_path / "none.json"),
        ),
        epochs=1,
        clip_len=16,
        stride=8,
        P=2,
        K=4,
        d_model=32,
        time_layers=1,
        time_heads=4,
        filter_classes=None,
        save_dir=str(tmp_path / "SAVE"),
    ).to_json(cfg_path)

    train_cli.main(["--config", cfg_path])

    printed = capsys.readouterr().out
    assert "Training complete" in printed
    save_dirs = os.listdir(str(tmp_path / "SAVE"))
    assert len(save_dirs) == 1
    run_dir = os.path.join(str(tmp_path / "SAVE"), save_dirs[0])
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    assert os.path.exists(os.path.join(run_dir, "label_mapping.json"))
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        events = [json.loads(l) for l in f]
    assert any(e["event"] == "train_epoch" and np.isfinite(e["loss"]) for e in events)


def test_train_cli_resume(tmp_path, capsys):
    """--resume restores a previous run's resume checkpoint and continues at
    the next epoch (only the remaining epochs are trained)."""
    mesh_root, kp_root = make_fixture_tree(
        str(tmp_path), ["JumpingJack", "PushUps"], videos_per_class=3,
        frames=(40, 48, 36), seed=11,
    )
    from video_gen_evals_tpu.core.config import PathsConfig, TrainConfig

    def write_cfg(name, epochs):
        path = str(tmp_path / f"cfg_{name}.json")
        TrainConfig(
            paths=PathsConfig(
                real_meshes_dir=mesh_root,
                real_kp_dir=kp_root,
                generated_meshes_dir=str(tmp_path / "none"),
                human_scores=str(tmp_path / "none.json"),
            ),
            epochs=epochs, clip_len=16, stride=8, P=2, K=4,
            d_model=32, time_layers=1, time_heads=4,
            filter_classes=None,
            save_dir=str(tmp_path / f"SAVE_{name}"),
        ).to_json(path)
        return path

    train_cli.main(["--config", write_cfg("first", 1)])
    (run1,) = os.listdir(str(tmp_path / "SAVE_first"))
    resume = os.path.join(str(tmp_path / "SAVE_first"), run1, "resume_epoch000")
    assert os.path.exists(resume)

    train_cli.main(["--config", write_cfg("second", 2), "--resume", resume])
    printed = capsys.readouterr().out
    assert "continuing at epoch 1" in printed
    (run2,) = os.listdir(str(tmp_path / "SAVE_second"))
    with open(os.path.join(str(tmp_path / "SAVE_second"), run2, "metrics.jsonl")) as f:
        epochs_trained = [
            e["epoch"] for e in map(json.loads, f) if e["event"] == "train_epoch"
        ]
    assert epochs_trained == [1], epochs_trained


def test_distributed_flag_validation():
    """Partial distributed flags must fail loudly, not silently no-op."""
    import argparse

    import pytest

    from video_gen_evals_tpu.utils.cli import (
        add_distributed_args, maybe_initialize_distributed,
    )

    p = argparse.ArgumentParser()
    add_distributed_args(p)
    with pytest.raises(SystemExit, match="--num-processes"):
        maybe_initialize_distributed(p.parse_args(["--coordinator", "x:1"]))
    with pytest.raises(SystemExit, match="--num-processes"):
        maybe_initialize_distributed(p.parse_args(["--process-id", "0"]))
    with pytest.raises(SystemExit, match="--process-id"):
        maybe_initialize_distributed(p.parse_args(["--num-processes", "2"]))
    with pytest.raises(SystemExit, match="--coordinator"):
        # missing coordinator must not fall into jax cluster auto-detection
        maybe_initialize_distributed(
            p.parse_args(["--num-processes", "2", "--process-id", "0"])
        )
    maybe_initialize_distributed(p.parse_args([]))  # clean no-op
