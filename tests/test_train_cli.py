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
