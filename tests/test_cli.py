"""CLI entry-point smoke tests (argv paths)."""

import json

import numpy as np

from video_gen_evals_tpu.human import mos
from video_gen_evals_tpu.pipelines import leaderboard


def test_leaderboard_cli(tmp_path, capsys):
    scores = {
        "Hunyuan_JumpingJack_01_a.mp4": {"ac": 0.2, "tc": 0.1},
        "wan21_PushUps_02_b.mp4": {"ac": 0.8, "tc": 0.5},
    }
    scores_path = str(tmp_path / "scores.json")
    out_path = str(tmp_path / "comparison_table.json")
    with open(scores_path, "w") as f:
        json.dump(scores, f)

    leaderboard.main(["--scores", scores_path, "--output", out_path])

    with open(out_path) as f:
        table = json.load(f)
    assert table["models"] == ["Hunyuan", "wan21"]
    printed = capsys.readouterr().out
    assert "JumpingJack" in printed


def test_mos_cli(tmp_path, rng, capsys):
    rows = []
    true_q = rng.uniform(1, 5, size=15)
    for p in range(6):
        for v in range(15):
            reps = 2 if v < 3 else 1
            for _ in range(reps):
                rows.append(
                    {
                        "participant_id": f"p{p}",
                        "video_id": f"vid{v:02d}",
                        "action_consistency": float(true_q[v] + rng.normal(0, 0.2)),
                        "physical_plausibility": float(true_q[v] + rng.normal(0, 0.2)),
                    }
                )
    raw = str(tmp_path / "raw.json")
    out = str(tmp_path / "human_scores.json")
    with open(raw, "w") as f:
        json.dump(rows, f)

    mos.main(["--input", raw, "--output", out])

    with open(out) as f:
        result = json.load(f)
    assert len(result) == 15
    vals = np.array([v["ac"] for v in result.values()])
    np.testing.assert_allclose(vals.mean(), 0.0, atol=1e-9)
