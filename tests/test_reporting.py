"""L5 reporting tests: leaderboard generation and the human MOS pipeline."""

import json
import os

import numpy as np
import pytest

from video_gen_evals_tpu.human.mos import (
    AC_KEY,
    TC_KEY,
    compute_mos_and_normalize,
    process_human_scores,
    stage1_repeated_video_consistency,
    stage2_subject_rejection,
    stage3_inter_rater_reliability,
)
from video_gen_evals_tpu.pipelines.leaderboard import (
    build_leaderboard,
    normalize_to_0_100,
    parse_filename,
    render_ascii,
)


# ----------------------------- leaderboard --------------------------------


def test_parse_filename_examples():
    assert parse_filename("Hunyuan_BodyWeightSquats_01_08d40ea1.mp4") == (
        "Hunyuan",
        "BodyWeightSquats",
    )
    # reference quirk: the trailing-digit strip reduces "Opensora_768" to
    # "Opensora" (the reference's docstring claims otherwise, but its code
    # strips any trailing numeric segment — we match the code)
    assert parse_filename("Opensora_768_BodyWeightSquats_01_73f1e099.mp4") == (
        "Opensora",
        "BodyWeightSquats",
    )
    m, a = parse_filename("wan21_TennisSwing_77.mp4")
    assert (m, a) == ("wan21", "TennisSwing")


def test_normalize_to_0_100():
    assert normalize_to_0_100(5, 0, 10) == 50.0
    assert normalize_to_0_100(3, 3, 3) == 50.0
    assert normalize_to_0_100(0, 0, 10) == 0.0


def test_build_leaderboard_schema(tmp_path):
    scores = {
        "Hunyuan_JumpingJack_01_a.mp4": {"ac": 0.2, "tc": 0.1},
        "Hunyuan_PushUps_02_b.mp4": {"ac": 0.6, "tc": 0.3},
        "wan21_JumpingJack_03_c.mp4": {"ac": 0.8, "tc": 0.5},
    }
    out = build_leaderboard(scores)
    assert out["models"] == ["Hunyuan", "wan21"]
    assert out["actions"] == ["JumpingJack", "PushUps"]
    # extremes normalize to 0 / 100
    assert out["table_data"]["JumpingJack"]["Hunyuan"]["ac"] == 0.0
    assert out["table_data"]["JumpingJack"]["wan21"]["ac"] == 100.0
    assert out["table_data"]["PushUps"]["wan21"]["ac"] is None
    agg = out["aggregated_scores"]["Hunyuan"]
    assert set(agg) == {"ac", "tc", "avg"}
    ascii_table = render_ascii(out, "ac")
    assert "JumpingJack" in ascii_table and "N/A" in ascii_table


# ----------------------------- MOS pipeline --------------------------------


def _make_rows(rng, n_participants=8, n_videos=20, bad_pids=()):
    """Synthetic ratings: shared per-video 'true' quality + rater noise;
    participants in bad_pids rate randomly (to be filtered)."""
    true_ac = rng.uniform(1, 5, size=n_videos)
    true_tc = rng.uniform(1, 5, size=n_videos)
    rows = []
    for p in range(n_participants):
        pid = f"p{p}"
        noisy = pid in bad_pids
        for v in range(n_videos):
            reps = 2 if v < 3 else 1  # first videos repeated
            for _ in range(reps):
                ac = rng.uniform(1, 5) if noisy else true_ac[v] + rng.normal(0, 0.3)
                tc = rng.uniform(1, 5) if noisy else true_tc[v] + rng.normal(0, 0.3)
                rows.append(
                    {
                        "participant_id": pid,
                        "video_id": f"gen_videos_vid{v:02d}",
                        AC_KEY: float(ac),
                        TC_KEY: float(tc),
                    }
                )
    participants = {}
    for r in rows:
        participants.setdefault(r["participant_id"], []).append(r)
    return rows, participants


def test_stage1_filters_inconsistent_raters(rng):
    _rows, participants = _make_rows(rng, n_participants=20, bad_pids=("p0",))
    kept = stage1_repeated_video_consistency(participants)
    assert len(kept) < 20            # 95th percentile cut removes someone
    assert "p1" in kept              # consistent raters survive


def test_stage3_filters_uncorrelated_raters(rng):
    _rows, participants = _make_rows(rng, n_participants=8, bad_pids=("p7",))
    kept = stage3_inter_rater_reliability(participants, AC_KEY)
    assert "p7" not in kept
    assert len(kept) >= 5


def test_stage2_minimum_ratings(rng):
    _rows, participants = _make_rows(rng, n_participants=4)
    participants["tiny"] = participants["p0"][:5]  # < 10 ratings
    kept = stage2_subject_rejection(participants, AC_KEY)
    assert "tiny" not in kept


def test_mos_zscore(rng):
    _rows, participants = _make_rows(rng, n_participants=5)
    mos = compute_mos_and_normalize(participants, AC_KEY)
    vals = np.array(list(mos.values()))
    np.testing.assert_allclose(vals.mean(), 0.0, atol=1e-9)
    np.testing.assert_allclose(vals.std(), 1.0, atol=1e-9)


def test_process_human_scores_end_to_end(rng, tmp_path):
    rows, _ = _make_rows(rng, n_participants=8, bad_pids=("p7",))
    raw = str(tmp_path / "raw.json")
    with open(raw, "w") as f:
        json.dump(rows, f)
    out_path = str(tmp_path / "human_scores.json")
    out = process_human_scores(raw, out_path)
    assert len(out) == 20
    # name normalization applied: "gen_videos_vidNN" -> "gen_vidNN.mp4"
    assert all(k.startswith("gen_vid") and k.endswith(".mp4") for k in out)
    with open(out_path) as f:
        assert json.load(f) == out


def test_shipped_benchmark_fixture():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "video_gen_evals_tpu",
        "human",
        "fixtures",
        "TAG_final_human_scores.json",
    )
    with open(path) as f:
        data = json.load(f)
    assert len(data) == 300
    generators = {"Hunyuan", "Opensora_768", "RunwayGen4", "wan21", "Wan2.2"}
    assert all(("ac" in v and "tc" in v) for v in data.values())
    assert any(any(k.startswith(g) for g in generators) for k in data)
