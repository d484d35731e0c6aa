"""End-to-end score pipeline test on synthetic fixtures: the ref eval.py flow
(stats -> centroids -> score generated -> video_scores.json -> Spearman)."""

import json
import os

import numpy as np
import jax
import pytest

from video_gen_evals_tpu.data import ModalityPaths
from video_gen_evals_tpu.data.fixtures import (
    make_fixture_tree,
    write_keypoints,
    write_mesh_npz,
)
from video_gen_evals_tpu.models import EncoderConfig, HumanActionScorer
from video_gen_evals_tpu.models.fusion_encoder import init_encoder
from video_gen_evals_tpu.pipelines.score import ScoreConfig, score_generated

CLASSES = ["JumpingJack", "PushUps"]


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    mesh_root, kp_root = make_fixture_tree(
        str(root), CLASSES, videos_per_class=4, frames=(40, 36, 25, 44), seed=3
    )
    # generated: flat dir with model/class-coded names + generated-layout kps
    gen_dir = str(root / "generated_meshes")
    gen_kp = str(root / "generated_kps")
    rng = np.random.default_rng(7)
    names = []
    for i, cls in enumerate(CLASSES * 3):
        stem = f"GenModel{i % 2}_{cls}_{i:02d}_hash{i}"
        write_mesh_npz(os.path.join(gen_dir, f"{stem}.npz"), 38, 64, rng)
        write_keypoints(os.path.join(gen_kp, stem, "keypoints.npy"), 38, rng)
        names.append(stem)
    human = {f"{n}.mp4": {"ac": float(i), "tc": float(-i)} for i, n in enumerate(names)}
    human_path = str(root / "human.json")
    with open(human_path, "w") as f:
        json.dump(human, f)
    return root, mesh_root, kp_root, gen_dir, gen_kp, human_path, names


def test_score_pipeline_end_to_end(env):
    root, mesh_root, kp_root, gen_dir, gen_kp, human_path, names = env
    dims_raw = {"vit": 64, "global": 9, "pose": 207, "beta": 10, "kp2d": 120}
    dims_diff = {"vit": 64, "global": 3, "pose": 69, "beta": 10, "kp2d": 120}
    cfg = EncoderConfig.create(dims_raw, dims_diff, d_model=64, time_layers=2, time_heads=4)
    model, params = init_encoder(cfg, jax.random.key(0), clip_len=16)

    out_json = str(root / "video_scores.json")
    result = score_generated(
        model,
        params,
        gen_dir,
        mesh_root,
        real_paths=ModalityPaths(keypoint_dir=kp_root, layout="real"),
        gen_paths=ModalityPaths(keypoint_dir=gen_kp, layout="generated"),
        cfg=ScoreConfig(clip_len=16, stride=8, batch_size=16),
        human_scores_path=human_path,
        output_json=out_json,
    )

    scores = result["scores"]
    assert len(scores) == len(names)
    for n in names:
        assert "ac" in scores[n] and "tc" in scores[n]
        assert np.isfinite(scores[n]["ac"]) and np.isfinite(scores[n]["tc"])
        assert scores[n]["tc"] >= 0 and 0 <= scores[n]["ac"] <= 2.0

    # schema on disk matches reference eval.py output
    with open(out_json) as f:
        on_disk = json.load(f)
    assert on_disk == scores

    assert result["ac_corr"]["n"] == len(names)
    assert result["tc_corr"]["n"] == len(names)
    assert result["ac_corr"]["spearman"] is not None


def test_batched_encoding_invariant_to_batch_size(env):
    """Scores must not depend on the scoring batch size (pad+mask check)."""
    root, mesh_root, kp_root, gen_dir, gen_kp, human_path, names = env
    dims_raw = {"vit": 64, "global": 9, "pose": 207, "beta": 10, "kp2d": 120}
    dims_diff = {"vit": 64, "global": 3, "pose": 69, "beta": 10, "kp2d": 120}
    cfg = EncoderConfig.create(dims_raw, dims_diff, d_model=32, time_layers=1, time_heads=4)
    model, params = init_encoder(cfg, jax.random.key(1), clip_len=16)

    outs = []
    for bs in (7, 64):
        r = score_generated(
            model,
            params,
            gen_dir,
            mesh_root,
            real_paths=ModalityPaths(keypoint_dir=kp_root, layout="real"),
            gen_paths=ModalityPaths(keypoint_dir=gen_kp, layout="generated"),
            cfg=ScoreConfig(clip_len=16, stride=8, batch_size=bs),
            output_json=None,
        )
        outs.append(r["scores"])
    for n in outs[0]:
        np.testing.assert_allclose(outs[0][n]["ac"], outs[1][n]["ac"], atol=1e-5)
        np.testing.assert_allclose(outs[0][n]["tc"], outs[1][n]["tc"], atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_window_encoder_mesh_matches_single_device(env):
    """Window-axis sharding over the mesh `data` axis returns the same
    embeddings/TC as the single-device sweep (SURVEY §5.8)."""
    from video_gen_evals_tpu.data import (
        build_feature_bank,
        compute_stats,
        enumerate_windows,
        scan_class_tree,
        train_test_split,
    )
    from video_gen_evals_tpu.parallel import make_mesh
    from video_gen_evals_tpu.pipelines.score import WindowEncoder

    root, mesh_root, kp_root, *_ = env
    manifest = scan_class_tree(mesh_root)
    train_ds, _ = train_test_split(manifest, 0.8, seed=1337)
    paths = ModalityPaths(keypoint_dir=kp_root, layout="real")
    stats = compute_stats(train_ds.items, paths)
    bank = build_feature_bank(train_ds.items, paths, stats, min_rows=24)
    windows = enumerate_windows(train_ds, 16, 8)
    assert len(windows) > 16  # multiple batches incl. a padded tail

    cfg = EncoderConfig.create(
        stats.dims_map_raw(), stats.dims_map_diff(), d_model=32, time_layers=1, time_heads=4
    )
    model, params = init_encoder(cfg, jax.random.key(2), clip_len=16)

    enc1 = WindowEncoder(model, params, 16, 16)
    s1, t1, v1 = enc1.encode_bank(bank, windows)
    enc8 = WindowEncoder(model, params, 16, 16, mesh=make_mesh(n_data=8, n_model=1))
    s8, t8, v8 = enc8.encode_bank(bank, windows)

    np.testing.assert_array_equal(v1, v8)
    np.testing.assert_allclose(s1, s8, atol=2e-5)
    np.testing.assert_allclose(t1, t8, atol=2e-5)

    with pytest.raises(ValueError, match="divide evenly"):
        WindowEncoder(model, params, 12, 16, mesh=make_mesh(n_data=8, n_model=1))


def test_window_encoder_block_kernel_matches_module(env):
    """encoder_impl="block_kernel" (fused Pallas conv stages, interpret mode
    on CPU) returns the same embeddings/TC as the module forward."""
    from video_gen_evals_tpu.data import (
        build_feature_bank,
        compute_stats,
        enumerate_windows,
        scan_class_tree,
        train_test_split,
    )
    from video_gen_evals_tpu.pipelines.score import WindowEncoder

    root, mesh_root, kp_root, *_ = env
    manifest = scan_class_tree(mesh_root)
    train_ds, _ = train_test_split(manifest, 0.8, seed=1337)
    paths = ModalityPaths(keypoint_dir=kp_root, layout="real")
    stats = compute_stats(train_ds.items, paths)
    bank = build_feature_bank(train_ds.items, paths, stats, min_rows=24)
    windows = enumerate_windows(train_ds, 16, 8)

    cfg = EncoderConfig.create(
        stats.dims_map_raw(), stats.dims_map_diff(),
        d_model=256, time_layers=1, time_heads=4,
    )
    model, params = init_encoder(cfg, jax.random.key(2), clip_len=16)

    enc_m = WindowEncoder(model, params, 16, 16, encoder_impl="module")
    sm, tm, vm = enc_m.encode_bank(bank, windows)
    for impl in ("block_kernel", "chain_kernel"):
        enc_k = WindowEncoder(model, params, 16, 16, encoder_impl=impl)
        assert enc_k._use_block_kernel
        sk, tk, vk = enc_k.encode_bank(bank, windows)

        np.testing.assert_array_equal(vm, vk)
        # CPU interpret runs the kernel's bf16_3x decomposition vs f32 module
        np.testing.assert_allclose(sm, sk, atol=5e-4, err_msg=impl)
        np.testing.assert_allclose(tm, tk, atol=5e-4, err_msg=impl)
