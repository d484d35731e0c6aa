"""Manifest whitelists, generated-dir recursion, stats serialization."""

import json
import os

import numpy as np

from video_gen_evals_tpu.data import (
    ModalityPaths,
    ModalityStats,
    compute_stats,
    scan_class_tree,
    scan_generated_flat,
)
from video_gen_evals_tpu.data.fixtures import make_fixture_tree, write_mesh_npz


def test_whitelist_filtering(tmp_path, rng):
    mesh_root, _ = make_fixture_tree(
        str(tmp_path), ["PushUps"], videos_per_class=3, frames=(20, 22, 24)
    )
    all_items = scan_class_tree(mesh_root)
    assert len(all_items) == 3

    # whitelist only the first video (stem with or without extension accepted)
    wdir = str(tmp_path / "whitelists")
    os.makedirs(wdir)
    keep = os.path.splitext(all_items.items[0].name)[0]
    with open(os.path.join(wdir, "PushUps.json"), "w") as f:
        json.dump([keep + ".mp4"], f)

    filtered = scan_class_tree(mesh_root, whitelist_json_dir=wdir)
    assert [it.name for it in filtered.items] == [all_items.items[0].name]


def test_generated_scan_recursive_and_class_inference(tmp_path, rng):
    gen = tmp_path / "gen"
    write_mesh_npz(str(gen / "Hunyuan_JumpingJack_01_ab.npz"), 10, 16)
    write_mesh_npz(str(gen / "sub" / "wan21_PushUps_02_cd.npz"), 12, 16)
    write_mesh_npz(str(gen / "mystery_lowercase_99.npz"), 8, 16)

    m = scan_generated_flat(str(gen))
    assert len(m) == 3
    by_name = {it.name: it for it in m.items}
    assert by_name["Hunyuan_JumpingJack_01_ab.npz"].cls == "JumpingJack"
    assert by_name["wan21_PushUps_02_cd.npz"].cls == "PushUps"   # found in subdir
    assert by_name["mystery_lowercase_99.npz"].cls == "Unknown"


def test_stats_save_load_roundtrip(tmp_path, rng):
    mesh_root, kp_root = make_fixture_tree(
        str(tmp_path / "fx"), ["PushUps"], videos_per_class=2, frames=(20, 24)
    )
    manifest = scan_class_tree(mesh_root)
    paths = ModalityPaths(keypoint_dir=kp_root, layout="real")
    stats = compute_stats(manifest.items, paths)
    p = str(tmp_path / "stats.npz")
    stats.save(p)
    loaded = ModalityStats.load(p)
    assert loaded.modalities == stats.modalities
    for m in stats.modalities:
        np.testing.assert_array_equal(loaded.mean_raw[m], stats.mean_raw[m])
        np.testing.assert_array_equal(loaded.std_diff[m], stats.std_diff[m])
    assert loaded.dims_map_raw() == stats.dims_map_raw()


def test_generated_scan_skips_unusable_npz(tmp_path, rng):
    """An npz with no 'pose' member (torn extraction) or zero frames can
    never produce a window; admitting it used to crash the eager bank build
    with KeyError 'pose' — the scan now drops it (the lazy reference never
    reads such items either, so observable outputs match)."""
    gen = tmp_path / "gen"
    gen.mkdir()
    write_mesh_npz(str(gen / "GenA_PushUps_01.npz"), 12, 16, rng)
    np.savez_compressed(str(gen / "GenB_PushUps_02_no_pose.npz"),
                        vit=np.zeros((5, 16), np.float32))
    np.savez_compressed(
        str(gen / "GenC_PushUps_03_zero_frames.npz"),
        pose=np.zeros((0, 23, 3, 3), np.float32),
        betas=np.zeros((0, 10), np.float32),
        global_orient=np.zeros((0, 1, 3, 3), np.float32),
        vit=np.zeros((0, 16), np.float32),
    )
    m = scan_generated_flat(str(gen))
    assert [it.name for it in m.items] == ["GenA_PushUps_01.npz"]


def test_npz_shapes_header_only_matches_fallback(tmp_path, rng):
    """npz_shapes (native header-only path) agrees with the zipfile
    fallback and with the real array shapes."""
    from video_gen_evals_tpu.utils import native_npz

    p = str(tmp_path / "v.npz")
    write_mesh_npz(p, 9, 24, rng)
    shapes = native_npz.npz_shapes(p)
    assert shapes["pose"] == (9, 23, 3, 3)
    assert shapes["vit"] == (9, 24)
    # force the zipfile fallback and compare
    orig = native_npz.load_library
    native_npz.load_library = lambda: None
    try:
        fb = native_npz.npz_shapes(p)
    finally:
        native_npz.load_library = orig
    for k, v in shapes.items():
        assert fb[k] == v


def test_bank_validate_clip_len(tmp_path, rng):
    """A bank built with min_rows < clip_len must be rejected at encode
    time — the sliced gather would otherwise silently read the NEXT video's
    rows for the window tail."""
    import pytest

    from video_gen_evals_tpu.data import build_feature_bank
    from video_gen_evals_tpu.data.manifest import scan_class_tree as _scan

    mesh_root, kp_root = make_fixture_tree(
        str(tmp_path), ["PushUps"], videos_per_class=2, frames=(10, 12)
    )
    manifest = _scan(mesh_root)
    paths = ModalityPaths(keypoint_dir=kp_root, layout="real")
    stats = compute_stats(manifest.items, paths)
    bank = build_feature_bank(manifest.items, paths, stats, min_rows=8)
    bank.validate_clip_len(8)  # every video has >= 8 rows: fine
    with pytest.raises(ValueError, match="rows"):
        bank.validate_clip_len(64)
