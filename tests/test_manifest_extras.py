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
