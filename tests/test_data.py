"""Data-layer tests on synthetic fixtures.

The key test validates the feature-bank + device-gather restructuring against
a direct per-window oracle that follows the reference pipeline order exactly
(slice-or-pad each modality -> compute deltas on the window -> z-score ->
concat), including edge cases: window start 0, tail padding, keypoint arrays
shorter than mesh arrays, and short videos.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from video_gen_evals_tpu.data import (
    ModalityPaths,
    PKBatchSampler,
    build_feature_bank,
    compute_stats,
    enumerate_windows,
    gather_windows,
    scan_class_tree,
    slice_or_pad,
    train_test_split,
)
from video_gen_evals_tpu.data.features import load_video_arrays, _NORM_EPS
from video_gen_evals_tpu.data.fixtures import make_fixture_tree
from video_gen_evals_tpu.ops import (
    vit_delta,
    betas_delta,
    procrustes_kp_delta,
)
from video_gen_evals_tpu.ops.so3 import rotmat_delta

CLASSES = ["JumpingJack", "PushUps"]


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("fixture")
    mesh_root, kp_root = make_fixture_tree(
        str(root), CLASSES, videos_per_class=3, frames=(40, 37, 25), kp_shorter_by=5
    )
    return mesh_root, kp_root


@pytest.fixture(scope="module")
def pipeline(tree):
    mesh_root, kp_root = tree
    manifest = scan_class_tree(mesh_root)
    paths = ModalityPaths(keypoint_dir=kp_root, layout="real")
    stats = compute_stats(manifest.items, paths)
    bank = build_feature_bank(manifest.items, paths, stats)
    return manifest, paths, stats, bank


def test_scan(tree):
    mesh_root, _ = tree
    manifest = scan_class_tree(mesh_root)
    assert len(manifest) == 6
    assert manifest.classes == sorted(CLASSES)
    assert all(it.vit_dim == 64 for it in manifest.items)


def test_class_filter(tree):
    mesh_root, _ = tree
    m = scan_class_tree(mesh_root, filter_classes=["PushUps"])
    assert len(m) == 3 and m.classes == ["PushUps"]


def test_split_deterministic_and_nonempty(tree):
    mesh_root, _ = tree
    manifest = scan_class_tree(mesh_root)
    tr1, te1 = train_test_split(manifest, 0.8, seed=1337)
    tr2, te2 = train_test_split(manifest, 0.8, seed=1337)
    assert [i.name for i in tr1.items] == [i.name for i in tr2.items]
    for cls in CLASSES:
        assert any(i.cls == cls for i in tr1.items)
        assert any(i.cls == cls for i in te1.items)


def test_enumerate_windows_semantics(tree):
    mesh_root, _ = tree
    manifest = scan_class_tree(mesh_root)
    wins = enumerate_windows(manifest, clip_len=32, stride=8)
    by_video = {}
    for vi, s in wins:
        by_video.setdefault(vi, []).append(s)
    for vi, starts in by_video.items():
        L = manifest.items[vi].length
        if L < 32:
            assert starts == [0]
        else:
            assert starts == list(range(0, L - 32 + 1, 8))


def test_slice_or_pad_rules(rng):
    arr = rng.normal(size=(10, 4)).astype(np.float32)
    # in range
    np.testing.assert_array_equal(slice_or_pad(arr, 2, 5), arr[2:7])
    # tail pad
    w = slice_or_pad(arr, 7, 5)
    np.testing.assert_array_equal(w[:3], arr[7:])
    np.testing.assert_array_equal(w[3:], np.repeat(arr[-1:], 2, axis=0))
    # start beyond end
    np.testing.assert_array_equal(
        slice_or_pad(arr, 15, 4), np.repeat(arr[-1:], 4, axis=0)
    )
    # negative start
    np.testing.assert_array_equal(
        slice_or_pad(arr, -3, 4), np.repeat(arr[:1], 4, axis=0)
    )


def _oracle_window(item, paths, stats, start, clip_len):
    """Reference-order per-window computation: slice-or-pad raw arrays, THEN
    deltas on the window, THEN z-score with (std + eps), THEN concat."""
    arrays = load_video_arrays(item, paths, strict_kp=True)
    mods = stats.modalities
    raw_parts, diff_parts = [], []
    for m in mods:
        w = slice_or_pad(arrays[m], start, clip_len)
        Tw = w.shape[0]
        if m in ("vit", "clip", "dino"):
            d = np.asarray(vit_delta(jnp.asarray(w)))
        elif m in ("global", "pose"):
            d = np.asarray(
                rotmat_delta(jnp.asarray(w.reshape(Tw, -1, 3, 3)))
            ).reshape(Tw, -1)
        elif m == "beta":
            d = np.asarray(betas_delta(jnp.asarray(w)))
        elif m == "kp2d":
            d = np.asarray(procrustes_kp_delta(jnp.asarray(w)))
        raw_parts.append((w - stats.mean_raw[m]) / (stats.std_raw[m] + _NORM_EPS))
        diff_parts.append((d - stats.mean_diff[m]) / (stats.std_diff[m] + _NORM_EPS))
    return np.concatenate(raw_parts + diff_parts, axis=1).astype(np.float32)


def test_gather_matches_per_window_oracle(pipeline):
    manifest, paths, stats, bank = pipeline
    clip_len = 32
    cases = []
    for vi, it in enumerate(manifest.items):
        L = it.length
        starts = {0}
        if L >= clip_len:
            starts.add(L - clip_len)            # exact tail
            starts.add(max(0, L - clip_len + 3))  # would-be overshoot is clipped
        if L > clip_len + 5:
            starts.add(5)                        # interior
        # force crossing the (shorter) keypoint array's end
        starts.add(max(0, L - clip_len))
        cases.extend((vi, s) for s in sorted(starts))

    video_idx = jnp.asarray(np.array([c[0] for c in cases], np.int32))
    starts = jnp.asarray(np.array([c[1] for c in cases], np.int32))
    out = np.asarray(
        gather_windows(
            jnp.asarray(bank.bank),
            jnp.asarray(bank.offsets),
            jnp.asarray(bank.row_limit),
            jnp.asarray(bank.z0_diff),
            bank.one_pass_raw,
            video_idx,
            starts,
            clip_len,
        )
    )
    for i, (vi, s) in enumerate(cases):
        oracle = _oracle_window(manifest.items[vi], paths, stats, s, clip_len)
        np.testing.assert_allclose(
            out[i], oracle, atol=2e-5,
            err_msg=f"video={manifest.items[vi].name} start={s}",
        )


def test_missing_keypoints_is_hard_error(tree, tmp_path):
    mesh_root, _ = tree
    manifest = scan_class_tree(mesh_root)
    paths = ModalityPaths(keypoint_dir=str(tmp_path / "nope"), layout="real")
    stats_paths = ModalityPaths(keypoint_dir=None)
    stats = compute_stats(manifest.items, stats_paths)
    with pytest.raises(FileNotFoundError):
        build_feature_bank(manifest.items[:1], paths, stats, modalities=["vit", "kp2d"])


def test_stats_constant_video(tmp_path):
    """Constant frames -> raw std = sqrt(eps), diff mean ~ 0."""
    import json
    from video_gen_evals_tpu.data.manifest import VideoItem

    Tlen = 20
    one_pose = np.broadcast_to(np.eye(3, dtype=np.float32), (Tlen, 23, 3, 3))
    path = str(tmp_path / "c" / "v.npz")
    import os

    os.makedirs(os.path.dirname(path))
    np.savez(
        path,
        pose=one_pose,
        betas=np.full((Tlen, 10), 2.0, np.float32),
        global_orient=one_pose[:, :1],
        vit=np.full((Tlen, 8), 3.0, np.float32),
        frame_idx=np.arange(Tlen),
        meta=json.dumps({}),
    )
    item = VideoItem(cls="c", name="v.npz", path=path, length=Tlen, vit_dim=8)
    stats = compute_stats([item], ModalityPaths(keypoint_dir=None))
    np.testing.assert_allclose(stats.mean_raw["beta"], 2.0, atol=1e-6)
    np.testing.assert_allclose(stats.std_raw["beta"], np.sqrt(1e-6), rtol=1e-4)
    np.testing.assert_allclose(stats.mean_diff["beta"], 0.0, atol=1e-6)


def test_pk_sampler_balance():
    labels = np.repeat(np.arange(4), [50, 30, 10, 5])
    sampler = PKBatchSampler(labels, P=3, K=8, rng=np.random.default_rng(0))
    batches = list(sampler)
    assert len(batches) == len(labels) // 24 == len(sampler)
    for b in batches:
        assert len(b) == 24
        ls, counts = np.unique(labels[b], return_counts=True)
        assert len(ls) == 3
        assert all(c == 8 for c in counts)


def test_pk_sampler_replacement_topup():
    labels = np.repeat(np.arange(3), [40, 40, 4])  # class 2 has < K items
    sampler = PKBatchSampler(labels, P=3, K=8, rng=np.random.default_rng(1))
    seen_cls2 = False
    for b in sampler:
        ls, counts = np.unique(labels[b], return_counts=True)
        if 2 in ls:
            seen_cls2 = True
            assert counts[list(ls).index(2)] == 8  # topped up with replacement
    assert seen_cls2


def test_pk_sampler_p_exceeds_classes():
    with pytest.raises(ValueError):
        PKBatchSampler([0, 0, 1, 1], P=3, K=1)


def test_feature_bank_save_load_roundtrip(pipeline, tmp_path):
    from video_gen_evals_tpu.data.features import load_feature_bank, save_feature_bank

    _manifest, _paths, _stats, bank = pipeline
    path = str(tmp_path / "bank.npz")
    save_feature_bank(bank, path)
    loaded = load_feature_bank(path)
    np.testing.assert_array_equal(loaded.bank, bank.bank)
    np.testing.assert_array_equal(loaded.offsets, bank.offsets)
    np.testing.assert_array_equal(loaded.row_limit, bank.row_limit)
    np.testing.assert_array_equal(loaded.z0_diff, bank.z0_diff)
    assert loaded.one_pass_raw == bank.one_pass_raw
    assert loaded.classes == bank.classes
    assert loaded.names == bank.names


def test_bank_cache_roundtrip_and_stale_rebuild(pipeline, tmp_path):
    from video_gen_evals_tpu.data import build_feature_bank_cached

    manifest, paths, stats, bank = pipeline
    cache = str(tmp_path / "bank.npz")
    b1 = build_feature_bank_cached(manifest.items, paths, stats, cache_path=cache)
    assert os.path.exists(cache)
    np.testing.assert_array_equal(b1.bank, bank.bank)
    # second call loads from cache (names match) and is identical
    b2 = build_feature_bank_cached(manifest.items, paths, stats, cache_path=cache)
    np.testing.assert_array_equal(b2.bank, bank.bank)
    assert b2.names == bank.names and b2.classes == bank.classes
    assert b2.one_pass_raw == bank.one_pass_raw
    # a different item set invalidates the cache and rebuilds + overwrites
    sub = manifest.items[:3]
    b3 = build_feature_bank_cached(sub, paths, stats, cache_path=cache)
    assert b3.names == [it.name for it in sub]
    b4 = build_feature_bank_cached(sub, paths, stats, cache_path=cache)
    np.testing.assert_array_equal(b4.bank, b3.bank)


def test_bank_cache_fingerprint_invalidation(pipeline, tmp_path):
    """Changed stats / min_rows / touched source files must miss the cache
    (advisor round-2: name equality alone silently reused stale banks)."""
    import dataclasses as dc

    from video_gen_evals_tpu.data import build_feature_bank_cached
    from video_gen_evals_tpu.data.features import bank_fingerprint

    manifest, paths, stats, _bank = pipeline
    items = manifest.items
    cache = str(tmp_path / "bank.npz")
    b1 = build_feature_bank_cached(items, paths, stats, cache_path=cache)

    # different stats -> different fingerprint and a rebuilt (different) bank
    stats2 = dc.replace(
        stats,
        mean_raw={m: v + 1.0 for m, v in stats.mean_raw.items()},
    )
    assert bank_fingerprint(items, paths, stats2) != bank_fingerprint(
        items, paths, stats
    )
    b2 = build_feature_bank_cached(items, paths, stats2, cache_path=cache)
    assert not np.array_equal(b2.bank, b1.bank)

    # different min_rows -> different fingerprint
    assert bank_fingerprint(items, paths, stats, min_rows=48) != bank_fingerprint(
        items, paths, stats, min_rows=40
    )

    # touching a source file (newer mtime, same content) -> different fingerprint
    fp_before = bank_fingerprint(items, paths, stats)
    st = os.stat(items[0].path)
    os.utime(items[0].path, ns=(st.st_atime_ns, st.st_mtime_ns + 10_000_000))
    assert bank_fingerprint(items, paths, stats) != fp_before

    # a pre-fingerprint cache (no stored fingerprint) is rebuilt, not trusted
    from video_gen_evals_tpu.data.features import (
        load_bank_fingerprint,
        save_feature_bank,
    )

    save_feature_bank(b1, cache)  # no fingerprint arg
    assert load_bank_fingerprint(cache) is None
    b3 = build_feature_bank_cached(items, paths, stats, cache_path=cache)
    np.testing.assert_array_equal(b3.bank, b1.bank)
    assert load_bank_fingerprint(cache) is not None


def test_bank_cache_class_relabel_invalidation(pipeline, tmp_path):
    """Relabeling a video's class (same file contents) must rebuild — AC
    centroids ride ``bank.classes`` even when the bank matrix is unchanged."""
    import dataclasses as dc

    from video_gen_evals_tpu.data import build_feature_bank_cached
    from video_gen_evals_tpu.data.features import bank_fingerprint

    manifest, _kp_paths, stats, _bank = pipeline
    # no class-dependent side files: relabeling must only change the labels
    paths = ModalityPaths(layout="real")
    mods = ["vit", "global", "pose", "beta"]
    items = list(manifest.items)
    cache = str(tmp_path / "bank.npz")
    b1 = build_feature_bank_cached(items, paths, stats, mods, cache_path=cache)

    relabeled = [dc.replace(items[0], cls=items[0].cls + "X")] + items[1:]
    assert bank_fingerprint(relabeled, paths, stats, mods) != bank_fingerprint(
        items, paths, stats, mods
    )
    b2 = build_feature_bank_cached(relabeled, paths, stats, mods, cache_path=cache)
    assert b2.classes[0] != b1.classes[0]
    assert b2.classes[0] == relabeled[0].cls
    np.testing.assert_array_equal(b2.bank, b1.bank)  # same file contents


def test_zero_frame_modality_is_hard_error(pipeline):
    """A modality with ZERO frames must fail at bank-build time: its bank
    would get row_limit -1 and windows would silently read the previous
    video's rows."""
    from video_gen_evals_tpu.data.features import compute_video_features
    from video_gen_evals_tpu.utils.native_npz import load_npz

    manifest, paths, stats, _bank = pipeline
    item = manifest.items[0]
    npz = dict(load_npz(item.path))
    npz["vit"] = npz["vit"][:0]
    with pytest.raises(ValueError, match="zero frames"):
        compute_video_features(item, paths, stats, npz=npz)


def test_gather_negative_start_stays_in_video():
    """A negative start must clamp to the video's own frame 0 (the reference
    slice-or-pad rule, ``slice_or_pad(-k)`` repeats frame 0) — NOT index into
    the previous video's bank rows. The sliced/Pallas variants shift the
    window back (documented divergence) but must also stay in-video."""
    from video_gen_evals_tpu.data.features import gather_windows_sliced
    from video_gen_evals_tpu.ops.window_kernel import (
        pad_bank_lanes,
        pallas_gather_windows,
    )

    V, rows, D, T_ = 2, 8, 4, 8
    one_pass_raw = 2
    bank = np.arange(V * rows * D, dtype=np.float32).reshape(V * rows, D)
    args_np = (
        np.array([0, rows], np.int32),          # offsets
        np.array([rows - 1, rows - 1], np.int32),  # row_limit
        np.full(D - one_pass_raw, -7.0, np.float32),  # z0_diff
    )
    vi = np.array([1], np.int32)
    st = np.array([-3], np.int32)

    out = np.asarray(
        gather_windows(
            jnp.asarray(bank), *map(jnp.asarray, args_np), one_pass_raw,
            jnp.asarray(vi), jnp.asarray(st), T_,
        )
    )[0]
    # slice_or_pad rule: a negative start yields frame 0 of the video's OWN
    # bank for the whole window (row 0's diff block is the z0 override)
    v1 = bank[rows : 2 * rows]
    np.testing.assert_array_equal(out[0, :one_pass_raw], v1[0, :one_pass_raw])
    np.testing.assert_array_equal(out[0, one_pass_raw:], args_np[2])
    np.testing.assert_array_equal(out[1:], np.repeat(v1[:1], T_ - 1, axis=0))

    sliced = np.asarray(
        gather_windows_sliced(
            jnp.asarray(bank), *map(jnp.asarray, args_np), one_pass_raw,
            jnp.asarray(vi), jnp.asarray(st), T_,
        )
    )[0]
    # never reads video 0 (row 0's diff block is the z0 overwrite)
    assert sliced[:, :one_pass_raw].min() >= v1.min()
    np.testing.assert_array_equal(sliced[1:], v1[1:T_])  # shifted-back window

    bank_p = pad_bank_lanes(jnp.asarray(bank))
    pal = np.asarray(
        pallas_gather_windows(
            jnp.asarray(bank_p), *map(jnp.asarray, args_np), one_pass_raw,
            jnp.asarray(vi), jnp.asarray(st), T_, out_dim=D, interpret=True,
        )
    )[0]
    np.testing.assert_array_equal(pal, sliced)
