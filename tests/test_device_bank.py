"""Device-resident bank assembly (round-5 directive #3): bitwise equivalence
vs the host builder on the CPU backend, plus the stream-stats fast path."""

import numpy as np
import pytest

from video_gen_evals_tpu.data.device_bank import build_bank_device, stream_stats
from video_gen_evals_tpu.data.stats import ModalityStats
from video_gen_evals_tpu.pipelines.full import bank_from_arrays, stats_from_arrays


def _synth_arrays(rng, Tlen, with_kp_short=False):
    """Per-video modality dict in the extraction-output (flattened) layout."""
    def rotmats(n):
        # near-orthonormal rotations via Rodrigues on random axis-angles
        from video_gen_evals_tpu.ops.so3 import axis_angle_to_matrix
        import jax.numpy as jnp

        aa = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
        return np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))

    T_kp = Tlen - 3 if with_kp_short else Tlen
    return {
        "vit": rng.normal(size=(Tlen, 32)).astype(np.float32),
        "global": rotmats(Tlen).reshape(Tlen, 9),
        "pose": np.stack(
            [rotmats(Tlen) for _ in range(3)], axis=1
        ).reshape(Tlen, 27),
        "beta": rng.normal(size=(Tlen, 10)).astype(np.float32),
        "kp2d": rng.uniform(0, 1, size=(T_kp, 24)).astype(np.float32),
    }


@pytest.fixture
def videos(rng):
    return [
        _synth_arrays(rng, 40),
        _synth_arrays(rng, 55, with_kp_short=True),  # kp/mesh misalignment quirk
        _synth_arrays(rng, 12),                      # short video: min_rows pad
    ]


def test_device_bank_bitwise_matches_host(videos):
    names = [f"v{i}" for i in range(len(videos))]
    classes = ["a", "b", "a"]
    stats = stats_from_arrays(videos)
    host = bank_from_arrays(videos, names, classes, stats, min_rows=40)
    dev = build_bank_device(videos, names, classes, stats, min_rows=40)

    np.testing.assert_array_equal(np.asarray(dev.bank), host.bank)
    np.testing.assert_array_equal(dev.offsets, host.offsets)
    np.testing.assert_array_equal(dev.row_limit, host.row_limit)
    np.testing.assert_array_equal(dev.z0_diff, host.z0_diff)
    assert dev.one_pass_raw == host.one_pass_raw
    assert dev.classes == host.classes and dev.names == host.names


def test_device_bank_feeds_encoder_identically(videos, rng):
    """End-to-end: scoring on the device bank == scoring on the host bank."""
    import jax

    from video_gen_evals_tpu.data.manifest import VideoItem, VideoManifest
    from video_gen_evals_tpu.data.windows import enumerate_windows
    from video_gen_evals_tpu.models import EncoderConfig
    from video_gen_evals_tpu.models.fusion_encoder import init_encoder
    from video_gen_evals_tpu.pipelines.score import WindowEncoder

    names = [f"v{i}" for i in range(len(videos))]
    classes = ["a", "b", "a"]
    stats = stats_from_arrays(videos)
    host = bank_from_arrays(videos, names, classes, stats, min_rows=24)
    dev = build_bank_device(videos, names, classes, stats, min_rows=24)

    cfg = EncoderConfig.create(
        stats.dims_map_raw(), stats.dims_map_diff(),
        d_model=64, time_layers=1, time_heads=4,
    )
    model, params = init_encoder(cfg, jax.random.key(0), clip_len=16)
    manifest = VideoManifest(
        [
            VideoItem(cls=c, name=n, path="", length=v["vit"].shape[0],
                      vit_dim=v["vit"].shape[1])
            for c, n, v in zip(classes, names, videos)
        ]
    )
    windows = enumerate_windows(manifest, 16, 8)
    enc = WindowEncoder(model, params, batch_size=8, clip_len=16)
    seq_h, tc_h, _ = enc.encode_bank(host, windows)
    seq_d, tc_d, _ = enc.encode_bank(dev, windows)
    np.testing.assert_array_equal(seq_d, seq_h)
    np.testing.assert_array_equal(tc_d, tc_h)


def test_device_bank_with_shared_streams_bitwise(videos):
    """Passing the StreamSet from stream_stats (the serve-path fast route)
    must produce the identical bank to recomputing streams in-place."""
    names = [f"v{i}" for i in range(len(videos))]
    classes = ["a", "b", "a"]
    stats = stats_from_arrays(videos)
    _dev_stats, streams = stream_stats(videos)
    direct = build_bank_device(videos, names, classes, stats, min_rows=40)
    shared = build_bank_device(
        videos, names, classes, stats, min_rows=40, streams=streams
    )
    np.testing.assert_array_equal(np.asarray(shared.bank), np.asarray(direct.bank))


def test_device_bank_rejects_missing_and_empty(videos):
    stats = stats_from_arrays(videos)
    broken = [dict(videos[0]), dict(videos[1])]
    del broken[1]["kp2d"]
    with pytest.raises(FileNotFoundError, match="missing modalities"):
        build_bank_device(broken, ["a", "b"], ["a", "b"], stats)
    empty = [dict(videos[0])]
    empty[0]["beta"] = np.zeros((0, 10), np.float32)
    with pytest.raises(ValueError, match="zero-frame"):
        build_bank_device(empty, ["a"], ["a"], stats)


def test_stream_stats_close_to_host_f64(videos):
    """f32 device accumulation vs the reference-exact f64 host path: the
    documented fast-path deviation must stay ~1e-5 relative."""
    host = stats_from_arrays(videos)
    dev, streams = stream_stats(videos)
    assert dev.modalities == host.modalities
    # the returned StreamSet is reusable by build_bank_device (one compute)
    assert set(streams.streams) == set(host.modalities)
    for m in host.modalities:
        for attr in ("mean_raw", "std_raw", "mean_diff", "std_diff"):
            h = getattr(host, attr)[m]
            d = getattr(dev, attr)[m]
            scale = np.maximum(np.abs(h), 1e-3)
            assert np.max(np.abs(h - d) / scale) < 1e-4, (m, attr)


def test_file_backed_device_impl_matches_host(rng, tmp_path):
    """build_feature_bank(impl='device') over a real fixture tree is bitwise
    the host build; the cached variant persists a host copy but returns the
    device-built bank."""
    from video_gen_evals_tpu.data import (
        ModalityPaths,
        build_feature_bank,
        build_feature_bank_cached,
        compute_stats,
        scan_class_tree,
    )
    from video_gen_evals_tpu.data.fixtures import make_fixture_tree

    mesh_root, kp_root = make_fixture_tree(
        str(tmp_path), ["JumpingJack", "PushUps"], videos_per_class=2,
        frames=(40, 25), kp_shorter_by=2, seed=3,
    )
    manifest = scan_class_tree(mesh_root)
    paths = ModalityPaths(keypoint_dir=kp_root, layout="real")
    stats = compute_stats(manifest.items, paths)

    host = build_feature_bank(manifest.items, paths, stats, min_rows=40)
    dev = build_feature_bank(
        manifest.items, paths, stats, min_rows=40, impl="device"
    )
    np.testing.assert_array_equal(np.asarray(dev.bank), host.bank)
    np.testing.assert_array_equal(dev.offsets, host.offsets)
    np.testing.assert_array_equal(dev.row_limit, host.row_limit)

    cache = str(tmp_path / "bank.npz")
    dev_cached = build_feature_bank_cached(
        manifest.items, paths, stats, min_rows=40, cache_path=cache,
        impl="device",
    )
    np.testing.assert_array_equal(np.asarray(dev_cached.bank), host.bank)
    # second call loads the persisted host copy (fingerprint hit)
    from video_gen_evals_tpu.data.features import load_feature_bank

    reloaded = load_feature_bank(cache)
    np.testing.assert_array_equal(reloaded.bank, host.bank)

    with pytest.raises(ValueError, match="unknown bank impl"):
        build_feature_bank(manifest.items, paths, stats, impl="gpu")
