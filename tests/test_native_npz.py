"""Native C++ npz reader: exact parity with numpy, threaded loads, fallback.

Builds ``native/libvge_native.so`` on demand (g++ is part of the toolchain);
skips gracefully if the build fails.
"""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native_lib():
    lib = os.path.join(REPO, "native", "libvge_native.so")
    if not os.path.exists(lib):
        try:
            subprocess.run(
                ["make", "-C", os.path.join(REPO, "native")],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception as e:
            pytest.skip(f"native build unavailable: {e}")
    if not os.path.exists(lib):
        pytest.skip("native library missing after build")
    from video_gen_evals_tpu.utils import native_npz

    native_npz._LIB_TRIED = False
    native_npz._LIB = None
    if not native_npz.native_available():
        pytest.skip("library failed to load")
    return native_npz


def _sample_arrays(rng):
    return {
        "pose": rng.normal(size=(25, 23, 3, 3)).astype(np.float32),
        "betas": rng.normal(size=(25, 10)).astype(np.float32),
        "global_orient": rng.normal(size=(25, 1, 3, 3)).astype(np.float32),
        "vit": rng.normal(size=(25, 256)).astype(np.float32),
        "frame_idx": np.arange(25, dtype=np.int32),
        "big_i8": rng.integers(-100, 100, size=(7,)).astype(np.int64),
        "flags": rng.integers(0, 2, size=(5, 3)).astype(np.uint8),
    }


def test_compressed_parity(native_lib, rng, tmp_path):
    arrs = _sample_arrays(rng)
    p = str(tmp_path / "c.npz")
    np.savez_compressed(p, **arrs, meta="ignored-string")
    out = native_lib.load_npz(p)
    assert set(arrs) <= set(out)
    for k, v in arrs.items():
        np.testing.assert_array_equal(out[k], v)
        assert out[k].dtype == v.dtype


def test_stored_parity(native_lib, rng, tmp_path):
    arrs = _sample_arrays(rng)
    p = str(tmp_path / "s.npz")
    np.savez(p, **arrs)
    out = native_lib.load_npz(p)
    for k, v in arrs.items():
        np.testing.assert_array_equal(out[k], v)


def test_threaded_many(native_lib, rng, tmp_path):
    paths = []
    golds = []
    for i in range(6):
        arrs = _sample_arrays(rng)
        p = str(tmp_path / f"m{i}.npz")
        np.savez_compressed(p, **arrs)
        paths.append(p)
        golds.append(arrs)
    outs = native_lib.load_npz_many(paths, n_threads=3)
    assert all(o is not None for o in outs)
    for o, g in zip(outs, golds):
        for k, v in g.items():
            np.testing.assert_array_equal(o[k], v)


def test_missing_file_returns_none_slot(native_lib, tmp_path, rng):
    good = str(tmp_path / "ok.npz")
    np.savez_compressed(good, x=rng.normal(size=(3, 3)).astype(np.float32))
    outs = native_lib.load_npz_many([good, str(tmp_path / "nope.npz")], 2)
    assert outs[0] is not None and outs[1] is None


def test_feature_bank_uses_native_path(native_lib, rng, tmp_path):
    """End-to-end: the bank builder reads mesh npz through the native lib."""
    from video_gen_evals_tpu.data import ModalityPaths, build_feature_bank, compute_stats, scan_class_tree
    from video_gen_evals_tpu.data.fixtures import make_fixture_tree

    mesh_root, kp_root = make_fixture_tree(
        str(tmp_path), ["PushUps"], videos_per_class=2, frames=(20, 24)
    )
    manifest = scan_class_tree(mesh_root)
    paths = ModalityPaths(keypoint_dir=kp_root, layout="real")
    stats = compute_stats(manifest.items, paths)
    bank = build_feature_bank(manifest.items, paths, stats)
    assert np.isfinite(bank.bank).all()
