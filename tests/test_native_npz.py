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


def test_truncated_archive_errors_not_crashes(native_lib, rng, tmp_path):
    """A torn/truncated npz (crashed writer, partial copy) must surface as a
    Python-level error — the manifest layer's corrupt-skip contract (ref
    utils.py:292-294) relies on exceptions, never an OOB read/segfault."""
    good = str(tmp_path / "good.npz")
    np.savez_compressed(good, **_sample_arrays(rng))
    raw = open(good, "rb").read()
    for frac in (0.1, 0.5, 0.9):
        p = str(tmp_path / f"trunc{frac}.npz")
        with open(p, "wb") as f:
            f.write(raw[: int(len(raw) * frac)])
        try:
            out = native_lib.load_npz(p)
        except IOError:
            continue  # open or read failed cleanly
        # open may succeed with members skipped; whatever loaded must be valid
        assert isinstance(out, dict)


def test_corrupt_deflate_stream_raises(native_lib, rng, tmp_path):
    """Zeroing bytes inside a deflated member must fail the read cleanly."""
    p = str(tmp_path / "corrupt.npz")
    np.savez_compressed(p, x=rng.normal(size=(64, 64)).astype(np.float32))
    raw = bytearray(open(p, "rb").read())
    # smash the middle of the member payload (well past the local header)
    mid = len(raw) // 2
    raw[mid : mid + 64] = b"\0" * 64
    with open(p, "wb") as f:
        f.write(bytes(raw))
    with pytest.raises(IOError):
        native_lib.load_npz(p)


def test_garbage_cd_offset_no_oob(native_lib, rng, tmp_path):
    """An EOCD whose central-directory offset points past EOF must yield an
    empty/failed open, not an out-of-bounds read of the mmap."""
    import struct

    p = str(tmp_path / "badcd.npz")
    np.savez(p, x=rng.normal(size=(4, 4)).astype(np.float32))
    raw = bytearray(open(p, "rb").read())
    eocd = raw.rfind(b"PK\x05\x06")
    assert eocd >= 0
    # cd_offset field sits at EOCD+16
    raw[eocd + 16 : eocd + 20] = struct.pack("<I", len(raw) + 4096)
    with open(p, "wb") as f:
        f.write(bytes(raw))
    try:
        out = native_lib.load_npz(p)
        assert out == {}  # no members parsed; no crash
    except IOError:
        pass


def _npy_bytes(arr):
    import io

    buf = io.BytesIO()
    np.lib.format.write_array(buf, arr, allow_pickle=False)
    return buf.getvalue()


def test_zip64_offset_only_placeholder(native_lib, tmp_path):
    """Zip64 extra fields store 8-byte values ONLY for the 32-bit fields that
    are 0xFFFFFFFF, in (uncomp, comp, offset) order — so an archive where only
    the local-header offset overflows (>4GB archive of small members) stores
    the offset at position 0 of the extra field. Craft such a CD entry and
    assert the reader resolves it (a fixed-index parse reads position 2 and
    gets garbage)."""
    import struct

    import zlib

    arr = np.arange(24, dtype=np.float32).reshape(4, 6)
    payload = _npy_bytes(arr)
    name = b"x.npy"
    crc = zlib.crc32(payload) & 0xFFFFFFFF

    local = struct.pack(
        "<IHHHHHIIIHH", 0x04034B50, 20, 0, 0, 0, 0, crc,
        len(payload), len(payload), len(name), 0,
    ) + name
    data_start = 0  # local header at archive offset 0
    zip64_extra = struct.pack("<HHQ", 0x0001, 8, data_start)
    cd = struct.pack(
        "<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 45, 0, 0, 0, 0, crc,
        len(payload), len(payload), len(name), len(zip64_extra), 0, 0, 0, 0,
        0xFFFFFFFF,  # local_offset -> zip64 placeholder
    ) + name + zip64_extra
    cd_start = len(local) + len(payload)
    eocd = struct.pack(
        "<IHHHHIIH", 0x06054B50, 0, 0, 1, 1, len(cd), cd_start, 0
    )
    p = str(tmp_path / "z64.npz")
    with open(p, "wb") as f:
        f.write(local + payload + cd + eocd)
    # sanity: numpy itself can read the crafted archive
    with np.load(p) as z:
        np.testing.assert_array_equal(z["x"], arr)
    out = native_lib.load_npz(p)
    np.testing.assert_array_equal(out["x"], arr)


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
