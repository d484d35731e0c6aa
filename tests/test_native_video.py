"""Native libav video decoder (native/video_decoder.cc + utils/native_video).

The host-side frame feeder replacing the reference's per-frame Python decode
loops (ref ``extract_mesh.py:47-101``, ``modifications/process_video.py:10-21``).
Checks: decode parity with OpenCV on the same file, the threaded multi-file
pool, per-video fault isolation, probe metadata, max_frames capping, and the
``load_all_frames`` integration.
"""

import os

import numpy as np
import pytest

from video_gen_evals_tpu.utils.native_video import (
    decode_video,
    decode_videos,
    native_available,
    probe_video,
)

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native video decoder not built (make -C native)"
)


def _write_video(path: str, frames: np.ndarray, fps: int = 10) -> None:
    h, w = frames.shape[1:3]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert vw.isOpened()
    for f in frames:
        vw.write(f[:, :, ::-1])  # frames are RGB; VideoWriter expects BGR
    vw.release()


def _cv2_decode(path: str) -> np.ndarray:
    cap = cv2.VideoCapture(path)
    out = []
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        out.append(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB))
    cap.release()
    return np.stack(out)


@pytest.fixture(scope="module")
def video_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (48, 64, 3), np.uint8)
    frames = np.stack(
        [cv2.GaussianBlur(np.roll(base, 3 * t, axis=1), (7, 7), 2) for t in range(25)]
    )
    path = str(tmp_path_factory.mktemp("vids") / "clip.mp4")
    _write_video(path, frames)
    return path


def test_decode_matches_opencv_bitwise(video_file):
    nat = decode_video(video_file)
    ref = _cv2_decode(video_file)
    assert nat.shape == ref.shape
    assert nat.dtype == np.uint8
    # same libavcodec under both -> identical decoded pixels
    np.testing.assert_array_equal(nat, ref)


def test_max_frames_cap(video_file):
    nat = decode_video(video_file, max_frames=7)
    assert nat.shape[0] == 7


def test_probe(video_file):
    n, h, w = probe_video(video_file)
    assert (n, h, w) == (25, 48, 64)


def test_threaded_pool_and_fault_isolation(video_file, tmp_path):
    bogus = str(tmp_path / "missing.mp4")
    corrupt = str(tmp_path / "corrupt.mp4")
    with open(corrupt, "wb") as f:
        f.write(b"\x00" * 256)
    results = decode_videos([video_file, bogus, video_file, corrupt], n_threads=3)
    assert results[0] is not None and results[2] is not None
    np.testing.assert_array_equal(results[0], results[2])
    assert results[1] is None and results[3] is None


def test_load_all_frames_uses_native(video_file):
    from video_gen_evals_tpu.utils.io import load_all_frames

    frames = load_all_frames(video_file)
    np.testing.assert_array_equal(frames, decode_video(video_file))
