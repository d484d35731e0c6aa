"""Window enumeration and host-side slice-or-pad.

Capability parity with C15/C18 in SURVEY.md:
- :func:`enumerate_windows` <- ``sample_all_windows_npz`` (ref
  ``utils.py:888-911``) / ``make_test_loader`` enumeration (ref
  ``utils.py:824-837``): stride windows for videos >= clip_len, one padded
  window at start 0 for shorter videos. Videos with length <= 0 are skipped
  with the same guard as ``make_test_loader`` (the reference's other
  enumerator would crash downstream on such videos).
- :func:`slice_or_pad` <- ref ``utils.py:366-381``: exact edge rules
  (out-of-range start repeats the nearest edge frame; short tail repeats the
  last frame).
"""

from __future__ import annotations

import typing as T

import numpy as np


def window_starts(length: int, clip_len: int, stride: int) -> T.List[int]:
    if length <= 0:
        return []
    if length < clip_len:
        return [0]
    return list(range(0, length - clip_len + 1, max(1, stride)))


def enumerate_windows(
    manifest, clip_len: int = 32, stride: int = 8
) -> T.List[T.Tuple[int, int]]:
    """All (video_index, start) pairs over ``manifest.items``."""
    out: T.List[T.Tuple[int, int]] = []
    for vi, it in enumerate(manifest.items):
        for s in window_starts(it.length, clip_len, stride):
            out.append((vi, s))
    return out


def slice_or_pad(arr: np.ndarray, start: int, clip_len: int) -> np.ndarray:
    """Window ``[start, start+clip_len)`` of ``arr`` with the reference's
    edge rules (ref ``utils.py:366-381``): a negative start repeats frame 0
    for the WHOLE window (not a clamped ramp), any other out-of-range or
    short-tail row repeats the last frame. One fancy-index gather covers
    every case."""
    if start < 0:
        rows = np.zeros(clip_len, dtype=np.intp)
    else:
        rows = np.minimum(np.arange(start, start + clip_len), arr.shape[0] - 1)
    return arr[rows]


def group_windows_by_video(
    manifest, clip_len: int = 32, stride: int = 8
) -> T.List[T.Tuple[int, T.List[int]]]:
    """Per-video window grouping — the ``SequenceDataset`` capability
    (ref ``utils.py:527-565``, unused by reference entry points but part of
    the API surface): for each video, the list of its window starts, so a
    caller can assemble ``[N_win, clip_len, D]`` stacks per video."""
    out: T.List[T.Tuple[int, T.List[int]]] = []
    for vi, it in enumerate(manifest.items):
        starts = window_starts(it.length, clip_len, stride)
        if starts:
            out.append((vi, starts))
    return out
