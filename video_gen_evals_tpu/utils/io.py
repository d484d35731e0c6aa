"""npz IO and video decoding helpers (host side).

The extraction npz contract matches ref ``extract_mesh.py:25-44``: one
compressed npz per video with keys ``pose [T,23,3,3]``, ``betas [T,10]``,
``global_orient [T,1,3,3]``, ``vit [T,1024]``, ``frame_idx [T]``, ``meta``
(JSON string). Video decode stays on host CPU (SURVEY §2.2) and degrades
gracefully when OpenCV is unavailable.
"""

from __future__ import annotations

import json
import os
import typing as T

import numpy as np


def save_video_npz(
    out_root: str,
    video_id: str,
    pose: np.ndarray,
    betas: np.ndarray,
    global_orient: np.ndarray,
    vit: np.ndarray,
    frame_idx: np.ndarray,
    meta: T.Optional[dict] = None,
) -> str:
    out_dir = os.path.join(out_root, os.path.dirname(video_id))
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_root, f"{video_id}.npz")
    # atomic publish: a crash (or a concurrent host scanning the shared
    # output tree) must never observe a torn npz at the published path
    tmp = f"{out_path}.{os.getpid()}.tmp.npz"
    np.savez_compressed(
        tmp,
        pose=pose.astype(np.float32),
        betas=betas.astype(np.float32),
        global_orient=global_orient.astype(np.float32),
        vit=vit.astype(np.float32),
        frame_idx=np.asarray(frame_idx, np.int32),
        meta=json.dumps(meta or {}, ensure_ascii=False),
    )
    os.replace(tmp, out_path)
    return out_path


def load_all_frames(video_path: str, bgr2rgb: bool = True) -> np.ndarray:
    """Decode every frame of a video (host CPU). Returns [T, H, W, 3] uint8.

    ``.npy`` paths are pre-decoded [T, H, W, 3] uint8 frame stacks (the
    extraction driver accepts them alongside real videos — useful for tests
    and for decode-offloaded pipelines)."""
    if video_path.lower().endswith(".npy"):
        frames = np.load(video_path)
        if frames.ndim != 4 or frames.shape[-1] != 3:
            raise RuntimeError(
                f"Frame stack {video_path} must be [T, H, W, 3], got {frames.shape}"
            )
        return frames.astype(np.uint8)
    # native libav decoder first (make -C native), OpenCV as fallback
    from .native_video import decode_video, native_available

    if native_available():
        try:
            frames = decode_video(video_path)  # native decoder emits RGB
            if not bgr2rgb:
                frames = frames[..., ::-1]  # honor the documented BGR contract
            return frames
        except IOError:
            pass  # fall through to OpenCV (e.g. exotic container)
    try:
        import cv2  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "OpenCV is not available in this environment; pass pre-decoded "
            "frame arrays to the extraction pipeline instead."
        ) from e
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise RuntimeError(f"Could not open video: {video_path}")
    frames = []
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if bgr2rgb:
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            frames.append(frame)
    finally:
        cap.release()
    if not frames:
        raise RuntimeError(f"No frames decoded from {video_path}")
    return np.stack(frames)


class ResumableLedger:
    """Per-action processed/not/error JSON ledgers with skip-if-processed
    semantics (ref ``extract_mesh.py:121-194``)."""

    def __init__(self, base_dir: str, action: str):
        self.paths = {
            kind: os.path.join(base_dir, kind, f"{action}.json")
            for kind in ("single", "not_single", "errors")
        }
        for p in self.paths.values():
            os.makedirs(os.path.dirname(p), exist_ok=True)
        self.singles: T.List[str] = self._load(self.paths["single"], [])
        self.nots: T.List[str] = self._load(self.paths["not_single"], [])
        self.errors: T.Dict[str, str] = self._load(self.paths["errors"], {})

    @staticmethod
    def _load(path: str, default):
        if os.path.exists(path):
            try:
                with open(path) as f:
                    return json.load(f)
            except Exception:
                pass
        return default

    def processed(self) -> T.Set[str]:
        return set(self.singles) | set(self.nots)

    def record(self, video: str, kind: str, error: T.Optional[str] = None) -> None:
        if kind == "single":
            self.singles.append(video)
            self._save(self.paths["single"], self.singles)
        elif kind == "not_single":
            self.nots.append(video)
            self._save(self.paths["not_single"], self.nots)
        else:
            self.errors[video] = error or "unknown"
            self._save(self.paths["errors"], self.errors)

    @staticmethod
    def _save(path: str, data) -> None:
        # atomic publish: a crash mid-write would tear the JSON and (via the
        # permissive _load fallback) silently discard the whole processed
        # list, re-extracting the entire action on resume
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=4)
        os.replace(tmp, path)
