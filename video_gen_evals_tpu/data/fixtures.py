"""Synthetic dataset fixtures: tiny mesh/keypoint trees with realistic shapes,
used by tests and benchmarks (SURVEY.md §4.3). Shapes follow the extraction
contract (ref ``extract_mesh.py:25-44``, ``process_video.py:73-91``):
``pose [T,23,3,3]``, ``betas [T,10]``, ``global_orient [T,1,3,3]``,
``vit [T,Dv]``, ``keypoints.npy [T',120]``.
"""

from __future__ import annotations

import json
import os
import typing as T

import numpy as np


def _random_rotmats(rng: np.random.Generator, shape: T.Tuple[int, ...]) -> np.ndarray:
    """Random rotation matrices via numpy Rodrigues (smooth-ish sequences)."""
    a = rng.normal(scale=0.3, size=shape + (3,)).cumsum(axis=0)  # smooth in time
    theta = np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
    k = a / theta
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = np.zeros_like(kx)
    K = np.stack(
        [
            np.stack([zero, -kz, ky], -1),
            np.stack([kz, zero, -kx], -1),
            np.stack([-ky, kx, zero], -1),
        ],
        axis=-2,
    )
    eye = np.broadcast_to(np.eye(3), shape + (3, 3))
    s = np.sin(theta)[..., None]
    c = np.cos(theta)[..., None]
    return (eye + s * K + (1 - c) * (K @ K)).astype(np.float32)


def write_mesh_npz(
    path: str, Tlen: int, vit_dim: int = 64, rng: T.Optional[np.random.Generator] = None
) -> None:
    rng = rng or np.random.default_rng(0)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(
        path,
        pose=_random_rotmats(rng, (Tlen, 23)),
        betas=rng.normal(size=(Tlen, 10)).astype(np.float32),
        global_orient=_random_rotmats(rng, (Tlen, 1)),
        vit=rng.normal(size=(Tlen, vit_dim)).astype(np.float32),
        frame_idx=np.arange(Tlen, dtype=np.int32),
        meta=json.dumps({}),
    )


def write_keypoints(path: str, Tlen: int, rng: T.Optional[np.random.Generator] = None) -> None:
    rng = rng or np.random.default_rng(0)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    base = rng.uniform(0.2, 0.8, size=(1, 120)).astype(np.float32)
    drift = np.cumsum(rng.normal(scale=0.01, size=(Tlen, 120)), axis=0).astype(np.float32)
    np.save(path, base + drift)


def write_embeddings_npz(
    path: str, Tlen: int, dim: int, rng: T.Optional[np.random.Generator] = None
) -> None:
    """Side-modality embedding file (CLIP 512 / DINO 768): one compressed npz
    with key ``embeddings [T, dim]`` (ref ``utils.py:434,448``)."""
    rng = rng or np.random.default_rng(0)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    base = rng.normal(size=(1, dim)).astype(np.float32)
    drift = np.cumsum(
        rng.normal(scale=0.05, size=(Tlen, dim)), axis=0
    ).astype(np.float32)
    np.savez_compressed(path, embeddings=base + drift)


def make_fixture_tree(
    root: str,
    classes: T.Sequence[str],
    videos_per_class: int = 3,
    frames: T.Sequence[int] = (40, 37, 25),
    vit_dim: int = 64,
    kp_shorter_by: int = 0,
    seed: int = 0,
) -> T.Tuple[str, str]:
    """Create ``<root>/meshes/<cls>/*.npz`` + ``<root>/kps/<cls>/<stem>/keypoints.npy``.

    ``kp_shorter_by`` drops that many frames from each keypoint file to
    exercise the reference's mesh/kp frame-misalignment quirk (SURVEY C28).
    Returns (mesh_root, kp_root).
    """
    rng = np.random.default_rng(seed)
    mesh_root = os.path.join(root, "meshes")
    kp_root = os.path.join(root, "kps")
    for cls in classes:
        for v in range(videos_per_class):
            Tlen = int(frames[v % len(frames)])
            stem = f"v_{cls}_g{v:02d}"
            write_mesh_npz(
                os.path.join(mesh_root, cls, f"{stem}.npz"), Tlen, vit_dim, rng
            )
            write_keypoints(
                os.path.join(kp_root, cls, stem, "keypoints.npy"),
                max(1, Tlen - kp_shorter_by),
                rng,
            )
    return mesh_root, kp_root
