"""Per-modality normalization statistics.

Capability parity with ``ModalityStats`` + ``compute_stats_from_npz``
(C16 in SURVEY.md, ref ``utils.py:570-801``): a single streaming pass over the
TRAIN videos accumulating per-dim sum/sum^2 in float64, for 7 raw and 7 diff
modalities; ``std = sqrt(max(var, 0) + eps)`` with eps *inside* the sqrt
(ref ``utils.py:749``), while window normalization later adds a separate eps
to the std (ref ``utils.py:473``). Delta features are computed in float32
with the same ops used by the feature bank, so stats and features agree.

The stats object is a plain pytree of numpy arrays, serializable to ``.npz``.
"""

from __future__ import annotations

import dataclasses
import os
import typing as T

import numpy as np

from .features import ModalityPaths, load_video_arrays, compute_modality_diffs

# canonical modality order == concatenation order (ref train.py:29-48)
MODALITIES: T.Tuple[str, ...] = ("vit", "global", "pose", "beta", "kp2d", "clip", "dino")


@dataclasses.dataclass
class ModalityStats:
    """mean/std per dim for each available modality, raw and diff streams."""

    mean_raw: T.Dict[str, np.ndarray]
    std_raw: T.Dict[str, np.ndarray]
    mean_diff: T.Dict[str, np.ndarray]
    std_diff: T.Dict[str, np.ndarray]

    @property
    def modalities(self) -> T.List[str]:
        return [m for m in MODALITIES if m in self.mean_raw]

    def dims_map_raw(self) -> T.Dict[str, int]:
        return {m: int(self.mean_raw[m].shape[0]) for m in self.modalities}

    def dims_map_diff(self) -> T.Dict[str, int]:
        return {m: int(self.mean_diff[m].shape[0]) for m in self.modalities}

    def save(self, path: str, fingerprint: T.Optional[str] = None) -> None:
        arrs = {}
        for m in self.modalities:
            arrs[f"mean_raw_{m}"] = self.mean_raw[m]
            arrs[f"std_raw_{m}"] = self.std_raw[m]
            arrs[f"mean_diff_{m}"] = self.mean_diff[m]
            arrs[f"std_diff_{m}"] = self.std_diff[m]
        if fingerprint is not None:
            arrs["fingerprint"] = np.array(fingerprint)
        # atomic publish (crash/concurrent-writer safe, like the bank cache)
        tmp = f"{path}.{os.getpid()}.tmp.npz"
        np.savez(tmp, **arrs)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "ModalityStats":
        npz = np.load(path)
        out = cls({}, {}, {}, {})
        for key in npz.files:
            if key == "fingerprint":
                continue
            kind, m = key.rsplit("_", 1)
            getattr(out, kind)[m] = npz[key]
        return out


class _Acc:
    """float64 sum / sum^2 / count accumulator (ref ``utils.py:589-593``)."""

    def __init__(self):
        self.s: T.Optional[np.ndarray] = None
        self.ss: T.Optional[np.ndarray] = None
        self.n = 0

    def update(self, X: np.ndarray) -> None:
        X64 = X.astype(np.float64)
        if self.s is None:
            self.s = np.zeros(X.shape[1], np.float64)
            self.ss = np.zeros(X.shape[1], np.float64)
        self.s += X64.sum(axis=0)
        self.ss += (X64**2).sum(axis=0)
        self.n += X.shape[0]

    def finalize(self, eps: float) -> T.Tuple[np.ndarray, np.ndarray]:
        n = max(1, self.n)
        mean = self.s / n
        var = self.ss / n - mean**2
        std = np.sqrt(np.maximum(var, 0.0) + eps)
        return mean.astype(np.float32), std.astype(np.float32)


def compute_stats(
    items: T.Sequence,                 # VideoItem sequence
    paths: ModalityPaths,
    eps: float = 1e-6,
) -> ModalityStats:
    """One streaming pass over train videos -> per-dim mean/std.

    Matches the reference's accumulation exactly: raw arrays accumulated as
    stored; diff arrays computed full-video in float32 then accumulated in
    float64. Missing kp/clip/dino side files are skipped silently here
    (stats pass; ref ``utils.py:668-704``).
    """
    assert len(items) > 0, "compute_stats: empty item list"
    accs_raw = {m: _Acc() for m in MODALITIES}
    accs_diff = {m: _Acc() for m in MODALITIES}

    # prefetch mesh npzs through the native thread pool (same files the bank
    # build decodes with 8 threads — the serial per-file decompress was the
    # dominant cold-start host cost of this pass); a None (unopenable) falls
    # back to the single-file loader for its original clear error
    from ..utils.native_npz import load_npz_many

    items = list(items)
    npzs = load_npz_many([it.path for it in items], n_threads=8)
    for it, z in zip(items, npzs):
        arrays = load_video_arrays(it, paths, strict_kp=False, npz=z)
        diffs = compute_modality_diffs(arrays)
        for m, X in arrays.items():
            accs_raw[m].update(X)
        for m, X in diffs.items():
            accs_diff[m].update(X)

    stats = ModalityStats({}, {}, {}, {})
    for m in MODALITIES:
        if accs_raw[m].n > 0:
            stats.mean_raw[m], stats.std_raw[m] = accs_raw[m].finalize(eps)
            stats.mean_diff[m], stats.std_diff[m] = accs_diff[m].finalize(eps)
    return stats


def load_stats_fingerprint(path: str) -> T.Optional[str]:
    try:
        with np.load(path, allow_pickle=False) as f:
            if "fingerprint" in f.files:
                return str(f["fingerprint"])
    except Exception:
        pass
    return None


def compute_stats_cached(
    items: T.Sequence,
    paths: ModalityPaths,
    eps: float = 1e-6,
    cache_path: T.Optional[str] = None,
) -> ModalityStats:
    """``compute_stats`` with an on-disk cache.

    The streaming stats pass decompresses every train npz + side file; on a
    warm start that is the dominant host cost left once the bank cache hits
    (the bank cache itself needs ``stats`` before it can validate, so stats
    must be cached separately). Keyed by ``source_fingerprint`` — any
    touched/added/removed source file or path-config change rebuilds.
    """
    if cache_path is None:
        return compute_stats(items, paths, eps=eps)
    from .features import source_fingerprint

    fp = source_fingerprint(items, paths, tag=f"stats-v1|eps={eps!r}")
    if os.path.exists(cache_path):
        try:
            # fingerprint and payload come from separate opens — bracket with
            # stat() so a concurrent different-config writer's os.replace
            # between them (inode change) falls through to a rebuild
            st_before = os.stat(cache_path)
            if load_stats_fingerprint(cache_path) == fp:
                out = ModalityStats.load(cache_path)
                st_after = os.stat(cache_path)
                if (
                    st_before.st_ino == st_after.st_ino
                    and st_before.st_mtime_ns == st_after.st_mtime_ns
                    and st_before.st_size == st_after.st_size
                ):
                    return out
        except Exception:
            pass  # unreadable cache: rebuild below
    stats = compute_stats(items, paths, eps=eps)
    os.makedirs(os.path.dirname(os.path.abspath(cache_path)), exist_ok=True)
    stats.save(cache_path, fingerprint=fp)
    return stats
