"""Per-video feature banks and device-side window gather.

This replaces the reference's per-window npz re-reading pipeline
(``WindowDataset._try_one``, ref ``utils.py:345-523``) with a TPU-first design:

1. **Precompute once per video** (host/accelerator, float32): raw features and
   temporal-diff features for every modality, normalized with train stats.
2. **Store as a bank**: one ``[L_bank + 1, D]`` matrix per video (sentinel row
   at the bottom), concatenated across videos into a single ``[N, D]`` array.
3. **Window assembly = one gather**: a window of ``clip_len`` frames starting
   at ``s`` is ``bank[offset + min(s + i, L_bank)]`` with the diff block of
   window row 0 overwritten by the normalized-zero vector.

This is *exactly* equivalent to the reference's per-window computation
(slice-or-pad -> deltas -> z-score -> concat, ref ``utils.py:366-514``):

- within a window, deltas at rows ``i >= 1`` equal the full-video deltas at
  ``s + i`` (all delta ops are consecutive-frame-local);
- window row 0 always pairs with itself -> delta 0 -> normalized zero;
- tail padding repeats the last frame -> deltas 0 in the pad region, which the
  bank encodes by storing normalized-zero diff rows at ``t >= L_m`` (per
  modality — keypoint arrays can be shorter than mesh arrays, the reference's
  frame-misalignment quirk, ref ``process_video.py:86-91`` / SURVEY C28);
- raw rows in the pad region repeat the last real row (edge padding).

The gather runs on device over the whole window batch — windowing,
normalization and corruption never touch the host after bank construction.
"""

from __future__ import annotations

import dataclasses
import os
import typing as T

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.deltas import vit_delta, betas_delta
from ..ops.so3 import rotmat_delta
from ..ops.procrustes import procrustes_kp_delta

if T.TYPE_CHECKING:  # avoid import cycle with stats.py
    from .stats import ModalityStats

# canonical modality order == concatenation order: stats.MODALITIES (single
# source of truth; ref train.py:29-48)

_NORM_EPS = 1e-6  # eps added to std at normalization time (ref utils.py:473)

# (modality, ModalityPaths attr, per-video file name) — the SINGLE source of
# side-file naming for both the loader (load_video_arrays) and the cache
# fingerprint (bank_fingerprint): they must stat the same files, or a stale
# cached bank could fingerprint-match files the bank never read
_SIDE_FILES = (
    ("kp2d", "keypoint_dir", "keypoints.npy"),
    ("clip", "clip_dir", "clip_embeddings.npz"),
    ("dino", "dino_dir", "dino_embeddings.npz"),
)


@dataclasses.dataclass(frozen=True)
class ModalityPaths:
    """Side-file locations for optional modalities.

    ``layout``:
      - ``"real"``      -> ``<dir>/<class>/<vid_stem>/<file>``
      - ``"generated"`` -> ``<dir>/<vid_stem>/<file>``
      - ``"auto"``      -> reference bug-compat: generated layout iff the
        *keypoint* dir name contains ``SAVE_GEN`` / ``SAVE_NEW`` /
        ``generated_kps`` (ref ``utils.py:411-414,429-432,443-446`` keys all
        three side-modalities off the keypoint dir name).
    """

    keypoint_dir: T.Optional[str] = None
    clip_dir: T.Optional[str] = None
    dino_dir: T.Optional[str] = None
    layout: str = "auto"

    def _is_generated(self) -> bool:
        if self.layout == "generated":
            return True
        if self.layout == "real":
            return False
        kd = str(self.keypoint_dir)
        return any(tok in kd for tok in ("SAVE_GEN", "SAVE_NEW", "generated_kps"))

    def resolve(self, base_dir: str, cls: str, vid_stem: str, fname: str) -> str:
        if self._is_generated():
            return os.path.join(base_dir, vid_stem, fname)
        return os.path.join(base_dir, cls, vid_stem, fname)


def load_video_arrays(
    item,
    paths: ModalityPaths,
    strict_kp: bool = True,
    npz: T.Optional[T.Dict[str, np.ndarray]] = None,
) -> T.Dict[str, np.ndarray]:
    """Load raw per-modality arrays for one video (float32, flattened):

    ``vit [T,Dv]``, ``global [T,9]``, ``pose [T,9J]``, ``beta [T,10]``, and
    optionally ``kp2d [T',120]``, ``clip [T'',512]``, ``dino [T'',768]``.

    Missing keypoints with ``strict_kp`` raise (ref ``utils.py:416-417``);
    clip/dino are skipped silently (ref ``utils.py:427-452``).

    Mesh npz files are read through the native C++ reader when built
    (``native/libvge_native.so``: mmap + direct-inflate + thread pool),
    falling back to ``np.load`` transparently.
    """
    if npz is None:
        from ..utils.native_npz import load_npz

        npz = load_npz(item.path)
    Tlen = npz["pose"].shape[0]
    out: T.Dict[str, np.ndarray] = {
        "vit": npz["vit"].astype(np.float32),
        "global": npz["global_orient"].astype(np.float32).reshape(Tlen, -1),
        "pose": npz["pose"].astype(np.float32).reshape(Tlen, -1),
        "beta": npz["betas"].astype(np.float32),
    }
    vid_stem = os.path.splitext(os.path.basename(item.path))[0]

    kp_fname = next(f for m, _, f in _SIDE_FILES if m == "kp2d")
    if paths.keypoint_dir is not None:
        kp_path = paths.resolve(paths.keypoint_dir, item.cls, vid_stem, kp_fname)
        if not os.path.exists(kp_path):
            if strict_kp:
                raise FileNotFoundError(
                    f"Expected keypoints at '{kp_path}' for video '{vid_stem}' "
                    "but file does not exist."
                )
        else:
            kp = np.load(kp_path).astype(np.float32)
            if kp.ndim == 2 and kp.shape[0] > 0:
                out["kp2d"] = kp
            elif strict_kp:
                raise ValueError(
                    f"Keypoint file '{kp_path}' is empty or malformed: {kp.shape}"
                )

    for m, attr, fname in _SIDE_FILES:
        if m == "kp2d":
            continue  # handled above (strict semantics differ)
        base = getattr(paths, attr)
        if base is None:
            continue
        p = paths.resolve(base, item.cls, vid_stem, fname)
        try:
            if os.path.exists(p):
                out[m] = np.load(p)["embeddings"].astype(np.float32)
        except Exception:
            pass
    return out


def compute_modality_diffs(
    arrays: T.Dict[str, np.ndarray]
) -> T.Dict[str, np.ndarray]:
    """Full-video diff features per modality (float32, same ops as windows).

    Host-facing micro-math: runs on the local CPU backend (``host_math``) —
    per modality this is a [T, D]-sized eager program on host numpy data, and
    on a tunneled TPU the two blocking round-trips per modality (upload +
    fetch) would dwarf the microseconds of arithmetic.
    """
    from ..utils.hostmath import host_math

    diffs: T.Dict[str, np.ndarray] = {}
    with host_math():
        for m, X in arrays.items():
            Tlen = X.shape[0]
            if m in ("vit", "clip", "dino"):
                d = vit_delta(jnp.asarray(X))
            elif m in ("global", "pose"):
                R = X.reshape(Tlen, -1, 3, 3)
                d = rotmat_delta(jnp.asarray(R)).reshape(Tlen, -1)
            elif m == "beta":
                d = betas_delta(jnp.asarray(X))
            elif m == "kp2d":
                d = procrustes_kp_delta(jnp.asarray(X))
            else:
                raise KeyError(m)
            diffs[m] = np.asarray(d, dtype=np.float32)
    return diffs


@dataclasses.dataclass
class VideoFeatures:
    """Normalized per-video feature bank ``[N_v, D]``.

    ``N_v = round_up(max(height + 1, min_rows), 8)``: rows beyond the video's
    last real frame are filled with its *sentinel* row (edge-replicated raw
    features, normalized-zero diffs), which bakes the reference's tail-padding
    semantics into the data. Any window whose rows land past the end of the
    video therefore reads correct values with a plain contiguous slice — and
    the 8-row alignment means every default-stride window starts on a sublane
    tile boundary, so the Pallas gather kernel can DMA it directly.
    """

    bank: np.ndarray       # [N_v, D] float32, normalized, sentinel-padded
    height: int            # number of real frames (sentinel rows start here)
    cls: str
    name: str


def _normalize(X: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    return (X - mean[None, :]) / (std[None, :] + _NORM_EPS)


_ROW_ALIGN = 8  # f32 sublane tile: keeps per-video offsets DMA-aligned


def compute_video_features(
    item,
    paths: ModalityPaths,
    stats: "ModalityStats",
    modalities: T.Optional[T.Sequence[str]] = None,
    min_rows: int = 40,
    npz: T.Optional[T.Dict[str, np.ndarray]] = None,
) -> VideoFeatures:
    """Build the normalized bank for one video.

    ``modalities`` defaults to the stats' available modalities; every listed
    modality must be loadable for this video (a clear error replaces the
    reference's shape-mismatch crash at collate time). ``min_rows`` must be
    >= the largest clip_len that will be gathered (short videos are padded to
    at least one full window of sentinel rows).
    """
    arrays = load_video_arrays(item, paths, strict_kp=True, npz=npz)
    mods = list(modalities) if modalities is not None else stats.modalities
    bank, height = assemble_video_bank(
        arrays, mods, stats, min_rows, item.name
    )
    return VideoFeatures(bank=bank, height=height, cls=item.cls, name=item.name)


def assemble_video_bank(
    arrays: T.Dict[str, np.ndarray],
    mods: T.Sequence[str],
    stats: "ModalityStats",
    min_rows: int,
    name: str,
    diffs: T.Optional[T.Dict[str, np.ndarray]] = None,
) -> T.Tuple[np.ndarray, int]:
    """Normalize + sentinel-pad one video's modality arrays into a bank row
    block ``[n_rows, D]``. Shared by :func:`build_feature_bank` and the
    in-memory extraction pipeline (``pipelines/full.py``) so the validation
    guards and layout stay in sync. Returns ``(bank_2d, height)``."""
    missing = [m for m in mods if m not in arrays]
    if missing:
        raise FileNotFoundError(
            f"video '{name}': missing modalities {missing} "
            f"(available: {sorted(arrays)})"
        )
    empty = [m for m in mods if arrays[m].shape[0] == 0]
    if empty:
        # a 0-row modality would yield a 0-row bank (row_limit -1) whose
        # windows silently read the PREVIOUS video's rows — fail at load
        raise ValueError(
            f"video '{name}': modalities {empty} have zero frames "
            "(truncated/failed extraction?)"
        )
    # validate first, diff only the requested subset (the delta pass is the
    # expensive part — no point running it for excluded modalities or for
    # videos that fail validation)
    arrays = {m: arrays[m] for m in mods}
    if diffs is None:
        diffs = compute_modality_diffs(arrays)

    height = max(arrays[m].shape[0] for m in mods)
    n_rows = max(height + 1, min_rows)
    n_rows = (n_rows + _ROW_ALIGN - 1) // _ROW_ALIGN * _ROW_ALIGN
    raw_blocks: T.List[np.ndarray] = []
    diff_blocks: T.List[np.ndarray] = []
    for m in mods:
        raw = _normalize(arrays[m], stats.mean_raw[m], stats.std_raw[m])
        diff = _normalize(diffs[m], stats.mean_diff[m], stats.std_diff[m])
        z0 = _normalize(
            np.zeros((1, diff.shape[1]), np.float32),
            stats.mean_diff[m],
            stats.std_diff[m],
        )
        L_m = raw.shape[0]
        pad = n_rows - L_m
        # raw: edge-pad with the last real row (sentinel region included)
        raw_full = np.concatenate([raw, np.repeat(raw[-1:], pad, axis=0)], axis=0)
        # diff: rows >= L_m are normalized-zero (self-paired pad frames)
        diff_full = np.concatenate([diff, np.repeat(z0, pad, axis=0)], axis=0)
        raw_blocks.append(raw_full)
        diff_blocks.append(diff_full)

    bank = np.concatenate(raw_blocks + diff_blocks, axis=1).astype(np.float32)
    return bank, height


@dataclasses.dataclass
class FeatureBank:
    """Concatenated per-video banks plus gather metadata.

    ``bank``      : [N, D] float32 (normalized, sentinel-padded per video)
    ``offsets``   : [V] row offset of each video's bank (8-aligned)
    ``row_limit`` : [V] last row index of each video's bank — clamping a
                    window row to it yields the sentinel (= reference
                    tail-padding) value for any out-of-range start
    ``z0_diff``   : [D_diff] normalized-zero diff vector (row-0 override)
    """

    bank: np.ndarray
    offsets: np.ndarray
    row_limit: np.ndarray
    z0_diff: np.ndarray
    one_pass_raw: int
    classes: T.List[str]
    names: T.List[str]

    @property
    def feature_dim(self) -> int:
        return int(self.bank.shape[1])

    @property
    def num_videos(self) -> int:
        return len(self.offsets)

    def validate_clip_len(self, clip_len: int) -> None:
        """``gather_windows_sliced`` reads contiguous ``[clip_len, D]``
        slices, so every video's bank must hold >= clip_len rows — a shorter
        bank (built with ``min_rows < clip_len``) would silently hand the
        window's tail to the NEXT video's rows. Build-time ``min_rows >=
        clip_len`` is a convention; this enforces it wherever a clip_len
        meets a bank (cheap: one min over ``row_limit``)."""
        if len(self.offsets) == 0:
            return
        shortest = int(np.min(self.row_limit)) + 1
        if shortest < clip_len:
            raise ValueError(
                f"feature bank has a video with only {shortest} rows < "
                f"clip_len={clip_len} — rebuild with min_rows >= {clip_len} "
                "(windows would silently read the next video's rows)"
            )


def build_feature_bank(
    items: T.Sequence,
    paths: ModalityPaths,
    stats: "ModalityStats",
    modalities: T.Optional[T.Sequence[str]] = None,
    min_rows: int = 40,
    impl: str = "host",
) -> FeatureBank:
    """Build the normalized window bank for ``items``.

    ``impl``: "host" (numpy per-video assembly) or "device" — the raw
    modality arrays are uploaded once and the whole delta/normalize/pad/
    concat assembly runs on device (``data/device_bank.py``; bitwise-equal
    on the CPU backend, tested), leaving the finished bank device-resident
    for the scoring sweep with no second transfer.
    """
    if impl not in ("host", "device"):
        raise ValueError(f"unknown bank impl {impl!r}")
    mods = list(modalities) if modalities is not None else stats.modalities
    # mesh npz files decode through the native C++ thread pool (mmap +
    # parallel inflate); Nones (unopenable files) surface as clear errors
    from ..utils.native_npz import load_npz_many

    items = list(items)
    npzs = load_npz_many([it.path for it in items], n_threads=8)
    for it, z in zip(items, npzs):
        if z is None:
            raise IOError(f"could not open mesh npz '{it.path}'")
    if impl == "device":
        from .device_bank import build_bank_device

        arrays_list = [
            load_video_arrays(it, paths, strict_kp=True, npz=z)
            for it, z in zip(items, npzs)
        ]
        if modalities is not None:
            from .stats import ModalityStats as _MS

            stats = _MS(
                {m: stats.mean_raw[m] for m in mods},
                {m: stats.std_raw[m] for m in mods},
                {m: stats.mean_diff[m] for m in mods},
                {m: stats.std_diff[m] for m in mods},
            )
        return build_bank_device(
            arrays_list,
            [it.name for it in items],
            [it.cls for it in items],
            stats,
            min_rows=min_rows,
        )
    feats = [
        compute_video_features(it, paths, stats, mods, min_rows=min_rows, npz=z)
        for it, z in zip(items, npzs)
    ]
    return finalize_feature_bank(
        [f.bank for f in feats], [f.name for f in feats],
        [f.cls for f in feats], stats, mods,
    )


def finalize_feature_bank(
    banks: T.Sequence[np.ndarray],
    names: T.Sequence[str],
    classes: T.Sequence[str],
    stats: "ModalityStats",
    mods: T.Sequence[str],
) -> FeatureBank:
    """Concatenate per-video bank blocks into a :class:`FeatureBank` with
    gather metadata (offsets, per-video last-row limits, z0 override).
    Shared by :func:`build_feature_bank` and ``pipelines/full.py``."""
    offsets = np.zeros(len(banks), np.int32)
    row_limit = np.zeros(len(banks), np.int32)
    row = 0
    for i, b in enumerate(banks):
        offsets[i] = row
        row_limit[i] = b.shape[0] - 1
        row += b.shape[0]
    z0_parts = [
        _normalize(
            np.zeros((1, stats.mean_diff[m].shape[0]), np.float32),
            stats.mean_diff[m],
            stats.std_diff[m],
        )[0]
        for m in mods
    ]
    return FeatureBank(
        bank=np.concatenate(list(banks), axis=0),
        offsets=offsets,
        row_limit=row_limit,
        z0_diff=np.concatenate(z0_parts).astype(np.float32),
        one_pass_raw=sum(int(stats.mean_raw[m].shape[0]) for m in mods),
        classes=list(classes),
        names=list(names),
    )


def gather_windows(
    bank: jnp.ndarray,       # [N, D]
    offsets: jnp.ndarray,    # [V] int32
    row_limit: jnp.ndarray,  # [V] int32 (last row of each video's bank)
    z0_diff: jnp.ndarray,    # [D_diff]
    one_pass_raw: int,
    video_idx: jnp.ndarray,  # [B] int32
    starts: jnp.ndarray,     # [B] int32
    clip_len: int,
) -> jnp.ndarray:
    """Assemble ``[B, clip_len, D]`` windows on device with one gather.

    Rows past the video's end clamp to its last bank row, which holds the
    sentinel (tail-padding) value by construction, so the result is exact for
    ANY start. Jit-friendly: static ``clip_len``/``one_pass_raw``.
    """
    i = jnp.arange(clip_len, dtype=starts.dtype)[None, :]
    # out-of-range starts follow slice_or_pad exactly (windows.py): a
    # negative start yields the video's frame 0 for the WHOLE window (never
    # the previous video's rows); starts past the end clamp into the
    # sentinel region
    row = jnp.clip(starts[:, None] + i, 0, row_limit[video_idx][:, None])
    row = jnp.where(starts[:, None] < 0, 0, row)
    rows = jnp.take(bank, offsets[video_idx][:, None] + row, axis=0)  # [B,T,D]
    # window row 0 always self-pairs -> diff block := normalized zero
    return rows.at[:, 0, one_pass_raw:].set(
        z0_diff[None, :].astype(rows.dtype)
    )


def gather_windows_sliced(
    bank: jnp.ndarray,       # [N, D]
    offsets: jnp.ndarray,    # [V] int32
    row_limit: jnp.ndarray,  # [V] int32
    z0_diff: jnp.ndarray,    # [D_diff]
    one_pass_raw: int,
    video_idx: jnp.ndarray,  # [B] int32
    starts: jnp.ndarray,     # [B] int32
    clip_len: int,
) -> jnp.ndarray:
    """Fast-path window assembly: ONE ``lax.gather`` of contiguous
    ``[clip_len, D]`` slices (1.7x the per-row ``jnp.take`` on v5e).

    Identical to :func:`gather_windows` for every start produced by
    ``enumerate_windows`` (the sentinel-padded bank guarantees
    ``start <= rows_v - clip_len``). For pathological starts beyond a video's
    padded end the window is shifted back instead of edge-repeated — use
    :func:`gather_windows` when arbitrary starts must match the reference
    slice-or-pad rule exactly.
    """
    rows_v = row_limit[video_idx] + 1
    # clip both ends: negative starts must not slide into the previous
    # video's rows (the shifted-back divergence documented above applies)
    base = offsets[video_idx] + jnp.clip(
        starts, 0, jnp.maximum(rows_v - clip_len, 0)
    )
    rows = jax.lax.gather(
        bank,
        base[:, None].astype(jnp.int32),
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
        ),
        slice_sizes=(clip_len, bank.shape[1]),
        mode=jax.lax.GatherScatterMode.CLIP,
    )
    return rows.at[:, 0, one_pass_raw:].set(z0_diff[None, :].astype(rows.dtype))


def bank_fingerprint(
    items: T.Sequence,
    paths: ModalityPaths,
    stats: "ModalityStats",
    modalities: T.Optional[T.Sequence[str]] = None,
    min_rows: int = 40,
) -> str:
    """Hash of everything a cached bank's contents depend on.

    Covers the normalization stats (mean/std, raw+diff, per modality), the
    modality subset and order, ``min_rows`` (clip_len changes), the side-file
    configuration, and each source file's identity (path, size, mtime) for the
    mesh npz and any existing keypoint/clip/dino side files. A cache built
    under any different configuration therefore misses and is rebuilt — name
    equality alone silently reused stale normalizations (advisor finding,
    round 2)."""
    import hashlib

    mods = list(modalities) if modalities is not None else stats.modalities
    h = hashlib.sha256()

    def add(s: str) -> None:
        h.update(s.encode())
        h.update(b"\x00")

    add("v2")  # v2: per-item class labels joined the hash
    add(",".join(mods))
    add(str(int(min_rows)))
    add(f"{paths.keypoint_dir}|{paths.clip_dir}|{paths.dino_dir}|{paths.layout}")
    for m in mods:
        for arr in (
            stats.mean_raw[m], stats.std_raw[m], stats.mean_diff[m], stats.std_diff[m]
        ):
            h.update(np.ascontiguousarray(arr, dtype=np.float64).tobytes())

    def add_file(p: str) -> None:
        try:
            st = os.stat(p)
            add(f"{p}|{st.st_size}|{st.st_mtime_ns}")
        except OSError:
            add(f"{p}|missing")

    _add_source_files(add, add_file, items, paths)
    return h.hexdigest()


def _add_source_files(add, add_file, items, paths: ModalityPaths) -> None:
    """Feed every source-file identity a bank/stats computation reads into a
    fingerprint: per-item name+class (class relabels must invalidate — AC
    centroids ride ``bank.classes`` even when file contents are unchanged),
    the mesh npz, and each configured side file from ``_SIDE_FILES``."""
    for it in items:
        add(f"{it.name}|{it.cls}")
        add_file(it.path)
        vid_stem = os.path.splitext(os.path.basename(it.path))[0]
        for _m, attr, fname in _SIDE_FILES:
            base = getattr(paths, attr)
            if base is not None:
                add_file(paths.resolve(base, it.cls, vid_stem, fname))


def source_fingerprint(items, paths: ModalityPaths, tag: str) -> str:
    """Hash of the source files + path configuration alone (no stats) —
    used to key caches of quantities DERIVED from the files, e.g. the
    streaming stats pass (``data/stats.py::compute_stats_cached``)."""
    import hashlib

    h = hashlib.sha256()

    def add(sv: str) -> None:
        h.update(sv.encode())
        h.update(b"\x00")

    def add_file(fp: str) -> None:
        try:
            st = os.stat(fp)
            add(f"{fp}|{st.st_size}|{st.st_mtime_ns}")
        except OSError:
            add(f"{fp}|missing")

    add(tag)
    add(f"{paths.keypoint_dir}|{paths.clip_dir}|{paths.dino_dir}|{paths.layout}")
    _add_source_files(add, add_file, items, paths)
    return h.hexdigest()


def save_feature_bank(
    bank: FeatureBank, path: str, fingerprint: T.Optional[str] = None
) -> None:
    """Cache a built bank to disk (one compressed npz) — the rebuild's
    equivalent of the reference's ``window_features.pt`` cache, but at the
    reusable bank level (windows derive from it for any stride)."""
    extra = {}
    if fingerprint is not None:
        extra["fingerprint"] = np.array(fingerprint)
    # atomic publish: write to a per-process temp name, then rename. A crash
    # mid-write (or several hosts of a multi-process run racing on a shared
    # cache dir) must never leave a torn npz at the published path — each
    # writer publishes a COMPLETE file and the last rename wins (identical
    # contents, same fingerprint).
    tmp = f"{path}.{os.getpid()}.tmp.npz"
    np.savez_compressed(
        tmp,
        bank=bank.bank,
        offsets=bank.offsets,
        row_limit=bank.row_limit,
        z0_diff=bank.z0_diff,
        one_pass_raw=np.int64(bank.one_pass_raw),
        classes=np.array(bank.classes),
        names=np.array(bank.names),
        **extra,
    )
    os.replace(tmp, path)


def load_feature_bank(path: str) -> FeatureBank:
    from ..utils.native_npz import load_npz

    z = load_npz(path)
    if "classes" not in z or "names" not in z:  # native reader skips strings
        with np.load(path, allow_pickle=False) as f:
            z["classes"] = f["classes"]
            z["names"] = f["names"]
    return FeatureBank(
        bank=z["bank"],
        offsets=z["offsets"],
        row_limit=z["row_limit"],
        z0_diff=z["z0_diff"],
        one_pass_raw=int(z["one_pass_raw"]),
        classes=[str(c) for c in z["classes"]],
        names=[str(n) for n in z["names"]],
    )


def load_bank_fingerprint(path: str) -> T.Optional[str]:
    """Read just the ``fingerprint`` string from a cached bank npz (cheap:
    the member is a few dozen bytes). ``None`` for pre-fingerprint caches."""
    try:
        with np.load(path, allow_pickle=False) as f:
            if "fingerprint" in f.files:
                return str(f["fingerprint"])
    except Exception:
        pass
    return None


def build_feature_bank_cached(
    items: T.Sequence,
    paths: ModalityPaths,
    stats: "ModalityStats",
    modalities: T.Optional[T.Sequence[str]] = None,
    min_rows: int = 40,
    cache_path: T.Optional[str] = None,
    impl: str = "host",
) -> FeatureBank:
    """``build_feature_bank`` with an on-disk cache.

    When ``cache_path`` exists, its stored fingerprint matches the current
    configuration (stats, modalities, min_rows, side-file config, source-file
    sizes/mtimes — :func:`bank_fingerprint`), and its video names match
    ``items`` (same order), the bank loads through the native npz reader and
    the whole normalize/delta pass is skipped — the serve-path analogue of the
    reference's ``window_features.pt`` reuse (ref ``eval.py:202-205``), but
    stride/clip-agnostic. A stale, mismatched, or pre-fingerprint cache is
    rebuilt and overwritten.
    """
    names = [getattr(it, "name") for it in items]
    fp = bank_fingerprint(items, paths, stats, modalities, min_rows=min_rows)
    if cache_path and os.path.exists(cache_path):
        try:
            # the fingerprint and the payload come from separate opens, so a
            # concurrent DIFFERENT-config writer's os.replace between them
            # could hand us a bank the fingerprint never validated; bracket
            # the reads with stat() and require an unchanged inode (replace
            # always changes it) before trusting the pair
            st_before = os.stat(cache_path)
            if load_bank_fingerprint(cache_path) == fp:
                bank = load_feature_bank(cache_path)
                st_after = os.stat(cache_path)
                unchanged = (
                    st_before.st_ino == st_after.st_ino
                    and st_before.st_mtime_ns == st_after.st_mtime_ns
                    and st_before.st_size == st_after.st_size
                )
                if unchanged and bank.names == names and bank.classes == [
                    it.cls for it in items
                ]:
                    return bank
        except Exception:
            pass  # unreadable/stale cache: rebuild below
    bank = build_feature_bank(
        items, paths, stats, modalities, min_rows=min_rows, impl=impl
    )
    if cache_path:
        os.makedirs(os.path.dirname(os.path.abspath(cache_path)), exist_ok=True)
        # device-built banks pay ONE fetch for the persistence copy (the
        # only transfer the device path makes); the RETURNED bank stays
        # device-resident for the scoring sweep
        to_save = (
            dataclasses.replace(bank, bank=np.asarray(bank.bank))
            if impl == "device"
            else bank
        )
        save_feature_bank(to_save, cache_path, fingerprint=fp)
    return bank
