"""Full pipeline: video frames -> mesh/keypoint extraction -> feature bank ->
fusion encoder -> TAG scores (BASELINE config 4).

The reference has no single entry point for this — it is three separate
scripts with a filesystem contract between them (``extract_mesh.py`` ->
``process_video.py`` -> ``eval.py``). Here the same chain runs in-process:
the extractor's outputs feed the feature-bank builder directly (the npz
round-trip is optional), and scoring reduces on device.
"""

from __future__ import annotations

import dataclasses
import typing as T

import numpy as np
import jax.numpy as jnp

from ..data.features import (
    FeatureBank,
    assemble_video_bank,
    compute_modality_diffs,
    finalize_feature_bank,
)
from ..data.manifest import VideoItem, VideoManifest
from ..data.stats import ModalityStats, _Acc, MODALITIES
from ..data.windows import enumerate_windows
from ..metrics.scores import finalize_video_scores
from ..models import HumanActionScorer
from ..pipelines.extract import Extractor
from ..pipelines.score import ScoreConfig, WindowEncoder
from ..utils.names import infer_class_from_name


def arrays_from_extraction(
    mesh: T.Dict[str, np.ndarray], kp: T.Optional[T.Dict[str, np.ndarray]] = None,
    kp_bug_compat: bool = True,
) -> T.Dict[str, np.ndarray]:
    """Extractor outputs -> per-modality raw arrays (the npz contract,
    without touching disk)."""
    Tlen = mesh["pose"].shape[0]
    out = {
        "vit": mesh["vit"].astype(np.float32),
        "global": mesh["global_orient"].astype(np.float32).reshape(Tlen, -1),
        "pose": mesh["pose"].astype(np.float32).reshape(Tlen, -1),
        "beta": mesh["betas"].astype(np.float32),
    }
    if kp is not None:
        rows = kp["kp120"][kp["valid"]] if kp_bug_compat else kp["kp120"]
        if rows.shape[0] > 0:
            out["kp2d"] = rows.astype(np.float32)
    return out


def stats_from_arrays(
    per_video_arrays: T.Sequence[T.Dict[str, np.ndarray]],
    eps: float = 1e-6,
    diffs_list: T.Optional[T.Sequence[T.Dict[str, np.ndarray]]] = None,
) -> ModalityStats:
    """In-memory equivalent of ``compute_stats`` over extracted arrays.

    ``diffs_list``: precomputed ``compute_modality_diffs`` outputs (one dict
    per video) — computing diffs dispatches device ops with a host fetch per
    modality, so callers that also build a bank should compute them once."""
    accs_raw = {m: _Acc() for m in MODALITIES}
    accs_diff = {m: _Acc() for m in MODALITIES}
    for vi, arrays in enumerate(per_video_arrays):
        diffs = (
            diffs_list[vi] if diffs_list is not None
            else compute_modality_diffs(arrays)
        )
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


def bank_from_arrays(
    per_video_arrays: T.Sequence[T.Dict[str, np.ndarray]],
    names: T.Sequence[str],
    classes: T.Sequence[str],
    stats: ModalityStats,
    min_rows: int = 40,
    diffs_list: T.Optional[T.Sequence[T.Dict[str, np.ndarray]]] = None,
) -> FeatureBank:
    """In-memory feature-bank builder over extracted arrays — the same
    assembly (and validation guards) as ``data/features.py``'s file-backed
    builder, via the shared helpers."""
    mods = stats.modalities
    banks = [
        assemble_video_bank(
            arrays, mods, stats, min_rows, names[i],
            diffs=diffs_list[i] if diffs_list is not None else None,
        )[0]
        for i, arrays in enumerate(per_video_arrays)
    ]
    return finalize_feature_bank(banks, names, classes, stats, mods)


@dataclasses.dataclass
class FullPipelineResult:
    scores: T.Dict[str, T.Dict[str, float]]
    rejected: T.List[str]       # videos failing the single-person ratio test
    stats: ModalityStats


def score_videos_end_to_end(
    extractor: Extractor,
    model: HumanActionScorer,
    params,
    frames_by_video: T.Mapping[str, np.ndarray],   # name -> [T, H, W, 3] uint8
    centroids: np.ndarray,
    label_dict: T.Dict[str, int],
    stats: T.Optional[ModalityStats] = None,
    cfg: T.Optional[ScoreConfig] = None,
    with_keypoints: bool = True,
    encoder: T.Optional[WindowEncoder] = None,
    phase_times: T.Optional[T.Dict[str, float]] = None,
) -> FullPipelineResult:
    """Decode-to-scores in one call: batched extraction (detector -> crops ->
    mesh net [+ pose net]) -> in-memory feature bank -> encoder -> AC/TC.

    Pass a prebuilt ``encoder`` (WindowEncoder on the same model/params/
    batch geometry) to amortize its jit trace across calls — a scoring
    service keeps it warm; rebuilding per call costs seconds of retrace.

    ``phase_times``: optional dict that receives coarse wall-clock phase
    seconds (``extract_s`` / ``bank_s`` / ``score_s``). Each phase already
    ends on host-materialized data (the streamed extraction fetches per
    super-batch, the bank is host numpy, the score sweep ends in one
    ``device_get``), so the boundaries are real completion points, not
    ``block_until_ready`` guesses (which the tunnel does not honor)."""
    import time as _time

    cfg = cfg or ScoreConfig()
    _t0 = _time.perf_counter()
    # device-resident bank assembly (round-5, data/device_bank.py):
    # extraction outputs stay on device, diffs/normalize/pad/concat run
    # there. Measured A/B on the tunneled v5e-1 (BENCH_NOTES round 5):
    # the HOST builder wins at both 8- and 16-video geometry — its per-
    # super-batch fetches overlap extraction dispatch and the ~6-12 MB
    # assembly/upload is cheaper than the device path's per-video stream
    # concat + stats barrier, a gap that GROWS with video count. "auto"
    # therefore resolves to host; "device" stays selectable (equivalence-
    # tested) for topologies where transfers are the binding cost.
    import jax

    if cfg.bank_impl not in ("host", "device", "auto"):
        raise ValueError(f"unknown bank_impl {cfg.bank_impl!r}")
    bank_device = cfg.bank_impl == "device"
    arrays_list: T.List[T.Dict[str, np.ndarray]] = []
    names: T.List[str] = []
    rejected: T.List[str] = []
    # cross-video streamed extraction: every video's frames flow through
    # detect/mesh/pose as one chunked device stream (threaded uploads, one
    # host fetch per stage per super-batch) — see process_videos_streamed
    items = list(frames_by_video.items())
    mesh_by_name, kp_by_name = extractor.process_videos_streamed(
        items, with_keypoints=with_keypoints, fetch_arrays=not bank_device
    )
    for name, _frames in items:
        mesh = mesh_by_name[name]
        kp = kp_by_name[name]
        if mesh is None:
            rejected.append(name)
            continue
        arrays = arrays_from_extraction(
            mesh, kp, kp_bug_compat=extractor.cfg.kp_bug_compat
        )
        if with_keypoints and "kp2d" not in arrays:
            arrays.pop("kp2d", None)  # no valid kp frames: drop the modality
        arrays_list.append(arrays)
        names.append(name)

    if phase_times is not None:
        phase_times["extract_s"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()

    if not arrays_list:
        return FullPipelineResult({}, rejected, stats or ModalityStats({}, {}, {}, {}))

    # restrict to modalities present in EVERY video
    common = set(arrays_list[0])
    for a in arrays_list[1:]:
        common &= set(a)
    arrays_list = [{m: a[m] for m in a if m in common} for a in arrays_list]

    diffs_list = None
    bank_streams = None
    if bank_device:
        if stats is None:
            # f32 device accumulation + f64 host finalize — the documented
            # fast-path deviation from the reference's all-f64 pass (the
            # parity configuration always passes precomputed host stats).
            # The returned StreamSet feeds the bank build below so the
            # delta chains run exactly once per sweep.
            from ..data.device_bank import stream_stats

            stats, bank_streams = stream_stats(arrays_list)
    else:
        diffs_list = [compute_modality_diffs(a) for a in arrays_list]
        if stats is None:
            stats = stats_from_arrays(arrays_list, diffs_list=diffs_list)
    used_mods = [m for m in stats.modalities if m in common]
    stats = ModalityStats(
        {m: stats.mean_raw[m] for m in used_mods},
        {m: stats.std_raw[m] for m in used_mods},
        {m: stats.mean_diff[m] for m in used_mods},
        {m: stats.std_diff[m] for m in used_mods},
    )

    # class-less videos get TC only: the reference EXCLUDES videos whose
    # class can't be inferred (or has no centroid) from AC rather than
    # scoring them against an arbitrary centroid (ref ``utils.py:1154-1159``,
    # ``eval.py:246-248``) — same semantics as the oracled score_bank path.
    classes = [infer_class_from_name(n, label_dict.keys()) for n in names]
    has_label = np.array(
        [c is not None and label_dict[c] < len(centroids) for c in classes]
    )
    bank_classes = [c or "" for c in classes]
    if bank_device:
        from ..data.device_bank import build_bank_device

        bank = build_bank_device(
            arrays_list, names, bank_classes, stats, streams=bank_streams
        )
    else:
        bank = bank_from_arrays(arrays_list, names, bank_classes, stats,
                                diffs_list=diffs_list)
    manifest = VideoManifest(
        [
            VideoItem(cls=c, name=n, path="", length=a["vit"].shape[0], vit_dim=a["vit"].shape[1])
            for c, n, a in zip(bank_classes, names, arrays_list)
        ]
    )
    windows = enumerate_windows(manifest, cfg.clip_len, cfg.stride)
    if phase_times is not None:
        phase_times["bank_s"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
    if encoder is None:
        encoder = WindowEncoder(
            model, params, cfg.batch_size, cfg.clip_len, cfg.matmul_precision
        )
    num_videos = len(names)
    # per-video sums accumulate on device along the sweep (no per-batch
    # fetches); only the [V]-sized sums come home, finalized locally
    win_video = np.array([v for v, _s in windows], np.int32)
    seq_sum, tc_sum, count = encoder.encode_bank_segsum(
        bank, windows, win_video, num_videos
    )
    # labels without a centroid row are masked by has_label; keep the gather
    # in-range regardless
    video_label = np.array(
        [label_dict[c] if h else 0 for c, h in zip(classes, has_label)],
        np.int32,
    )
    from ..utils.hostmath import host_math

    with host_math():
        ac_j, tc_j = finalize_video_scores(
            jnp.asarray(seq_sum),
            jnp.asarray(tc_sum),
            jnp.asarray(count),
            jnp.asarray(video_label),
            jnp.asarray(centroids),
        )
        ac_v, tc_v = np.asarray(ac_j), np.asarray(tc_j)
    if phase_times is not None:
        phase_times["score_s"] = _time.perf_counter() - _t0
    scores = {}
    for i, n in enumerate(names):
        entry: T.Dict[str, float] = {"tc": float(tc_v[i])}
        if has_label[i]:
            entry["ac"] = float(ac_v[i])
        scores[n] = entry
    return FullPipelineResult(scores, rejected, stats)
