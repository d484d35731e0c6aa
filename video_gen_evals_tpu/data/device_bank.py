"""Device-resident feature-bank assembly (round-5 directive #3).

The host bank builder (``features.assemble_video_bank`` +
``finalize_feature_bank``) runs diffs, z-score, sentinel-pad, and concat as
per-video host numpy — which forces every extraction output through a
device->host fetch and the finished bank back through a host->device upload
(~55 MB/s through the axon tunnel), and serializes [T, D]-sized eager math on
the 1-core host. This module keeps the whole assembly ON DEVICE — eager delta
ops plus one jitted normalize/gather/concat program — over per-modality
*streams* (all videos' rows concatenated):

1. diffs over the stream — every delta op is consecutive-frame-local
   (``ops/deltas.py``, ``ops/so3.py::rotmat_delta``,
   ``ops/procrustes.py::procrustes_kp_delta``), so the only cross-video
   contamination is the row at each video start, which is exactly the row
   the per-video ops define as 0 — one mask restores per-video semantics
   bitwise (per-video row 0 is an exact +0.0 in every op: x - x, or
   theta * 0 for the rotation log);
2. z-score with train stats (device constants);
3. sentinel-pad + concat via one precomputed gather per modality: bank row r
   of video v at local row t reads stream row ``off_m[v] + min(t, L_m-1)``,
   and diff rows at ``t >= L_m`` take the normalized-zero vector — the same
   slice-or-pad semantics the host builder bakes in (ref ``utils.py:366-514``
   for the original per-window formulation).

The result is a ``FeatureBank`` whose ``bank`` is a device array: the scoring
sweep (``WindowEncoder``) consumes it with zero re-upload, and only the
optional persistence copy ever crosses the tunnel.

Equivalence: bitwise vs the host builder when both run on the CPU backend
(same jnp ops, same order — ``tests/test_device_bank.py``). On a real TPU the
values differ only at f32 rounding of the delta matmuls (the normalization is
elementwise), orders below the 1e-3 parity budget.

Stats: when no precomputed stats exist, ``stream_stats`` accumulates per-dim
sum/sum^2 on device in float32 and finalizes on host in float64. This is NOT
bit-identical to the reference's float64 per-row accumulation (ref
``utils.py:589-593``); the parity configuration always uses precomputed
host-path stats (the real-train-split pass), so this fast path only serves
self-normalized throughput sweeps. The deviation is measured in the tests
(~1e-6 relative on the resulting mean/std).
"""

from __future__ import annotations

import functools
import typing as T

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.deltas import betas_delta, vit_delta
from ..ops.procrustes import procrustes_kp_delta
from ..ops.so3 import rotmat_delta
from .features import _NORM_EPS, _ROW_ALIGN, FeatureBank

if T.TYPE_CHECKING:  # avoid import cycle with stats.py
    from .stats import ModalityStats


def _stream_delta(m: str, X: jnp.ndarray, start_mask: jnp.ndarray) -> jnp.ndarray:
    """Full-stream diff features with per-video first-row zeroing.

    ``start_mask``: [N] bool, True at each video's first stream row. The
    per-video ops produce an exact +0.0 at their own row 0, so masking the
    stream op's (cross-video) value at start rows with 0 reproduces the
    per-video result bitwise.
    """
    Tn = X.shape[0]
    if m in ("vit", "clip", "dino"):
        d = vit_delta(X)
    elif m in ("global", "pose"):
        d = rotmat_delta(X.reshape(Tn, -1, 3, 3)).reshape(Tn, -1)
    elif m == "beta":
        d = betas_delta(X)
    elif m == "kp2d":
        d = procrustes_kp_delta(X)
    else:
        raise KeyError(m)
    return jnp.where(start_mask[:, None], jnp.zeros((), d.dtype), d)


_stream_delta_jit = jax.jit(_stream_delta, static_argnums=(0,))


def _delta_dispatch(m: str, X: jnp.ndarray, start_mask: jnp.ndarray):
    """Eager on CPU (bitwise vs the host builder's op-by-op order — the
    equivalence tests pin the CPU backend); ONE jitted program per modality
    elsewhere: the rotation/Procrustes chains are dozens of primitives, and
    at ~1.6 ms per chained tunnel dispatch the eager form costs ~0.1 s per
    sweep before any math runs (measured round 5: device bank_s 0.68 s vs
    host 0.14 s, half of it dispatch + duplicated delta work)."""
    if jax.default_backend() == "cpu":
        return _stream_delta(m, X, start_mask)
    return _stream_delta_jit(m, X, start_mask)


class StreamSet(T.NamedTuple):
    """Concatenated per-modality streams + diffs, shared by ``stream_stats``
    and ``build_bank_device`` so the serve path computes them exactly once."""

    mods: T.Tuple[str, ...]
    lengths: T.List[T.Dict[str, int]]
    streams: T.Dict[str, jnp.ndarray]
    diffs: T.Dict[str, jnp.ndarray]


def build_streams(
    arrays_list: T.Sequence[T.Dict[str, T.Any]],
    mods: T.Sequence[str],
) -> StreamSet:
    """Concat every video's [T, D] arrays into one device stream per modality
    and compute the diff streams (per-video semantics restored by the
    start-row mask)."""
    lengths = [{m: int(a[m].shape[0]) for m in mods} for a in arrays_list]
    streams = {
        m: jnp.concatenate(
            [jnp.asarray(a[m], jnp.float32).reshape(a[m].shape[0], -1)
             for a in arrays_list]
        )
        for m in mods
    }
    diffs = {}
    for m in mods:
        L = np.array([lm[m] for lm in lengths], np.int64)
        off = np.concatenate([[0], np.cumsum(L)[:-1]])
        sm = np.zeros(int(L.sum()), bool)
        sm[off] = True
        diffs[m] = _delta_dispatch(m, streams[m], jnp.asarray(sm))
    return StreamSet(tuple(mods), lengths, streams, diffs)


@functools.partial(jax.jit, static_argnames=("mods",))
def _assemble_jit(mods, streams, diffs, src_raw, src_diff, pad_diff,
                  mean_raw, std_raw, mean_diff, std_diff):
    """One device program: normalize -> gather -> concat.

    The diff streams are computed EAGERLY by the caller (``_stream_delta``):
    the host builder runs the delta ops op-by-op (eager jnp under
    ``host_math``), and whole-program jit changes reduction fusion in the
    Procrustes op by ~1 ulp — keeping the deltas eager on both paths is what
    makes the CPU-backend equivalence bitwise. Everything inside this jit is
    elementwise math, gathers, and concat (fusion-stable).

    All dict args are keyed by modality; ``mods`` (a tuple) pins the
    concatenation order (raw block then diff block — ref ``utils.py:496-514``,
    ``train.py:29-48``).
    """
    parts_raw, parts_diff = [], []
    for m in mods:
        X = streams[m]
        d = diffs[m]
        raw_n = (X[src_raw[m]] - mean_raw[m][None, :]) / (
            std_raw[m][None, :] + _NORM_EPS
        )
        z0 = (jnp.zeros_like(mean_diff[m]) - mean_diff[m]) / (
            std_diff[m] + _NORM_EPS
        )
        dn = (d[src_diff[m]] - mean_diff[m][None, :]) / (
            std_diff[m][None, :] + _NORM_EPS
        )
        dn = jnp.where(pad_diff[m][:, None], z0[None, :], dn)
        parts_raw.append(raw_n)
        parts_diff.append(dn)
    return jnp.concatenate(parts_raw + parts_diff, axis=1)


@functools.partial(jax.jit, static_argnames=("mods",))
def _stream_stats_jit(mods, streams, diffs):
    """Per-dim f32 sum / sum^2 over raw and (precomputed) diff streams."""
    out = {}
    for m in mods:
        X = streams[m]
        d = diffs[m]
        out[m] = (
            jnp.sum(X, axis=0), jnp.sum(X * X, axis=0),
            jnp.sum(d, axis=0), jnp.sum(d * d, axis=0),
        )
    return out


def _bank_geometry(
    lengths: T.Sequence[T.Dict[str, int]], mods: T.Sequence[str], min_rows: int
) -> T.Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(per-video n_rows, bank offsets, row_limit) — host integer math,
    identical to ``assemble_video_bank`` + ``finalize_feature_bank``."""
    n_rows = np.empty(len(lengths), np.int64)
    for v, lm in enumerate(lengths):
        height = max(lm[m] for m in mods)
        r = max(height + 1, min_rows)
        n_rows[v] = (r + _ROW_ALIGN - 1) // _ROW_ALIGN * _ROW_ALIGN
    offsets = np.concatenate([[0], np.cumsum(n_rows)[:-1]]).astype(np.int32)
    row_limit = (n_rows - 1).astype(np.int32)
    return n_rows, offsets, row_limit


def _gather_indices(
    lengths: T.Sequence[T.Dict[str, int]],
    mods: T.Sequence[str],
    n_rows: np.ndarray,
) -> T.Tuple[dict, dict, dict, dict]:
    """Per-modality (src_raw [R], src_diff [R], pad_diff [R], start_mask [N])."""
    src_raw: T.Dict[str, np.ndarray] = {}
    src_diff: T.Dict[str, np.ndarray] = {}
    pad_diff: T.Dict[str, np.ndarray] = {}
    start_mask: T.Dict[str, np.ndarray] = {}
    for m in mods:
        L = np.array([lm[m] for lm in lengths], np.int64)
        off = np.concatenate([[0], np.cumsum(L)[:-1]])
        sr, sd, pd = [], [], []
        for v, nr in enumerate(n_rows):
            t = np.arange(nr)
            clamped = off[v] + np.minimum(t, L[v] - 1)
            sr.append(clamped)
            sd.append(clamped)          # pad rows overridden by pad mask
            pd.append(t >= L[v])        # diff: sentinel rows -> z0
        src_raw[m] = np.concatenate(sr).astype(np.int32)
        src_diff[m] = np.concatenate(sd).astype(np.int32)
        pad_diff[m] = np.concatenate(pd)
        sm = np.zeros(int(L.sum()), bool)
        sm[off] = True
        start_mask[m] = sm
    return src_raw, src_diff, pad_diff, start_mask


def build_bank_device(
    arrays_list: T.Sequence[T.Dict[str, T.Any]],   # per-video, device or np
    names: T.Sequence[str],
    classes: T.Sequence[str],
    stats: "ModalityStats",
    min_rows: int = 40,
    streams: T.Optional[StreamSet] = None,
) -> FeatureBank:
    """Device-resident equivalent of ``pipelines.full.bank_from_arrays``.

    Per-video arrays may be jax device arrays (the extraction outputs, kept
    resident) or numpy; everything size-[T, D] stays on device. Returns a
    ``FeatureBank`` whose ``bank`` is a jax array — pass it straight to
    ``WindowEncoder`` (which no-ops the upload for already-device banks).
    """
    # same contract as the host builder (assemble_video_bank): every stats
    # modality must be present for every video — a clear error, not a
    # silently narrower bank
    mods = stats.modalities
    missing = [
        (names[i], [m for m in mods if m not in a])
        for i, a in enumerate(arrays_list)
        if any(m not in a for m in mods)
    ]
    if missing:
        raise FileNotFoundError(
            f"videos missing modalities (device bank): {missing[:4]}"
        )
    empty = [
        (names[i], m)
        for i, a in enumerate(arrays_list)
        for m in mods
        if a[m].shape[0] == 0
    ]
    if empty:
        raise ValueError(
            f"zero-frame modalities (truncated extraction?): {empty[:4]}"
        )
    # canonical stats order may differ from the StreamSet's dict order; the
    # streams are keyed by modality so any superset is reusable as-is
    if streams is None or not all(m in streams.streams for m in mods):
        streams = build_streams(arrays_list, mods)
    lengths = streams.lengths
    n_rows, offsets, row_limit = _bank_geometry(lengths, mods, min_rows)
    src_raw, src_diff, pad_diff, _start_mask = _gather_indices(
        lengths, mods, n_rows
    )
    bank_dev = _assemble_jit(
        tuple(mods),
        streams.streams,
        streams.diffs,
        {m: jnp.asarray(src_raw[m]) for m in mods},
        {m: jnp.asarray(src_diff[m]) for m in mods},
        {m: jnp.asarray(pad_diff[m]) for m in mods},
        {m: jnp.asarray(stats.mean_raw[m]) for m in mods},
        {m: jnp.asarray(stats.std_raw[m]) for m in mods},
        {m: jnp.asarray(stats.mean_diff[m]) for m in mods},
        {m: jnp.asarray(stats.std_diff[m]) for m in mods},
    )
    z0_parts = [
        (np.zeros(stats.mean_diff[m].shape[0], np.float32) - stats.mean_diff[m])
        / (stats.std_diff[m] + _NORM_EPS)
        for m in mods
    ]
    return FeatureBank(
        bank=bank_dev,                      # device-resident
        offsets=offsets,
        row_limit=row_limit,
        z0_diff=np.concatenate(z0_parts).astype(np.float32),
        one_pass_raw=sum(int(stats.mean_raw[m].shape[0]) for m in mods),
        classes=list(classes),
        names=list(names),
    )


def stream_stats(
    arrays_list: T.Sequence[T.Dict[str, T.Any]],
    eps: float = 1e-6,
    streams: T.Optional[StreamSet] = None,
) -> T.Tuple["ModalityStats", StreamSet]:
    """Device-accumulated normalization stats (f32 sums, f64 host finalize).

    Fast path for self-normalized sweeps (config-4 bench mode). NOT the
    parity stats path — see the module docstring. Returns the stats AND the
    :class:`StreamSet` it computed them from, so the caller can hand the
    same streams/diffs to :func:`build_bank_device` (the serve path was
    measured paying the whole delta chain twice without this — round-5
    device-bank A/B).
    """
    from .stats import ModalityStats

    mods = [m for m in arrays_list[0] if all(m in a for a in arrays_list)]
    if streams is None or not all(m in streams.streams for m in mods):
        streams = build_streams(arrays_list, mods)
    lengths = streams.lengths
    sums = jax.device_get(
        _stream_stats_jit(tuple(mods), streams.streams, streams.diffs)
    )
    from .stats import MODALITIES

    stats = ModalityStats({}, {}, {}, {})
    for m in MODALITIES:
        if m not in mods:
            continue
        n = sum(lm[m] for lm in lengths)
        s_r, ss_r, s_d, ss_d = (np.asarray(x, np.float64) for x in sums[m])
        for s, ss, mean_d, std_d in (
            (s_r, ss_r, stats.mean_raw, stats.std_raw),
            (s_d, ss_d, stats.mean_diff, stats.std_diff),
        ):
            mean = s / max(1, n)
            var = ss / max(1, n) - mean**2
            mean_d[m] = mean.astype(np.float32)
            std_d[m] = np.sqrt(np.maximum(var, 0.0) + eps).astype(np.float32)
    return stats, streams
