"""TAG scores (Action Consistency, Temporal Coherence) as on-device reducers.

Capability parity with C20-C21/C24 in SURVEY.md:
- :func:`build_centroids`  <- ``build_train_centroids_subset``
  (ref ``utils.py:1018-1045``): class centroids = L2-normalized mean of the
  (already-normalized) window CLS embeddings, via ``segment_sum``.
- :func:`tc_per_window`    <- ref ``eval.py:209-226`` inner math: mean
  consecutive L2 distance between per-frame embeddings, CLS excluded.
- :func:`video_ac_scores`  <- ref ``eval.py:229-257``: per video, L2 distance
  of the normalized mean window embedding to the class centroid.
- :func:`video_tc_scores`  <- per-video mean of window TCs.

Everything here is jittable with static shapes; per-video aggregation uses
segment sums over a window->video index map so a whole benchmark sweep reduces
on device without host round-trips (BASELINE.json north star).
"""

from __future__ import annotations

import typing as T

import jax
import jax.numpy as jnp

from ..ops.deltas import l2_normalize


def segment_mean(
    values: jnp.ndarray,      # [N, ...] per-window values
    segment_ids: jnp.ndarray, # [N] int video index
    num_segments: int,
    weights: T.Optional[jnp.ndarray] = None,  # [N] 0/1 validity mask
) -> jnp.ndarray:
    """Mean of ``values`` per segment (count clamped to >= 1)."""
    if weights is not None:
        w = weights.astype(values.dtype)
        values = values * w.reshape((-1,) + (1,) * (values.ndim - 1))
    else:
        w = jnp.ones(values.shape[0], values.dtype)
    sums = jax.ops.segment_sum(values, segment_ids, num_segments)
    counts = jax.ops.segment_sum(w, segment_ids, num_segments)
    counts = jnp.maximum(counts, 1.0)
    return sums / counts.reshape((-1,) + (1,) * (values.ndim - 1))


def build_centroids(
    embeddings: jnp.ndarray,  # [N, D] window CLS embeddings (normalized)
    labels: jnp.ndarray,      # [N] int class ids
    num_classes: int,
    weights: T.Optional[jnp.ndarray] = None,
) -> T.Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-class normalized mean embedding + per-class counts."""
    if weights is not None:
        w = weights.astype(embeddings.dtype)
        embeddings = embeddings * w[:, None]
    else:
        w = jnp.ones(embeddings.shape[0], embeddings.dtype)
    sums = jax.ops.segment_sum(embeddings, labels, num_classes)
    counts = jax.ops.segment_sum(w, labels, num_classes)
    # a class with ZERO windows gets NaN (like the reference's mean over an
    # empty set), not a zero centroid — a zero centroid would score every
    # video of that class at a fabricated constant ac of exactly 1.0
    centroids = jnp.where(
        counts[:, None] > 0,
        sums / jnp.maximum(counts, 1.0)[:, None],
        jnp.nan,
    )
    return l2_normalize(centroids, axis=-1), counts


def tc_per_window(frame_embeds: jnp.ndarray) -> jnp.ndarray:
    """``[B, T+1, D]`` normalized frame embeddings (CLS at index 0) ->
    per-window temporal-coherence score ``[B]``."""
    frames = frame_embeds[:, 1:, :]
    diffs = frames[:, 1:, :] - frames[:, :-1, :]
    return jnp.sqrt(jnp.sum(diffs * diffs, axis=-1)).mean(axis=-1)


def video_tc_scores(
    window_tc: jnp.ndarray,     # [N]
    window_video: jnp.ndarray,  # [N] video index per window
    num_videos: int,
    weights: T.Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """[V] mean window TC per video."""
    return segment_mean(window_tc, window_video, num_videos, weights)


def finalize_centroids(
    seq_sum: jnp.ndarray,  # [C, D] accumulated per-class embedding sums
    count: jnp.ndarray,    # [C] accumulated window counts
) -> jnp.ndarray:
    """:func:`build_centroids` applied to pre-reduced per-class sums.

    Companion to ``WindowEncoder.encode_bank_segsum``: the segment sums are
    accumulated on device batch by batch, so only the ``[C, D]``-sized sums
    cross the host boundary. Same semantics as build_centroids, including
    NaN for classes with zero windows (ref ``utils.py:1018-1045``).
    """
    centroids = jnp.where(
        count[:, None] > 0,
        seq_sum / jnp.maximum(count, 1.0)[:, None],
        jnp.nan,
    )
    return l2_normalize(centroids, axis=-1)


def finalize_video_scores(
    seq_sum: jnp.ndarray,     # [V, D] accumulated per-video embedding sums
    tc_sum: jnp.ndarray,      # [V] accumulated per-video window-TC sums
    count: jnp.ndarray,       # [V] accumulated window counts
    video_label: jnp.ndarray, # [V] class id per video
    centroids: jnp.ndarray,   # [C, D]
) -> T.Tuple[jnp.ndarray, jnp.ndarray]:
    """``(ac [V], tc [V])`` from pre-reduced per-video sums — the math of
    :func:`video_ac_scores` / :func:`video_tc_scores` (ref ``eval.py:209-257``)
    applied after device-side segment accumulation."""
    cnt = jnp.maximum(count, 1.0)
    tc_v = tc_sum / cnt
    z_mean = l2_normalize(seq_sum / cnt[:, None], axis=-1)
    d = z_mean - centroids[video_label]
    return jnp.sqrt(jnp.sum(d * d, axis=-1)), tc_v


def video_ac_scores(
    seq_embeds: jnp.ndarray,    # [N, D] window CLS embeddings
    window_video: jnp.ndarray,  # [N]
    video_label: jnp.ndarray,   # [V] class id per video
    centroids: jnp.ndarray,     # [C, D]
    weights: T.Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """[V] L2 distance from each video's normalized mean embedding to its
    class centroid."""
    num_videos = video_label.shape[0]
    z_mean = segment_mean(seq_embeds, window_video, num_videos, weights)
    z_mean = l2_normalize(z_mean, axis=-1)
    cen = centroids[video_label]
    d = z_mean - cen
    return jnp.sqrt(jnp.sum(d * d, axis=-1))
