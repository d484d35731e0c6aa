"""Metrics: AC/TC on-device reducers, class centroids, rank correlations."""

from .scores import (
    build_centroids,
    tc_per_window,
    segment_mean,
    video_ac_scores,
    video_tc_scores,
)
from .correlation import spearman, pearson, match_and_correlate

__all__ = [
    "build_centroids",
    "tc_per_window",
    "segment_mean",
    "video_ac_scores",
    "video_tc_scores",
    "spearman",
    "pearson",
    "match_and_correlate",
]
