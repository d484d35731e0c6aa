"""Data layer: manifests, modality statistics, window enumeration, feature
banks with device-side window gather, and PK balanced sampling."""

from .manifest import (
    VideoItem,
    VideoManifest,
    scan_class_tree,
    scan_generated_flat,
    train_test_split,
)
from .stats import ModalityStats, compute_stats, compute_stats_cached
from .windows import enumerate_windows, slice_or_pad
from .features import (
    ModalityPaths,
    VideoFeatures,
    FeatureBank,
    compute_video_features,
    build_feature_bank,
    build_feature_bank_cached,
    load_feature_bank,
    save_feature_bank,
    gather_windows,
    gather_windows_sliced,
)
from .sampler import PKBatchSampler

__all__ = [
    "VideoItem",
    "VideoManifest",
    "scan_class_tree",
    "scan_generated_flat",
    "train_test_split",
    "ModalityStats",
    "compute_stats",
    "compute_stats_cached",
    "enumerate_windows",
    "slice_or_pad",
    "ModalityPaths",
    "VideoFeatures",
    "FeatureBank",
    "compute_video_features",
    "build_feature_bank",
    "build_feature_bank_cached",
    "load_feature_bank",
    "save_feature_bank",
    "gather_windows",
    "gather_windows_sliced",
    "PKBatchSampler",
]
