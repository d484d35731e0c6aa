"""Human-study layer: MOS rater-filtering pipeline and benchmark fixtures."""

from .mos import (
    stage1_repeated_video_consistency,
    stage2_subject_rejection,
    stage3_inter_rater_reliability,
    compute_mos_and_normalize,
    process_human_scores,
)

__all__ = [
    "stage1_repeated_video_consistency",
    "stage2_subject_rejection",
    "stage3_inter_rater_reliability",
    "compute_mos_and_normalize",
    "process_human_scores",
]
