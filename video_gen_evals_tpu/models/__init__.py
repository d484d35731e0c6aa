"""Model zoo: fusion encoder (HumanActionScorer), TokenHMR-equivalent ViT +
SMPL token decoder head, DWPose-equivalent 2D pose estimator, person detector,
and torch-checkpoint weight converters."""

from .fusion_encoder import EncoderConfig, HumanActionScorer

__all__ = ["EncoderConfig", "HumanActionScorer"]
