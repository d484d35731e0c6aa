"""Training: losses, fused jitted train step, experiment harness, checkpointing."""

from .losses import (
    tcl_loss,
    supcon_hard_negatives,
    hard_neg_infonce,
    arc_margin_logits,
    margin_hard_negatives,
)

__all__ = [
    "tcl_loss",
    "supcon_hard_negatives",
    "hard_neg_infonce",
    "arc_margin_logits",
    "margin_hard_negatives",
]
