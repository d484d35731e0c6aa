"""Pure array ops: SO(3) geometry, Procrustes keypoint velocity, temporal deltas,
window corruption, and Pallas TPU kernels."""

from .so3 import (
    axis_angle_to_matrix,
    log_so3,
    rotmat_delta,
    axis_angle_delta,
)
from .deltas import vit_delta, betas_delta
from .procrustes import procrustes_kp_delta
from .corruption import partial_shuffle_within_window, reverse_sequence, static_window

__all__ = [
    "axis_angle_to_matrix",
    "log_so3",
    "rotmat_delta",
    "axis_angle_delta",
    "vit_delta",
    "betas_delta",
    "procrustes_kp_delta",
    "partial_shuffle_within_window",
    "reverse_sequence",
    "static_window",
]
