"""Shared utilities: canonical names, npz IO, logging."""

from .names import (
    ACTION_CLASSES,
    canonicalize_class,
    norm_name,
    infer_class_from_name,
)

__all__ = [
    "ACTION_CLASSES",
    "canonicalize_class",
    "norm_name",
    "infer_class_from_name",
]
