"""Canonical action classes and video-name normalization.

These conventions ARE part of the reference API surface (SURVEY.md §1):
- the 10 canonical UCF101 action classes (ref ``eval.py:22-33``,
  ``train.py:476-477``);
- class-token canonicalization with lowercase aliases (ref ``eval.py:36-45``);
- video-name normalization used to match model scores against human MOS keys
  (ref ``eval.py:289-294``, ``utils.py:1112-1117``,
  ``process_human_scores.py:204-228`` — deliberately one shared function here
  instead of three duplicated copies);
- substring-based class inference from generated-video filenames
  (ref ``eval.py:55-74``, ``utils.py:1069-1073``).
"""

from __future__ import annotations

import os
import typing as T

ACTION_CLASSES: T.Tuple[str, ...] = (
    "BodyWeightSquats",
    "HulaHoop",
    "JumpingJack",
    "PullUps",
    "PushUps",
    "Shotput",
    "SoccerJuggling",
    "TennisSwing",
    "ThrowDiscus",
    "WallPushups",
)

_ALIASES = {
    "soccerjuggling": "SoccerJuggling",
    "tennisswing": "TennisSwing",
}


def canonicalize_class(name: str) -> str:
    """Map a filename class token onto the canonical ACTION_CLASSES label."""
    for cls in ACTION_CLASSES:
        if name.lower() == cls.lower():
            return cls
    return _ALIASES.get(name.lower(), name)


def norm_name(name: str) -> str:
    """Normalize a video name for model<->human score matching."""
    stem = os.path.splitext(os.path.basename(name))[0]
    stem = stem.replace("_videos_", "_")
    stem = stem.replace("videos_", "")
    stem = stem.replace("_video_", "_")
    return stem


def infer_class_from_name(
    name: str, known_classes: T.Iterable[str]
) -> T.Optional[str]:
    """First known class appearing as a substring of ``name`` (ref
    ``utils.py:1069-1073`` / ``eval.py``'s ``_extract_class``)."""
    for cls in known_classes:
        if cls in name:
            return cls
    return None


def infer_class_from_generated_stem(stem: str) -> str:
    """Class inference for generated-mesh filenames (ref ``eval.py:55-74``):
    first try canonical tokens split on '_', then a capitalized-word
    heuristic; fall back to ``"Unknown"``."""
    parts = stem.split("_")
    for part in parts:
        canon = canonicalize_class(part)
        if canon in ACTION_CLASSES:
            return canon
    for part in parts:
        if (
            part
            and part[0].isupper()
            and not part.isdigit()
            and len(part) > 3
            and part.lower() not in ("videos", "npz")
        ):
            return canonicalize_class(part)
    return "Unknown"
