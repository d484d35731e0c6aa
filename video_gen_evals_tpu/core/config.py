"""Typed configuration tree (SURVEY §5.6 rebuild plan).

One dataclass tree replaces the reference's three ad-hoc mechanisms
(``GLOBAL_CONFIG`` dict, per-experiment cfg dict, edit-the-source constants —
ref ``train.py:15-53,471-480``, ``eval.py:351-359``). Serialized with every
run; the "modalities = what's configured" auto-detection behavior is kept
(ref ``train.py:225-236``).

Default hyperparameters mirror ``Exp_TCL_Hard_V2Plus`` (ref ``train.py:471-480``).
"""

from __future__ import annotations

import dataclasses
import json
import typing as T

from ..utils.names import ACTION_CLASSES

# canonical modality dims (ref train.py:29-48); vit dim is dataset-dependent
DEFAULT_DIMS_RAW = {
    "vit": 1024,
    "global": 9,
    "pose": 207,
    "beta": 10,
    "kp2d": 120,
    "clip": 512,
    "dino": 768,
}
DEFAULT_DIMS_DIFF = {
    "vit": 1024,
    "global": 3,
    "pose": 69,
    "beta": 10,
    "kp2d": 120,
    "clip": 512,
    "dino": 768,
}


@dataclasses.dataclass(frozen=True)
class BugCompat:
    """One switch for the reference's accidental behaviors (SURVEY §7.4.7):
    observable scoring semantics are always reproduced, but the internals that
    are clearly bugs are gated here so they can be turned off together.

    - ``kp_frame_drop``: write only valid keypoint frames during extraction,
      reproducing the reference's mesh/kp frame misalignment
      (ref ``process_video.py:23-57`` silently drops frames).
    - ``layout_auto``: infer the generated-vs-real side-modality directory
      layout from the *keypoint dir name* (``SAVE_GEN``/``SAVE_NEW``/
      ``generated_kps``), as the reference keys all three side modalities off
      it (ref ``utils.py:411-414,429-432,443-446``).
    - ``permissive_ckpt``: tolerate missing/extra checkpoint keys like the
      reference's ``strict=False`` loading (ref ``eval.py:136-165``).

    CLI surface: ``--bug-compat`` (default) / ``--no-bug-compat`` on the
    extract and score pipelines. Documented in PARITY.md.
    """

    kp_frame_drop: bool = True
    layout_auto: bool = True
    permissive_ckpt: bool = True

    @classmethod
    def enabled(cls) -> "BugCompat":
        return cls()

    @classmethod
    def disabled(cls) -> "BugCompat":
        return cls(kp_frame_drop=False, layout_auto=False, permissive_ckpt=False)


@dataclasses.dataclass
class PathsConfig:
    real_meshes_dir: str = "meshes_10classes"
    generated_meshes_dir: str = "generated_meshes"
    human_scores: str = "TAG_final_human_scores.json"
    real_kp_dir: T.Optional[str] = "SAVE_REAL_ONLY_10_minus1"
    gen_kp_dir: T.Optional[str] = "generated_kps"
    real_clip_dir: T.Optional[str] = None
    real_dino_dir: T.Optional[str] = None
    gen_clip_dir: T.Optional[str] = None
    gen_dino_dir: T.Optional[str] = None


@dataclasses.dataclass
class TrainConfig:
    paths: PathsConfig = dataclasses.field(default_factory=PathsConfig)
    seed: int = 1337
    epochs: int = 30
    clip_len: int = 32
    stride: int = 8
    P: int = 10                      # classes per batch
    K: int = 24                      # windows per class
    lr: float = 3e-4
    eta_min: float = 1e-6            # cosine floor (ref train.py:184-186)
    latent_dim: int = 128            # passed through (unused by model; quirk)
    d_model: int = 256
    time_layers: int = 4
    time_heads: int = 8
    dropout: float = 0.1
    hard_negative_weight: float = 10.0
    filter_classes: T.Optional[T.List[str]] = dataclasses.field(
        default_factory=lambda: list(ACTION_CLASSES)
    )
    num_dp_devices: T.Optional[int] = None  # None -> all local devices
    # optional directory for cached feature banks (skip the normalize/delta
    # pass when the video set is unchanged) — see build_feature_bank_cached
    bank_cache_dir: T.Optional[str] = None
    save_dir: str = "SAVE"
    name: str = "HumanActionScorer"
    # debug mode: raise on the first NaN instead of silently skipping the
    # batch (SURVEY §5.2 — replaces the reference's silent non-finite skip)
    debug_nans: bool = False
    # "auto": fused Pallas conv stages (custom VJP, +12.5% steps/s measured
    # — BENCH_NOTES round 2) on single-chip TPU, module convs elsewhere;
    # "module"/"kernel" force one implementation
    conv_impl: str = "auto"
    # overlap per-epoch checkpoint writes with the next epoch's compute
    # (worker-thread device_get + write; ~30 s/epoch through the tunnel,
    # BENCH_NOTES config-5). Only affects Experiment.run's own saves —
    # direct save_resume_checkpoint calls stay blocking — and only
    # single-process runs (multi-process saves are collective).
    async_checkpoint: bool = True

    @property
    def batch_size(self) -> int:
        return self.P * self.K

    def detect_modalities(self) -> T.List[str]:
        """Modalities = base four + whatever side dirs are configured
        (ref ``train.py:225-236``)."""
        mods = ["vit", "global", "pose", "beta"]
        if self.paths.real_kp_dir is not None:
            mods.append("kp2d")
        if self.paths.real_clip_dir is not None:
            mods.append("clip")
        if self.paths.real_dino_dir is not None:
            mods.append("dino")
        return mods

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def from_json(cls, path: str) -> "TrainConfig":
        with open(path) as f:
            d = json.load(f)
        d["paths"] = PathsConfig(**d.get("paths", {}))
        return cls(**d)


def default_train_config() -> TrainConfig:
    return TrainConfig()
