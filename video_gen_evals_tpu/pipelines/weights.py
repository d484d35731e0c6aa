"""Published-checkpoint loading for the extraction stack.

The reference pipeline loads four pretrained networks from disk (ref
``mesh_generator.py:35-78``: ``tokenhmr_model_latest.ckpt`` + the detectron2
zoo X101-FPN; ``dwpose_init.py``/``wholebody``: the DWPose wholebody model
and its YOLOX person detector, which are ONNX exports of the published
mmpose ``dwpose_l`` / Megvii ``yolox_l`` torch weights). This module is the
one-call bridge from those files to a ready :class:`Extractor`:

    ex = Extractor.from_checkpoints(
        tokenhmr="tokenhmr_model_latest.ckpt",   # or model.pt / .npz
        dwpose="dwpose_l.pth",                   # mmpose layout
        yolox="yolox_l.pth",                     # Megvii layout
        rcnn="model_final_68b088.pkl",           # detectron2 .pkl or .pt
    )

Every argument is optional — nets without a file keep their random init (and
their configured geometry), so partial drops work (e.g. benchmarking with
only the detector converted). Each provided file switches that net's config
to the published geometry (``yolox_l`` / ``dwpose_l``; the ViT-H and X101
defaults already are published geometry) and runs the same replica-tested
converter the activation-diff harness uses (``scripts/activation_diff.py``
validates any drop layer-by-layer).

Accepted containers: torch ``.pt/.pth/.ckpt`` (bare state_dicts or
``state_dict``/``model_state_dict``/``model`` wrappers — Lightning, mmpose,
and Megvii conventions; ref ``eval.py:136-165`` is the same permissive
rule), ``.npz`` of torch-named arrays, and detectron2 ``.pkl``. ``module.``
(DataParallel) and ``model.`` wrapper prefixes are stripped.
"""

from __future__ import annotations

import typing as T

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "sub_state_dict",
    "extraction_params_from_checkpoints",
]


def load_torch_state_dict(path: str) -> T.Dict[str, np.ndarray]:
    """Load ``path`` into a flat ``{torch_name: np.ndarray}`` dict."""
    if path.endswith(".npz"):
        with np.load(path, allow_pickle=False) as f:
            return {k: f[k] for k in f.files}
    if path.endswith(".pkl"):
        from ..models.rcnn import load_detectron2_pkl

        return load_detectron2_pkl(path)

    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for wrapper in ("state_dict", "model_state_dict", "model"):
            inner = obj.get(wrapper)
            if isinstance(inner, dict) and inner:
                obj = inner
                break
    sd = {}
    for k, v in obj.items():
        if torch.is_tensor(v):
            sd[k] = v.detach().cpu().numpy()
        elif isinstance(v, np.ndarray):
            sd[k] = v
    if not sd:
        raise ValueError(f"{path}: no tensors found in checkpoint")
    for prefix in ("module.", "model."):
        if all(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()}
    return sd


def _as_state_dict(x) -> T.Dict[str, np.ndarray]:
    """Accept a path or an already-loaded state_dict (so callers that need
    a file twice — geometry inference then conversion — load it once)."""
    return x if isinstance(x, dict) else load_torch_state_dict(x)


def sub_state_dict(
    sd: T.Dict[str, np.ndarray], prefix: str
) -> T.Dict[str, np.ndarray]:
    """Keys under ``prefix``, stripped. Raises if none match (a wrong-file
    drop should fail loudly, not silently keep random weights)."""
    out = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    if not out:
        raise ValueError(
            f"no keys under prefix {prefix!r}; checkpoint has e.g. "
            f"{sorted(sd)[:5]}"
        )
    return out


def extraction_params_from_checkpoints(
    cfg,                      # ExtractorConfig (already published-geometry)
    *,
    tokenhmr: T.Union[str, T.Dict[str, "np.ndarray"], None] = None,
    dwpose: T.Union[str, T.Dict[str, "np.ndarray"], None] = None,
    yolox: T.Union[str, T.Dict[str, "np.ndarray"], None] = None,
    rcnn: T.Union[str, T.Dict[str, "np.ndarray"], None] = None,
) -> T.Dict[str, T.Dict]:
    """Convert the provided checkpoints into Extractor param subtrees.

    Each net argument is a file path OR an already-loaded flat state_dict
    (the ``_as_state_dict`` load-once pattern used by
    ``Extractor.from_checkpoints`` to avoid re-reading multi-GB files).

    Returns a dict with any of the keys ``vit``/``head``/``pose``/``det``/
    ``rcnn`` — only the nets whose file was given. ``cfg`` must already hold
    the matching geometries (see :func:`published_config`).
    """
    out: T.Dict[str, T.Dict] = {}
    if tokenhmr is not None:
        from ..models.smpl_head import torch_head_to_flax
        from ..models.vit import torch_vit_to_flax

        sd = _as_state_dict(tokenhmr)
        out["vit"] = torch_vit_to_flax(sub_state_dict(sd, "backbone."), cfg.vit)
        out["head"] = torch_head_to_flax(
            sub_state_dict(sd, "smpl_head."), cfg.head
        )
    if dwpose is not None:
        from ..models.pose2d import mmpose_to_flax

        out["pose"] = mmpose_to_flax(_as_state_dict(dwpose), cfg.pose)
    if yolox is not None:
        from ..models.detector import yolox_to_flax

        out["det"] = yolox_to_flax(_as_state_dict(yolox), cfg.det)
    if rcnn is not None:
        from ..models.rcnn import detectron2_to_flax

        out["rcnn"] = detectron2_to_flax(_as_state_dict(rcnn), cfg.rcnn)
    return out


def published_config(
    cfg,
    *,
    tokenhmr: T.Union[str, T.Dict[str, "np.ndarray"], None] = None,
    dwpose: T.Union[str, T.Dict[str, "np.ndarray"], None] = None,
    yolox: T.Union[str, T.Dict[str, "np.ndarray"], None] = None,
    rcnn: T.Union[str, T.Dict[str, "np.ndarray"], None] = None,
):
    """Return ``cfg`` updated so each net with a checkpoint file uses its
    published geometry: ``yolox_l`` for the DWPose person detector and
    ``dwpose_l`` for the pose net — but only when the caller left those
    nets at their (lite) defaults, so an explicitly configured geometry
    (e.g. a distilled/small variant with a matching checkpoint) is
    respected; TokenClassfier geometry is shape-inferred from the head
    state_dict (`classifier_config_from_state_dict`); and
    ``mesh_detector="rcnn"`` is selected when an R-CNN file is given. The
    ViT-H and X101-FPN defaults are already the published geometry."""
    import dataclasses

    if yolox is not None:
        from ..models.detector import DetectorConfig

        if cfg.det == DetectorConfig():
            cfg = dataclasses.replace(cfg, det=DetectorConfig.yolox_l())
    if dwpose is not None:
        from ..models.pose2d import PoseNetConfig

        if cfg.pose == PoseNetConfig():
            cfg = dataclasses.replace(cfg, pose=PoseNetConfig.dwpose_l())
    if tokenhmr is not None:
        from ..models.smpl_head import classifier_config_from_state_dict

        sd = _as_state_dict(tokenhmr)
        head_sd = sub_state_dict(sd, "smpl_head.")
        cfg = dataclasses.replace(
            cfg, head=classifier_config_from_state_dict(head_sd, cfg.head)
        )
    if rcnn is not None and cfg.mesh_detector != "rcnn":
        cfg = dataclasses.replace(cfg, mesh_detector="rcnn")
    return cfg
