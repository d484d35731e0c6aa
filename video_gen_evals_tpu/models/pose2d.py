"""DWPose-equivalent whole-body 2D pose estimation, batched and fixed-shape.

Capability parity with the reference's vendored DWPose stack (C28-C29 in
SURVEY.md): a top-down SimCC pose network over person crops plus the exact
post-processing semantics of ``modifications/dwpose_init.py`` and
``modifications/process_video.py``:

- 133 COCO-wholebody keypoints -> openpose-style 134 (neck inserted, body
  reordered) exactly as DWPose's ``Wholebody`` conversion;
- coordinates normalized by (W, H); visibility < 0.3 -> -1 sentinel
  (ref ``dwpose_init.py:42-57``);
- split body[0:18] / foot[18:24] / face[24:92] / hands[92:113]+[113:134]
  (ref ``dwpose_init.py:59-64``);
- the 120-d per-frame flatten (18 body + 2x21 hand x/y) with the
  "first person, >= 18 body kps, both hands" validity rule
  (ref ``process_video.py:23-57``) — realized as a fixed-shape mask instead
  of frame dropping (SURVEY §7.1: masks replace data-dependent shapes; the
  reference's silent frame-drop misalignment quirk becomes explicit).

The network itself (``SimCCPoseNet``) is an RTMPose-style architecture:
conv backbone -> per-keypoint SimCC x/y classification bins -> soft-argmax
decode. Weight conversion from the reference's ONNX graphs requires the
external model files (not shipped with the reference repo); the architecture
and all post-processing are exact, and the post-processing is unit-tested
against the reference rules.
"""

from __future__ import annotations

import dataclasses
import typing as T

import jax
import jax.numpy as jnp
from flax import linen as nn

NUM_WHOLEBODY_KPTS = 133    # COCO-wholebody
NUM_OPENPOSE_KPTS = 134     # after neck insertion

# mmpose -> openpose body reordering (public DWPose Wholebody conversion)
_MMPOSE_IDX = (17, 6, 8, 10, 7, 9, 12, 14, 16, 13, 15, 2, 1, 4, 3)
_OPENPOSE_IDX = (1, 2, 3, 4, 6, 7, 8, 9, 10, 12, 13, 14, 15, 16, 17)


@dataclasses.dataclass(frozen=True)
class PoseNetConfig:
    input_hw: T.Tuple[int, int] = (256, 192)
    num_keypoints: int = NUM_WHOLEBODY_KPTS
    widths: T.Tuple[int, ...] = (32, 64, 128, 256)
    simcc_ratio: float = 2.0
    feat_dim: int = 256


class ConvBNAct(nn.Module):
    features: int
    stride: int = 1
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            use_bias=False,
        )(x)
        x = nn.LayerNorm(epsilon=1e-5)(x)  # static-shape friendly norm
        return jax.nn.silu(x)


class CSPStage(nn.Module):
    """Compact CSP-style stage: split, residual bottlenecks, merge."""

    features: int
    n_blocks: int = 2

    @nn.compact
    def __call__(self, x):
        half = self.features // 2
        a = ConvBNAct(half, kernel=1)(x)
        b = ConvBNAct(half, kernel=1)(x)
        for _ in range(self.n_blocks):
            r = b
            b = ConvBNAct(half)(b)
            b = ConvBNAct(half)(b)
            b = b + r
        return ConvBNAct(self.features, kernel=1)(jnp.concatenate([a, b], axis=-1))


class SimCCPoseNet(nn.Module):
    """RTMPose-style top-down pose net with SimCC x/y classification heads."""

    config: PoseNetConfig

    @nn.compact
    def __call__(self, crops: jnp.ndarray) -> T.Tuple[jnp.ndarray, jnp.ndarray]:
        """``crops``: [B, H, W, 3] normalized -> (keypoints_xy [B, K, 2] in
        crop pixel coords, scores [B, K])."""
        cfg = self.config
        H, W = cfg.input_hw
        x = ConvBNAct(cfg.widths[0], stride=2)(crops)
        for w_ch in cfg.widths[1:]:
            x = ConvBNAct(w_ch, stride=2)(x)
            x = CSPStage(w_ch)(x)
        # final conv features [B, h, w, C]
        x = ConvBNAct(cfg.feat_dim, kernel=1)(x)
        B, h, w, C = x.shape

        K = cfg.num_keypoints
        nx = int(W * cfg.simcc_ratio)
        ny = int(H * cfg.simcc_ratio)
        gap = x.mean(axis=(1, 2))  # [B, C]
        kp_feat = nn.Dense(K * 64, name="kp_proj")(gap).reshape(B, K, 64)
        x_logits = nn.Dense(nx, name="simcc_x")(kp_feat)   # [B, K, nx]
        y_logits = nn.Dense(ny, name="simcc_y")(kp_feat)   # [B, K, ny]

        px = jax.nn.softmax(x_logits, axis=-1)
        py = jax.nn.softmax(y_logits, axis=-1)
        xs = jnp.sum(px * jnp.arange(nx, dtype=px.dtype), axis=-1) / cfg.simcc_ratio
        ys = jnp.sum(py * jnp.arange(ny, dtype=py.dtype), axis=-1) / cfg.simcc_ratio
        scores = jnp.minimum(jnp.max(px, axis=-1), jnp.max(py, axis=-1)) * 8.0
        return jnp.stack([xs, ys], axis=-1), jnp.clip(scores, 0.0, 1.0)


def wholebody_to_openpose(
    kpts: jnp.ndarray,    # [P, 133, 2]
    scores: jnp.ndarray,  # [P, 133]
) -> T.Tuple[jnp.ndarray, jnp.ndarray]:
    """COCO-wholebody -> openpose layout: insert neck (mean of shoulders,
    visible iff both shoulders > 0.3) at index 17, then reorder the body
    block (DWPose Wholebody conversion)."""
    neck_xy = (kpts[:, 5] + kpts[:, 6]) / 2.0
    neck_sc = jnp.where(
        jnp.logical_and(scores[:, 5] > 0.3, scores[:, 6] > 0.3),
        jnp.minimum(scores[:, 5], scores[:, 6]),
        0.0,
    )
    kpts134 = jnp.concatenate(
        [kpts[:, :17], neck_xy[:, None], kpts[:, 17:]], axis=1
    )
    sc134 = jnp.concatenate([scores[:, :17], neck_sc[:, None], scores[:, 17:]], axis=1)
    mm = jnp.asarray(_MMPOSE_IDX)
    op = jnp.asarray(_OPENPOSE_IDX)
    kpts134 = kpts134.at[:, op].set(kpts134[:, mm])
    sc134 = sc134.at[:, op].set(sc134[:, mm])
    return kpts134, sc134


def dwpose_postprocess(
    kpts134: jnp.ndarray,   # [P, 134, 2] pixel coords in the ORIGINAL frame
    scores: jnp.ndarray,    # [P, 134]
    frame_wh: T.Tuple[jnp.ndarray, jnp.ndarray],
    vis_thresh: float = 0.3,
) -> T.Dict[str, jnp.ndarray]:
    """Exact ``dwpose_init.py`` semantics: normalize by (W, H), mask
    sub-threshold keypoints to -1, split into body/foot/face/hands."""
    W, H = frame_wh
    cand = kpts134 / jnp.stack([W, H]).astype(kpts134.dtype)
    visible = scores > vis_thresh
    cand = jnp.where(visible[..., None], cand, -1.0)
    hands = jnp.concatenate([cand[:, 92:113], cand[:, 113:134]], axis=0)
    return {
        "candidate": cand,                 # [P, 134, 2]
        "body": cand[:, :18],              # [P, 18, 2]
        "foot": cand[:, 18:24],
        "faces": cand[:, 24:92],
        "hands": hands,                    # [2P, 21, 2]
        "visible": visible,
        "raw_score": scores[:, :18],
    }


def flatten_first_person(
    post: T.Dict[str, jnp.ndarray]
) -> T.Tuple[jnp.ndarray, jnp.ndarray]:
    """The reference's 120-d flatten + validity rule
    (ref ``process_video.py:23-57``), fixed-shape:

    valid iff the first person has >= 18 body keypoints available and both
    hands present. Returns (kp120 [120], valid bool). With masks instead of
    frame dropping, the caller decides whether to keep reference bug-compat
    (drop frames) or aligned fixed-length output.
    """
    body = post["body"][0]            # [18, 2]
    n_person = post["body"].shape[0]
    lhand = post["hands"][0]          # [21, 2]
    rhand = post["hands"][n_person]   # person 0's second hand block
    kp120 = jnp.concatenate(
        [body.reshape(-1), lhand.reshape(-1), rhand.reshape(-1)]
    )
    body_ok = jnp.all(post["visible"][0, :18])
    lhand_ok = jnp.any(post["visible"][0, 92:113])
    rhand_ok = jnp.any(post["visible"][0, 113:134])
    return kp120, jnp.logical_and(body_ok, jnp.logical_and(lhand_ok, rhand_ok))
