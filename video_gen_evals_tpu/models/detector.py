"""Person detection with pure-XLA NMS, batched over frame stacks.

Capability parity with the reference's person-detection stage and its usage
pattern (C26/SURVEY §2.2): per-frame person boxes with score thresholding,
followed by the single-person video filter (ref ``mesh_generator.py:103-117``:
keep a frame iff exactly ONE person box with class==person and score > 0.5;
reject the video if fewer than 80% of frames qualify).

TPU-first design: the reference calls its detector once per frame in a Python
loop (the #1 throughput sink per SURVEY §3.3); here the whole frame stack is
one batched forward, and NMS is expressed with ``lax`` primitives (top-k +
iterative IoU suppression) so it stays on device with static shapes.

The network is the PUBLISHED YOLOX architecture (Megvii layout: CSPDarknet
with Focus stem, YOLOPAFPN neck, decoupled heads; exact exp-wh/grid decode) —
the same detector DWPose's ONNX person-detection graph is exported from — so
the published yolox checkpoints convert 1:1 through :func:`yolox_to_flax`,
unit-tested against a torch replica (``tests/test_yolox.py``). Only the
checkpoint files themselves are absent from this image.
"""

from __future__ import annotations

import dataclasses
import typing as T

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .pose2d import BatchNormInference, ConvBN, SPPBottleneck


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """YOLOX hyperparameters: ``depth``/``width`` scale exactly as Megvii's
    ``yolox_base`` does; :meth:`yolox_l` is the layout of DWPose's detector."""

    input_hw: T.Tuple[int, int] = (416, 416)
    depth: float = 0.33
    width: float = 0.25
    strides: T.Tuple[int, ...] = (8, 16, 32)
    num_classes: int = 80
    max_detections: int = 16

    @property
    def base_channels(self) -> int:
        return int(64 * self.width)

    @property
    def base_depth(self) -> int:
        return max(round(3 * self.depth), 1)

    def ch(self, mult: int) -> int:
        return int(64 * mult * self.width)

    @classmethod
    def yolox_l(cls) -> "DetectorConfig":
        return cls(input_hw=(640, 640), depth=1.0, width=1.0)


class Bottleneck(nn.Module):
    """Megvii Bottleneck: 1x1 -> 3x3, optional residual."""

    features: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        y = ConvBN(self.features, kernel=1, name="conv1")(x)
        y = ConvBN(self.features, kernel=3, name="conv2")(y)
        return x + y if self.shortcut else y


class CSPLayerYX(nn.Module):
    """Megvii CSPLayer: conv1 -> n bottlenecks || conv2, concat, conv3."""

    features: int
    n_blocks: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        hidden = self.features // 2
        a = ConvBN(hidden, kernel=1, name="conv1")(x)
        for i in range(self.n_blocks):
            a = Bottleneck(hidden, self.shortcut, name=f"m{i}")(a)
        b = ConvBN(hidden, kernel=1, name="conv2")(x)
        return ConvBN(self.features, kernel=1, name="conv3")(
            jnp.concatenate([a, b], axis=-1)
        )


class Focus(nn.Module):
    """Space-to-depth stem: 2x2 patch split (TL, BL, TR, BR channel order —
    Megvii's exact concatenation order) + 3x3 conv."""

    features: int

    @nn.compact
    def __call__(self, x):
        tl = x[:, ::2, ::2, :]
        tr = x[:, ::2, 1::2, :]
        bl = x[:, 1::2, ::2, :]
        br = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([tl, bl, tr, br], axis=-1)
        return ConvBN(self.features, kernel=3, name="conv")(x)


class CSPDarknet(nn.Module):
    """YOLOX backbone; returns (dark3, dark4, dark5) features."""

    config: DetectorConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        base, bd = cfg.base_channels, cfg.base_depth
        x = Focus(base, name="stem")(x)                              # /2
        x = ConvBN(base * 2, stride=2, name="dark2_conv")(x)         # /4
        x = CSPLayerYX(base * 2, bd, name="dark2_csp")(x)
        x = ConvBN(base * 4, stride=2, name="dark3_conv")(x)         # /8
        x = d3 = CSPLayerYX(base * 4, bd * 3, name="dark3_csp")(x)
        x = ConvBN(base * 8, stride=2, name="dark4_conv")(x)         # /16
        x = d4 = CSPLayerYX(base * 8, bd * 3, name="dark4_csp")(x)
        x = ConvBN(base * 16, stride=2, name="dark5_conv")(x)        # /32
        x = SPPBottleneck(base * 16, name="dark5_spp")(x)
        d5 = CSPLayerYX(base * 16, bd, shortcut=False, name="dark5_csp")(x)
        return d3, d4, d5


def _upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x (torch nn.Upsample(scale_factor=2))."""
    B, H, W, C = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (B, H, 2, W, 2, C)
    ).reshape(B, 2 * H, 2 * W, C)


class YOLOPAFPN(nn.Module):
    """YOLOX neck: top-down FPN + bottom-up PAN over dark3/4/5."""

    config: DetectorConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        bd = cfg.base_depth
        c256, c512, c1024 = cfg.ch(4), cfg.ch(8), cfg.ch(16)
        x2, x1, x0 = CSPDarknet(cfg, name="backbone")(x)

        fpn_out0 = ConvBN(c512, kernel=1, name="lateral_conv0")(x0)
        f = jnp.concatenate([_upsample2(fpn_out0), x1], axis=-1)
        f_out0 = CSPLayerYX(c512, bd, shortcut=False, name="C3_p4")(f)

        fpn_out1 = ConvBN(c256, kernel=1, name="reduce_conv1")(f_out0)
        f = jnp.concatenate([_upsample2(fpn_out1), x2], axis=-1)
        pan_out2 = CSPLayerYX(c256, bd, shortcut=False, name="C3_p3")(f)   # /8

        p = ConvBN(c256, stride=2, name="bu_conv2")(pan_out2)
        f = jnp.concatenate([p, fpn_out1], axis=-1)
        pan_out1 = CSPLayerYX(c512, bd, shortcut=False, name="C3_n3")(f)   # /16

        p = ConvBN(c512, stride=2, name="bu_conv1")(pan_out1)
        f = jnp.concatenate([p, fpn_out0], axis=-1)
        pan_out0 = CSPLayerYX(c1024, bd, shortcut=False, name="C3_n4")(f)  # /32
        return pan_out2, pan_out1, pan_out0


class YOLOXDetector(nn.Module):
    """YOLOX: PAFPN + decoupled heads, Megvii inference decode."""

    config: DetectorConfig

    @nn.compact
    def __call__(self, frames: jnp.ndarray) -> T.Dict[str, jnp.ndarray]:
        """``frames``: [B, H, W, 3] -> raw predictions per location:
        boxes_xyxy [B, N, 4], obj [B, N], cls [B, N, C]."""
        cfg = self.config
        hidden = cfg.ch(4)
        feats = YOLOPAFPN(cfg, name="neck")(frames)

        all_boxes, all_obj, all_cls = [], [], []
        for i, (stride, f) in enumerate(zip(cfg.strides, feats)):
            h = ConvBN(hidden, kernel=1, name=f"stem{i}")(f)
            c = ConvBN(hidden, kernel=3, name=f"cls_conv{i}_0")(h)
            c = ConvBN(hidden, kernel=3, name=f"cls_conv{i}_1")(c)
            r = ConvBN(hidden, kernel=3, name=f"reg_conv{i}_0")(h)
            r = ConvBN(hidden, kernel=3, name=f"reg_conv{i}_1")(r)
            cls = nn.Conv(cfg.num_classes, (1, 1), name=f"cls_pred{i}")(c)
            reg = nn.Conv(4, (1, 1), name=f"reg_pred{i}")(r)
            obj = nn.Conv(1, (1, 1), name=f"obj_pred{i}")(r)

            B, fh, fw, _ = reg.shape
            gy = jnp.arange(fh, dtype=reg.dtype)[:, None]
            gx = jnp.arange(fw, dtype=reg.dtype)[None, :]
            # Megvii decode: center = (pred_xy + grid) * stride, wh = exp * stride
            px = (jnp.broadcast_to(gx, (fh, fw))[None] + reg[..., 0]) * stride
            py = (jnp.broadcast_to(gy, (fh, fw))[None] + reg[..., 1]) * stride
            pw = jnp.exp(jnp.clip(reg[..., 2], -8, 8)) * stride
            ph = jnp.exp(jnp.clip(reg[..., 3], -8, 8)) * stride
            boxes = jnp.stack(
                [px - pw / 2, py - ph / 2, px + pw / 2, py + ph / 2], axis=-1
            ).reshape(B, fh * fw, 4)
            all_boxes.append(boxes)
            all_obj.append(jax.nn.sigmoid(obj).reshape(B, fh * fw))
            all_cls.append(jax.nn.sigmoid(cls).reshape(B, fh * fw, cfg.num_classes))
        return {
            "boxes": jnp.concatenate(all_boxes, axis=1),
            "obj": jnp.concatenate(all_obj, axis=1),
            "cls": jnp.concatenate(all_cls, axis=1),
        }


# backwards-compatible alias (round-1 name)
YOLOXLiteDetector = YOLOXDetector


def yolox_to_flax(sd: T.Dict[str, T.Any], cfg: DetectorConfig) -> T.Dict:
    """Map a Megvii-layout YOLOX state_dict (``backbone.*`` = YOLOPAFPN with
    nested ``backbone.backbone.*`` CSPDarknet, ``head.*`` = YOLOXHead) onto
    :class:`YOLOXDetector`'s param tree. Works on ``{name: np.ndarray}``."""

    def conv(prefix):
        return {"kernel": np.transpose(np.asarray(sd[f"{prefix}.weight"]), (2, 3, 1, 0))}

    def bn(prefix):
        return {
            "scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
            "mean": np.asarray(sd[f"{prefix}.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.running_var"]),
        }

    def convbn(prefix):
        return {"conv": conv(f"{prefix}.conv"), "bn": bn(f"{prefix}.bn")}

    def pred(prefix):
        return {
            "kernel": np.transpose(np.asarray(sd[f"{prefix}.weight"]), (2, 3, 1, 0)),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
        }

    def csp(prefix):
        out = {
            "conv1": convbn(f"{prefix}.conv1"),
            "conv2": convbn(f"{prefix}.conv2"),
            "conv3": convbn(f"{prefix}.conv3"),
        }
        i = 0
        while f"{prefix}.m.{i}.conv1.conv.weight" in sd:
            out[f"m{i}"] = {
                "conv1": convbn(f"{prefix}.m.{i}.conv1"),
                "conv2": convbn(f"{prefix}.m.{i}.conv2"),
            }
            i += 1
        return out

    bb = "backbone.backbone"
    darknet: T.Dict[str, T.Any] = {
        "stem": {"conv": convbn(f"{bb}.stem.conv")},
        "dark2_conv": convbn(f"{bb}.dark2.0"),
        "dark2_csp": csp(f"{bb}.dark2.1"),
        "dark3_conv": convbn(f"{bb}.dark3.0"),
        "dark3_csp": csp(f"{bb}.dark3.1"),
        "dark4_conv": convbn(f"{bb}.dark4.0"),
        "dark4_csp": csp(f"{bb}.dark4.1"),
        "dark5_conv": convbn(f"{bb}.dark5.0"),
        "dark5_spp": {
            "conv1": convbn(f"{bb}.dark5.1.conv1"),
            "conv2": convbn(f"{bb}.dark5.1.conv2"),
        },
        "dark5_csp": csp(f"{bb}.dark5.2"),
    }
    neck: T.Dict[str, T.Any] = {
        "backbone": darknet,
        "lateral_conv0": convbn("backbone.lateral_conv0"),
        "C3_p4": csp("backbone.C3_p4"),
        "reduce_conv1": convbn("backbone.reduce_conv1"),
        "C3_p3": csp("backbone.C3_p3"),
        "bu_conv2": convbn("backbone.bu_conv2"),
        "C3_n3": csp("backbone.C3_n3"),
        "bu_conv1": convbn("backbone.bu_conv1"),
        "C3_n4": csp("backbone.C3_n4"),
    }
    params: T.Dict[str, T.Any] = {"neck": neck}
    for i in range(len(cfg.strides)):
        params[f"stem{i}"] = convbn(f"head.stems.{i}")
        for j in range(2):
            params[f"cls_conv{i}_{j}"] = convbn(f"head.cls_convs.{i}.{j}")
            params[f"reg_conv{i}_{j}"] = convbn(f"head.reg_convs.{i}.{j}")
        params[f"cls_pred{i}"] = pred(f"head.cls_preds.{i}")
        params[f"reg_pred{i}"] = pred(f"head.reg_preds.{i}")
        params[f"obj_pred{i}"] = pred(f"head.obj_preds.{i}")
    return params


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix [Na, Nb] for xyxy boxes."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_xla(
    boxes: jnp.ndarray,   # [N, 4]
    scores: jnp.ndarray,  # [N]
    iou_thresh: float = 0.5,
    max_out: int = 16,
) -> T.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static-shape NMS: top-k by score, greedy IoU suppression via fori_loop.

    Returns (boxes [max_out, 4], scores [max_out], keep_mask [max_out]);
    suppressed/padded slots have score 0 and keep False.
    """
    out_boxes, out_scores, out_keep, _ = nms_xla_indexed(
        boxes, scores, iou_thresh, max_out
    )
    return out_boxes, out_scores, out_keep


def nms_xla_indexed(
    boxes: jnp.ndarray,   # [N, 4]
    scores: jnp.ndarray,  # [N]
    iou_thresh: float = 0.5,
    max_out: int = 16,
) -> T.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """:func:`nms_xla` that also returns the ORIGINAL indices of the kept
    boxes — callers carrying per-box side data (class ids) gather with it."""
    k = min(max_out * 4, boxes.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[top_idx]
    iou = box_iou(top_boxes, top_boxes)

    def body(i, keep):
        # suppress j > i overlapping a kept i
        suppress = (iou[i] > iou_thresh) & (jnp.arange(k) > i) & keep[i]
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, k, body, top_scores > 0)
    # compact the kept entries to the front (stable by score order)
    order = jnp.argsort(~keep, stable=True)[:max_out]
    out_boxes = top_boxes[order]
    out_scores = jnp.where(keep[order], top_scores[order], 0.0)
    out_keep = keep[order]
    return out_boxes, out_scores, out_keep, top_idx[order]


def person_detections(
    raw: T.Dict[str, jnp.ndarray],
    score_thresh: float = 0.5,
    iou_thresh: float = 0.5,
    max_out: int = 16,
    person_class: int = 0,
) -> T.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched person filter + NMS: returns (boxes [B, max_out, 4],
    scores [B, max_out], valid [B, max_out])."""
    scores = raw["obj"] * raw["cls"][..., person_class]

    def one(b, s):
        bb, ss, kk = nms_xla(b, s, iou_thresh, max_out)
        ok = kk & (ss > score_thresh)
        return bb, ss, ok

    return jax.vmap(one)(raw["boxes"], scores)


def dwpose_person_detections(
    raw: T.Dict[str, jnp.ndarray],
    prefilter_thresh: float = 0.1,
    iou_thresh: float = 0.45,
    max_out: int = 16,
    person_class: int = 0,
) -> T.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """DWPose/Megvii onnxdet ``inference_detector`` postprocess, batched:
    per location class = argmax(obj * cls); candidates with score > 0.1 go
    through CLASS-AGNOSTIC NMS at IoU 0.45 (``multiclass_nms`` default).
    Returns (boxes [B, max_out, 4], scores [B, max_out], person [B,
    max_out]) in score-descending order (the published pipeline's box
    order — its "first person" is the best-scoring one); the caller
    applies its score rule (the published keypoint branch keeps
    ``score > 0.3``, the mesh single-person filter ``> 0.5``)."""
    cls_scores = raw["obj"][..., None] * raw["cls"]            # [B, N, C]
    best_cls = jnp.argmax(cls_scores, axis=-1)                 # [B, N]
    best_score = jnp.max(cls_scores, axis=-1)                  # [B, N]

    def one(boxes, scores, classes):
        s = jnp.where(scores > prefilter_thresh, scores, 0.0)
        bb, ss, kk, idx = nms_xla_indexed(boxes, s, iou_thresh, max_out)
        person = kk & (classes[idx] == person_class)
        return bb, ss, person

    return jax.vmap(one)(raw["boxes"], best_score, best_cls)


def single_person_mask(valid: jnp.ndarray) -> jnp.ndarray:
    """[B, max_out] validity -> [B] "exactly one person" mask
    (ref ``mesh_generator.py:103-111``)."""
    return jnp.sum(valid.astype(jnp.int32), axis=-1) == 1


def video_is_single_person(frame_mask: jnp.ndarray, min_ratio: float = 0.8) -> jnp.ndarray:
    """Video-level accept: >= ``min_ratio`` of frames are single-person
    (ref ``mesh_generator.py:113-117``)."""
    frac = jnp.mean(frame_mask.astype(jnp.float32))
    return frac >= min_ratio
