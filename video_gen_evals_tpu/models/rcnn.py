"""Faster R-CNN X101-32x8d-FPN — the reference's mesh-path person detector.

The reference builds detectron2's ``COCO-Detection/faster_rcnn_X_101_32x8d_
FPN_3x`` DefaultPredictor and filters its outputs per frame (ref
``modifications/mesh_generator.py:69-74`` config + ``:82-91/:103-111`` the
``pred_classes == 0 & scores > 0.5``, exactly-one-box rule). PARITY.md's
box-sensitivity study shows AC/TC scores are NOT robust to detector-box
provenance (±1% box jitter → 2-6e-2 score drift), so reference-checkpoint
parity requires THIS detector family for the mesh crops — the YOLOX path
(`models/detector.py`) remains the DWPose keypoint-branch detector, which is
its own provenance.

TPU-first design (vs detectron2's per-frame Python predictor):

- whole frame stacks run as ONE jitted batched forward; every stage is
  static-shape (fixed canvas, per-level top-k, masked NMS via ``fori_loop``
  batched over frames x levels so the sequential suppression amortizes);
- ROIAlignV2 is the separable-matmul window formulation
  (`ops/roi_align.py`), not a gather;
- FrozenBN folds into inference affine params (``BatchNormInference``);
- the published checkpoint layout converts 1:1 via
  :func:`detectron2_to_flax`, replica-tested in ``tests/test_rcnn.py``.

Architecture constants follow the published config: ResNeXt-101 32x8d
(blocks 3/4/23/3, ``stride_in_1x1=False``), FPN-256 with LastLevelMaxPool
p6, RPN (1k pre/post-NMS test proposals, IoU 0.7), box head 2x FC-1024 with
class-specific deltas (weights 10,10,5,5), test score 0.05 (the reference
overrides to 0.25), class-wise NMS 0.5, 100 detections.
"""

from __future__ import annotations

import dataclasses
import typing as T

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .pose2d import BatchNormInference
from ..ops.roi_align import assign_fpn_levels, pack_pyramid, roi_align_pyramid


@dataclasses.dataclass(frozen=True)
class RCNNConfig:
    stage_blocks: T.Tuple[int, ...] = (3, 4, 23, 3)
    groups: int = 32
    width_per_group: int = 8
    stem_channels: int = 64
    stage_out: T.Tuple[int, ...] = (256, 512, 1024, 2048)
    stride_in_1x1: bool = False
    # grouped-conv lowering: "block_diag" runs each grouped 3x3 as one full
    # conv with a zero-filled block-diagonal kernel — the backbone-only probe
    # measured an identical-shape groups=1 conv 2.1x faster than XLA's native
    # feature_group_count=32 lowering despite 9x nominal conv2 FLOPs, and the
    # full detect stage measures 561->421 ms/8 frames at `default` precision
    # (797->669 at `high`) on v5e-1 (BENCH_NOTES round 3); bit-equal results,
    # identical param tree. "native" keeps the grouped conv.
    grouped_conv_impl: str = "block_diag"
    # block_diag dense-block channel width: 0 = merge all groups into one
    # full conv; w = super-group blocks of w lanes (executed-FLOP expansion
    # w/cg instead of G). 128 — one MXU lane tile — measured fastest at
    # EVERY res-stage geometry (res4 6.4 vs 13.9 ms full / 10.7 native per
    # conv, 8 canvases; probe_rcnn_levers, BENCH_NOTES round 3).
    grouped_conv_width: int = 128
    fpn_channels: int = 256
    # RPN (test-time settings of the published config)
    anchor_sizes: T.Tuple[float, ...] = (32.0, 64.0, 128.0, 256.0, 512.0)
    anchor_ratios: T.Tuple[float, ...] = (0.5, 1.0, 2.0)
    rpn_pre_nms_topk: int = 1000
    rpn_post_nms_topk: int = 1000
    rpn_nms_thresh: float = 0.7
    # ROI heads
    roi_resolution: int = 7
    fc_dim: int = 1024
    num_classes: int = 80
    box_reg_weights: T.Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0)
    test_score_thresh: float = 0.25   # the reference's override (d2 default .05)
    test_nms_thresh: float = 0.5
    detections_per_image: int = 100
    # DefaultPredictor test-time resize (d2 INPUT.MIN_SIZE_TEST/MAX_SIZE_TEST)
    min_size_test: int = 800
    max_size_test: int = 1333
    # static-shape knobs (TPU): candidate cap for the class-wise NMS stage
    second_stage_candidates: int = 1000
    roi_window: int = 48
    roi_chunk: int = 128
    # ROIAlign pool implementation: "matmul" = XLA separable-dot form;
    # "dma" = Pallas burst-DMA + single-GEMM form (ops/roi_align.py::
    # roi_align_pyramid_dma) — identical _axis_weights math, restructured
    # to kill the M=7/K=48 MXU tile padding that dominates the pool's cost.
    # "auto" (default) = dma on TPU (measured 64 vs 175 ms per 8x1000 f32
    # ROIs; full exact detect stage 29.9 vs 18.4 frames/s — BENCH_NOTES
    # round 4; on-chip agreement 4.8e-7 for every in-span ROI), matmul
    # elsewhere (the Pallas kernel needs the Mosaic backend).
    roi_impl: str = "auto"
    roi_rois_per_step: int = 1
    # packed-pyramid buffer dtype for ROIAlign: the pool is slice-traffic
    # bound (probe_rcnn_levers: f32 175 ms -> bf16 106 ms /8 frames), but
    # bf16 perturbs pooled features ~4e-3 relative — exact f32 stays the
    # parity default; the fast() preset opts in.
    roi_dtype: str = "float32"

    @property
    def strides(self) -> T.Tuple[int, ...]:
        return (4, 8, 16, 32, 64)  # p2..p6

    @classmethod
    def x101_32x8d(cls) -> "RCNNConfig":
        return cls()

    @classmethod
    def fast(cls) -> "RCNNConfig":
        """Measured fast mode (probe_rcnn_levers, BENCH_NOTES round 3):
        bf16 ROIAlign pyramid + window 32. NOT parity-exact — bf16 pooled
        features carry ~4e-3 relative noise and tap spans beyond 32 cells
        (tall/wide boxes at worst-in-level size) clamp to the window edge —
        use for throughput-first runs; the default config stays exact."""
        return cls(roi_dtype="bfloat16", roi_window=32)

    @classmethod
    def small(cls) -> "RCNNConfig":
        """Tiny geometry for replica tests."""
        return cls(
            stage_blocks=(1, 1, 1, 1),
            groups=2,
            width_per_group=4,
            stem_channels=8,
            stage_out=(16, 32, 64, 128),
            fpn_channels=16,
            fc_dim=32,
            rpn_pre_nms_topk=64,
            rpn_post_nms_topk=32,
            min_size_test=48,
            max_size_test=80,
            second_stage_candidates=64,
            roi_chunk=16,
        )


class _GroupedConvBlockDiag(nn.Module):
    """Grouped conv executed as a wider conv with a block-diagonal kernel.

    XLA:TPU lowers ``feature_group_count=32`` convs with 8-channel groups far
    off the MXU's happy path (the ResNeXt small-group pathology — measured
    2.1x on the backbone-only probe at ``default`` precision, 311 vs 148 ms
    for 8 canvases); zero-filling the grouped kernel into wider dense blocks
    trades nominal FLOPs for full 128-lane MXU tiles. Mathematically
    identical (the off-block products are exact zeros); the parameter keeps
    the NATIVE grouped shape ``[kh, kw, Cin/G, Cout]`` so checkpoints and
    the converter are impl-agnostic.

    ``width`` picks the dense-block channel width: 0 merges ALL groups into
    one full conv (executed-FLOP expansion = G); width w merges ``w/cg``
    groups into each dense block, running as ``feature_group_count = G*cg/w``
    — expansion only ``w/cg``, while each block still fills ``w`` MXU lanes
    (the round-3 super-group probe measured the sweet spot per stage; see
    BENCH_NOTES)."""

    features: int
    kernel: int
    stride: int
    groups: int
    width: int = 0

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        G = self.groups
        cg = cin // G
        cog = self.features // G
        k = self.kernel
        kern = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, cg, self.features),
        )
        m = G if self.width <= 0 else max(min(self.width // cg, G), 1)
        if G % m != 0:
            raise ValueError(
                f"grouped_conv_width {self.width} merges {m} of {G} groups "
                f"per dense block, but {m} does not divide {G} — pick a "
                f"width whose group count (width // {cg}) divides the "
                "stage's group count"
            )
        Gp = G // m
        w = kern.reshape(k, k, cg, Gp, m, cog)
        eye = jnp.eye(m, dtype=kern.dtype)[None, None, :, None, None, :, None]
        full = (w[:, :, None] * eye).reshape(k, k, m * cg, self.features)
        p = (k - 1) // 2
        return jax.lax.conv_general_dilated(
            x, full.astype(x.dtype),
            (self.stride, self.stride),
            [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=Gp,
        )


class ConvFrozenBN(nn.Module):
    """detectron2 ``Conv2d(..., bias=False, norm=FrozenBatchNorm2d)``."""

    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    conv_impl: str = "native"   # "native" | "block_diag" (groups > 1 only)
    conv_width: int = 0         # block_diag dense-block width (0 = full)

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2
        if self.groups > 1 and self.conv_impl == "block_diag":
            x = _GroupedConvBlockDiag(
                self.features, self.kernel, self.stride, self.groups,
                width=self.conv_width, name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=[(p, p), (p, p)],
                feature_group_count=self.groups,
                use_bias=False,
                name="conv",
            )(x)
        return BatchNormInference(name="norm")(x)


class BottleneckX(nn.Module):
    """detectron2 ``BottleneckBlock`` (ResNeXt form: grouped 3x3, stride in
    conv2 when ``stride_in_1x1=False`` — the X101 config's setting)."""

    out_channels: int
    bottleneck_channels: int
    stride: int
    groups: int
    stride_in_1x1: bool
    has_shortcut: bool
    conv_impl: str = "native"
    conv_width: int = 0

    @nn.compact
    def __call__(self, x):
        s1, s2 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        y = ConvFrozenBN(self.bottleneck_channels, 1, s1, name="conv1")(x)
        y = jax.nn.relu(y)
        y = ConvFrozenBN(
            self.bottleneck_channels, 3, s2, groups=self.groups,
            conv_impl=self.conv_impl, conv_width=self.conv_width, name="conv2"
        )(y)
        y = jax.nn.relu(y)
        y = ConvFrozenBN(self.out_channels, 1, 1, name="conv3")(y)
        if self.has_shortcut:
            sc = ConvFrozenBN(self.out_channels, 1, self.stride, name="shortcut")(x)
        else:
            sc = x
        return jax.nn.relu(y + sc)


class ResNeXtFPN(nn.Module):
    """bottom-up ResNeXt + top-down FPN; returns (p2, p3, p4, p5, p6)."""

    config: RCNNConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = ConvFrozenBN(cfg.stem_channels, 7, 2, name="stem_conv1")(x)
        x = jax.nn.relu(x)
        # torch MaxPool2d(kernel=3, stride=2, padding=1): pad with -inf
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        res = []
        width = cfg.groups * cfg.width_per_group
        for si, (n, out_ch) in enumerate(zip(cfg.stage_blocks, cfg.stage_out)):
            bott = width * (2 ** si)
            for bi in range(n):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = BottleneckX(
                    out_ch, bott, stride, cfg.groups, cfg.stride_in_1x1,
                    has_shortcut=(bi == 0),
                    conv_impl=cfg.grouped_conv_impl,
                    conv_width=cfg.grouped_conv_width,
                    name=f"res{si + 2}_b{bi}",
                )(x)
            res.append(x)

        f = cfg.fpn_channels
        laterals = [
            nn.Conv(f, (1, 1), name=f"fpn_lateral{i + 2}")(r)
            for i, r in enumerate(res)
        ]
        # top-down: nearest 2x upsample + add (d2 F.interpolate nearest)
        outs = [None] * 4
        prev = laterals[3]
        outs[3] = prev
        for i in (2, 1, 0):
            B, H, W, C = prev.shape
            th, tw = laterals[i].shape[1], laterals[i].shape[2]
            up = jnp.broadcast_to(
                prev[:, :, None, :, None, :], (B, H, 2, W, 2, C)
            ).reshape(B, 2 * H, 2 * W, C)[:, :th, :tw]
            prev = laterals[i] + up
            outs[i] = prev
        ps = [
            nn.Conv(f, (3, 3), padding=[(1, 1), (1, 1)], name=f"fpn_output{i + 2}")(o)
            for i, o in enumerate(outs)
        ]
        # LastLevelMaxPool: stride-2 subsample of p5 (kernel 1)
        p6 = ps[3][:, ::2, ::2, :]
        return (*ps, p6)


class RPNHead(nn.Module):
    """shared 3x3 conv + 1x1 objectness / anchor-delta heads."""

    config: RCNNConfig

    @nn.compact
    def __call__(self, feats):
        A = len(self.config.anchor_ratios)
        conv = nn.Conv(self.config.fpn_channels, (3, 3),
                       padding=[(1, 1), (1, 1)], name="conv")
        obj = nn.Conv(A, (1, 1), name="objectness_logits")
        deltas = nn.Conv(A * 4, (1, 1), name="anchor_deltas")
        outs = []
        for f in feats:
            h = jax.nn.relu(conv(f))
            outs.append((obj(h), deltas(h)))
        return outs


# ---------------------------------------------------------------------------
# anchor generation / box coding / NMS (pure functions; numpy-oracle tested)

def cell_anchors(size: float, ratios: T.Sequence[float]) -> np.ndarray:
    """d2 ``generate_cell_anchors``: area-preserving ratios around (0, 0)."""
    out = []
    for r in ratios:
        w = float(np.sqrt(size * size / r))
        h = w * r
        out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(out, np.float32)


def level_anchors(
    hw: T.Tuple[int, int], stride: int, size: float, ratios: T.Sequence[float]
) -> np.ndarray:
    """[H*W*A, 4] anchors for one level, d2 order (row-major cells, then
    anchor index; offset 0 → centers at ``i*stride``)."""
    H, W = hw
    cell = cell_anchors(size, ratios)                      # [A, 4]
    sx = np.arange(W, dtype=np.float32) * stride
    sy = np.arange(H, dtype=np.float32) * stride
    shift = np.stack(
        [*np.meshgrid(sx, sy), *np.meshgrid(sx, sy)], axis=-1
    ).reshape(H * W, 1, 4)                                  # (x, y, x, y)
    return (shift + cell[None]).reshape(-1, 4)


def apply_deltas(
    deltas: jnp.ndarray,   # [..., 4]
    boxes: jnp.ndarray,    # [..., 4] xyxy
    weights: T.Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """d2 ``Box2BoxTransform.apply_deltas`` (dw/dh clamped at log(1000/16))."""
    wx, wy, ww, wh = weights
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    scale_clamp = float(np.log(1000.0 / 16.0))
    dx, dy = deltas[..., 0] / wx, deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, scale_clamp)
    dh = jnp.minimum(deltas[..., 3] / wh, scale_clamp)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = jnp.exp(dw) * w
    ph = jnp.exp(dh) * h
    return jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph],
        axis=-1,
    )


def clip_boxes(boxes: jnp.ndarray, hw: T.Tuple) -> jnp.ndarray:
    h, w = hw
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, w),
            jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w),
            jnp.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )


def nms_masked(
    boxes: jnp.ndarray,   # [N, 4] score-DESC-sorted candidates
    valid: jnp.ndarray,   # [N] bool
    iou_thresh: float,
) -> jnp.ndarray:
    """Exact greedy NMS keep-mask over pre-sorted candidates. Sequential by
    definition; batch via ``vmap`` so the ``fori_loop`` amortizes across
    frames/levels (BENCH_NOTES: per-step cost is loop overhead, not FLOPs)."""
    n = boxes.shape[0]
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)

    def body(i, keep):
        suppress = (iou[i] > iou_thresh) & (jnp.arange(n) > i) & keep[i]
        return keep & ~suppress

    return jax.lax.fori_loop(0, n, body, valid)


def _sort_desc(scores: jnp.ndarray, *arrays):
    order = jnp.argsort(-scores)
    return (scores[order], *[a[order] for a in arrays])


def rpn_proposals(
    rpn_outs,                       # [(obj [B,H,W,A], deltas [B,H,W,A*4])]
    anchors: T.Sequence[jnp.ndarray],
    image_hw: T.Tuple,              # true resized size (clip target)
    cfg: RCNNConfig,
) -> T.Tuple[jnp.ndarray, jnp.ndarray]:
    """d2 ``find_top_rpn_proposals`` (test mode): per-level top-k by logit,
    decode, clip, per-level NMS(0.7), cross-level top ``post_nms_topk``.

    Returns (proposals [B, K, 4], valid [B, K]).
    """
    k = cfg.rpn_pre_nms_topk
    B = rpn_outs[0][0].shape[0]
    lvl_scores, lvl_boxes, lvl_valid = [], [], []
    for (obj, deltas), anc in zip(rpn_outs, anchors):
        logits = obj.reshape(B, -1)                         # [B, HWA]
        d = deltas.reshape(B, -1, 4)  # [B, HWA, 4], HWA major order
        n = logits.shape[1]
        kk = min(k, n)
        top, idx = jax.lax.top_k(logits, kk)
        db = jnp.take_along_axis(d, idx[..., None], axis=1)
        ab = anc[idx]
        boxes = clip_boxes(apply_deltas(db, ab), image_hw)
        w = boxes[..., 2] - boxes[..., 0]
        h = boxes[..., 3] - boxes[..., 1]
        ok = (w > 0) & (h > 0) & jnp.isfinite(top)
        pad = k - kk
        if pad:
            top = jnp.pad(top, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
            ok = jnp.pad(ok, ((0, 0), (0, pad)))
        lvl_scores.append(top)
        lvl_boxes.append(boxes)
        lvl_valid.append(ok)
    L = len(lvl_scores)
    scores = jnp.stack(lvl_scores, 1).reshape(B * L, k)
    boxes = jnp.stack(lvl_boxes, 1).reshape(B * L, k, 4)
    valid = jnp.stack(lvl_valid, 1).reshape(B * L, k)
    keep = jax.vmap(lambda b, v: nms_masked(b, v, cfg.rpn_nms_thresh))(
        boxes, valid
    )
    scores = jnp.where(keep, scores, -jnp.inf).reshape(B, L * k)
    boxes = boxes.reshape(B, L * k, 4)
    kk = min(cfg.rpn_post_nms_topk, L * k)
    top, idx = jax.lax.top_k(scores, kk)
    out_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    return out_boxes, jnp.isfinite(top)


def fast_rcnn_postprocess(
    cls_logits: jnp.ndarray,   # [B, K, C+1]
    box_deltas: jnp.ndarray,   # [B, K, C*4]
    proposals: jnp.ndarray,    # [B, K, 4]
    prop_valid: jnp.ndarray,   # [B, K]
    image_hw: T.Tuple,
    cfg: RCNNConfig,
) -> T.Dict[str, jnp.ndarray]:
    """d2 ``fast_rcnn_inference``: per-class deltas + clip, score thresh,
    class-wise NMS(0.5), top ``detections_per_image`` — static shapes via a
    ``second_stage_candidates`` score-ranked cap."""
    B, K, C1 = cls_logits.shape
    C = C1 - 1
    scores = jax.nn.softmax(cls_logits, axis=-1)[..., :C]          # [B, K, C]
    deltas = box_deltas.reshape(B, K, C, 4)
    boxes = apply_deltas(deltas, proposals[:, :, None, :], cfg.box_reg_weights)
    boxes = clip_boxes(boxes, image_hw)                            # [B, K, C, 4]
    passed = (scores > cfg.test_score_thresh) & prop_valid[..., None]
    flat_scores = jnp.where(passed, scores, -jnp.inf).reshape(B, K * C)
    flat_boxes = boxes.reshape(B, K * C, 4)
    flat_cls = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[None, None, :], (B, K, C)
    ).reshape(B, K * C)
    M = min(cfg.second_stage_candidates, K * C)
    top, idx = jax.lax.top_k(flat_scores, M)
    cand_boxes = jnp.take_along_axis(flat_boxes, idx[..., None], axis=1)
    cand_cls = jnp.take_along_axis(flat_cls, idx, axis=1)
    cand_valid = jnp.isfinite(top)
    # batched_nms trick: offset boxes per class so NMS never crosses classes
    span = max(float(image_hw[0]), float(image_hw[1])) + 2.0
    off = cand_cls.astype(jnp.float32)[..., None] * span
    keep = jax.vmap(lambda b, v: nms_masked(b, v, cfg.test_nms_thresh))(
        cand_boxes + off, cand_valid
    )
    kept_scores = jnp.where(keep, top, -jnp.inf)
    D = min(cfg.detections_per_image, M)
    fs, fb, fc = jax.vmap(lambda s, b, c: _sort_desc(s, b, c))(
        kept_scores, cand_boxes, cand_cls
    )
    return {
        "boxes": fb[:, :D],
        "scores": jnp.where(jnp.isfinite(fs[:, :D]), fs[:, :D], 0.0),
        "classes": fc[:, :D],
        "valid": jnp.isfinite(fs[:, :D]),
    }


class FasterRCNN(nn.Module):
    """Full batched test-time Faster R-CNN: normalized BGR canvas in,
    (boxes, scores, classes, valid) out — one jittable program."""

    config: RCNNConfig

    def setup(self):
        self.backbone = ResNeXtFPN(self.config, name="backbone")
        self.rpn = RPNHead(self.config, name="rpn")
        cfg = self.config
        self.fc1 = nn.Dense(cfg.fc_dim, name="fc1")
        self.fc2 = nn.Dense(cfg.fc_dim, name="fc2")
        self.cls_score = nn.Dense(cfg.num_classes + 1, name="cls_score")
        self.bbox_pred = nn.Dense(cfg.num_classes * 4, name="bbox_pred")

    def _box_head(self, pooled: jnp.ndarray) -> T.Tuple[jnp.ndarray, jnp.ndarray]:
        """pooled [N, R, R, C] -> (cls_logits, deltas). torch flattens
        channel-first — converter permutes fc1 instead, so flatten (y,x,c)."""
        x = pooled.reshape(pooled.shape[0], -1)
        x = jax.nn.relu(self.fc1(x))
        x = jax.nn.relu(self.fc2(x))
        return self.cls_score(x), self.bbox_pred(x)

    def _pool(self, feats, proposals, levels=None):
        cfg = self.config
        if levels is None:
            levels = assign_fpn_levels(proposals.reshape(-1, 4)).reshape(
                proposals.shape[:2]
            )

        roi_dt = jnp.dtype(cfg.roi_dtype)

        roi_impl = cfg.roi_impl
        if roi_impl == "auto":
            roi_impl = "dma" if jax.default_backend() == "tpu" else "matmul"

        def one_image(args):
            fs, boxes, lv = args
            buf, offs, hw = pack_pyramid([f.astype(roi_dt) for f in fs])
            if roi_impl == "dma":
                from ..ops.roi_align import roi_align_pyramid_dma

                return roi_align_pyramid_dma(
                    buf, offs, hw, cfg.strides[:4], boxes, lv,
                    out_size=cfg.roi_resolution, window=cfg.roi_window,
                    rois_per_step=cfg.roi_rois_per_step,
                )
            return roi_align_pyramid(
                buf, offs, hw, cfg.strides[:4], boxes, lv,
                out_size=cfg.roi_resolution, window=cfg.roi_window,
                chunk=cfg.roi_chunk,
            )

        return jax.lax.map(one_image, (list(feats[:4]), proposals, levels))

    def __call__(
        self, images: jnp.ndarray, image_hw: T.Optional[T.Tuple] = None
    ) -> T.Dict[str, jnp.ndarray]:
        """``images``: [B, H, W, 3] BGR, pixel-mean-subtracted, zero-padded
        canvas (H, W divisible by 32). ``image_hw``: the true (unpadded)
        resized size used for box clipping — defaults to the canvas."""
        cfg = self.config
        hw = tuple(image_hw) if image_hw is not None else images.shape[1:3]
        feats = self.backbone(images)
        rpn_outs = self.rpn(feats)
        anchors = [
            jnp.asarray(
                level_anchors(
                    f.shape[1:3], cfg.strides[i], cfg.anchor_sizes[i],
                    cfg.anchor_ratios,
                )
            )
            for i, f in enumerate(feats)
        ]
        proposals, prop_valid = rpn_proposals(rpn_outs, anchors, hw, cfg)
        pooled = self._pool(feats, proposals)          # [B, K, R, R, C]
        B, K = pooled.shape[:2]
        cls_logits, deltas = self._box_head(
            pooled.reshape(B * K, *pooled.shape[2:])
        )
        return fast_rcnn_postprocess(
            cls_logits.reshape(B, K, -1),
            deltas.reshape(B, K, -1),
            proposals,
            prop_valid,
            hw,
            cfg,
        )

    # --- test/benchmark entry points -----------------------------------
    def init_all(self, images):
        """Cheap init surface: touches every parameter (backbone, RPN, box
        head) without tracing the proposal/NMS/pooling machinery — spatial
        dims don't shape any param, so a tiny canvas suffices."""
        feats = self.backbone(images)
        self.rpn(feats)
        cfg = self.config
        dummy = jnp.zeros(
            (1, cfg.roi_resolution, cfg.roi_resolution, cfg.fpn_channels)
        )
        return self._box_head(dummy)

    def backbone_features(self, images):
        return self.backbone(images)

    def rpn_raw(self, images):
        feats = self.backbone(images)
        return self.rpn(feats)

    def box_forward(self, images, boxes, levels):
        """Pool fixed per-image ``boxes`` [B, N, 4] at ``levels`` [B, N] and
        run the box head — replica-comparison surface that bypasses the
        proposal machinery. Pools via the same ``_pool`` as ``__call__`` so
        the comparison surface can never drift from the production path."""
        feats = self.backbone(images)
        pooled = self._pool(feats, boxes, levels)
        B, N = pooled.shape[:2]
        cls_logits, deltas = self._box_head(
            pooled.reshape(B * N, *pooled.shape[2:])
        )
        return cls_logits.reshape(B, N, -1), deltas.reshape(B, N, -1)


# ---------------------------------------------------------------------------
# preprocessing + detectron2 checkpoint conversion

def resize_shortest_edge(
    hw: T.Tuple[int, int], short: int = 800, max_size: int = 1333
) -> T.Tuple[int, int]:
    """d2 ``ResizeShortestEdge.get_output_shape`` incl. its +0.5 rounding."""
    h, w = hw
    scale = short / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    return int(h * scale + 0.5), int(w * scale + 0.5)


def pad_to_divisible(hw: T.Tuple[int, int], div: int = 32) -> T.Tuple[int, int]:
    h, w = hw
    return ((h + div - 1) // div * div, (w + div - 1) // div * div)


# BGR pixel means of the published config (PIXEL_STD = 1,1,1)
PIXEL_MEAN_BGR = np.array([103.530, 116.280, 123.675], np.float32)


def load_detectron2_pkl(path: str) -> T.Dict[str, np.ndarray]:
    """Load a detectron2 model-zoo ``.pkl`` checkpoint — a pickled
    ``{"model": {name: np.ndarray}, ...}`` of plain numpy arrays, so neither
    torch nor detectron2 is needed. Feed the result to
    :func:`detectron2_to_flax`."""
    import pickle

    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    model = data.get("model", data) if isinstance(data, dict) else data
    return {
        k: np.asarray(v)
        for k, v in model.items()
        if isinstance(v, np.ndarray)
    }


def detectron2_to_flax(sd: T.Dict[str, T.Any], cfg: RCNNConfig) -> T.Dict:
    """Map a detectron2 GeneralizedRCNN checkpoint (``backbone.bottom_up.*``
    ResNet/ResNeXt + ``backbone.fpn_*`` + ``proposal_generator.rpn_head.*``
    + ``roi_heads.*``; d2's ``.pkl`` model zoo files unpickle to exactly this
    ``{name: ndarray}`` dict) onto :class:`FasterRCNN`'s tree.

    Raises on any unconsumed model key (the TokenClassifier lesson —
    VERDICT r2 weak #1): silence would hide conversion gaps.
    """
    sd = dict(sd)
    consumed = set()

    def take(name):
        consumed.add(name)
        return np.asarray(sd[name])

    def conv(prefix):
        w = take(f"{prefix}.weight")          # [out, in/groups, kh, kw]
        out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
        if f"{prefix}.bias" in sd:
            out["bias"] = take(f"{prefix}.bias")
        return out

    def frozen_bn(prefix):
        return {
            "scale": take(f"{prefix}.weight"),
            "bias": take(f"{prefix}.bias"),
            "mean": take(f"{prefix}.running_mean"),
            "var": take(f"{prefix}.running_var"),
        }

    def conv_norm(prefix):
        return {"conv": conv(prefix), "norm": frozen_bn(f"{prefix}.norm")}

    def linear(prefix):
        return {
            "kernel": np.transpose(take(f"{prefix}.weight")),
            "bias": take(f"{prefix}.bias"),
        }

    bu = "backbone.bottom_up"
    backbone: T.Dict[str, T.Any] = {
        "stem_conv1": conv_norm(f"{bu}.stem.conv1"),
    }
    for si, n in enumerate(cfg.stage_blocks):
        for bi in range(n):
            p = f"{bu}.res{si + 2}.{bi}"
            block = {
                "conv1": conv_norm(f"{p}.conv1"),
                "conv2": conv_norm(f"{p}.conv2"),
                "conv3": conv_norm(f"{p}.conv3"),
            }
            if bi == 0:
                block["shortcut"] = conv_norm(f"{p}.shortcut")
            backbone[f"res{si + 2}_b{bi}"] = block
    for i in range(2, 6):
        backbone[f"fpn_lateral{i}"] = conv(f"backbone.fpn_lateral{i}")
        backbone[f"fpn_output{i}"] = conv(f"backbone.fpn_output{i}")

    rpn = {
        "conv": conv("proposal_generator.rpn_head.conv"),
        "objectness_logits": conv("proposal_generator.rpn_head.objectness_logits"),
        "anchor_deltas": conv("proposal_generator.rpn_head.anchor_deltas"),
    }

    # torch flattens pooled features channel-first; flax flattens (y, x, c):
    # permute fc1's input axes to match (same trick as the ViT patch embed).
    r, f = cfg.roi_resolution, cfg.fpn_channels
    fc1_w = take("roi_heads.box_head.fc1.weight")          # [fc, C*r*r]
    fc1_w = (
        fc1_w.reshape(cfg.fc_dim, f, r, r)
        .transpose(2, 3, 1, 0)
        .reshape(r * r * f, cfg.fc_dim)
    )
    params = {
        "backbone": backbone,
        "rpn": rpn,
        "fc1": {"kernel": fc1_w, "bias": take("roi_heads.box_head.fc1.bias")},
        "fc2": linear("roi_heads.box_head.fc2"),
        "cls_score": linear("roi_heads.box_predictor.cls_score"),
        "bbox_pred": linear("roi_heads.box_predictor.bbox_pred"),
    }

    buffer_keys = {
        k for k in sd
        if k in ("pixel_mean", "pixel_std")
        or k.startswith("proposal_generator.anchor_generator")
    }
    leftover = set(sd) - consumed - buffer_keys
    if leftover:
        raise ValueError(
            "detectron2_to_flax: unconsumed model keys "
            f"({len(leftover)}): {sorted(leftover)[:8]}..."
        )
    return params
