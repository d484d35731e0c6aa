"""Faster R-CNN X101-FPN: converter/forward parity vs a torch replica of the
detectron2 layout, plus numpy oracles for the proposal/NMS/postprocess math.

The replica follows detectron2's published module structure verbatim
(``GeneralizedRCNN``: ResNeXt bottom-up with FrozenBN, FPN laterals/outputs,
StandardRPNHead, FastRCNNConvFCHead + FastRCNNOutputLayers) with d2's
state-dict naming, so ``detectron2_to_flax`` is exercised against the real
checkpoint key layout (ref ``modifications/mesh_generator.py:69-74`` is
where the reference instantiates this model from the zoo).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from video_gen_evals_tpu.models.rcnn import (
    FasterRCNN,
    RCNNConfig,
    apply_deltas,
    cell_anchors,
    clip_boxes,
    detectron2_to_flax,
    fast_rcnn_postprocess,
    level_anchors,
    nms_masked,
    pad_to_divisible,
    resize_shortest_edge,
    rpn_proposals,
)
from video_gen_evals_tpu.ops.roi_align import (
    assign_fpn_levels,
    roi_align_reference,
)


# ---------------------------------------------------------------------------
# torch replica (detectron2 layout + naming)

class FrozenBN(tnn.Module):
    def __init__(self, c, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.register_buffer("weight", torch.ones(c))
        self.register_buffer("bias", torch.zeros(c))
        self.register_buffer("running_mean", torch.zeros(c))
        self.register_buffer("running_var", torch.ones(c))

    def forward(self, x):
        scale = self.weight * (self.running_var + self.eps).rsqrt()
        bias = self.bias - self.running_mean * scale
        return x * scale[None, :, None, None] + bias[None, :, None, None]


class D2Conv(tnn.Conv2d):
    """detectron2's Conv2d subclass carrying an attached ``.norm``."""

    def __init__(self, *a, norm=None, **kw):
        super().__init__(*a, **kw)
        self.norm = norm

    def forward(self, x):
        x = super().forward(x)
        return self.norm(x) if self.norm is not None else x


class TorchBottleneck(tnn.Module):
    def __init__(self, cin, cout, bott, stride, groups, stride_in_1x1):
        super().__init__()
        s1, s2 = (stride, 1) if stride_in_1x1 else (1, stride)
        self.conv1 = D2Conv(cin, bott, 1, s1, bias=False, norm=FrozenBN(bott))
        self.conv2 = D2Conv(
            bott, bott, 3, s2, 1, groups=groups, bias=False, norm=FrozenBN(bott)
        )
        self.conv3 = D2Conv(bott, cout, 1, bias=False, norm=FrozenBN(cout))
        if cin != cout or stride != 1:
            self.shortcut = D2Conv(cin, cout, 1, stride, bias=False, norm=FrozenBN(cout))
        else:
            self.shortcut = None

    def forward(self, x):
        y = F.relu(self.conv1(x))
        y = F.relu(self.conv2(y))
        y = self.conv3(y)
        sc = self.shortcut(x) if self.shortcut is not None else x
        return F.relu(y + sc)


class TorchRCNN(tnn.Module):
    """Network stages of d2's GeneralizedRCNN with its state-dict names."""

    def __init__(self, cfg: RCNNConfig):
        super().__init__()
        self.cfg = cfg
        backbone = tnn.Module()
        bottom_up = tnn.Module()
        stem = tnn.Module()
        stem.conv1 = D2Conv(
            3, cfg.stem_channels, 7, 2, 3, bias=False,
            norm=FrozenBN(cfg.stem_channels),
        )
        bottom_up.stem = stem
        width = cfg.groups * cfg.width_per_group
        cin = cfg.stem_channels
        for si, (n, cout) in enumerate(zip(cfg.stage_blocks, cfg.stage_out)):
            blocks = []
            for bi in range(n):
                stride = 2 if (si > 0 and bi == 0) else 1
                blocks.append(
                    TorchBottleneck(
                        cin, cout, width * (2 ** si), stride, cfg.groups,
                        cfg.stride_in_1x1,
                    )
                )
                cin = cout
            setattr(bottom_up, f"res{si + 2}", tnn.Sequential(*blocks))
        backbone.bottom_up = bottom_up
        for i, cout in enumerate(cfg.stage_out):
            setattr(backbone, f"fpn_lateral{i + 2}",
                    tnn.Conv2d(cout, cfg.fpn_channels, 1))
            setattr(backbone, f"fpn_output{i + 2}",
                    tnn.Conv2d(cfg.fpn_channels, cfg.fpn_channels, 3, padding=1))
        self.backbone = backbone

        pg = tnn.Module()
        head = tnn.Module()
        A = len(cfg.anchor_ratios)
        head.conv = tnn.Conv2d(cfg.fpn_channels, cfg.fpn_channels, 3, padding=1)
        head.objectness_logits = tnn.Conv2d(cfg.fpn_channels, A, 1)
        head.anchor_deltas = tnn.Conv2d(cfg.fpn_channels, A * 4, 1)
        pg.rpn_head = head
        self.proposal_generator = pg

        rh = tnn.Module()
        box_head = tnn.Module()
        in_dim = cfg.fpn_channels * cfg.roi_resolution ** 2
        box_head.fc1 = tnn.Linear(in_dim, cfg.fc_dim)
        box_head.fc2 = tnn.Linear(cfg.fc_dim, cfg.fc_dim)
        rh.box_head = box_head
        pred = tnn.Module()
        pred.cls_score = tnn.Linear(cfg.fc_dim, cfg.num_classes + 1)
        pred.bbox_pred = tnn.Linear(cfg.fc_dim, cfg.num_classes * 4)
        rh.box_predictor = pred
        self.roi_heads = rh

    def features(self, x):
        bu = self.backbone.bottom_up
        x = F.relu(bu.stem.conv1(x))
        x = F.max_pool2d(x, 3, 2, 1)
        res = []
        for si in range(len(self.cfg.stage_blocks)):
            x = getattr(bu, f"res{si + 2}")(x)
            res.append(x)
        lats = [
            getattr(self.backbone, f"fpn_lateral{i + 2}")(r)
            for i, r in enumerate(res)
        ]
        outs = [None] * 4
        prev = lats[3]
        outs[3] = prev
        for i in (2, 1, 0):
            prev = lats[i] + F.interpolate(prev, scale_factor=2, mode="nearest")
            outs[i] = prev
        ps = [
            getattr(self.backbone, f"fpn_output{i + 2}")(o)
            for i, o in enumerate(outs)
        ]
        ps.append(F.max_pool2d(ps[3], 1, 2))
        return ps

    def rpn(self, feats):
        h = self.proposal_generator.rpn_head
        outs = []
        for f in feats:
            t = F.relu(h.conv(f))
            outs.append((h.objectness_logits(t), h.anchor_deltas(t)))
        return outs

    def forward(self, x):
        return self.rpn(self.features(x))

    def box_head_forward(self, pooled_cf):
        """pooled_cf: [N, C, r, r] channel-first (torch flatten order)."""
        x = pooled_cf.flatten(1)
        x = F.relu(self.roi_heads.box_head.fc1(x))
        x = F.relu(self.roi_heads.box_head.fc2(x))
        return (
            self.roi_heads.box_predictor.cls_score(x),
            self.roi_heads.box_predictor.bbox_pred(x),
        )


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
        else:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
    model.load_state_dict(sd)
    return model


@pytest.fixture(scope="module")
def small_pair():
    cfg = RCNNConfig.small()
    ref = _randomize(TorchRCNN(cfg)).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = detectron2_to_flax(sd, cfg)
    return cfg, ref, params


def _canvas(seed=0, b=2, hw=(64, 96)):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, *hw, 3)).astype(np.float32)


def test_backbone_fpn_matches_torch(small_pair):
    cfg, ref, params = small_pair
    x = _canvas()
    model = FasterRCNN(cfg)
    got = model.apply({"params": params}, jnp.asarray(x),
                      method=model.backbone_features)
    with torch.no_grad():
        want = ref.features(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for i, (g, w) in enumerate(zip(got, want)):
        w = w.numpy().transpose(0, 2, 3, 1)
        assert np.abs(np.asarray(g) - w).max() < 1e-4, f"level p{i + 2}"


def test_rpn_head_matches_torch(small_pair):
    cfg, ref, params = small_pair
    x = _canvas(1)
    model = FasterRCNN(cfg)
    got = model.apply({"params": params}, jnp.asarray(x), method=model.rpn_raw)
    with torch.no_grad():
        want = ref.rpn(ref.features(torch.from_numpy(x.transpose(0, 3, 1, 2))))
    for i, ((go, gd), (wo, wd)) in enumerate(zip(got, want)):
        assert np.abs(np.asarray(go) - wo.numpy().transpose(0, 2, 3, 1)).max() < 1e-4
        assert np.abs(np.asarray(gd) - wd.numpy().transpose(0, 2, 3, 1)).max() < 1e-4


def test_box_head_matches_torch_on_fixed_rois(small_pair):
    """Flax pool+head vs torch head on oracle-pooled features: covers the
    fc1 channel-order permutation and the class-major bbox_pred layout."""
    cfg, ref, params = small_pair
    x = _canvas(2, b=1)
    boxes = np.array(
        [[[4, 4, 40, 60], [10, 20, 90, 50], [0, 0, 96, 64], [30, 10, 34, 18]]],
        np.float32,
    )
    levels = np.asarray(assign_fpn_levels(jnp.asarray(boxes[0])))[None]
    model = FasterRCNN(cfg)
    g_cls, g_del = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(boxes),
        jnp.asarray(levels), method=model.box_forward,
    )
    with torch.no_grad():
        feats = ref.features(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        pooled = np.stack(
            [
                roi_align_reference(
                    feats[levels[0, i]][0].numpy().transpose(1, 2, 0),
                    boxes[0, i : i + 1],
                    cfg.strides[levels[0, i]],
                    out_size=cfg.roi_resolution,
                )[0]
                for i in range(boxes.shape[1])
            ]
        )
        w_cls, w_del = ref.box_head_forward(
            torch.from_numpy(pooled.transpose(0, 3, 1, 2))
        )
    assert np.abs(np.asarray(g_cls)[0] - w_cls.numpy()).max() < 1e-3
    assert np.abs(np.asarray(g_del)[0] - w_del.numpy()).max() < 1e-3


# ---------------------------------------------------------------------------
# numpy oracles for the box/proposal math

def _np_apply_deltas(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    wx, wy, ww, wh = weights
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    clamp = np.log(1000.0 / 16.0)
    dx, dy = deltas[..., 0] / wx, deltas[..., 1] / wy
    dw = np.minimum(deltas[..., 2] / ww, clamp)
    dh = np.minimum(deltas[..., 3] / wh, clamp)
    pcx, pcy = dx * w + cx, dy * h + cy
    pw, ph = np.exp(dw) * w, np.exp(dh) * h
    return np.stack(
        [pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2], -1
    )


def _np_iou(a, b):
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)


def _np_greedy_nms(boxes, scores, thresh):
    """torchvision-style greedy NMS on score-sorted candidates -> kept idx."""
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        ious = _np_iou(boxes[i : i + 1], boxes[order[1:]])[0]
        order = order[1:][ious <= thresh]
    return np.asarray(keep, np.int64)


def test_apply_deltas_and_clip_match_numpy():
    rng = np.random.default_rng(0)
    boxes = rng.uniform(0, 80, (32, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(1, 40, (32, 2))
    deltas = rng.standard_normal((32, 4)).astype(np.float32) * 2
    got = np.asarray(apply_deltas(jnp.asarray(deltas), jnp.asarray(boxes),
                                  (10.0, 10.0, 5.0, 5.0)))
    want = _np_apply_deltas(deltas, boxes, (10.0, 10.0, 5.0, 5.0))
    assert np.abs(got - want).max() < 1e-3
    gc = np.asarray(clip_boxes(jnp.asarray(got), (64, 96)))
    assert gc[..., 0].min() >= 0 and gc[..., 2].max() <= 96
    assert gc[..., 1].min() >= 0 and gc[..., 3].max() <= 64


def test_cell_anchors_match_detectron2_formula():
    cell = cell_anchors(64.0, (0.5, 1.0, 2.0))
    for r, (x0, y0, x1, y1) in zip((0.5, 1.0, 2.0), cell):
        w, h = x1 - x0, y1 - y0
        assert abs(w * h - 64.0 * 64.0) < 1e-2      # area preserved
        assert abs(h / w - r) < 1e-5                # aspect = ratio
        assert abs(x0 + x1) < 1e-5 and abs(y0 + y1) < 1e-5
    grid = level_anchors((2, 3), 16, 64.0, (0.5, 1.0, 2.0))
    assert grid.shape == (18, 4)
    # second cell along x: shifted by stride in x only, same in y
    np.testing.assert_allclose(grid[3] - grid[0], [16, 0, 16, 0], atol=1e-5)
    # second row: shifted by stride in y
    np.testing.assert_allclose(grid[9] - grid[0], [0, 16, 0, 16], atol=1e-5)


def test_nms_masked_matches_greedy_oracle():
    rng = np.random.default_rng(1)
    for trial in range(5):
        boxes = rng.uniform(0, 60, (64, 4)).astype(np.float32)
        boxes[:, 2:] = boxes[:, :2] + rng.uniform(2, 30, (64, 2))
        scores = rng.uniform(0.01, 1, 64).astype(np.float32)
        order = np.argsort(-scores)
        sb, ss = boxes[order], scores[order]
        keep_mask = np.asarray(
            nms_masked(jnp.asarray(sb), jnp.ones(64, bool), 0.5)
        )
        want = set(_np_greedy_nms(boxes, scores, 0.5).tolist())
        got = set(order[np.where(keep_mask)[0]].tolist())
        assert got == want, trial


def _np_rpn_oracle(rpn_outs, anchors, image_hw, cfg):
    """find_top_rpn_proposals (test mode) in plain numpy, one image."""
    cands = []
    for (obj, deltas), anc in zip(rpn_outs, anchors):
        logits = obj.reshape(-1)
        d = deltas.reshape(-1, 4)
        k = min(cfg.rpn_pre_nms_topk, logits.shape[0])
        idx = np.argsort(-logits)[:k]
        b = _np_apply_deltas(d[idx], anc[idx])
        b[:, 0::2] = np.clip(b[:, 0::2], 0, image_hw[1])
        b[:, 1::2] = np.clip(b[:, 1::2], 0, image_hw[0])
        ok = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])
        b, s = b[ok], logits[idx][ok]
        keep = _np_greedy_nms(b, s, cfg.rpn_nms_thresh)
        cands.append((s[keep], b[keep]))
    scores = np.concatenate([s for s, _ in cands])
    boxes = np.concatenate([b for _, b in cands])
    order = np.argsort(-scores)[: cfg.rpn_post_nms_topk]
    return boxes[order], scores[order]


def test_rpn_proposals_match_numpy_oracle(small_pair):
    cfg, ref, params = small_pair
    x = _canvas(3, b=2)
    model = FasterRCNN(cfg)
    rpn_outs = model.apply({"params": params}, jnp.asarray(x),
                           method=model.rpn_raw)
    anchors = [
        level_anchors(tuple(o.shape[1:3]), cfg.strides[i],
                      cfg.anchor_sizes[i], cfg.anchor_ratios)
        for i, (o, _) in enumerate(rpn_outs)
    ]
    hw = (x.shape[1], x.shape[2])
    got_boxes, got_valid = rpn_proposals(
        rpn_outs, [jnp.asarray(a) for a in anchors], hw, cfg
    )
    for bi in range(x.shape[0]):
        outs_np = [
            (np.asarray(o)[bi], np.asarray(d)[bi]) for o, d in rpn_outs
        ]
        wb, _ = _np_rpn_oracle(outs_np, anchors, hw, cfg)
        n = wb.shape[0]
        gv = np.asarray(got_valid[bi])
        assert gv[:n].all() and not gv[n:].any()
        assert np.abs(np.asarray(got_boxes[bi])[:n] - wb).max() < 1e-3


def test_fast_rcnn_postprocess_matches_numpy_oracle():
    cfg = RCNNConfig.small()
    rng = np.random.default_rng(4)
    K, C = 24, cfg.num_classes
    props = rng.uniform(0, 50, (1, K, 4)).astype(np.float32)
    props[..., 2:] = props[..., :2] + rng.uniform(4, 30, (1, K, 2))
    logits = (rng.standard_normal((1, K, C + 1)) * 3).astype(np.float32)
    deltas = (rng.standard_normal((1, K, C * 4)) * 0.3).astype(np.float32)
    valid = np.ones((1, K), bool)
    valid[0, -3:] = False
    hw = (64, 96)
    got = fast_rcnn_postprocess(
        jnp.asarray(logits), jnp.asarray(deltas), jnp.asarray(props),
        jnp.asarray(valid), hw, cfg,
    )
    # oracle
    sm = np.exp(logits[0]) / np.exp(logits[0]).sum(-1, keepdims=True)
    scores = sm[:, :C]
    boxes = _np_apply_deltas(
        deltas[0].reshape(K, C, 4), props[0][:, None], cfg.box_reg_weights
    )
    boxes[..., 0::2] = np.clip(boxes[..., 0::2], 0, hw[1])
    boxes[..., 1::2] = np.clip(boxes[..., 1::2], 0, hw[0])
    ri, ci = np.where((scores > cfg.test_score_thresh) & valid[0][:, None])
    cb, cs, cc = boxes[ri, ci], scores[ri, ci], ci
    span = float(max(hw)) + 2.0
    keep = _np_greedy_nms(cb + (cc * span)[:, None], cs, cfg.test_nms_thresh)
    keep = keep[np.argsort(-cs[keep])][: cfg.detections_per_image]
    n = len(keep)
    gv = np.asarray(got["valid"][0])
    assert gv[:n].all() and not gv[n:].any()
    assert np.abs(np.asarray(got["boxes"][0])[:n] - cb[keep]).max() < 1e-3
    assert np.abs(np.asarray(got["scores"][0])[:n] - cs[keep]).max() < 1e-4
    assert (np.asarray(got["classes"][0])[:n] == cc[keep]).all()


def test_full_call_matches_composed_oracle(small_pair):
    """End-to-end: flax ``__call__`` vs the composed pipeline (torch replica
    network stages + numpy proposal/pool/postprocess oracles)."""
    cfg, ref, params = small_pair
    x = _canvas(5, b=1)
    hw = (x.shape[1], x.shape[2])
    model = FasterRCNN(cfg)
    got = model.apply({"params": params}, jnp.asarray(x))

    with torch.no_grad():
        feats_t = ref.features(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        rpn_t = ref.rpn(feats_t)
    outs_np = [
        (o[0].numpy().transpose(1, 2, 0), d[0].numpy().transpose(1, 2, 0))
        for o, d in rpn_t
    ]
    anchors = [
        level_anchors(o.shape[:2], cfg.strides[i], cfg.anchor_sizes[i],
                      cfg.anchor_ratios)
        for i, (o, _) in enumerate(outs_np)
    ]
    props, _ = _np_rpn_oracle(outs_np, anchors, hw, cfg)
    levels = np.asarray(assign_fpn_levels(jnp.asarray(props)))
    pooled = np.stack(
        [
            roi_align_reference(
                feats_t[levels[i]][0].numpy().transpose(1, 2, 0),
                props[i : i + 1], cfg.strides[levels[i]],
                out_size=cfg.roi_resolution,
            )[0]
            for i in range(props.shape[0])
        ]
    )
    with torch.no_grad():
        w_cls, w_del = ref.box_head_forward(
            torch.from_numpy(pooled.transpose(0, 3, 1, 2))
        )
    K = props.shape[0]
    want = fast_rcnn_postprocess(
        jnp.asarray(w_cls.numpy())[None],
        jnp.asarray(w_del.numpy())[None],
        jnp.asarray(props)[None],
        jnp.ones((1, K), bool),
        hw,
        cfg,
    )
    gn = int(np.asarray(got["valid"][0]).sum())
    wn = int(np.asarray(want["valid"][0]).sum())
    assert gn == wn
    if gn:
        assert np.abs(
            np.asarray(got["boxes"][0])[:gn] - np.asarray(want["boxes"][0])[:gn]
        ).max() < 5e-3
        assert (
            np.asarray(got["classes"][0])[:gn]
            == np.asarray(want["classes"][0])[:gn]
        ).all()


def test_preprocess_geometry_rules():
    # d2 ResizeShortestEdge rounding + size-divisibility padding
    assert resize_shortest_edge((240, 320)) == (800, 1067)
    assert resize_shortest_edge((320, 240)) == (1067, 800)
    assert resize_shortest_edge((480, 1280)) == (500, 1333)
    assert pad_to_divisible((800, 1067)) == (800, 1088)
    assert pad_to_divisible((500, 1333)) == (512, 1344)


def test_full_geometry_x101_conversion():
    """Shape-faithful X101-32x8d-FPN state_dict converts to the exact init
    tree (meta-device replica + eval_shape; no real allocation)."""
    cfg = RCNNConfig.x101_32x8d()
    with torch.device("meta"):
        ref = TorchRCNN(cfg)
    sd = {
        k: np.zeros(tuple(v.shape), np.float32)
        for k, v in ref.state_dict().items()
    }
    params = detectron2_to_flax(sd, cfg)
    init_shapes = jax.eval_shape(
        FasterRCNN(cfg).init,
        jax.random.key(0),
        jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32),
    )["params"]

    def tree_shapes(t):
        return {
            jax.tree_util.keystr(p): tuple(v.shape)
            for p, v in jax.tree_util.tree_leaves_with_path(t)
        }

    want, gotd = tree_shapes(init_shapes), tree_shapes(params)
    assert set(want) == set(gotd), (
        sorted(set(want) ^ set(gotd))[:8]
    )
    bad = {k: (gotd[k], want[k]) for k in want if gotd[k] != want[k]}
    assert not bad, bad


def test_converter_raises_on_unconsumed_keys(small_pair):
    cfg, ref, _ = small_pair
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    sd["roi_heads.box_predictor.extra.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        detectron2_to_flax(sd, cfg)


def test_grouped_conv_block_diag_matches_native(small_pair):
    """The block-diagonal lowering of the grouped 3x3 (the TPU-fast path,
    `rcnn.py::_GroupedConvBlockDiag`) is mathematically identical to the
    native feature_group_count conv: same param tree, same outputs."""
    cfg, _, params = small_pair
    x = jnp.asarray(_canvas(7))
    feats = {}
    # width 0 = full merge; width 8 exercises the super-group path proper
    # (m < G at the small config's res4/res5 where cg = 16/32 -> m clamps
    # to 1 = native blocks, and cg = 4/8 at res2/res3 -> m = 2/1); width 128
    # is the production default (full merge at this tiny geometry).
    for impl, width in (
        ("native", 0), ("block_diag", 0), ("block_diag", 8), ("block_diag", 128)
    ):
        c = dataclasses.replace(
            cfg, grouped_conv_impl=impl, grouped_conv_width=width
        )
        feats[(impl, width)] = FasterRCNN(c).apply(
            {"params": params}, x, method="backbone_features"
        )
    ref = feats[("native", 0)]
    for key, got in feats.items():
        for i, (a, b) in enumerate(zip(ref, got)):
            assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-5, (
                f"{key} p{i + 2}"
            )

    # a width whose group count does not divide G must fail with a clear
    # config error, not an opaque reshape crash deep in tracing
    # (groups=6, cg=2, width=8 -> m=4, 6 % 4 != 0)
    import pytest

    from video_gen_evals_tpu.models.rcnn import _GroupedConvBlockDiag

    bad = _GroupedConvBlockDiag(12, 3, 1, groups=6, width=8)
    with pytest.raises(ValueError, match="grouped_conv_width"):
        bad.init(jax.random.key(0), jnp.zeros((1, 8, 8, 12)))


def test_fast_preset_runs_and_stays_close(small_pair):
    """The measured fast() ROI knobs (bf16 pyramid + clamped window) run
    end-to-end and only perturb boxes/scores within their documented
    approximation class (~4e-3 relative pooled-feature noise)."""
    cfg, _, params = small_pair
    x = _canvas(11, b=1)
    exact = FasterRCNN(cfg).apply({"params": params}, jnp.asarray(x))
    fast_cfg = dataclasses.replace(
        cfg, roi_dtype="bfloat16", roi_window=max(cfg.roi_window // 2, 8)
    )
    fast = FasterRCNN(fast_cfg).apply({"params": params}, jnp.asarray(x))
    for k in ("boxes", "scores", "classes", "valid"):
        assert fast[k].shape == exact[k].shape, k
        assert np.all(np.isfinite(np.asarray(fast[k], np.float32))), k
    # same proposal set -> scores of kept detections shift only by the bf16
    # pooled-feature noise through the box head (loose bound, not parity)
    ev, fv = np.asarray(exact["valid"]), np.asarray(fast["valid"])
    if ev.any() and fv.any():
        es = np.asarray(exact["scores"])[ev.astype(bool)]
        fs = np.asarray(fast["scores"])[fv.astype(bool)]
        assert abs(float(es.max()) - float(fs.max())) < 0.1
