"""Extraction-model tests: rot6d, image crops, NMS, ViT/SMPL-head contracts,
DWPose postprocessing parity, detector filters."""

import numpy as np
import jax
import jax.numpy as jnp

from video_gen_evals_tpu.models.detector import (
    DetectorConfig,
    YOLOXLiteDetector,
    box_iou,
    nms_xla,
    person_detections,
    single_person_mask,
    video_is_single_person,
)
from video_gen_evals_tpu.models.pose2d import (
    PoseNetConfig,
    SimCCPoseNet,
    dwpose_postprocess,
    flatten_first_person,
    wholebody_to_openpose,
)
from video_gen_evals_tpu.models.smpl_head import SMPLHeadConfig, SMPLTokenDecoderHead
from video_gen_evals_tpu.models.vit import ViTBackbone, ViTConfig
from video_gen_evals_tpu.ops.image import batched_person_crops, crop_resize
from video_gen_evals_tpu.ops.so3 import rot6d_to_rotmat


# --------------------------- rot6d ---------------------------------------


def test_rot6d_identity():
    x = jnp.asarray([1.0, 0, 0, 0, 1.0, 0])
    R = np.asarray(rot6d_to_rotmat(x))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_rot6d_orthonormal(rng):
    x = jnp.asarray(rng.normal(size=(50, 6)).astype(np.float32))
    R = np.asarray(rot6d_to_rotmat(x))
    eye = np.einsum("bij,bik->bjk", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


# --------------------------- image ops ------------------------------------


def test_crop_resize_identity(rng):
    img = rng.uniform(0, 255, size=(16, 12, 3)).astype(np.float32)
    box = jnp.asarray([12 / 2, 16 / 2, 12, 16], jnp.float32)  # full image
    out = np.asarray(crop_resize(jnp.asarray(img), box, (16, 12)))
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_crop_resize_subregion(rng):
    img = np.arange(8 * 8, dtype=np.float32).reshape(8, 8, 1)
    # exact 4x4 crop at top-left, same-size output -> identity on the region
    box = jnp.asarray([2.0, 2.0, 4.0, 4.0])  # cx, cy, w, h
    out = np.asarray(crop_resize(jnp.asarray(img), box, (4, 4)))
    np.testing.assert_allclose(out, img[0:4, 0:4], atol=1e-4)


def test_batched_person_crops_shapes(rng):
    frames = jnp.asarray(rng.uniform(0, 255, size=(3, 32, 24, 3)).astype(np.float32))
    boxes = jnp.asarray(
        np.array([[2, 2, 20, 30], [0, 0, 24, 32], [5, 5, 10, 20]], np.float32)
    )
    crops = batched_person_crops(frames, boxes, out_hw=(16, 12))
    assert crops.shape == (3, 16, 12, 3)
    assert np.isfinite(np.asarray(crops)).all()


# --------------------------- NMS ------------------------------------------


def _numpy_nms(boxes, scores, iou_thresh):
    order = np.argsort(-scores)
    keep = []
    while len(order):
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        rest = order[1:]
        ious = np.asarray(box_iou(jnp.asarray(boxes[i : i + 1]), jnp.asarray(boxes[rest])))[0]
        order = rest[ious <= iou_thresh]
    return keep


def test_nms_matches_numpy_oracle(rng):
    for trial in range(5):
        n = 40
        centers = rng.uniform(20, 200, size=(n, 2))
        wh = rng.uniform(10, 60, size=(n, 2))
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], axis=1).astype(
            np.float32
        )
        scores = rng.uniform(0.01, 1.0, size=n).astype(np.float32)
        out_boxes, out_scores, keep = nms_xla(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=16
        )
        got = [tuple(np.round(b, 3)) for b, k in zip(np.asarray(out_boxes), np.asarray(keep)) if k]
        want_idx = _numpy_nms(boxes, scores, 0.5)[:16]
        want = [tuple(np.round(boxes[i], 3)) for i in want_idx]
        assert got == want, f"trial {trial}"


def test_single_person_mask_and_video_filter():
    valid = jnp.asarray(
        np.array(
            [[1, 0, 0], [1, 1, 0], [0, 0, 0], [1, 0, 0], [1, 0, 0]], bool
        )
    )
    mask = np.asarray(single_person_mask(valid))
    np.testing.assert_array_equal(mask, [True, False, False, True, True])
    assert not bool(video_is_single_person(jnp.asarray(mask), 0.8))
    assert bool(video_is_single_person(jnp.asarray(mask), 0.6))


# --------------------------- detector -------------------------------------


def test_detector_forward_and_person_filter(rng):
    cfg = DetectorConfig(input_hw=(64, 64), depth=0.33, width=0.0625, max_detections=8)
    det = YOLOXLiteDetector(cfg)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    params = det.init(jax.random.key(0), x)["params"]
    raw = det.apply({"params": params}, x)
    assert raw["boxes"].shape[0] == 2 and raw["boxes"].shape[2] == 4
    assert raw["cls"].shape[2] == 80
    boxes, scores, valid = person_detections(raw, score_thresh=0.5, max_out=8)
    assert boxes.shape == (2, 8, 4) and valid.dtype == bool


# --------------------------- ViT + SMPL head -------------------------------


def test_vit_backbone_shapes(rng):
    cfg = ViTConfig(img_size=(32, 24), patch_size=8, embed_dim=64, depth=2, num_heads=4)
    vit = ViTBackbone(cfg)
    x = jnp.asarray(rng.normal(size=(2, 32, 24, 3)).astype(np.float32))
    params = vit.init(jax.random.key(0), x)["params"]
    tokens, fmap = vit.apply({"params": params}, x)
    assert tokens.shape == (2, 12, 64)       # 4x3 patches
    assert fmap.shape == (2, 64, 4, 3)
    np.testing.assert_allclose(
        np.asarray(tokens), np.transpose(np.asarray(fmap), (0, 2, 3, 1)).reshape(2, 12, 64)
    )


def test_vit_converter_layout(rng):
    from video_gen_evals_tpu.models.vit import torch_vit_to_flax

    cfg = ViTConfig(img_size=(16, 16), patch_size=8, embed_dim=32, depth=1, num_heads=4)
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(32, 3, 8, 8)).astype(np.float32),
        "patch_embed.proj.bias": np.zeros(32, np.float32),
        "pos_embed": rng.normal(size=(1, 4, 32)).astype(np.float32),
        "norm.weight": np.ones(32, np.float32),
        "norm.bias": np.zeros(32, np.float32),
    }
    for k in ("norm1", "norm2"):
        sd[f"blocks.0.{k}.weight"] = np.ones(32, np.float32)
        sd[f"blocks.0.{k}.bias"] = np.zeros(32, np.float32)
    sd["blocks.0.attn.qkv.weight"] = rng.normal(size=(96, 32)).astype(np.float32)
    sd["blocks.0.attn.qkv.bias"] = np.zeros(96, np.float32)
    sd["blocks.0.attn.proj.weight"] = rng.normal(size=(32, 32)).astype(np.float32)
    sd["blocks.0.attn.proj.bias"] = np.zeros(32, np.float32)
    sd["blocks.0.mlp.fc1.weight"] = rng.normal(size=(128, 32)).astype(np.float32)
    sd["blocks.0.mlp.fc1.bias"] = np.zeros(128, np.float32)
    sd["blocks.0.mlp.fc2.weight"] = rng.normal(size=(32, 128)).astype(np.float32)
    sd["blocks.0.mlp.fc2.bias"] = np.zeros(32, np.float32)

    params = torch_vit_to_flax(sd, cfg)
    vit = ViTBackbone(cfg)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    ref = vit.init(jax.random.key(0), x)["params"]
    # converted tree must structurally match the initialized tree
    a = {jax.tree_util.keystr(p): np.asarray(v).shape
         for p, v in jax.tree_util.tree_leaves_with_path(params)}
    b = {jax.tree_util.keystr(p): np.asarray(v).shape
         for p, v in jax.tree_util.tree_leaves_with_path(ref)}
    assert a == b
    tokens, _ = vit.apply({"params": params}, x)
    assert np.isfinite(np.asarray(tokens)).all()


def test_smpl_head_contract(rng):
    cfg = SMPLHeadConfig(
        dim=64, context_dim=48, depth=2, heads=4, dim_head=16, mlp_dim=64,
        token_num=4, token_class_num=16, token_code_dim=8,
    )
    head = SMPLTokenDecoderHead(cfg)
    ctx = jnp.asarray(rng.normal(size=(3, 12, 48)).astype(np.float32))
    params = head.init(jax.random.key(0), ctx)["params"]
    out = head.apply({"params": params}, ctx)
    assert out["body_pose"].shape == (3, 23, 3, 3)
    assert out["global_orient"].shape == (3, 1, 3, 3)
    assert out["betas"].shape == (3, 10)
    assert out["cam"].shape == (3, 3)
    assert out["token_out"].shape == (3, 64)
    R = np.asarray(out["body_pose"]).reshape(-1, 3, 3)
    eye = np.einsum("bij,bik->bjk", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)


# --------------------------- pose postprocessing ---------------------------


def _np_wholebody_to_openpose(kpts, scores):
    """Independent numpy oracle of DWPose's Wholebody conversion."""
    P = kpts.shape[0]
    neck = kpts[:, [5, 6]].mean(axis=1)
    neck_sc = np.where(
        (scores[:, 5] > 0.3) & (scores[:, 6] > 0.3),
        np.minimum(scores[:, 5], scores[:, 6]),
        0.0,
    )
    k = np.insert(kpts, 17, neck, axis=1)
    s = np.insert(scores, 17, neck_sc, axis=1)
    mm = [17, 6, 8, 10, 7, 9, 12, 14, 16, 13, 15, 2, 1, 4, 3]
    op = [1, 2, 3, 4, 6, 7, 8, 9, 10, 12, 13, 14, 15, 16, 17]
    k2, s2 = k.copy(), s.copy()
    k2[:, op] = k[:, mm]
    s2[:, op] = s[:, mm]
    return k2, s2


def test_wholebody_to_openpose_matches_oracle(rng):
    kpts = rng.uniform(0, 200, size=(2, 133, 2)).astype(np.float32)
    scores = rng.uniform(0, 1, size=(2, 133)).astype(np.float32)
    k_j, s_j = wholebody_to_openpose(jnp.asarray(kpts), jnp.asarray(scores))
    k_n, s_n = _np_wholebody_to_openpose(kpts, scores)
    np.testing.assert_allclose(np.asarray(k_j), k_n, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_j), s_n, atol=1e-5)


def test_dwpose_postprocess_semantics(rng):
    kpts = rng.uniform(0, 100, size=(1, 134, 2)).astype(np.float32)
    scores = np.full((1, 134), 0.9, np.float32)
    scores[0, 3] = 0.1  # below vis threshold
    post = dwpose_postprocess(
        jnp.asarray(kpts), jnp.asarray(scores), (jnp.float32(200), jnp.float32(100))
    )
    cand = np.asarray(post["candidate"])
    np.testing.assert_allclose(cand[0, 0], kpts[0, 0] / [200, 100], atol=1e-6)
    np.testing.assert_allclose(cand[0, 3], [-1, -1])  # sub-threshold sentinel
    assert post["body"].shape == (1, 18, 2)
    assert post["faces"].shape == (1, 68, 2)
    assert post["hands"].shape == (2, 21, 2)


def test_flatten_first_person_validity(rng):
    """Reference semantics (process_video.py:23-57): a frame with a detected
    person is ALWAYS kept — visibility never gates, sub-threshold keypoints
    flow in as -1 sentinels. The stricter visibility mask is opt-in."""
    kpts = rng.uniform(0, 100, size=(1, 134, 2)).astype(np.float32)
    wh = (jnp.float32(100), jnp.float32(100))

    scores = np.full((1, 134), 0.9, np.float32)
    post = dwpose_postprocess(jnp.asarray(kpts), jnp.asarray(scores), wh)
    kp, valid = flatten_first_person(post)
    assert kp.shape == (120,)
    assert bool(valid)

    scores_bad = scores.copy()
    scores_bad[0, :18] = 0.1  # occluded body: ref keeps, -1 sentinels flow
    post = dwpose_postprocess(jnp.asarray(kpts), jnp.asarray(scores_bad), wh)
    kp, valid = flatten_first_person(post)
    assert bool(valid)
    np.testing.assert_allclose(np.asarray(kp[:36]), -1.0)  # ref -1 sentinel
    _, strict = flatten_first_person(post, visibility_rule=True)
    assert not bool(strict)  # opt-in quality mask still available

    scores_nohand = scores.copy()
    scores_nohand[0, 92:113] = 0.0  # left hand invisible: ref still keeps
    post = dwpose_postprocess(jnp.asarray(kpts), jnp.asarray(scores_nohand), wh)
    _, valid = flatten_first_person(post)
    assert bool(valid)
    _, strict = flatten_first_person(post, visibility_rule=True)
    assert not bool(strict)


def test_pose_net_shapes(rng):
    cfg = PoseNetConfig(
        input_hw=(64, 48), widen_factor=0.0625, deepen_factor=0.2,
        num_keypoints=133, gau_dim=32, gau_s=16,
    )
    net = SimCCPoseNet(cfg)
    x = jnp.asarray(rng.normal(size=(2, 64, 48, 3)).astype(np.float32))
    params = net.init(jax.random.key(0), x)["params"]
    kps, scores = net.apply({"params": params}, x)
    assert kps.shape == (2, 133, 2)
    assert scores.shape == (2, 133)
    k = np.asarray(kps)
    s = np.asarray(scores)
    # mmpose decode: -1 where score <= 0, else inside the crop
    pos = s > 0
    assert (k[pos][..., 0] >= 0).all() and (k[pos][..., 0] <= 48).all()
    assert (k[pos][..., 1] >= 0).all() and (k[pos][..., 1] <= 64).all()
    assert (k[~pos] == -1).all()


def test_crop_resize_matmul_matches_gather(rng):
    """Separable two-matmul resize == 4-tap gather bilinear, incl. edges."""
    from video_gen_evals_tpu.ops.image import crop_resize_matmul

    img = jnp.asarray(rng.normal(size=(24, 20, 3)).astype(np.float32))
    for box in (
        jnp.asarray([10.0, 12.0, 20.0, 24.0]),   # identity-ish
        jnp.asarray([4.0, 5.0, 7.0, 9.0]),       # interior subregion
        jnp.asarray([1.0, 2.0, 30.0, 40.0]),     # spills past every edge
    ):
        ref = np.asarray(crop_resize(img, box, (16, 12)))
        out = np.asarray(crop_resize_matmul(img, box, (16, 12)))
        np.testing.assert_allclose(out, ref, atol=2e-4)


def test_pil_resize_matmul_matches_pillow(rng):
    """resize_pil_matmul == PIL.Image.resize(BILINEAR) on F-mode images —
    up- AND downsampling (the antialias case) including PIL's renormalized
    edge windows. This is d2 ResizeShortestEdge's resize (DefaultPredictor
    full-frame preprocessing)."""
    from PIL import Image as PIL_Image
    from video_gen_evals_tpu.ops.image import resize_pil_matmul

    for (h, w), (oh, ow) in [
        ((240, 320), (800, 1067)),   # the UCF101 upsample case
        ((48, 64), (33, 21)),        # downsample: antialias kicks in
        ((37, 29), (37, 58)),        # mixed axes
        ((16, 16), (5, 5)),          # strong downsample
    ]:
        img = rng.normal(size=(h, w, 3)).astype(np.float32) * 50 + 100
        got = np.asarray(resize_pil_matmul(jnp.asarray(img), (oh, ow)))
        for c in range(3):
            ref = np.asarray(
                PIL_Image.fromarray(img[..., c], mode="F").resize(
                    (ow, oh), PIL_Image.BILINEAR
                )
            )
            np.testing.assert_allclose(got[..., c], ref, atol=2e-3)


def test_dwpose_person_detections_matches_onnxdet_oracle(rng):
    """dwpose_person_detections == a numpy transcription of DWPose onnxdet:
    class = argmax(obj*cls) per location, candidates > 0.1, CLASS-AGNOSTIC
    NMS at IoU 0.45, boxes in score-descending keep order, person mask by
    class id (the caller applies the published 0.3/0.5 score rules)."""
    from video_gen_evals_tpu.models.detector import dwpose_person_detections

    n, C = 60, 4
    centers = rng.uniform(20, 200, size=(n, 2))
    wh = rng.uniform(10, 60, size=(n, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], axis=1).astype(
        np.float32
    )
    obj = rng.uniform(0.0, 1.0, size=n).astype(np.float32)
    cls = rng.uniform(0.0, 1.0, size=(n, C)).astype(np.float32)
    raw = {
        "boxes": jnp.asarray(boxes)[None],
        "obj": jnp.asarray(obj)[None],
        "cls": jnp.asarray(cls)[None],
    }
    bb, ss, person = dwpose_person_detections(
        raw, prefilter_thresh=0.1, iou_thresh=0.45, max_out=16
    )
    got = [
        (tuple(np.round(b, 3)), bool(p))
        for b, s, p in zip(np.asarray(bb[0]), np.asarray(ss[0]), np.asarray(person[0]))
        if s > 0
    ]

    # onnxdet transcription: multiclass_nms(..., class_agnostic=True)
    scores_all = obj[:, None] * cls
    cls_ind = scores_all.argmax(1)
    cls_score = scores_all[np.arange(n), cls_ind]
    m = cls_score > 0.1
    vb, vs, vc = boxes[m], cls_score[m], cls_ind[m]
    keep = _numpy_nms(vb, vs, 0.45)[:16]
    want = [(tuple(np.round(vb[i], 3)), bool(vc[i] == 0)) for i in keep]
    assert got == want


def test_dwpose_person_detections_score_order(rng):
    """Kept boxes come out score-descending — the published pipeline's
    'first person' is its best-scoring one."""
    from video_gen_evals_tpu.models.detector import dwpose_person_detections

    boxes = np.array(
        [[0, 0, 10, 10], [100, 100, 120, 130], [300, 50, 340, 90]], np.float32
    )
    obj = np.array([0.5, 0.9, 0.7], np.float32)
    cls = np.zeros((3, 2), np.float32)
    cls[:, 0] = 1.0
    raw = {
        "boxes": jnp.asarray(boxes)[None],
        "obj": jnp.asarray(obj)[None],
        "cls": jnp.asarray(cls)[None],
    }
    bb, ss, person = dwpose_person_detections(raw, max_out=4)
    s = np.asarray(ss[0])
    assert s[0] >= s[1] >= s[2]
    np.testing.assert_allclose(np.asarray(bb[0, 0]), boxes[1])


def test_vit_block_precision_schedule(rng):
    """ViTConfig.block_precision: schedule-wrapped forward equals the plain
    forward on CPU (f32 backend — precision classes are TPU-only effects)
    and validates its length."""
    import jax
    from video_gen_evals_tpu.models.vit import ViTBackbone, ViTConfig

    cfg = ViTConfig(img_size=(32, 24), patch_size=8, embed_dim=32, depth=2,
                    num_heads=4)
    x = jnp.asarray(rng.normal(size=(2, 32, 24, 3)).astype(np.float32))
    m0 = ViTBackbone(cfg)
    params = m0.init(jax.random.key(0), x)["params"]
    t0, _ = m0.apply({"params": params}, x)
    m1 = ViTBackbone(
        ViTConfig(img_size=(32, 24), patch_size=8, embed_dim=32, depth=2,
                  num_heads=4, block_precision=("default", "high"))
    )
    t1, _ = m1.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), atol=1e-6)

    bad = ViTBackbone(
        ViTConfig(img_size=(32, 24), patch_size=8, embed_dim=32, depth=2,
                  num_heads=4, block_precision=("high",))
    )
    import pytest
    with pytest.raises(ValueError, match="block_precision"):
        bad.init(jax.random.key(0), x)
