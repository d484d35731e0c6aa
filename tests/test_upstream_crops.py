"""Upstream-exact preprocessing oracles (ops/upstream_crops.py).

The upstream sources (hmr2/TokenHMR ``vitdet_dataset.py`` +
``datasets/utils.py``, DWPose ``onnxdet.py``/``onnxpose.py``) are not in
this image, so the oracle is a numpy TRANSCRIPTION of each published
algorithm (the ``test_pil_resize_matmul`` pattern), cross-checked against
REAL cv2 (``getAffineTransform`` / ``warpAffine`` / ``resize``) — the same
binary the reference pipelines call — and then pinned against the device
ops.

Tolerance notes: the measured cv2 build (5.0) inverse-maps with continuous
float coordinates, so uint8 comparisons differ only by output-rounding
ties (atol=1 LSB). The device ops compute coordinates in f32 (the
transcription/cv2 use f64), so op-vs-oracle tests use SMOOTH images
(bounded gradient) where sub-ULP coordinate differences move values far
below 1 LSB; noise images are used for the f64-vs-f64 transcription-vs-cv2
checks.
"""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest
import scipy.ndimage

from video_gen_evals_tpu.ops.upstream_crops import (
    DWPOSE_MEAN,
    DWPOSE_STD,
    VITDET_MEAN_RGB,
    VITDET_STD_RGB,
    _compose_gaussian,
    dwpose_backmap,
    dwpose_center_scale,
    dwpose_topdown_crop,
    letterbox_geometry,
    vitdet_mesh_crop,
    vitdet_square_bbox,
    yolox_letterbox,
)


# ---------------------------------------------------------------------------
# numpy transcriptions of the published algorithms
# ---------------------------------------------------------------------------

def np_expand_to_aspect_ratio(wh, target):
    """hmr2 ``datasets/utils.py::expand_to_aspect_ratio`` (verbatim logic)."""
    if target is None:
        return np.asarray(wh, np.float64)
    w, h = wh
    w_t, h_t = target
    if h / w < h_t / w_t:
        h_new = max(w * h_t / w_t, h)
        w_new = w
    else:
        h_new = h
        w_new = max(h * w_t / h_t, w)
    return np.array([w_new, h_new])


def np_gen_trans_from_patch_cv(c_x, c_y, src_w, src_h, dst_w, dst_h):
    """hmr2 ``gen_trans_from_patch_cv`` (scale=1, rot=0 — the
    ViTDetDataset inference path): 3-point affine solved by cv2 itself."""
    src_center = np.array([c_x, c_y], np.float32)
    src_downdir = np.array([0, src_h * 0.5], np.float32)
    src_rightdir = np.array([src_w * 0.5, 0], np.float32)
    dst_center = np.array([dst_w * 0.5, dst_h * 0.5], np.float32)
    dst_downdir = np.array([0, dst_h * 0.5], np.float32)
    dst_rightdir = np.array([dst_w * 0.5, 0], np.float32)
    src = np.stack(
        [src_center, src_center + src_downdir, src_center + src_rightdir]
    )
    dst = np.stack(
        [dst_center, dst_center + dst_downdir, dst_center + dst_rightdir]
    )
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


def np_mmpose_warp_mat(center, scale, output_size):
    """mmpose/DWPose onnxpose ``get_warp_matrix`` (rot=0, shift=0)."""
    w, h = output_size
    src_w = scale[0]
    src_dir = np.array([0.0, src_w * -0.5])
    dst_dir = np.array([0.0, w * -0.5])

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]])

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center
    src[1] = center + src_dir
    src[2] = third(src[0], src[1])
    dst[0] = [w * 0.5, h * 0.5]
    dst[1] = dst[0] + dst_dir
    dst[2] = third(dst[0], dst[1])
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


def np_warp(img, M, out_wh, round_out):
    """``cv2.warpAffine(INTER_LINEAR, BORDER_CONSTANT=0)`` transcription:
    inverse-mapped CONTINUOUS source coordinates (measured behavior of the
    cv2 build in this image — legacy builds quantized to 1/32 px),
    out-of-range taps blend with a 0 border, uint8 outputs round."""
    Minv = cv2.invertAffineTransform(M)
    ow, oh = out_wh
    x = np.arange(ow)
    y = np.arange(oh)
    xs = Minv[0, 0] * x[None, :] + Minv[0, 1] * y[:, None] + Minv[0, 2]
    ys = Minv[1, 0] * x[None, :] + Minv[1, 1] * y[:, None] + Minv[1, 2]
    ix, fx = np.floor(xs).astype(np.int64), xs - np.floor(xs)
    iy, fy = np.floor(ys).astype(np.int64), ys - np.floor(ys)
    H, W = img.shape[:2]
    imgf = img.astype(np.float64)

    def tap(iy_, ix_):
        valid = (iy_ >= 0) & (iy_ < H) & (ix_ >= 0) & (ix_ < W)
        v = imgf[np.clip(iy_, 0, H - 1), np.clip(ix_, 0, W - 1)]
        return np.where(valid[..., None], v, 0.0)

    out = (
        tap(iy, ix) * ((1 - fy) * (1 - fx))[..., None]
        + tap(iy, ix + 1) * ((1 - fy) * fx)[..., None]
        + tap(iy + 1, ix) * (fy * (1 - fx))[..., None]
        + tap(iy + 1, ix + 1) * (fy * fx)[..., None]
    )
    if round_out:
        out = np.clip(np.rint(out), 0, 255)
    return out


def np_vitdet_crop(img_bgr_u8, box, out_hw, rescale=2.5, bbox_shape=None,
                   antialias=True):
    """Full ViTDetDataset.__getitem__ transcription (hmr2/TokenHMR): box ->
    center/scale -> square bbox_size, gaussian anti-alias when the
    downsampling factor exceeds 1.1, warp to the square IMAGE_SIZE patch,
    BGR->RGB, ImageNet normalize, then the model-side width slice."""
    oh, ow = out_hw
    if bbox_shape is None:
        bbox_shape = (ow, oh)
    c = (box[:2] + box[2:]) / 2.0
    scale200 = rescale * (box[2:] - box[:2])   # "scale * 200" in hmr2 units
    size = np_expand_to_aspect_ratio(scale200, bbox_shape).max()
    img = img_bgr_u8
    round_out = True
    if antialias:
        df = (size / oh) / 2.0
        if df > 1.1:
            sigma = (df - 1) / 2.0
            img = scipy.ndimage.gaussian_filter(
                img.astype(np.float64), sigma=(sigma, sigma, 0),
                mode="nearest", truncate=4.0,
            )
            round_out = False                 # float image -> float warp
    M = np_gen_trans_from_patch_cv(c[0], c[1], size, size, oh, oh)
    patch = np_warp(img, M, (oh, oh), round_out)
    patch = patch[:, :, ::-1]                 # BGR -> RGB
    patch = (patch - VITDET_MEAN_RGB) / VITDET_STD_RGB
    pad = (oh - ow) // 2
    return patch[:, pad : pad + ow, :]


def np_dwpose_crop(img_bgr_u8, box, input_hw=(384, 288), padding=1.25):
    """DWPose onnxpose ``preprocess`` transcription: bbox_xyxy2cs(1.25),
    fix aspect to w/h, get_warp_matrix affine, RGB-order mean/std applied
    to the BGR image. Returns (crop, center, scale)."""
    h, w = input_hw
    center = np.array([(box[0] + box[2]) / 2.0, (box[1] + box[3]) / 2.0])
    scale = np.array([box[2] - box[0], box[3] - box[1]]) * padding
    ar = w / h
    if scale[0] > scale[1] * ar:
        scale = np.array([scale[0], scale[0] / ar])
    else:
        scale = np.array([scale[1] * ar, scale[1]])
    M = np_mmpose_warp_mat(center, scale, (w, h))
    crop = np_warp(img_bgr_u8, M, (w, h), round_out=True)
    crop = (crop - DWPOSE_MEAN) / DWPOSE_STD
    return crop, center, scale


def np_letterbox(img_bgr_u8, size=640):
    """Megvii/DWPose onnxdet ``preprocess`` transcription (cv2.resize is
    the resize oracle itself)."""
    H, W = img_bgr_u8.shape[:2]
    r = min(size / H, size / W)
    canvas = np.full((size, size, 3), 114.0, np.float64)
    resized = cv2.resize(
        img_bgr_u8, (int(W * r), int(H * r)), interpolation=cv2.INTER_LINEAR
    )
    canvas[: int(H * r), : int(W * r)] = resized
    return canvas, r


def _smooth_frame(rng, H, W, lo=0, hi=255):
    """uint8 frame with bounded gradient (a few LSB/px) so sub-1/32-px
    coordinate differences between f32 and f64 fixed-point math stay far
    below 1 LSB."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = np.stack(
        [
            127
            + 90 * np.sin(2 * np.pi * (xx / W * f1 + yy / H * f2 + p))
            for f1, f2, p in rng.uniform(0.3, 1.8, size=(3, 3))
        ],
        axis=-1,
    )
    return np.clip(img, lo, hi).astype(np.uint8)


# ---------------------------------------------------------------------------
# transcription vs real cv2 (f64 vs f64 — noise images, tight)
# ---------------------------------------------------------------------------

def test_warp_transcription_matches_cv2(rng):
    img = rng.integers(0, 256, size=(37, 52, 3)).astype(np.uint8)
    for c, size in [((20.0, 15.0), 24.0), ((5.5, 30.25), 61.0),
                    ((48.0, 4.0), 17.5)]:
        M = np_gen_trans_from_patch_cv(c[0], c[1], size, size, 32, 32)
        ours = np_warp(img, M, (32, 32), round_out=True)
        ref = cv2.warpAffine(
            img, M, (32, 32), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=0,
        )
        np.testing.assert_allclose(ours, ref.astype(np.float64), atol=1)


def test_warp_transcription_matches_cv2_mmpose(rng):
    img = rng.integers(0, 256, size=(45, 33, 3)).astype(np.uint8)
    for box in [np.array([3.0, 5.0, 28.0, 40.0]),
                np.array([-4.0, 10.0, 20.0, 22.5])]:
        _, center, scale = np_dwpose_crop(img, box, input_hw=(40, 30))
        M = np_mmpose_warp_mat(center, scale, (30, 40))
        ours = np_warp(img, M, (30, 40), round_out=True)
        ref = cv2.warpAffine(
            img, M, (30, 40), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=0,
        )
        np.testing.assert_allclose(ours, ref.astype(np.float64), atol=1)


def test_float_warp_transcription_matches_cv2(rng):
    """The float-image path (post-blur): no output rounding; cv2's float
    kernel uses the same 1/32 coordinate tables."""
    img = rng.uniform(0, 255, size=(30, 41, 3)).astype(np.float32)
    M = np_gen_trans_from_patch_cv(18.0, 12.0, 39.0, 39.0, 32, 32)
    ours = np_warp(img, M, (32, 32), round_out=False)
    ref = cv2.warpAffine(
        img, M, (32, 32), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    np.testing.assert_allclose(ours, ref.astype(np.float64), atol=2e-2)


# ---------------------------------------------------------------------------
# device ops vs transcription
# ---------------------------------------------------------------------------

def test_vitdet_square_bbox_matches_transcription(rng):
    # sort the two corner points elementwise -> rows [x1 y1 x2 y2]
    boxes = np.sort(rng.uniform(0, 60, size=(16, 2, 2)), axis=1).reshape(16, 4)
    cx, cy, size = vitdet_square_bbox(
        jnp.asarray(boxes, jnp.float32), rescale_factor=2.5,
        bbox_shape=(192, 256),
    )
    for i, b in enumerate(boxes):
        c = (b[:2] + b[2:]) / 2.0
        s = np_expand_to_aspect_ratio(2.5 * (b[2:] - b[:2]), (192, 256)).max()
        assert abs(float(cx[i]) - c[0]) < 1e-3
        assert abs(float(cy[i]) - c[1]) < 1e-3
        assert abs(float(size[i]) - s) < max(1e-3 * s, 1e-3)


@pytest.mark.parametrize("boxes", [
    [(4.0, 6.0, 20.0, 26.0), (10.0, 2.0, 34.0, 30.0)],    # no blur
])
def test_vitdet_crop_matches_transcription(rng, boxes):
    H, W = 36, 48
    frames_rgb = np.stack([_smooth_frame(rng, H, W) for _ in boxes])
    out = np.asarray(
        vitdet_mesh_crop(
            jnp.asarray(frames_rgb, jnp.float32),
            jnp.asarray(np.array(boxes, np.float32)),
            out_hw=(32, 24),
        )
    )
    for i, b in enumerate(boxes):
        ref = np_vitdet_crop(
            frames_rgb[i][:, :, ::-1].copy(), np.array(b), (32, 24)
        )
        # normalized units; 1 uint8 LSB ~ 1/58 after the std divide
        np.testing.assert_allclose(out[i], ref, atol=2.5e-2)


def test_vitdet_crop_blur_matches_transcription(rng):
    """A box big enough that the anti-alias pre-blur triggers
    (downsampling factor > 1.1 -> scipy gaussian, float warp path)."""
    H, W = 40, 56
    frames_rgb = np.stack([_smooth_frame(rng, H, W)])
    box = np.array([[2.0, 2.0, 50.0, 38.0]], np.float32)  # 2.5x -> big
    # verify the blur actually triggers for this geometry
    size = np_expand_to_aspect_ratio(2.5 * (box[0, 2:] - box[0, :2]),
                                     (24, 32)).max()
    assert (size / 32) / 2.0 > 1.1
    out = np.asarray(
        vitdet_mesh_crop(
            jnp.asarray(frames_rgb, jnp.float32), jnp.asarray(box),
            out_hw=(32, 24),
        )
    )
    ref = np_vitdet_crop(frames_rgb[0][:, :, ::-1].copy(), box[0], (32, 24))
    np.testing.assert_allclose(out[0], ref, atol=2.5e-2)


def test_vitdet_no_blur_when_disabled(rng):
    H, W = 40, 56
    frames_rgb = np.stack([_smooth_frame(rng, H, W)])
    box = np.array([[2.0, 2.0, 50.0, 38.0]], np.float32)
    out = np.asarray(
        vitdet_mesh_crop(
            jnp.asarray(frames_rgb, jnp.float32), jnp.asarray(box),
            out_hw=(32, 24), antialias=False,
        )
    )
    ref = np_vitdet_crop(
        frames_rgb[0][:, :, ::-1].copy(), box[0], (32, 24), antialias=False
    )
    np.testing.assert_allclose(out[0], ref, atol=2.5e-2)


def test_compose_gaussian_matches_scipy_matrix(rng):
    """_compose_gaussian(W, sigma) == W @ B where B is scipy's 1-D gaussian
    filter matrix (mode nearest, truncate 4) — including edge replication."""
    n_in, n_out = 30, 8
    Wm = rng.normal(size=(n_out, n_in)).astype(np.float32)
    for sigma in (0.6, 1.3, 2.0):
        # filtered basis vector e_j is COLUMN j of the operator matrix
        B = np.stack(
            [
                scipy.ndimage.gaussian_filter1d(
                    np.eye(n_in)[j], sigma, mode="nearest", truncate=4.0
                )
                for j in range(n_in)
            ],
            axis=0,
        ).T  # B[i, j]: weight of input j in output i
        ref = Wm @ B
        out = np.asarray(
            _compose_gaussian(
                jnp.asarray(Wm), jnp.float32(sigma), jnp.bool_(True),
                max_radius=int(4 * sigma + 0.5) + 2,
            )
        )
        np.testing.assert_allclose(out, ref, atol=1e-4)


def test_compose_gaussian_identity_when_off(rng):
    Wm = rng.normal(size=(8, 30)).astype(np.float32)
    out = np.asarray(
        _compose_gaussian(jnp.asarray(Wm), jnp.float32(1.5), jnp.bool_(False),
                          max_radius=8)
    )
    np.testing.assert_allclose(out, Wm, atol=1e-6)


def test_dwpose_crop_matches_transcription(rng):
    H, W = 45, 33
    frames_rgb = np.stack([_smooth_frame(rng, H, W) for _ in range(2)])
    boxes = np.array(
        [[3.0, 5.0, 28.0, 40.0], [-4.0, 10.0, 20.0, 22.5]], np.float32
    )
    crops, center, scale = dwpose_topdown_crop(
        jnp.asarray(frames_rgb, jnp.float32), jnp.asarray(boxes),
        input_hw=(40, 30),
    )
    crops = np.asarray(crops)
    for i in range(2):
        ref, c_ref, s_ref = np_dwpose_crop(
            frames_rgb[i][:, :, ::-1].copy(), boxes[i], input_hw=(40, 30)
        )
        np.testing.assert_allclose(np.asarray(center)[i], c_ref, atol=1e-3)
        np.testing.assert_allclose(np.asarray(scale)[i], s_ref, rtol=1e-5)
        np.testing.assert_allclose(crops[i], ref, atol=2.5e-2)


def test_dwpose_backmap_matches_formula(rng):
    kp = rng.uniform(0, 288, size=(3, 133, 2)).astype(np.float32)
    center = rng.uniform(0, 100, size=(3, 2)).astype(np.float32)
    scale = rng.uniform(50, 200, size=(3, 2)).astype(np.float32)
    out = np.asarray(
        dwpose_backmap(jnp.asarray(kp), jnp.asarray(center),
                       jnp.asarray(scale), input_hw=(384, 288))
    )
    ref = kp / np.array([288.0, 384.0]) * scale[:, None] + center[:, None] \
        - scale[:, None] / 2
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-3)


def test_dwpose_backmap_inverts_warp():
    """A frame point maps through the warp to crop coords and back."""
    box = np.array([10.0, 20.0, 60.0, 100.0], np.float32)
    center, scale = dwpose_center_scale(jnp.asarray(box), (384, 288), 1.25)
    # forward warp (continuous form): crop = (frame - c)/s_inv_at_center
    s_inv = float(scale[0]) / 288.0
    frame_pt = np.array([37.0, 55.0])
    crop_pt = (frame_pt - np.asarray(center)) / s_inv + np.array([144.0, 192.0])
    back = np.asarray(
        dwpose_backmap(
            jnp.asarray(crop_pt[None, None], jnp.float32),
            jnp.asarray(np.asarray(center)[None], jnp.float32),
            jnp.asarray(np.asarray(scale)[None], jnp.float32),
            input_hw=(384, 288),
        )
    )[0, 0]
    np.testing.assert_allclose(back, frame_pt, atol=1e-2)


def test_yolox_letterbox_matches_transcription(rng):
    for H, W in [(36, 64), (64, 36), (48, 48)]:
        frames_rgb = np.stack([_smooth_frame(rng, H, W)])
        canvas, r = yolox_letterbox(
            jnp.asarray(frames_rgb, jnp.float32), size=64
        )
        ref, r_ref = np_letterbox(frames_rgb[0][:, :, ::-1].copy(), size=64)
        assert abs(r - r_ref) < 1e-9
        np.testing.assert_allclose(np.asarray(canvas)[0], ref, atol=1.0)
        # padded region is exactly 114
        rh, rw = int(H * r), int(W * r)
        assert np.all(np.asarray(canvas)[0, rh:, :, :] == 114.0)
        assert np.all(np.asarray(canvas)[0, :, rw:, :] == 114.0)


def test_letterbox_geometry_int_truncation():
    # int() truncation, not rounding — the published code's arithmetic
    r, rh, rw = letterbox_geometry((101, 53), 64)
    assert r == min(64 / 101, 64 / 53)
    assert rh == int(101 * r) and rw == int(53 * r)
