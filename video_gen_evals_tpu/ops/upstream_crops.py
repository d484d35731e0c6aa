"""Upstream-exact crop/canvas preprocessing for the extraction inputs.

The published extraction weights load through replica-tested converters
(TokenHMR, mmpose DWPose, Megvii YOLOX, detectron2), but weights only
reproduce features when fed tensors produced by the SAME preprocessing they
were trained/exported with — and PARITY.md's box-sensitivity study (±1% box
-> 2-6e-2 AC/TC) proves crop geometry is part of the feature definition.
This module transcribes each upstream algorithm as device-side ops:

- :func:`vitdet_mesh_crop` — TokenHMR/hmr2 ``ViTDetDataset`` mesh crops
  (consumed at ref ``modifications/mesh_generator.py:122-143``): box ->
  center + 2.5x rescale in 200px units, ``expand_to_aspect_ratio`` to
  ``BBOX_SHAPE`` then ``.max()`` -> square source window; gaussian
  anti-alias pre-blur when the downsampling factor exceeds 1.1
  (scipy/skimage semantics: radius ``int(4*sigma+0.5)``, mode "nearest");
  ``cv2.warpAffine(INTER_LINEAR, BORDER_CONSTANT=0)`` to a square
  ``IMAGE_SIZE`` patch via ``gen_trans_from_patch_cv``; BGR->RGB; ImageNet
  (x255) normalization. The model-side width slice (hmr2 feeds
  ``x[:, :, :, 32:-32]`` — 256x256 -> 256x192) is fused into the warp by
  sampling only the kept destination columns.

- :func:`dwpose_topdown_crop` — the mmpose top-down warp baked into the
  DWPose ONNX contract (ref ``modifications/dwpose_init.py:32-35``):
  ``bbox_xyxy2cs(padding=1.25)``, ``_fix_aspect_ratio`` to the model
  aspect, ``get_warp_matrix`` affine to (w=288, h=384), then per-channel
  normalization with mean (123.675, 116.28, 103.53) / std (58.395, 57.12,
  57.375) applied to the BGR image (the published code's exact channel
  order). :func:`dwpose_backmap` is the matching crop->frame coordinate
  map (``kp / input_size * scale + center - scale/2``).

- :func:`yolox_letterbox` — Megvii/DWPose detector canvas: aspect-
  preserving ``cv2.resize(INTER_LINEAR)`` by ``r = min(S/h, S/w)``, pasted
  at the top-left of a 114-filled SxS canvas, raw BGR 0..255 floats with
  NO mean/std (the published YOLOX preprocessing).

All warps run as separable MXU matmuls (the ``crop_resize_matmul``
pattern) with cv2's sampling conventions, measured empirically against
the cv2 build in this image (5.0): ``warpAffine`` inverse-maps with
CONTINUOUS float coordinates (integer pixel centers; legacy builds
quantized to 1/32 px — a <=1/32-px difference bounded by the image
gradient), blends out-of-range taps with the constant border value, and
rounds the uint8 path's output; ``resize`` uses half-pixel centers with
edge-clamped taps. With the uint8 rounding reproduced, the device crops
match real cv2 warps to <=1 uint8 LSB (tests/test_upstream_crops.py). The
upstream sources are not shipped in this image; the oracles are numpy
transcriptions of the published algorithms (hmr2
``datasets/{vitdet_dataset,utils}.py``, DWPose ``onnxdet/onnxpose.py``)
cross-checked against real cv2 warps.
"""

from __future__ import annotations

import typing as T

import jax
import jax.numpy as jnp
import numpy as np

# hmr2/TokenHMR DEFAULT_MEAN/STD (0..255 scale, RGB)
VITDET_MEAN_RGB = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
VITDET_STD_RGB = np.array([0.229, 0.224, 0.225], np.float32) * 255.0
# mmpose/DWPose onnxpose preprocess constants — applied to the BGR image
DWPOSE_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
DWPOSE_STD = np.array([58.395, 57.12, 57.375], np.float32)
LETTERBOX_FILL = 114.0


# ---------------------------------------------------------------------------
# cv2.warpAffine sampling (scale+translate case)
# ---------------------------------------------------------------------------

def cv2_affine_coords(
    s_inv: jnp.ndarray, t: jnp.ndarray, dst_idx: jnp.ndarray
) -> jnp.ndarray:
    """warpAffine's inverse-mapped source coordinates along one axis:
    ``src = M_inv_diag * dst + t`` with integer pixel centers (measured:
    the cv2 build in this image computes these continuously in float)."""
    return s_inv * dst_idx.astype(jnp.float32) + t


def _border0_weights(coords: jnp.ndarray, n_in: int, dtype) -> jnp.ndarray:
    """[n_out, n_in] linear-tap weights with BORDER_CONSTANT(0) semantics:
    out-of-range taps simply contribute nothing (equality against an
    out-of-range index never matches), which is exactly blending with a
    zero border value."""
    f = jnp.floor(coords)
    frac = coords - f
    i0 = f.astype(jnp.int32)
    idx = jnp.arange(n_in, dtype=jnp.int32)[None, :]
    return (
        (idx == i0[:, None]) * (1.0 - frac[:, None])
        + (idx == (i0[:, None] + 1)) * frac[:, None]
    ).astype(dtype)


def _clamp_weights(
    coords: jnp.ndarray, n_in: int, dtype
) -> jnp.ndarray:
    """[n_out, n_in] linear-tap weights with edge-clamp (replicate)
    semantics and continuous coords — cv2.resize's sampling convention
    (``src = (dst+0.5)*scale - 0.5``, the COORDINATE clamped to the valid
    range, so out-of-range samples replicate the edge pixel with frac 0)."""
    coords = jnp.clip(coords, 0.0, float(n_in - 1))
    f = jnp.floor(coords)
    frac = coords - f
    i0 = f.astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, n_in - 1)
    idx = jnp.arange(n_in, dtype=jnp.int32)[None, :]
    return (
        (idx == i0[:, None]) * (1.0 - frac[:, None])
        + (idx == i1[:, None]) * frac[:, None]
    ).astype(dtype)


# ---------------------------------------------------------------------------
# scipy/skimage gaussian pre-blur, composed into the warp weights
# ---------------------------------------------------------------------------

def _compose_gaussian(
    w_warp: jnp.ndarray,    # [n_out, n_in] warp weights
    sigma: jnp.ndarray,     # scalar (traced)
    apply: jnp.ndarray,     # scalar bool (traced)
    max_radius: int,
) -> jnp.ndarray:
    """Return ``w_warp @ B`` where B is scipy.ndimage's 1-D gaussian filter
    matrix (``radius = int(4*sigma + 0.5)``, mode "nearest" edge replicate)
    — without materializing the [n_in, n_in] B: the banded interior is a
    static-shift convolution of the warp rows; edge replication folds the
    out-of-range tail weights into the first/last columns."""
    if max_radius <= 0:
        return w_warp
    n_out, n_in = w_warp.shape
    x = jnp.arange(-max_radius, max_radius + 1, dtype=jnp.float32)
    # scipy: lw = int(truncate * sigma + 0.5), weights exp(-x^2/(2 sigma^2))
    # over |x| <= lw, normalized. int() truncates toward zero (arg >= 0.5).
    lw = jnp.floor(4.0 * sigma + 0.5).astype(jnp.int32)
    g = jnp.exp(-0.5 * jnp.square(x) / jnp.maximum(sigma, 1e-12) ** 2)
    g = jnp.where(jnp.abs(x.astype(jnp.int32)) <= lw, g, 0.0)
    # identity kernel when the blur is off
    delta = (x == 0).astype(jnp.float32)
    g = jnp.where(apply, g / jnp.sum(g), delta)

    # interior: (w_warp @ B)[o, j] = sum_t g[t] * w_warp[o, j - t]
    out = jnp.zeros_like(w_warp)
    for k, t in enumerate(range(-max_radius, max_radius + 1)):
        if t == 0:
            shifted = w_warp
        elif t > 0:
            shifted = jnp.pad(w_warp[:, t:], ((0, 0), (0, t)))
        else:
            shifted = jnp.pad(w_warp[:, :t], ((0, 0), (-t, 0)))
        out = out + g[k] * shifted
    # "nearest" edges: source taps at j + t falling off either end replicate
    # the edge pixel, so their weight lands on column 0 / n_in - 1
    j = jnp.arange(n_in, dtype=jnp.int32)
    # weight of blur taps t (source position j - t... work in B terms:
    # B[i, 0] gains sum_{t : i + t < 0} g[t]; composing, column 0 of
    # w_warp @ B gains sum_i w_warp[o, i] * lo_extra[i]
    lo_extra = jnp.sum(
        jnp.where((j[:, None] + x[None, :].astype(jnp.int32)) < 0, g[None, :], 0.0),
        axis=1,
    )
    hi_extra = jnp.sum(
        jnp.where(
            (j[:, None] + x[None, :].astype(jnp.int32)) > n_in - 1,
            g[None, :],
            0.0,
        ),
        axis=1,
    )
    out = out.at[:, 0].add(w_warp @ lo_extra)
    out = out.at[:, n_in - 1].add(w_warp @ hi_extra)
    return out


# ---------------------------------------------------------------------------
# TokenHMR / hmr2 ViTDetDataset mesh crops
# ---------------------------------------------------------------------------

def vitdet_square_bbox(
    boxes_xyxy: jnp.ndarray,                    # [..., 4]
    rescale_factor: float = 2.5,
    bbox_shape: T.Optional[T.Tuple[int, int]] = (192, 256),
) -> T.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ViTDetDataset box geometry: center, plus the square source-window
    size ``expand_to_aspect_ratio(rescale*wh, BBOX_SHAPE).max()``.

    ``expand_to_aspect_ratio`` grows (never shrinks) (w, h) to the target
    w:h; taking ``.max()`` of the result collapses to the closed form
    ``max(w * h_t/w_t, h)`` (for h/w < h_t/w_t the expanded h dominates,
    otherwise h already dominates both)."""
    cx = (boxes_xyxy[..., 0] + boxes_xyxy[..., 2]) * 0.5
    cy = (boxes_xyxy[..., 1] + boxes_xyxy[..., 3]) * 0.5
    w = (boxes_xyxy[..., 2] - boxes_xyxy[..., 0]) * rescale_factor
    h = (boxes_xyxy[..., 3] - boxes_xyxy[..., 1]) * rescale_factor
    if bbox_shape is None:
        size = jnp.maximum(w, h)
    else:
        w_t, h_t = bbox_shape
        size = jnp.maximum(w * (h_t / w_t), h)
    return cx, cy, size


def _vitdet_warp_one(
    img: jnp.ndarray,          # [H, W, C] f32 (values 0..255)
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    size: jnp.ndarray,
    patch: int,
    out_w: int,
    antialias: bool,
    max_radius: int,
) -> jnp.ndarray:
    H, W, C = img.shape
    pad = (patch - out_w) // 2
    s_inv = size / patch
    # gen_trans_from_patch_cv maps (cx, cy) -> (patch/2, patch/2); inverse:
    # src = (dst - patch/2) * s_inv + c
    tx = cx - s_inv * (patch * 0.5)
    ty = cy - s_inv * (patch * 0.5)
    # sample only the destination columns the model keeps (hmr2's
    # x[:, :, :, pad:-pad] slice) — dst indices are the FULL-patch ones
    xi = jnp.arange(pad, pad + out_w, dtype=jnp.int32)
    yi = jnp.arange(patch, dtype=jnp.int32)
    wx = _border0_weights(cv2_affine_coords(s_inv, tx, xi), W, img.dtype)
    wy = _border0_weights(cv2_affine_coords(s_inv, ty, yi), H, img.dtype)

    blurred = jnp.bool_(False)
    if antialias:
        # hmr2 anti-aliasing: df = (size/patch)/2; blur iff df > 1.1 with
        # sigma = (df - 1)/2 (skimage gaussian, mode nearest, truncate 4)
        df = (size / patch) * 0.5
        blurred = df > 1.1
        sigma = (df - 1.0) * 0.5
        wx = _compose_gaussian(wx, sigma, blurred, max_radius)
        wy = _compose_gaussian(wy, sigma, blurred, max_radius)

    hi = jax.lax.Precision.HIGHEST
    t = jnp.dot(wy, img.reshape(H, W * C), precision=hi).reshape(patch, W, C)
    out = jnp.einsum("ywc,xw->yxc", t, wx, precision=hi)
    # uint8 path: cv2 warps the uint8 frame and rounds; the float (blurred)
    # path doesn't. cv2's saturate_cast also clips to [0, 255].
    out_round = jnp.clip(jnp.round(out), 0.0, 255.0)
    return jnp.where(blurred, out, out_round)


def vitdet_mesh_crop(
    frames: jnp.ndarray,        # [B, H, W, 3] f32 RGB 0..255
    boxes_xyxy: jnp.ndarray,    # [B, 4]
    out_hw: T.Tuple[int, int] = (256, 192),
    rescale_factor: float = 2.5,
    bbox_shape: T.Optional[T.Tuple[int, int]] = None,
    antialias: bool = True,
    mean: T.Optional[np.ndarray] = None,
    std: T.Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """ViTDetDataset-exact mesh crops: [B, out_h, out_w, 3], normalized.

    ``out_hw`` is the MODEL input (e.g. TokenHMR's 256x192); the warp
    target is the square ``patch = out_h`` IMAGE_SIZE with the width slice
    fused in. ``bbox_shape`` defaults to (out_w, out_h) — TokenHMR's
    BBOX_SHAPE [192, 256]. Frames are RGB; the reference warps the BGR
    frame then flips to RGB before normalizing, and both the blur and the
    warp are channelwise, so warping RGB directly is identical."""
    oh, ow = out_hw
    if bbox_shape is None:
        bbox_shape = (ow, oh)
    if (oh - ow) % 2:
        raise ValueError(f"patch-slice padding must be even, got {out_hw}")
    cx, cy, size = vitdet_square_bbox(boxes_xyxy, rescale_factor, bbox_shape)
    H, W, _ = frames.shape[1:]
    max_radius = 0
    if antialias:
        # static bound on the blur radius: boxes are at most frame-sized
        w_t, h_t = bbox_shape
        size_max = rescale_factor * max(W * (h_t / w_t), H)
        sigma_max = max((size_max / oh / 2.0 - 1.0) * 0.5, 0.0)
        max_radius = int(4.0 * sigma_max + 0.5)
    crops = jax.vmap(
        lambda im, a, b, s: _vitdet_warp_one(
            im, a, b, s, oh, ow, antialias, max_radius
        )
    )(frames, cx, cy, size)
    mean = VITDET_MEAN_RGB if mean is None else mean
    std = VITDET_STD_RGB if std is None else std
    return (crops - jnp.asarray(mean, crops.dtype)) / jnp.asarray(std, crops.dtype)


# ---------------------------------------------------------------------------
# mmpose / DWPose top-down pose crops
# ---------------------------------------------------------------------------

def dwpose_center_scale(
    boxes_xyxy: jnp.ndarray,    # [..., 4]
    input_hw: T.Tuple[int, int] = (384, 288),
    padding: float = 1.25,
) -> T.Tuple[jnp.ndarray, jnp.ndarray]:
    """``bbox_xyxy2cs(padding=1.25)`` + ``_fix_aspect_ratio`` to the model
    aspect: returns (center [..., 2], scale [..., 2]) in frame pixels."""
    h, w = input_hw
    ar = w / h
    cx = (boxes_xyxy[..., 0] + boxes_xyxy[..., 2]) * 0.5
    cy = (boxes_xyxy[..., 1] + boxes_xyxy[..., 3]) * 0.5
    sw = (boxes_xyxy[..., 2] - boxes_xyxy[..., 0]) * padding
    sh = (boxes_xyxy[..., 3] - boxes_xyxy[..., 1]) * padding
    wide = sw > sh * ar
    fw = jnp.where(wide, sw, sh * ar)
    fh = jnp.where(wide, sw / ar, sh)
    return jnp.stack([cx, cy], -1), jnp.stack([fw, fh], -1)


def _dwpose_warp_one(
    img_bgr: jnp.ndarray,       # [H, W, C]
    center: jnp.ndarray,        # [2]
    scale: jnp.ndarray,         # [2]
    out_hw: T.Tuple[int, int],
) -> jnp.ndarray:
    H, W, C = img_bgr.shape
    oh, ow = out_hw
    # get_warp_matrix: uniform factor ow/scale_w both axes, center -> center
    s_inv = scale[0] / ow
    tx = center[0] - s_inv * (ow * 0.5)
    ty = center[1] - s_inv * (oh * 0.5)
    wx = _border0_weights(
        cv2_affine_coords(s_inv, tx, jnp.arange(ow, dtype=jnp.int32)),
        W, img_bgr.dtype,
    )
    wy = _border0_weights(
        cv2_affine_coords(s_inv, ty, jnp.arange(oh, dtype=jnp.int32)),
        H, img_bgr.dtype,
    )
    hi = jax.lax.Precision.HIGHEST
    t = jnp.dot(wy, img_bgr.reshape(H, W * C), precision=hi).reshape(oh, W, C)
    out = jnp.einsum("ywc,xw->yxc", t, wx, precision=hi)
    return jnp.clip(jnp.round(out), 0.0, 255.0)   # uint8 warp output


def dwpose_topdown_crop(
    frames_rgb: jnp.ndarray,    # [B, H, W, 3] f32 RGB 0..255
    boxes_xyxy: jnp.ndarray,    # [B, 4]
    input_hw: T.Tuple[int, int] = (384, 288),
    padding: float = 1.25,
) -> T.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """DWPose onnxpose-exact crops: (crops [B, h, w, 3] normalized BGR,
    center [B, 2], scale [B, 2]). The published preprocessing normalizes
    the cv2-BGR image with the (123.675, 116.28, 103.53) RGB-order means —
    a quirk baked into the exported weights, reproduced verbatim."""
    center, scale = dwpose_center_scale(boxes_xyxy, input_hw, padding)
    bgr = frames_rgb[..., ::-1]
    crops = jax.vmap(
        lambda im, c, s: _dwpose_warp_one(im, c, s, input_hw)
    )(bgr, center, scale)
    crops = (crops - jnp.asarray(DWPOSE_MEAN, crops.dtype)) / jnp.asarray(
        DWPOSE_STD, crops.dtype
    )
    return crops, center, scale


def dwpose_backmap(
    kp_xy: jnp.ndarray,         # [..., K, 2] crop-pixel coords
    center: jnp.ndarray,        # [..., 2]
    scale: jnp.ndarray,         # [..., 2]
    input_hw: T.Tuple[int, int] = (384, 288),
) -> jnp.ndarray:
    """onnxpose postprocess coordinate map:
    ``kp / model_input_size * scale + center - scale/2``."""
    h, w = input_hw
    wh = jnp.asarray([w, h], kp_xy.dtype)
    return (
        kp_xy / wh * scale[..., None, :]
        + center[..., None, :]
        - scale[..., None, :] * 0.5
    )


# ---------------------------------------------------------------------------
# Megvii / DWPose YOLOX letterbox canvas
# ---------------------------------------------------------------------------

def letterbox_geometry(
    frame_hw: T.Tuple[int, int], size: int = 640
) -> T.Tuple[float, int, int]:
    """(ratio, resized_h, resized_w) for the Megvii letterbox: ``r =
    min(S/h, S/w)``, content size ``(int(h*r), int(w*r))`` (int truncation,
    the published code's exact arithmetic)."""
    H, W = frame_hw
    r = min(size / H, size / W)
    return r, int(H * r), int(W * r)


def yolox_letterbox(
    frames_rgb: jnp.ndarray,    # [B, H, W, 3] f32 RGB 0..255
    size: int = 640,
) -> T.Tuple[jnp.ndarray, float]:
    """(canvas [B, size, size, 3] raw BGR 0..255 floats, ratio). Boxes
    decoded on the canvas map back to frame coords by ``boxes / ratio``
    (no clipping — the published pipeline keeps unclipped boxes)."""
    B, H, W, _ = frames_rgb.shape
    r, rh, rw = letterbox_geometry((H, W), size)
    bgr = frames_rgb[..., ::-1]
    if (rh, rw) == (H, W):
        resized = bgr
    else:
        # cv2.resize(INTER_LINEAR) semantics: half-pixel centers, taps
        # clamped at the edges; the uint8 path rounds the result
        ys = (jnp.arange(rh, dtype=jnp.float32) + 0.5) * (H / rh) - 0.5
        xs = (jnp.arange(rw, dtype=jnp.float32) + 0.5) * (W / rw) - 0.5
        wy = _clamp_weights(ys, H, frames_rgb.dtype)
        wx = _clamp_weights(xs, W, frames_rgb.dtype)
        hi = jax.lax.Precision.HIGHEST

        def one(im):
            t = jnp.dot(wy, im.reshape(H, W * 3), precision=hi).reshape(rh, W, 3)
            return jnp.einsum("ywc,xw->yxc", t, wx, precision=hi)

        resized = jnp.clip(jnp.round(jax.vmap(one)(bgr)), 0.0, 255.0)
    canvas = jnp.pad(
        resized,
        ((0, 0), (0, size - rh), (0, size - rw), (0, 0)),
        constant_values=LETTERBOX_FILL,
    )
    return canvas, r
