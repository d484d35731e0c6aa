"""Batched image ops for the extraction pipeline: box crop + bilinear resize
and normalization, as fused XLA gathers.

Capability parity with the reference's per-frame host preprocessing
(``ViTDetDataset`` crops feeding TokenHMR, ref ``mesh_generator.py:122-143``;
DWPose 256x192 top-down crops). The reference crops one box at a time with
OpenCV on the CPU; here a whole (video x frame) batch of boxes is cropped,
resized and normalized on device in one program.
"""

from __future__ import annotations

import typing as T

import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img [H, W, C]`` at float coords ``ys/xs [h, w]`` (edge clamp)."""
    H, W, _ = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)

    def g(yy, xx):
        return img[yy, xx]

    v00 = g(y0, x0)
    v01 = g(y0, x1)
    v10 = g(y1, x0)
    v11 = g(y1, x1)
    wy = wy[..., None]
    wx = wx[..., None]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def crop_resize(
    img: jnp.ndarray,                # [H, W, C] float
    box_cxcywh: jnp.ndarray,         # [4]: center x, center y, width, height (pixels)
    out_hw: T.Tuple[int, int],
) -> jnp.ndarray:
    """Crop the given box and resize to ``out_hw`` with bilinear sampling.
    Pixel-center convention: output pixel i maps to
    ``box_start + (i + 0.5) * box_extent / out - 0.5``."""
    oh, ow = out_hw
    cx, cy, w, h = box_cxcywh[0], box_cxcywh[1], box_cxcywh[2], box_cxcywh[3]
    x0 = cx - w / 2.0
    y0 = cy - h / 2.0
    ys = y0 + (jnp.arange(oh, dtype=img.dtype) + 0.5) * (h / oh) - 0.5
    xs = x0 + (jnp.arange(ow, dtype=img.dtype) + 0.5) * (w / ow) - 0.5
    ys = jnp.broadcast_to(ys[:, None], (oh, ow))
    xs = jnp.broadcast_to(xs[None, :], (oh, ow))
    return bilinear_sample(img, ys, xs)


def crop_resize_matmul(
    img: jnp.ndarray,                # [H, W, C] float
    box_cxcywh: jnp.ndarray,         # [4]
    out_hw: T.Tuple[int, int],
) -> jnp.ndarray:
    """``crop_resize`` as two MXU matmuls instead of 4-tap gathers.

    Bilinear sampling is separable: out = Wy @ img @ Wx^T where Wy is the
    row-weight matrix with (1-frac) at the clipped floor tap and frac at the
    clipped floor+1 tap — built with equality compares so it is BIT-FAITHFUL
    to ``bilinear_sample``'s index-clip convention, including its
    out-of-range behavior (below-range samples interpolate rows 0/1 with the
    raw fractional part). XLA gathers run element-at-a-time on TPU — the
    matmul form is the fast path for the extraction crops (25M gathers per
    32-frame chunk otherwise). Both contractions are pinned to
    ``Precision.HIGHEST`` so the TPU MXU runs them as f32-accurate (bf16_3x)
    dots — at DEFAULT precision single-pass bf16 would drift up to ~0.5 in
    0-255 pixel units from the f32 gather path."""
    H, W, C = img.shape
    oh, ow = out_hw

    def weights(coords, n):
        f = jnp.floor(coords)
        frac = coords - f
        i0 = jnp.clip(f.astype(jnp.int32), 0, n - 1)
        i1 = jnp.clip(i0 + 1, 0, n - 1)
        idx = jnp.arange(n)[None, :]
        return (
            (idx == i0[:, None]) * (1.0 - frac[:, None])
            + (idx == i1[:, None]) * frac[:, None]
        ).astype(img.dtype)

    cx, cy, w, h = box_cxcywh[0], box_cxcywh[1], box_cxcywh[2], box_cxcywh[3]
    x0 = cx - w / 2.0
    y0 = cy - h / 2.0
    ys = y0 + (jnp.arange(oh, dtype=img.dtype) + 0.5) * (h / oh) - 0.5
    xs = x0 + (jnp.arange(ow, dtype=img.dtype) + 0.5) * (w / ow) - 0.5
    wy = weights(ys, H)                                   # [oh, H]
    wx = weights(xs, W)                                   # [ow, W]
    hi = jax.lax.Precision.HIGHEST
    t = jnp.dot(wy, img.reshape(H, W * C), precision=hi).reshape(oh, W, C)
    return jnp.einsum("ywc,xw->yxc", t, wx, precision=hi)


def pil_resize_weights(n_in: int, n_out: int) -> "np.ndarray":
    """Exact PIL bilinear resample weights as a dense ``[n_out, n_in]`` f32
    matrix (one output row = one normalized filter window).

    Reproduces Pillow ``Resample.c::precompute_coeffs`` for the BILINEAR
    filter over the full extent: ``center = (i + 0.5) * scale``, filter
    support scaled by ``max(scale, 1)`` — so DOWNsampling antialiases with a
    widened triangle window and UPsampling degenerates to classic 2-tap
    bilinear; out-of-range taps are dropped and the remaining window
    renormalized (PIL's edge rule — NOT index clamping).

    detectron2's ``ResizeShortestEdge`` resizes frames via
    ``PIL.Image.resize(..., BILINEAR)`` (d2 ``transform.py``), so this is the
    parity-exact weight set for the DefaultPredictor full-frame resize (ref
    ``mesh_generator.py:74``); PIL's uint8 path additionally quantizes
    coefficients to 8-bit fixed point, bounding it within ~1 LSB of this
    continuous form. Weights are static per (n_in, n_out) — compute host-side
    once, close over them as constants.
    """
    import numpy as np

    scale = n_in / n_out
    fscale = max(scale, 1.0)
    support = 1.0 * fscale                       # bilinear filter support = 1
    out = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        center = (i + 0.5) * scale
        # C int casts truncate toward zero; both operands are >= -support
        # so max(..., 0) first reproduces the C behavior for the low edge.
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), n_in)
        x = np.arange(lo, hi, dtype=np.float64)
        w = 1.0 - np.abs((x - center + 0.5) / fscale)
        w = np.maximum(w, 0.0)
        out[i, lo:hi] = w / w.sum()
    return out.astype(np.float32)


def resize_pil_matmul(img: jnp.ndarray, out_hw: T.Tuple[int, int]) -> jnp.ndarray:
    """Full-image resize with PIL-BILINEAR semantics as two MXU matmuls:
    ``Wy @ img @ Wx^T`` with :func:`pil_resize_weights` rows. Static shapes
    only (the weights are trace-time constants); pinned to
    ``Precision.HIGHEST`` like :func:`crop_resize_matmul`."""
    H, W, C = img.shape
    oh, ow = out_hw
    wy = jnp.asarray(pil_resize_weights(H, oh), img.dtype)
    wx = jnp.asarray(pil_resize_weights(W, ow), img.dtype)
    hi = jax.lax.Precision.HIGHEST
    t = jnp.dot(wy, img.reshape(H, W * C), precision=hi).reshape(oh, W, C)
    return jnp.einsum("ywc,xw->yxc", t, wx, precision=hi)


def batched_person_crops(
    frames: jnp.ndarray,             # [N, H, W, 3] float32 (RGB, 0..255)
    boxes_xyxy: jnp.ndarray,         # [N, 4] person boxes (pixels)
    out_hw: T.Tuple[int, int] = (256, 192),
    aspect_expand: bool = True,
    scale: float = 1.0,
    mean: T.Optional[jnp.ndarray] = None,
    std: T.Optional[jnp.ndarray] = None,
    impl: str = "matmul",
) -> jnp.ndarray:
    """Expand each box to the target aspect ratio, crop, resize, normalize.

    Mirrors top-down pose/mesh preprocessing: the box is expanded (not
    squashed) to match ``out_hw``'s aspect ratio around its center, optionally
    scaled, then bilinearly resized; mean/std are per-channel (0..255 scale).
    ``impl``: "matmul" (separable MXU form, default) or "gather" (4-tap).
    """
    oh, ow = out_hw
    x0, y0, x1, y1 = (
        boxes_xyxy[:, 0],
        boxes_xyxy[:, 1],
        boxes_xyxy[:, 2],
        boxes_xyxy[:, 3],
    )
    cx = (x0 + x1) / 2.0
    cy = (y0 + y1) / 2.0
    w = (x1 - x0) * scale
    h = (y1 - y0) * scale
    if aspect_expand:
        target = ow / oh
        w = jnp.where(w / jnp.maximum(h, 1e-6) > target, w, h * target)
        h = jnp.where(w / jnp.maximum(h, 1e-6) >= target, w / target, h)
    boxes = jnp.stack([cx, cy, w, h], axis=1)

    fn = crop_resize_matmul if impl == "matmul" else crop_resize
    crops = jax.vmap(lambda im, b: fn(im, b, out_hw))(frames, boxes)
    if mean is not None:
        crops = (crops - mean) / std
    return crops
