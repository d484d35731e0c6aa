"""ROIAlignV2 over an FPN pyramid as per-ROI separable MXU matmuls.

The reference's mesh-path detector is detectron2's Faster R-CNN X101-FPN
(`modifications/mesh_generator.py:69-74`), whose box head pools proposals
with ROIAlignV2 (``aligned=True``, adaptive sampling ``ratio=0``). The CUDA
op samples ``ceil(roi_extent/bins)`` bilinear taps per bin per axis and
averages — a data-dependent gather pattern that lowers element-at-a-time on
TPU (the ``ops/image.py`` lesson: ~4 gathers/sample is the slow path).

TPU-native formulation
----------------------
Bilinear sampling on a regular grid is separable, and bin-averaging is
linear, so the WHOLE pool for one ROI collapses to two tiny matmuls:

    out[by, bx, c] = Wy[by, :] @ window[:, :, c] @ Wx[bx, :]^T

where ``Wy``/``Wx`` are ``[bins, win]`` matrices holding the SUM over that
bin's adaptive sample positions of the two bilinear tap weights (divided by
the per-axis sample count) — built per ROI from its geometry with static
shapes (samples masked up to a cap), exactly reproducing ROIAlignV2's
sampling/border semantics for every ROI whose span fits the window.

The pyramid is packed once per image into a single row-concatenated buffer
(levels stacked along rows, columns padded to the widest level), so the
per-ROI window is ONE ``dynamic_slice`` at ``(row_offset[level] + y0, x0)``
— no per-level branching under ``vmap``.

Exactness domain: bit-equal (up to matmul precision, pinned HIGHEST) to the
CUDA algorithm whenever (a) the ROI's tap span per axis fits in ``window``
cells and (b) the per-bin adaptive sample count is <= ``max_samples``.
detectron2's canonical FPN level assignment bounds the span to ~2x
``224/stride`` cells and the sample count to <= ceil(max_size/stride/bins)
(6 at 1333 px input) — both inside the defaults (window 48, cap 8): at the
level-assignment bound ``sqrt(area)/stride < 28`` the span fits for aspect
ratios up to ~3 (all person boxes; window 48 vs the ~44-cell span of a
1:2.5 box at worst-in-level size). Proposals whose span exceeds the window
(degenerate aspect ratios) read the window-edge cells for their outer bins
— a bounded approximation, never zeros.
"""

from __future__ import annotations

import typing as T

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_pyramid(
    feats: T.Sequence[jnp.ndarray],  # per level [H_l, W_l, C]
) -> T.Tuple[jnp.ndarray, T.Tuple[int, ...], T.Tuple[T.Tuple[int, int], ...]]:
    """Stack pyramid levels along rows (cols zero-padded to the widest,
    rounded up to the 8-sublane tile so the DMA pool's aligned column
    windows always fit).

    Returns ``(buffer [sum(H_l), ceil8(max(W_l)), C], row_offsets,
    level_hw)``. The padding content is never read: interpolation weights
    only address cells inside each level's true extent.
    """
    wmax = max(f.shape[1] for f in feats)
    wmax += (-wmax) % 8
    offs, rows = [], 0
    padded = []
    for f in feats:
        offs.append(rows)
        rows += f.shape[0]
        padded.append(jnp.pad(f, ((0, 0), (0, wmax - f.shape[1]), (0, 0))))
    buf = jnp.concatenate(padded, axis=0)
    hw = tuple((f.shape[0], f.shape[1]) for f in feats)
    return buf, tuple(offs), hw


def _axis_weights(
    start: jnp.ndarray,      # scalar: roi start in feature coords (aligned: x0/stride - 0.5)
    length: jnp.ndarray,     # scalar: roi extent in feature coords
    extent: jnp.ndarray,     # scalar int: level size along this axis (H_l or W_l)
    win_start: jnp.ndarray,  # scalar int: absolute buffer index of window col 0
    bins: int,
    window: int,
    max_samples: int,
) -> jnp.ndarray:
    """[bins, window] combined bilinear+average weights for one axis.

    Reproduces ROIAlignV2's per-sample rules (torchvision/detectron2
    ``roi_align`` kernel): sample count ``ceil(length/bins)`` (0 for empty
    ROIs -> zero output), positions ``start + (b + (k+.5)/s) * bin``, taps
    zeroed outside ``[-1, extent]``, clamped into ``[0, extent-1]`` with the
    floor==extent-1 edge rule, each sample weighted ``1/s``.
    """
    s = jnp.ceil(length / bins).astype(jnp.int32)
    s = jnp.clip(s, 0, max_samples)
    safe_s = jnp.maximum(s, 1)
    binw = length / bins
    b = jnp.arange(bins, dtype=jnp.float32)[:, None]
    k = jnp.arange(max_samples, dtype=jnp.float32)[None, :]
    kmask = k < s.astype(jnp.float32)
    pos = start + binw * (b + (k + 0.5) / safe_s.astype(jnp.float32))
    ext_f = extent.astype(jnp.float32)
    oob = (pos < -1.0) | (pos > ext_f)
    p = jnp.clip(pos, 0.0)
    low = jnp.floor(p).astype(jnp.int32)
    at_edge = low >= extent - 1
    low = jnp.where(at_edge, extent - 1, low)
    high = jnp.where(at_edge, extent - 1, low + 1)
    frac = jnp.where(at_edge, 0.0, p - low.astype(jnp.float32))
    w = jnp.where(oob | ~kmask, 0.0, 1.0) / safe_s.astype(jnp.float32)
    idx = jnp.arange(window, dtype=jnp.int32)[None, None, :]
    # taps beyond the window (ROI span > window cells) clamp to the last
    # window cell — a graceful edge-value fallback rather than a silent
    # zero; exact whenever the span fits (see module docstring).
    rel_low = jnp.minimum(low - win_start, window - 1)
    rel_high = jnp.minimum(high - win_start, window - 1)
    onehot_low = (idx == rel_low[..., None]).astype(jnp.float32)
    onehot_high = (idx == rel_high[..., None]).astype(jnp.float32)
    contrib = (w * (1.0 - frac))[..., None] * onehot_low + (w * frac)[..., None] * onehot_high
    return contrib.sum(axis=1)  # sum over samples -> [bins, window]


def roi_align_pyramid(
    buffer: jnp.ndarray,                       # [sumH, Wmax, C] packed pyramid
    row_offsets: T.Tuple[int, ...],
    level_hw: T.Tuple[T.Tuple[int, int], ...],
    strides: T.Tuple[int, ...],
    boxes: jnp.ndarray,                        # [R, 4] xyxy, image coords
    levels: jnp.ndarray,                       # [R] int in [0, L)
    out_size: int = 7,
    window: int = 48,
    max_samples: int = 8,
    chunk: int = 128,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """ROIAlignV2 pool of ``boxes`` from their assigned pyramid levels.

    Returns ``[R, out_size, out_size, C]``. ``chunk`` bounds the transient
    window memory (``chunk * window^2 * C`` floats) via a sequential
    ``lax.map`` over ROI chunks.
    """
    bufh, bufw, C = buffer.shape
    window = min(window, bufh, bufw)
    offs = jnp.asarray(row_offsets, jnp.int32)
    hs = jnp.asarray([h for h, _ in level_hw], jnp.int32)
    ws = jnp.asarray([w for _, w in level_hw], jnp.int32)
    strides_arr = jnp.asarray(strides, jnp.float32)

    def one(box, lvl):
        stride = strides_arr[lvl]
        H_l, W_l, off = hs[lvl], ws[lvl], offs[lvl]
        x0 = box[0] / stride - 0.5
        y0 = box[1] / stride - 0.5
        lx = (box[2] - box[0]) / stride
        ly = (box[3] - box[1]) / stride
        # window start: absolute buffer coords, clipped so the slice is
        # in-bounds; weights are built relative to the CLIPPED start so
        # clipping never misaligns taps (it only limits coverage for ROIs
        # whose span exceeds the window).
        wy0 = jnp.clip(jnp.floor(y0).astype(jnp.int32), 0, jnp.maximum(H_l - window, 0)) + off
        wy0 = jnp.clip(wy0, 0, bufh - window)
        wx0 = jnp.clip(jnp.floor(x0).astype(jnp.int32), 0, jnp.maximum(W_l - window, 0))
        wx0 = jnp.clip(wx0, 0, bufw - window)
        Wy = _axis_weights(y0, ly, H_l, wy0 - off, out_size, window, max_samples)
        Wx = _axis_weights(x0, lx, W_l, wx0, out_size, window, max_samples)
        win = jax.lax.dynamic_slice(buffer, (wy0, wx0, 0), (window, window, C))
        win = win.astype(jnp.float32)
        t = jax.lax.dot_general(
            Wy, win.reshape(window, window * C),
            (((1,), (0,)), ((), ())), precision=precision,
        ).reshape(out_size, window, C)
        out = jnp.einsum("qw,pwc->pqc", Wx, t, precision=precision)
        return out

    R = boxes.shape[0]
    pad = (-R) % chunk
    boxes_p = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)]) if pad else boxes
    levels_p = jnp.concatenate([levels, jnp.zeros((pad,), levels.dtype)]) if pad else levels
    boxes_c = boxes_p.reshape(-1, chunk, 4)
    levels_c = levels_p.reshape(-1, chunk)
    out = jax.lax.map(lambda bl: jax.vmap(one)(bl[0], bl[1]), (boxes_c, levels_c))
    out = out.reshape(-1, out_size, out_size, C)
    return out[:R]


def _pool_dma_kernel(
    wy0_ref, wx0_ref, buf_ref, wyx_ref, out_ref, win, sems,
    *, n: int, window: int, window_x: int, n_steps: int, precision,
):
    """One grid step = ``n`` ROIs: double-buffered window DMAs (start step
    i+1's copies before computing step i's) and ONE dense dot per ROI."""
    i = pl.program_id(0)

    def start(step, slot):
        for j in range(n):
            yo = wy0_ref[step * n + j]
            xo = pl.multiple_of(wx0_ref[step * n + j], 8)
            pltpu.make_async_copy(
                buf_ref.at[pl.ds(yo, window), pl.ds(xo, window_x), :],
                win.at[slot, j],
                sems.at[slot, j],
            ).start()

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < n_steps)
    def _():
        start(i + 1, (i + 1) % 2)

    slot = i % 2
    for j in range(n):
        yo = wy0_ref[i * n + j]
        xo = pl.multiple_of(wx0_ref[i * n + j], 8)
        pltpu.make_async_copy(
            buf_ref.at[pl.ds(yo, window), pl.ds(xo, window_x), :],
            win.at[slot, j],
            sems.at[slot, j],
        ).wait()
        w = win[slot, j]
        w2 = w.reshape(window * window_x, w.shape[-1])
        out_ref[j] = jax.lax.dot_general(
            wyx_ref[j], w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(out_ref.dtype)


def roi_align_pyramid_dma(
    buffer: jnp.ndarray,                       # [sumH, Wmax8, C] packed pyramid
    row_offsets: T.Tuple[int, ...],
    level_hw: T.Tuple[T.Tuple[int, int], ...],
    strides: T.Tuple[int, ...],
    boxes: jnp.ndarray,                        # [R, 4] xyxy, image coords
    levels: jnp.ndarray,                       # [R] int in [0, L)
    out_size: int = 7,
    window: int = 48,
    window_x: T.Optional[int] = None,
    max_samples: int = 8,
    rois_per_step: int = 1,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
) -> jnp.ndarray:
    """:func:`roi_align_pyramid` as a Pallas DMA + single-GEMM kernel.

    Two restructurings versus the XLA matmul pool (which BENCH_NOTES
    round-3 measured at 175 ms per 8x1000 ROIs, f32):

    1. **Burst window DMA**: each ROI's ``[window, window_x, C]`` slice is
       an explicit double-buffered HBM->VMEM copy (column starts 8-aligned,
       ``window_x`` carries +8 slack so alignment never loses coverage) —
       replacing XLA ``dynamic_slice`` realignment copies, and overlapping
       the next ROI's fetch with the current ROI's compute.
    2. **One dense dot per ROI**: the separable ``[7,48] @ [48, 56*C]``
       then ``[7,56]`` contractions waste the MXU on M=7/K=48 tile padding
       (2% utilization — the real reason the pool is slow). Precomputing
       the outer-product weights ``Wyx[pq, hw] = Wy[p,h]*Wx[q,w]`` (one
       XLA einsum, K = window*window_x = 21 full lane tiles) turns the
       pool into ``[49, 2688] @ [2688, C]`` — fully dense K, ~3x less
       executed MXU work despite 7x more nominal FLOPs.

    Weight math is IDENTICAL to the matmul pool (same ``_axis_weights``),
    so results match it bit-for-bit up to dot-order rounding; exactness vs
    the CUDA-transcription oracle is inherited (same sampling semantics,
    wider-or-equal x window).
    """
    import functools

    bufh, bufw, C = buffer.shape
    window = min(window, bufh)
    if window_x is None:
        window_x = window + 8
    window_x = min(window_x, bufw - bufw % 8)
    if window_x <= 0 or bufw % 8:
        raise ValueError(
            f"buffer cols {bufw} must be 8-padded (pack_pyramid does this)"
        )
    offs = jnp.asarray(row_offsets, jnp.int32)
    hs = jnp.asarray([h for h, _ in level_hw], jnp.int32)
    ws = jnp.asarray([w for _, w in level_hw], jnp.int32)
    strides_arr = jnp.asarray(strides, jnp.float32)
    osq = out_size * out_size

    def geom(box, lvl):
        stride = strides_arr[lvl]
        H_l, W_l, off = hs[lvl], ws[lvl], offs[lvl]
        x0 = box[0] / stride - 0.5
        y0 = box[1] / stride - 0.5
        lx = (box[2] - box[0]) / stride
        ly = (box[3] - box[1]) / stride
        wy0 = jnp.clip(
            jnp.floor(y0).astype(jnp.int32), 0, jnp.maximum(H_l - window, 0)
        ) + off
        wy0 = jnp.clip(wy0, 0, bufh - window)
        # x window: clip only to the BUFFER (cols beyond W_l are zero-weight
        # level padding, safe to cover) — clipping to the level width would
        # pin the window left of right-edge boxes on mid-width levels
        wx0 = jnp.clip(jnp.floor(x0).astype(jnp.int32), 0, bufw)
        wx0 = (wx0 // 8) * 8                    # sublane-aligned DMA start
        wx0 = jnp.clip(wx0, 0, bufw - window_x)
        Wy = _axis_weights(y0, ly, H_l, wy0 - off, out_size, window, max_samples)
        Wx = _axis_weights(x0, lx, W_l, wx0, out_size, window_x, max_samples)
        return wy0, wx0, Wy, Wx

    R = boxes.shape[0]
    n = rois_per_step
    pad = (-R) % n
    boxes_p = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)]) if pad else boxes
    levels_p = jnp.concatenate([levels, jnp.zeros((pad,), levels.dtype)]) if pad else levels
    wy0, wx0, Wy, Wx = jax.vmap(geom)(boxes_p, levels_p)
    # combined outer-product weights: [R, out^2, window*window_x]
    wyx = jnp.einsum("rph,rqw->rpqhw", Wy, Wx).reshape(
        R + pad, osq, window * window_x
    )

    n_steps = (R + pad) // n
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (n, osq, window * window_x),
                lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n, osq, C), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, n, window, window_x, C), buffer.dtype),
            pltpu.SemaphoreType.DMA((2, n)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _pool_dma_kernel,
            n=n, window=window, window_x=window_x, n_steps=n_steps,
            precision=precision,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R + pad, osq, C), jnp.float32),
        interpret=interpret,
    )(wy0.astype(jnp.int32), wx0.astype(jnp.int32), buffer, wyx)
    return out[:R].reshape(R, out_size, out_size, C)


def assign_fpn_levels(
    boxes: jnp.ndarray,            # [R, 4] xyxy
    min_level: int = 2,
    max_level: int = 5,
    canonical_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """detectron2 ``assign_boxes_to_levels``: ``floor(L0 + log2(sqrt(area)/s0
    + 1e-8))`` clamped to the pyramid — returned 0-based into [p_min..p_max]."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    lvl = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(area) / canonical_size + 1e-8)
    )
    return (jnp.clip(lvl, min_level, max_level) - min_level).astype(jnp.int32)


def roi_align_reference(
    feat: np.ndarray,        # [H, W, C]
    boxes: np.ndarray,       # [R, 4] xyxy in image coords
    stride: float,
    out_size: int = 7,
    sampling_ratio: int = 0,
    aligned: bool = True,
) -> np.ndarray:
    """Direct per-sample numpy ROIAlign(V2), transcribed from the published
    CUDA kernel (torchvision ``roi_align`` / detectron2 ``ROIAlign``) — the
    oracle the matmul formulation is tested against. O(R * bins^2 * s^2)
    python loops; test-scale only.
    """
    H, W, C = feat.shape
    R = boxes.shape[0]
    out = np.zeros((R, out_size, out_size, C), np.float64)
    off = 0.5 if aligned else 0.0
    f = feat.astype(np.float64)

    def interp(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C)
        y = max(y, 0.0)
        x = max(x, 0.0)
        y_low, x_low = int(y), int(x)
        if y_low >= H - 1:
            y_low = y_high = H - 1
            y = float(y_low)
        else:
            y_high = y_low + 1
        if x_low >= W - 1:
            x_low = x_high = W - 1
            x = float(x_low)
        else:
            x_high = x_low + 1
        ly, lx = y - y_low, x - x_low
        hy, hx = 1.0 - ly, 1.0 - lx
        return (
            hy * hx * f[y_low, x_low]
            + hy * lx * f[y_low, x_high]
            + ly * hx * f[y_high, x_low]
            + ly * lx * f[y_high, x_high]
        )

    for r in range(R):
        x0 = boxes[r, 0] / stride - off
        y0 = boxes[r, 1] / stride - off
        x1 = boxes[r, 2] / stride - off
        y1 = boxes[r, 3] / stride - off
        rw, rh = x1 - x0, y1 - y0
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / out_size, rh / out_size
        gw = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rw / out_size))
        gh = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rh / out_size))
        count = max(gw * gh, 1)
        for by in range(out_size):
            for bx in range(out_size):
                acc = np.zeros(C)
                for iy in range(gh):
                    yy = y0 + by * bh + (iy + 0.5) * bh / gh
                    for ix in range(gw):
                        xx = x0 + bx * bw + (ix + 0.5) * bw / gw
                        acc += interp(yy, xx)
                out[r, by, bx] = acc / count
    return out.astype(np.float32)
