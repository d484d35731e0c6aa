"""ROIAlignV2 separable-matmul formulation vs the per-sample oracle.

The oracle (`roi_align_reference`) is a direct float64 transcription of the
published torchvision/detectron2 CUDA kernel (aligned=True, adaptive
sampling), so agreement here covers the bilinear border rules, the
``ceil(extent/bins)`` sample counts, the 1/count averaging, and the packed
multi-level window addressing.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from video_gen_evals_tpu.ops.roi_align import (
    assign_fpn_levels,
    pack_pyramid,
    roi_align_pyramid,
    roi_align_reference,
)

STRIDES = (4, 8, 16, 32)


def _pyramid(rng, hw, C):
    H, W = hw
    return [
        rng.standard_normal((max(H // s, 1), max(W // s, 1), C)).astype(np.float32)
        for s in STRIDES
    ]


BOXES = np.array(
    [
        [10, 12, 80, 100],
        [0, 0, 30, 30],
        [100, 50, 220, 158],    # near bottom-right
        [-5, -5, 40, 60],       # spills past top-left (clipped taps)
        [5, 5, 5, 5],           # degenerate -> zeros
        [200, 140, 224, 160],   # corner
        [3, 90, 180, 130],      # wide aspect (span 44 cells at stride 4)
        [60, 2, 80, 150],       # tall aspect
        [30, 30, 31.7, 33.2],   # tiny (single-sample bins)
    ],
    np.float32,
)


def test_matches_reference_per_level():
    rng = np.random.default_rng(0)
    feats = _pyramid(rng, (160, 224), C=8)
    buf, offs, hw = pack_pyramid([jnp.asarray(f) for f in feats])
    levels = assign_fpn_levels(jnp.asarray(BOXES))
    got = np.asarray(
        roi_align_pyramid(
            buf, offs, hw, STRIDES, jnp.asarray(BOXES), levels, chunk=4
        )
    )
    for r in range(len(BOXES)):
        lvl = int(levels[r])
        want = roi_align_reference(feats[lvl], BOXES[r : r + 1], STRIDES[lvl])
        assert np.abs(got[r] - want[0]).max() < 1e-4, r


def test_forced_levels_cover_all_strides():
    """Same boxes pooled from EVERY level (exercises window clamping at the
    coarse levels where the level extent is smaller than the window)."""
    rng = np.random.default_rng(1)
    feats = _pyramid(rng, (160, 224), C=4)
    buf, offs, hw = pack_pyramid([jnp.asarray(f) for f in feats])
    boxes = BOXES[:6]
    for lvl in range(4):
        levels = jnp.full((len(boxes),), lvl, jnp.int32)
        got = np.asarray(
            roi_align_pyramid(
                buf, offs, hw, STRIDES, jnp.asarray(boxes), levels, chunk=3
            )
        )
        want = roi_align_reference(feats[lvl], boxes, STRIDES[lvl])
        assert np.abs(got - want).max() < 1e-4, lvl


def test_adaptive_sample_counts_beyond_one():
    """Large box at a fine level -> ceil(extent/7) of 5-8 samples per bin."""
    rng = np.random.default_rng(2)
    feats = _pyramid(rng, (256, 256), C=4)
    buf, offs, hw = pack_pyramid([jnp.asarray(f) for f in feats])
    boxes = np.array([[4, 8, 224, 248], [0, 0, 180, 120]], np.float32)
    levels = jnp.full((2,), 1, jnp.int32)   # stride 8: spans ~28 cells
    got = np.asarray(
        roi_align_pyramid(buf, offs, hw, STRIDES, jnp.asarray(boxes), levels, chunk=2)
    )
    want = roi_align_reference(feats[1], boxes, STRIDES[1])
    assert np.abs(got - want).max() < 1e-4


def test_level_assignment_matches_detectron2_rule():
    boxes = jnp.asarray(
        [
            [0, 0, 64, 64],      # sqrt=64  -> floor(4 + log2(64/224)) = 2
            [0, 0, 224, 224],    # canonical -> 4
            [0, 0, 448, 448],    # -> 5
            [0, 0, 1200, 1200],  # clamps to 5
            [0, 0, 8, 8],        # clamps to 2
            [0, 0, 112, 112],    # sqrt=112 -> 3
        ],
        jnp.float32,
    )
    got = np.asarray(assign_fpn_levels(boxes))
    assert got.tolist() == [0, 2, 3, 3, 0, 1]


def test_over_span_box_degrades_gracefully():
    """A box spanning more cells than the window reads edge cells for its
    outer bins — bounded output, never silent zeros."""
    rng = np.random.default_rng(4)
    feats = _pyramid(rng, (256, 256), C=4)
    buf, offs, hw = pack_pyramid([jnp.asarray(f) for f in feats])
    box = np.array([[0, 100, 250, 140]], np.float32)   # 62 cells at stride 4
    out = np.asarray(
        roi_align_pyramid(
            buf, offs, hw, STRIDES, jnp.asarray(box),
            jnp.zeros((1,), jnp.int32), chunk=1,
        )
    )
    assert np.all(np.abs(out).max(axis=-1) > 0)        # every bin populated
    assert np.abs(out).max() <= np.abs(feats[0]).max() + 1e-5


@pytest.mark.parametrize("aligned", [True])
def test_oracle_degenerate_box_zero(aligned):
    rng = np.random.default_rng(3)
    feat = rng.standard_normal((16, 16, 2)).astype(np.float32)
    out = roi_align_reference(
        feat, np.array([[8, 8, 8, 8]], np.float32), 4.0, aligned=aligned
    )
    assert np.all(out == 0)


def test_dma_pool_matches_matmul_pool_and_reference():
    """roi_align_pyramid_dma (Pallas burst-DMA + single-GEMM form) ==
    the XLA matmul pool AND the CUDA-transcription oracle, interpret mode.
    Same _axis_weights math; only dot-order rounding differs."""
    from video_gen_evals_tpu.ops.roi_align import roi_align_pyramid_dma

    rng = np.random.default_rng(3)
    feats = _pyramid(rng, (160, 224), C=8)
    buf, offs, hw = pack_pyramid([jnp.asarray(f) for f in feats])
    levels = assign_fpn_levels(jnp.asarray(BOXES))
    base = np.asarray(
        roi_align_pyramid(
            buf, offs, hw, STRIDES, jnp.asarray(BOXES), levels, chunk=4
        )
    )
    for n in (1, 3):
        got = np.asarray(
            roi_align_pyramid_dma(
                buf, offs, hw, STRIDES, jnp.asarray(BOXES), levels,
                rois_per_step=n, interpret=True,
            )
        )
        np.testing.assert_allclose(got, base, atol=1e-4)
    got = np.asarray(
        roi_align_pyramid_dma(
            buf, offs, hw, STRIDES, jnp.asarray(BOXES), levels,
            rois_per_step=1, interpret=True,
        )
    )
    for r in range(len(BOXES)):
        lvl = int(levels[r])
        want = roi_align_reference(feats[lvl], BOXES[r : r + 1], STRIDES[lvl])
        assert np.abs(got[r] - want[0]).max() < 1e-4, r


def test_dma_pool_small_levels_and_bf16():
    """Tiny pyramid (levels smaller than the window) + bf16 buffer path."""
    from video_gen_evals_tpu.ops.roi_align import roi_align_pyramid_dma

    rng = np.random.default_rng(4)
    feats = _pyramid(rng, (48, 80), C=4)
    boxes = np.array([[2, 2, 30, 40], [10, 5, 46, 70]], np.float32)
    buf, offs, hw = pack_pyramid([jnp.asarray(f) for f in feats])
    levels = assign_fpn_levels(jnp.asarray(boxes))
    base = np.asarray(
        roi_align_pyramid(
            buf, offs, hw, STRIDES, jnp.asarray(boxes), levels, chunk=2
        )
    )
    got = np.asarray(
        roi_align_pyramid_dma(
            buf, offs, hw, STRIDES, jnp.asarray(boxes), levels, interpret=True
        )
    )
    np.testing.assert_allclose(got, base, atol=1e-4)
    got_bf = np.asarray(
        roi_align_pyramid_dma(
            buf.astype(jnp.bfloat16), offs, hw, STRIDES, jnp.asarray(boxes),
            levels, interpret=True,
        )
    )
    np.testing.assert_allclose(got_bf, base, atol=0.02, rtol=0.02)


def test_dma_pool_right_edge_mid_level():
    """Regression (found on-chip): a box near the RIGHT edge of a mid-width
    level (floor(x0) > W_l - window_x) must still be covered — the x window
    may extend past the level width (zero-weight padding), so it clips only
    to the buffer, never left of the box."""
    from video_gen_evals_tpu.ops.roi_align import roi_align_pyramid_dma

    rng = np.random.default_rng(6)
    feats = _pyramid(rng, (256, 272), C=8)      # p2 = 64x68 (stride 4)
    boxes = np.array([[240.0, 20.0, 268.0, 120.0]], np.float32)
    buf, offs, hw = pack_pyramid([jnp.asarray(f) for f in feats])
    levels = assign_fpn_levels(jnp.asarray(boxes))
    assert int(levels[0]) == 0                   # stride 4: x taps 59..67
    base = np.asarray(
        roi_align_pyramid(
            buf, offs, hw, STRIDES, jnp.asarray(boxes), levels, chunk=1
        )
    )
    got = np.asarray(
        roi_align_pyramid_dma(
            buf, offs, hw, STRIDES, jnp.asarray(boxes), levels, interpret=True
        )
    )
    np.testing.assert_allclose(got, base, atol=1e-4)
    want = roi_align_reference(feats[0], boxes, STRIDES[0])
    np.testing.assert_allclose(got, want, atol=1e-4)
