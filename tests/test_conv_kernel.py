"""Fused TemporalConvBlock Pallas kernel (ops/conv_kernel.py) equivalence.

The kernel fuses conv1 -> GELU -> conv2 -> +residual -> GELU -> GroupNorm(1)
(ref ``model.py:21-40``) into one VMEM-resident pass; these tests pin it
against the flax module at every dilation the encoder uses, plus the full
``block_kernel_forward`` against ``HumanActionScorer.apply`` on the same
param tree. Interpret mode on the CPU backend (the TPU path shares the same
kernel body; on-chip agreement is measured in BENCH_NOTES).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_gen_evals_tpu.models import EncoderConfig
from video_gen_evals_tpu.models.fused_apply import block_kernel_forward
from video_gen_evals_tpu.models.fusion_encoder import TemporalConvBlock, init_encoder
from video_gen_evals_tpu.ops.conv_kernel import fused_temporal_block


@pytest.mark.parametrize("dilation", [1, 2, 4, 8])
@pytest.mark.parametrize(
    "precision,variant,atol",
    [("highest", "slice", 2e-5), ("high", "slice", 1e-4),
     ("high", "mm_first", 1e-4)],
)
def test_fused_block_matches_module(rng, dilation, precision, variant, atol):
    B, T, C = 8, 32, 256
    blk = TemporalConvBlock(C, dilation=dilation, dropout=0.0)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    params = blk.init(jax.random.key(dilation), x, deterministic=True)["params"]
    ref = blk.apply({"params": params}, x, deterministic=True)
    out = fused_temporal_block(
        x,
        params["conv1"]["kernel"],
        params["conv2"]["kernel"],
        params["norm"]["scale"],
        params["norm"]["bias"],
        dilation=dilation,
        block_windows=4,
        precision=precision,
        variant=variant,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=atol)


def test_fused_block_rejects_bad_batch(rng):
    x = jnp.zeros((6, 32, 256), jnp.float32)
    w = jnp.zeros((5, 256, 256), jnp.float32)
    g = jnp.zeros((256,), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        fused_temporal_block(x, w, w, g, g, dilation=1, block_windows=4)


def test_block_kernel_forward_matches_module(rng):
    dims_raw = {"vit": 16, "global": 9, "pose": 18, "beta": 10, "kp2d": 12}
    dims_diff = {"vit": 16, "global": 3, "pose": 6, "beta": 10, "kp2d": 12}
    cfg = EncoderConfig.create(
        dims_raw, dims_diff, d_model=256, time_layers=2, time_heads=4
    )
    model, params = init_encoder(cfg, jax.random.key(0), clip_len=32)
    x = jnp.asarray(rng.normal(size=(8, 32, cfg.input_dim)).astype(np.float32))
    ref = model.apply({"params": params}, x, deterministic=True)
    out = block_kernel_forward(
        cfg, params, x, block_windows=4, precision="highest", interpret=True
    )
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    out_hi = block_kernel_forward(
        cfg, params, x, block_windows=4, precision="high", interpret=True
    )
    for a, b in zip(out_hi, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    # end-to-end with the fused Pallas attention at the scoring geometry
    # (N=33, H=4 here; the 8-head regime is pinned in test_attention.py)
    out_core = block_kernel_forward(
        cfg, params, x, block_windows=4, precision="highest",
        attn_impl="core", interpret=True,
    )
    for a, b in zip(out_core, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    with pytest.raises(ValueError, match="attn_impl"):
        block_kernel_forward(
            cfg, params, x, block_windows=4, attn_impl="BENCH_ATTN",
            interpret=True,
        )


def test_chain_kernel_matches_stage_kernels(rng):
    """Whole-chain kernel (ops/chain_kernel.py) is bit-identical to stacking
    fused_temporal_block per stage at precision 'high' (same dots, same order)."""
    from video_gen_evals_tpu.ops.chain_kernel import fused_temporal_chain

    B, Tl, C = 8, 16, 128
    x = jnp.asarray(rng.normal(size=(B, Tl, C)).astype(np.float32))
    w1s = jnp.asarray(rng.normal(size=(4, 5, C, C)).astype(np.float32)) * 0.08
    w2s = jnp.asarray(rng.normal(size=(4, 5, C, C)).astype(np.float32)) * 0.08
    gss = jnp.asarray(1.0 + 0.1 * rng.normal(size=(4, C)).astype(np.float32))
    gbs = jnp.asarray(0.1 * rng.normal(size=(4, C)).astype(np.float32))
    y_ref = x
    for s, dil in enumerate((1, 2, 4, 8)):
        y_ref = fused_temporal_block(
            y_ref, w1s[s], w2s[s], gss[s], gbs[s], dilation=dil,
            block_windows=4, precision="high", interpret=True,
        )
    y = fused_temporal_chain(
        x, w1s, w2s, gss, gbs, block_windows=4, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))


def test_chain_kernel_mm_first_matches_stage_mm(rng):
    """Chain kernel with the scratch-free mm_first taps (round-5) is
    bit-identical to stacking the per-stage mm_first kernel: same unpadded
    dots, same shifted-add accumulation order."""
    from video_gen_evals_tpu.ops.chain_kernel import fused_temporal_chain

    B, Tl, C = 8, 16, 128
    x = jnp.asarray(rng.normal(size=(B, Tl, C)).astype(np.float32))
    w1s = jnp.asarray(rng.normal(size=(4, 5, C, C)).astype(np.float32)) * 0.08
    w2s = jnp.asarray(rng.normal(size=(4, 5, C, C)).astype(np.float32)) * 0.08
    gss = jnp.asarray(1.0 + 0.1 * rng.normal(size=(4, C)).astype(np.float32))
    gbs = jnp.asarray(0.1 * rng.normal(size=(4, C)).astype(np.float32))
    y_ref = x
    for s, dil in enumerate((1, 2, 4, 8)):
        y_ref = fused_temporal_block(
            y_ref, w1s[s], w2s[s], gss[s], gbs[s], dilation=dil,
            block_windows=4, precision="high", variant="mm_first",
            interpret=True,
        )
    y = fused_temporal_chain(
        x, w1s, w2s, gss, gbs, block_windows=4, variant="mm_first",
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
    # split-group form (chain2): same stages in two launches, same numerics
    y2 = x
    for g in ((0, 1), (2, 3)):
        idx = np.array(g)
        y2 = fused_temporal_chain(
            y2, w1s[idx], w2s[idx], gss[idx], gbs[idx],
            dilations=tuple((1, 2, 4, 8)[i] for i in g),
            block_windows=4, variant="mm_first", interpret=True,
        )
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y_ref))


def test_chain_kernel_rejects_unknown_variant(rng):
    from video_gen_evals_tpu.ops.chain_kernel import fused_temporal_chain

    x = jnp.zeros((4, 16, 128), jnp.float32)
    w = jnp.zeros((4, 5, 128, 128), jnp.float32)
    g = jnp.zeros((4, 128), jnp.float32)
    with pytest.raises(ValueError, match="variant"):
        fused_temporal_chain(x, w, w, g, g, block_windows=4,
                             variant="mm", interpret=True)


def test_stacked_fusion_matches_stage(rng):
    """stage_fusion='stacked' (all chains, grid-(chain, block) kernel) is
    bit-identical to the per-chain stage kernels on the full forward."""
    from video_gen_evals_tpu.models.fused_apply import block_kernel_forward

    dims_raw = {"vit": 16, "global": 9, "pose": 18, "beta": 10, "kp2d": 12}
    dims_diff = {"vit": 16, "global": 3, "pose": 6, "beta": 10, "kp2d": 12}
    cfg = EncoderConfig.create(
        dims_raw, dims_diff, d_model=128, time_layers=1, time_heads=4
    )
    model, params = init_encoder(cfg, jax.random.key(0), clip_len=16)
    x = jnp.asarray(rng.normal(size=(8, 16, cfg.input_dim)).astype(np.float32))
    a = block_kernel_forward(cfg, params, x, block_windows=4,
                             precision="high", interpret=True,
                             stage_fusion="stage")
    b = block_kernel_forward(cfg, params, x, block_windows=4,
                             precision="high", interpret=True,
                             stage_fusion="stacked")
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_fused_block_rejects_unknown_strings():
    """Unknown precision/variant strings must raise, not silently fall back
    to a different-numerics kernel."""
    x = jnp.zeros((4, 32, 256), jnp.float32)
    w = jnp.zeros((5, 256, 256), jnp.float32)
    g = jnp.zeros((256,), jnp.float32)
    with pytest.raises(ValueError, match="precision"):
        fused_temporal_block(x, w, w, g, g, dilation=1, block_windows=4,
                             precision="default")
    with pytest.raises(ValueError, match="variant"):
        fused_temporal_block(x, w, w, g, g, dilation=1, block_windows=4,
                             variant="mm-first")
    with pytest.raises(ValueError, match="mm_first"):
        # the f32 path has no mm-first kernel: the combination must raise,
        # not silently run the slice kernel with variant ignored
        fused_temporal_block(x, w, w, g, g, dilation=1, block_windows=4,
                             precision="highest", variant="mm_first")
