"""Pallas flash-attention kernel vs einsum reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from video_gen_evals_tpu.ops.attention import attention_xla, flash_attention


@pytest.mark.parametrize(
    "B,N,H,D", [(2, 33, 8, 32), (1, 192, 4, 64), (2, 128, 2, 128), (1, 130, 2, 64)]
)
def test_flash_matches_reference(rng, B, N, H, D):
    q = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    ref = np.asarray(attention_xla(q, k, v))
    out = np.asarray(flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_flash_respects_padding_mask(rng):
    """Values in the padded tail must not leak into the output."""
    B, N, H, D = 1, 33, 2, 32
    q = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    out1 = np.asarray(flash_attention(q, k, v, interpret=True))
    # same inputs -> same outputs regardless of what padding would contain
    out2 = np.asarray(flash_attention(q * 1.0, k * 1.0, v * 1.0, interpret=True))
    np.testing.assert_array_equal(out1, out2)
    ref = np.asarray(attention_xla(q, k, v))
    np.testing.assert_allclose(out1, ref, atol=2e-5)


def test_flash_blocked_kv(rng):
    """KV streaming with multiple blocks (online softmax correctness)."""
    B, N, H, D = 1, 256, 2, 32
    q = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    out = np.asarray(
        flash_attention(q, k, v, block_q=64, block_kv=64, interpret=True)
    )
    ref = np.asarray(attention_xla(q, k, v))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_flash_bf16_precision_mode(rng):
    """precision='default' (bf16 single-pass dots, the extraction mode)
    agrees with the einsum reference at bf16-level tolerance."""
    B, N, H, D = 2, 192, 4, 80
    q = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    k = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    v = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ref = np.asarray(
        attention_xla(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        )
    )
    out = np.asarray(
        flash_attention(q, k, v, interpret=True, precision="default")
    ).astype(np.float32)
    np.testing.assert_allclose(out, ref, atol=0.03, rtol=0.03)


@pytest.mark.parametrize(
    "B,N,H,D",
    [
        (2, 48, 4, 64),   # aligned shapes
        (2, 33, 8, 32),   # the scoring regime: sublane-unaligned N, sub-128
                          # lane slices (the block_kernel_forward call site)
    ],
)
@pytest.mark.parametrize("precision", ["highest", "high"])
def test_mha_core_matches_reference(rng, B, N, H, D, precision):
    """Layout-preserving attention core (ops/attention_core.py) vs einsum."""
    from video_gen_evals_tpu.ops.attention_core import mha_core

    q = jnp.asarray(rng.normal(size=(B, N, H * D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, N, H * D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, N, H * D)).astype(np.float32))
    ref = np.asarray(
        attention_xla(
            q.reshape(B, N, H, D), k.reshape(B, N, H, D), v.reshape(B, N, H, D)
        )
    ).reshape(B, N, H * D)
    out = np.asarray(
        mha_core(q, k, v, heads=H, precision=precision, interpret=True)
    )
    # interpret mode runs f32 regardless of precision class; on-chip "high"
    # is bf16_3x (within the scoring budget, PARITY.md)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_mha_core_rejects_bad_precision(rng):
    from video_gen_evals_tpu.ops.attention_core import mha_core

    q = jnp.zeros((2, 8, 32), jnp.float32)
    with pytest.raises(ValueError, match="precision"):
        mha_core(q, q, q, heads=4, precision="BENCH_ATTN", interpret=True)


def test_vit_block_core_impl_matches_xla(rng):
    """ViTBlock(attention_impl='core') == the einsum block on shared params."""
    import jax
    from video_gen_evals_tpu.models.vit import ViTBlock

    B, N, D, H = 2, 24, 64, 4
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    blk_x = ViTBlock(D, H)
    blk_c = ViTBlock(D, H, attention_impl="core_interpret")
    params = blk_x.init(jax.random.key(0), x)["params"]
    yx = blk_x.apply({"params": params}, x)
    yc = blk_c.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(yx), atol=5e-3,
                               rtol=5e-3)


def test_mha_head_batched_matches_reference(rng):
    """Head-batched packed-QKV schedule (round-3 candidate) vs einsum."""
    from video_gen_evals_tpu.ops.attention_core import mha_head_batched

    B, N, H, D = 2, 48, 4, 64
    q = jnp.asarray(rng.normal(size=(B, N, H * D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, N, H * D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, N, H * D)).astype(np.float32))
    ref = np.asarray(
        attention_xla(
            q.reshape(B, N, H, D), k.reshape(B, N, H, D), v.reshape(B, N, H, D)
        )
    ).reshape(B, N, H * D)
    out = np.asarray(mha_head_batched(q, k, v, heads=H, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)
    # odd block_pairs fallback (BH=8 % 3 != 0 -> bp halves to 1)
    out2 = np.asarray(
        mha_head_batched(q, k, v, heads=H, block_pairs=3, interpret=True)
    )
    np.testing.assert_allclose(out2, ref, atol=2e-5)


def test_vit_block_head_batched_impl_matches_xla(rng):
    import jax
    from video_gen_evals_tpu.models.vit import ViTBlock

    B, N, D, H = 2, 24, 64, 4
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    blk_x = ViTBlock(D, H)
    blk_h = ViTBlock(D, H, attention_impl="head_batched_interpret")
    params = blk_x.init(jax.random.key(0), x)["params"]
    yx = blk_x.apply({"params": params}, x)
    yh = blk_h.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(yh), np.asarray(yx), atol=5e-3,
                               rtol=5e-3)
