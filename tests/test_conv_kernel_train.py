"""Trainable fused conv-stage kernel (``ops/conv_kernel_train.py``): forward
and custom-VJP backward parity against the module block / a pure-jnp replica,
plus checkpoint interchangeability of the kernel-backed encoder.

Runs in Pallas interpret mode on the CPU conftest backend (the kernel
auto-selects interpret off-TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_gen_evals_tpu.models.fusion_encoder import (
    EncoderConfig,
    HumanActionScorer,
    TemporalConvBlock,
    TemporalConvBlockKernel,
    init_encoder,
)
from video_gen_evals_tpu.ops.conv_kernel_train import fused_temporal_block_train

B, T, C, K = 8, 8, 32, 5


def _replica(x, w1, w2, gs, gb, mask, dilation):
    """Pure-jnp f32 replica of the fused stage (conv via XLA, exact erf)."""
    def conv(src, w):
        pad = dilation * (K - 1) // 2
        return jax.lax.conv_general_dilated(
            src, w, (1,), [(pad, pad)], rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=jax.lax.Precision.HIGHEST,
        )

    a1 = jax.nn.gelu(conv(x, w1), approximate=False)
    if mask is not None:
        a1 = a1 * mask
    h = jax.nn.gelu(conv(a1, w2) + x, approximate=False)
    mu = jnp.mean(h, axis=(1, 2), keepdims=True)
    var = jnp.var(h, axis=(1, 2), keepdims=True)
    hn = (h - mu) / jnp.sqrt(var + 1e-5)
    return hn * gs[None, None, :] + gb[None, None, :]


def _inputs(seed=0, with_mask=False):
    ks = jax.random.split(jax.random.key(seed), 6)
    x = jax.random.normal(ks[0], (B, T, C), jnp.float32)
    w1 = jax.random.normal(ks[1], (K, C, C)) * 0.1
    w2 = jax.random.normal(ks[2], (K, C, C)) * 0.1
    gs = 1.0 + 0.1 * jax.random.normal(ks[3], (C,))
    gb = 0.1 * jax.random.normal(ks[4], (C,))
    mask = None
    if with_mask:
        mask = (jax.random.bernoulli(ks[5], 0.9, (B, T, C)) / 0.9).astype(
            jnp.float32
        )
    return x, w1, w2, gs, gb, mask


@pytest.mark.parametrize("dilation", [1, 4])
def test_forward_matches_replica_highest(dilation):
    x, w1, w2, gs, gb, _ = _inputs()
    got = fused_temporal_block_train(
        x, w1, w2, gs, gb, None, dilation, "highest"
    )
    want = _replica(x, w1, w2, gs, gb, None, dilation)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_forward_dropout_mask_applied():
    x, w1, w2, gs, gb, mask = _inputs(with_mask=True)
    got = fused_temporal_block_train(x, w1, w2, gs, gb, mask, 2, "highest")
    want = _replica(x, w1, w2, gs, gb, mask, 2)
    np.testing.assert_allclose(got, want, atol=2e-5)
    plain = fused_temporal_block_train(x, w1, w2, gs, gb, None, 2, "highest")
    assert float(jnp.max(jnp.abs(got - plain))) > 1e-3


@pytest.mark.parametrize("with_mask", [False, True])
def test_custom_vjp_matches_autodiff_of_replica(with_mask):
    x, w1, w2, gs, gb, mask = _inputs(with_mask=with_mask)
    probe = jax.random.normal(jax.random.key(9), (B, T, C))

    def loss_kernel(x, w1, w2, gs, gb):
        y = fused_temporal_block_train(x, w1, w2, gs, gb, mask, 2, "highest")
        return jnp.sum(y * probe)

    def loss_replica(x, w1, w2, gs, gb):
        return jnp.sum(_replica(x, w1, w2, gs, gb, mask, 2) * probe)

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(x, w1, w2, gs, gb)
    g_r = jax.grad(loss_replica, argnums=(0, 1, 2, 3, 4))(x, w1, w2, gs, gb)
    for a, b, name in zip(g_k, g_r, ["dx", "dw1", "dw2", "dgs", "dgb"]):
        np.testing.assert_allclose(
            a, b, atol=5e-4, rtol=5e-4, err_msg=name
        )


def test_default_precision_close_to_f32():
    # bf16 single-pass dots: same math at reduced mantissa
    x, w1, w2, gs, gb, _ = _inputs()
    got = fused_temporal_block_train(x, w1, w2, gs, gb, None, 1, "default")
    want = _replica(x, w1, w2, gs, gb, None, 1)
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.1)


def test_kernel_block_module_param_tree_and_forward():
    """TemporalConvBlockKernel: identical param tree + init values to the
    module block, and matching deterministic forward."""
    x = jax.random.normal(jax.random.key(0), (B, T, C))
    mod = TemporalConvBlock(C, dilation=2)
    ker = TemporalConvBlockKernel(C, dilation=2, precision="highest")
    p_mod = mod.init(jax.random.key(7), x, deterministic=True)["params"]
    p_ker = ker.init(jax.random.key(7), x, deterministic=True)["params"]
    assert jax.tree_util.tree_structure(p_mod) == jax.tree_util.tree_structure(
        p_ker
    )
    for a, b in zip(jax.tree_util.tree_leaves(p_mod),
                    jax.tree_util.tree_leaves(p_ker)):
        np.testing.assert_array_equal(a, b)
    y_mod = mod.apply({"params": p_mod}, x, deterministic=True)
    y_ker = ker.apply({"params": p_mod}, x, deterministic=True)
    np.testing.assert_allclose(y_ker, y_mod, atol=2e-5)


def test_encoder_conv_impl_kernel_checkpoint_compatible():
    """Full HumanActionScorer with conv_impl='kernel' consumes module-path
    params and reproduces the deterministic embeddings."""
    dims_raw = {"pose": 12, "beta": 6}
    dims_diff = {"pose": 12, "beta": 0}
    cfg_mod = EncoderConfig.create(dims_raw, dims_diff, d_model=32,
                                   time_layers=1)
    cfg_ker = EncoderConfig.create(dims_raw, dims_diff, d_model=32,
                                   time_layers=1, conv_impl="kernel",
                                   conv_precision="highest")
    model_mod, params = init_encoder(cfg_mod, jax.random.key(0), clip_len=T)
    model_ker = HumanActionScorer(cfg_ker)
    x = jax.random.normal(jax.random.key(1), (B, T, cfg_mod.input_dim))
    e_mod, f_mod, _ = model_mod.apply({"params": params}, x,
                                      deterministic=True)
    e_ker, f_ker, _ = model_ker.apply({"params": params}, x,
                                      deterministic=True)
    np.testing.assert_allclose(e_ker, e_mod, atol=5e-5)
    np.testing.assert_allclose(f_ker, f_mod, atol=5e-5)


def test_train_grads_match_module_impl():
    """value_and_grad of the eval-mode contrastive loss agrees between
    conv_impl='module' and conv_impl='kernel' on shared params."""
    from video_gen_evals_tpu.train.step import make_loss_fn

    dims_raw = {"pose": 12}
    dims_diff = {"pose": 12}
    cfg_mod = EncoderConfig.create(dims_raw, dims_diff, d_model=32,
                                   time_layers=1)
    cfg_ker = EncoderConfig.create(dims_raw, dims_diff, d_model=32,
                                   time_layers=1, conv_impl="kernel",
                                   conv_precision="highest")
    model_mod, params = init_encoder(cfg_mod, jax.random.key(0), clip_len=T)
    model_ker = HumanActionScorer(cfg_ker)
    feats = jax.random.normal(jax.random.key(1), (4, T, cfg_mod.input_dim))
    labels = jnp.array([0, 0, 1, 1])
    rng = jax.random.key(2)
    out = {}
    for name, model in [("module", model_mod), ("kernel", model_ker)]:
        loss_fn = make_loss_fn(model, matmul_precision="highest")
        (total, _), grads = jax.value_and_grad(
            lambda p: loss_fn(p, feats, labels, rng, False), has_aux=True
        )(params)
        out[name] = (total, grads)
    np.testing.assert_allclose(out["kernel"][0], out["module"][0], rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(out["kernel"][1]),
                    jax.tree_util.tree_leaves(out["module"][1])):
        np.testing.assert_allclose(a, b, atol=3e-4, rtol=3e-3)


def test_train_mode_dropout_runs_and_is_stochastic():
    """Training path (mask drawn from the dropout stream) runs under grad and
    two different RNGs give different losses."""
    dims_raw = {"pose": 12}
    cfg = EncoderConfig.create(dims_raw, dims_raw, d_model=32, time_layers=1,
                               conv_impl="kernel")
    model = HumanActionScorer(cfg)
    x = jax.random.normal(jax.random.key(1), (4, T, cfg.input_dim))
    params = model.init({"params": jax.random.key(0)}, x,
                        deterministic=True)["params"]

    probe = jax.random.normal(jax.random.key(5), (32,))

    def loss(p, key):
        e, _, _ = model.apply({"params": p}, x, deterministic=False,
                              rngs={"dropout": key})
        return jnp.sum(e @ probe)

    l1, g = jax.value_and_grad(loss)(params, jax.random.key(1))
    l2 = loss(params, jax.random.key(2))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert abs(float(l1) - float(l2)) > 1e-6
    assert all(np.all(np.isfinite(le)) for le in jax.tree_util.tree_leaves(g))
