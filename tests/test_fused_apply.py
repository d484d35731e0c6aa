"""Fused scoring forward == module forward, on the same param tree."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_gen_evals_tpu.models import EncoderConfig
from video_gen_evals_tpu.models.fused_apply import fused_forward
from video_gen_evals_tpu.models.fusion_encoder import init_encoder


@pytest.mark.parametrize(
    "dims_raw,dims_diff",
    [
        (
            {"vit": 16, "global": 9, "pose": 18, "beta": 10, "kp2d": 12},
            {"vit": 16, "global": 3, "pose": 6, "beta": 10, "kp2d": 12},
        ),
        # a modality with zero diff dim exercises the chain/slot bookkeeping
        (
            {"vit": 16, "pose": 18, "beta": 10},
            {"vit": 16, "pose": 0, "beta": 10},
        ),
    ],
)
@pytest.mark.parametrize("conv_impl", ["vmap_conv", "tap_matmul"])
def test_fused_matches_module(rng, dims_raw, dims_diff, conv_impl):
    cfg = EncoderConfig.create(
        dims_raw, dims_diff, d_model=32, time_layers=2, time_heads=4
    )
    model, params = init_encoder(cfg, jax.random.key(0), clip_len=8)
    x = jnp.asarray(rng.normal(size=(3, 8, cfg.input_dim)).astype(np.float32))

    ref = model.apply({"params": params}, x, deterministic=True)
    out = fused_forward(cfg, params, x, conv_impl=conv_impl)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_fused_jittable(rng):
    dims_raw = {"vit": 16, "pose": 18}
    dims_diff = {"vit": 16, "pose": 6}
    cfg = EncoderConfig.create(dims_raw, dims_diff, d_model=32, time_layers=1, time_heads=4)
    _, params = init_encoder(cfg, jax.random.key(1), clip_len=8)
    x = jnp.asarray(rng.normal(size=(2, 8, cfg.input_dim)).astype(np.float32))
    f = jax.jit(lambda p, xx: fused_forward(cfg, p, xx))
    seq, frames, tokens = f(params, x)
    assert seq.shape == (2, 32)
