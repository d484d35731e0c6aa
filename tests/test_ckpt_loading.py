"""Permissive torch checkpoint loading (ref eval.py:136-165 semantics):
bare state dicts and model_state_dict/state_dict wrappers all load, and the
loaded params reproduce the source model's outputs."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from video_gen_evals_tpu.models import EncoderConfig, HumanActionScorer
from video_gen_evals_tpu.models.fusion_encoder import init_encoder
from video_gen_evals_tpu.models.torch_compat import (
    flax_params_to_torch_state_dict,
    load_torch_checkpoint,
)

DIMS_RAW = {"vit": 16, "pose": 18}
DIMS_DIFF = {"vit": 16, "pose": 6}


@pytest.fixture(scope="module")
def setup():
    cfg = EncoderConfig.create(DIMS_RAW, DIMS_DIFF, d_model=32, time_layers=1, time_heads=4)
    model, params = init_encoder(cfg, jax.random.key(0), clip_len=8)
    sd_np = flax_params_to_torch_state_dict(jax.device_get(params), cfg)
    sd_torch = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd_np.items()}
    return cfg, model, params, sd_torch


@pytest.mark.parametrize("wrapper", [None, "model_state_dict", "state_dict"])
def test_load_torch_checkpoint_wrappers(setup, tmp_path, wrapper, rng):
    cfg, model, params, sd_torch = setup
    path = str(tmp_path / f"ckpt_{wrapper}.pt")
    obj = sd_torch if wrapper is None else {wrapper: sd_torch}
    torch.save(obj, path)

    loaded = load_torch_checkpoint(path, cfg)
    x = jnp.asarray(rng.normal(size=(2, 8, cfg.input_dim)).astype(np.float32))
    ref = model.apply({"params": params}, x, deterministic=True)
    out = model.apply({"params": loaded}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(ref[2]), atol=1e-6)
