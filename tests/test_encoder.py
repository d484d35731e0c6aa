"""Fusion-encoder parity tests.

The oracle is an independent torch-functional composition of the documented
block spec (conv stem + dilated residual blocks + GroupNorm, latent-query
fusion with learned temperature, torch ``nn.TransformerEncoderLayer``), driven
by weights exported from the flax model via the torch_compat converter. This
validates both the model math and the checkpoint converter in one shot.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from video_gen_evals_tpu.models import EncoderConfig, HumanActionScorer
from video_gen_evals_tpu.models.fusion_encoder import init_encoder
from video_gen_evals_tpu.models.torch_compat import (
    flax_params_to_torch_state_dict,
    torch_state_dict_to_flax,
)

DIMS_RAW = {"vit": 16, "global": 9, "pose": 18, "beta": 10, "kp2d": 12}
DIMS_DIFF = {"vit": 16, "global": 3, "pose": 6, "beta": 10, "kp2d": 12}
D_MODEL, HEADS, LAYERS, T_LEN, B = 32, 4, 2, 8, 3


def small_config():
    return EncoderConfig.create(
        DIMS_RAW, DIMS_DIFF, d_model=D_MODEL, time_heads=HEADS, time_layers=LAYERS
    )


# ----------------------------- torch oracle ------------------------------


def _movement_encoder_torch(sd, prefix, x, dilations=(1, 2, 4, 8), k=5):
    y = F.conv1d(x.transpose(1, 2), sd[f"{prefix}.stem.weight"])
    for i, d in enumerate(dilations):
        pad = d * (k - 1) // 2
        res = y
        h = F.gelu(F.conv1d(y, sd[f"{prefix}.blocks.{i}.conv1.weight"], padding=pad, dilation=d))
        h = F.conv1d(h, sd[f"{prefix}.blocks.{i}.conv2.weight"], padding=pad, dilation=d)
        h = F.gelu(h + res)
        y = F.group_norm(
            h, 1, sd[f"{prefix}.blocks.{i}.norm.weight"], sd[f"{prefix}.blocks.{i}.norm.bias"], eps=1e-5
        )
    y = y.transpose(1, 2)
    return F.linear(y, sd[f"{prefix}.proj.weight"])


def _fusion_torch(sd, m_tokens):
    Bt, Tt, M, D = m_tokens.shape
    kv = F.layer_norm(m_tokens, (D,), sd["fusion.kv_ln.weight"], sd["fusion.kv_ln.bias"]).view(Bt * Tt, M, D)
    q = F.layer_norm(
        sd["fusion.latent"].expand(Bt * Tt, 1, D), (D,), sd["fusion.q_ln.weight"], sd["fusion.q_ln.bias"]
    )
    Q = F.linear(q, sd["fusion.Wq.weight"])
    K = F.linear(kv, sd["fusion.Wk.weight"])
    V = F.linear(kv, sd["fusion.Wv.weight"])
    logits = torch.matmul(Q, K.transpose(-2, -1)) / math.sqrt(D)
    tau = F.softplus(sd["fusion.logit_temp"]) + 1e-3
    logits = logits / tau.view(1, 1, M) + sd["fusion.logit_bias"].view(1, 1, M)
    A = logits.softmax(dim=-1)
    fused = torch.matmul(A, V).squeeze(1)
    return F.linear(fused, sd["fusion.Wo.weight"]).view(Bt, Tt, D)


def _transformer_layer_torch(sd, i, x):
    layer = torch.nn.TransformerEncoderLayer(
        D_MODEL, HEADS, 4 * D_MODEL, dropout=0.0, batch_first=True
    )
    prefix = f"temporal.layers.{i}."
    layer_sd = {
        k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
    }
    layer.load_state_dict(layer_sd)
    layer.eval()
    with torch.no_grad():
        return layer(x)


def _pe_torch(T, d):
    pos = torch.arange(T, dtype=torch.float32).unsqueeze(1)
    div = torch.exp(torch.arange(0, d, 2, dtype=torch.float32) * (-math.log(10000.0) / d))
    pe = torch.zeros(T, d)
    pe[:, 0::2] = torch.sin(pos * div)
    pe[:, 1::2] = torch.cos(pos * div)
    return pe


def oracle_forward(sd_np, cfg, x_np):
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}
    x = torch.from_numpy(x_np)
    raw = x[:, :, : cfg.one_pass_raw]
    diff = x[:, :, cfg.one_pass_raw : cfg.one_pass_raw + cfg.one_pass_diff]
    diff_dims = dict(cfg.dims_map_diff)

    per_mod = []
    r_off = d_off = 0
    with torch.no_grad():
        for m, rd in cfg.dims_map_raw:
            s = _movement_encoder_torch(sd, f"state_enc.{m}", raw[:, :, r_off : r_off + rd])
            r_off += rd
            dd = diff_dims[m]
            if dd > 0:
                s = s + _movement_encoder_torch(sd, f"motion_enc.{m}", diff[:, :, d_off : d_off + dd])
            d_off += dd
            s = F.layer_norm(s, (s.size(-1),))
            per_mod.append(s.unsqueeze(2))
        m_tokens = torch.cat(per_mod, dim=2)
        frame_tok = _fusion_torch(sd, m_tokens)
        tokens = torch.cat([sd["cls"].expand(x.shape[0], 1, D_MODEL), frame_tok], dim=1)
        tokens = tokens + _pe_torch(tokens.shape[1], D_MODEL).unsqueeze(0)
        for i in range(LAYERS):
            tokens = _transformer_layer_torch(sd, i, tokens)
        seq = F.normalize(tokens[:, 0, :])
        frames = F.normalize(tokens, dim=-1)
    return seq.numpy(), frames.numpy(), tokens.numpy()


# ------------------------------- tests -----------------------------------


def test_forward_shapes(rng):
    cfg = small_config()
    model, params = init_encoder(cfg, jax.random.key(0), clip_len=T_LEN)
    x = jnp.asarray(rng.normal(size=(B, T_LEN, cfg.input_dim)).astype(np.float32))
    seq, frames, tokens = model.apply({"params": params}, x, deterministic=True)
    assert seq.shape == (B, D_MODEL)
    assert frames.shape == (B, T_LEN + 1, D_MODEL)
    assert tokens.shape == (B, T_LEN + 1, D_MODEL)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(seq), axis=-1), 1.0, atol=1e-5)


def test_full_model_matches_torch_oracle(rng):
    cfg = small_config()
    model, params = init_encoder(cfg, jax.random.key(1), clip_len=T_LEN)
    x = rng.normal(size=(B, T_LEN, cfg.input_dim)).astype(np.float32)

    seq_j, frames_j, tokens_j = model.apply(
        {"params": params}, jnp.asarray(x), deterministic=True
    )
    sd = flax_params_to_torch_state_dict(jax.device_get(params), cfg)
    seq_t, frames_t, tokens_t = oracle_forward(sd, cfg, x)

    np.testing.assert_allclose(np.asarray(tokens_j), tokens_t, atol=2e-4)
    np.testing.assert_allclose(np.asarray(seq_j), seq_t, atol=2e-4)
    np.testing.assert_allclose(np.asarray(frames_j), frames_t, atol=2e-4)


def test_converter_round_trip(rng):
    cfg = small_config()
    _, params = init_encoder(cfg, jax.random.key(2), clip_len=T_LEN)
    sd = flax_params_to_torch_state_dict(jax.device_get(params), cfg)
    back = torch_state_dict_to_flax(sd, cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(jax.device_get(params))
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    # compare by path
    b_by_path = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(back)}
    for p, v in flat_a:
        key = jax.tree_util.keystr(p)
        np.testing.assert_allclose(np.asarray(v), np.asarray(b_by_path[key]), atol=0)


def test_deterministic_forward_is_reproducible(rng):
    cfg = small_config()
    model, params = init_encoder(cfg, jax.random.key(3), clip_len=T_LEN)
    x = jnp.asarray(rng.normal(size=(2, T_LEN, cfg.input_dim)).astype(np.float32))
    a = model.apply({"params": params}, x, deterministic=True)
    b = model.apply({"params": params}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))


def test_dropout_changes_output_in_train_mode(rng):
    cfg = small_config()
    model, params = init_encoder(cfg, jax.random.key(4), clip_len=T_LEN)
    x = jnp.asarray(rng.normal(size=(2, T_LEN, cfg.input_dim)).astype(np.float32))
    out1 = model.apply(
        {"params": params}, x, deterministic=False, rngs={"dropout": jax.random.key(5)}
    )
    out2 = model.apply(
        {"params": params}, x, deterministic=False, rngs={"dropout": jax.random.key(6)}
    )
    assert not np.allclose(np.asarray(out1[2]), np.asarray(out2[2]))


def test_fusion_attention_exposure(rng):
    """Parity with the reference's last_attn stash (ref model.py:185): the
    per-frame fusion attention map is retrievable and row-stochastic."""
    from video_gen_evals_tpu.models.fusion_encoder import apply_with_attention

    cfg = small_config()
    model, params = init_encoder(cfg, jax.random.key(9), clip_len=T_LEN)
    x = jnp.asarray(rng.normal(size=(2, T_LEN, cfg.input_dim)).astype(np.float32))
    (seq, frames, tokens), attn = apply_with_attention(model, params, x)
    M = len(cfg.modalities)
    assert attn.shape == (2, T_LEN, M)
    np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, atol=1e-5)
    assert seq.shape == (2, D_MODEL)
