"""SMPL token decoder head — the TokenHMR-equivalent mesh/pose/feature head.

Capability parity with the reference's patched ``SMPLTokenDecoderHead``
(ref ``modifications/token_head.py:131-247``), whose defining behaviors are:

1. a zero input token cross-attends over the ViT patch tokens through a
   TransformerDecoder (dim 1024), yielding ``token_out [B, 1024]``
   (ref ``token_head.py:202-213``) — **this IS the "vit" modality** stored per
   frame in the extraction npz (ref ``mesh_generator.py:160``);
2. linear readouts with iterative-error-feedback residual adds: global
   orientation as 6d (``decpose_grot``), body pose via a token classifier over
   a frozen VQ codebook (``decpose``), hands 12d, shape 10, cam 3
   (ref ``token_head.py:216-222``);
3. rot6d -> rotmat conversion and the global/body split
   (ref ``token_head.py:228-246``).

Outputs match the extraction contract exactly: ``body_pose [B,23,3,3]``,
``betas [B,10]``, ``global_orient [B,1,3,3]``, ``token_out [B,1024]``
(ref ``extract_mesh.py:25-44``, ``mesh_generator.py:157-169``).

The cross-attention decoder follows TokenHMR's pose_transformer layout
(pre-LN blocks of self-attn / cross-attn over context / FFN). Upstream
checkpoint conversion maps through :func:`torch_head_to_flax`.
"""

from __future__ import annotations

import dataclasses
import typing as T

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.so3 import rot6d_to_rotmat


@dataclasses.dataclass(frozen=True)
class SMPLHeadConfig:
    dim: int = 1024
    context_dim: int = 1280
    depth: int = 6
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 1024
    num_body_joints: int = 23       # SMPL body joints (pose output [23,3,3])
    # --- TokenClassfier geometry (ref token_head.py:160-164 ctor args; the
    # tokenizer decoder follows the public PCT 'parts' layout, see
    # TokenClassifier). Real checkpoints carry their own geometry — derive a
    # matching config with classifier_config_from_state_dict().
    token_num: int = 160            # VQ tokens for body pose (cfg TOKEN_NUM)
    token_class_num: int = 2048     # codebook size (cfg TOKEN_CLASS_NUM)
    token_code_dim: int = 32        # codebook embedding dim (TOKEN_CODE_DIM)
    dec_num_blocks: int = 1         # tokenizer-decoder MixerLayer count
    dec_hidden_dim: int = 32        # tokenizer-decoder channel width
    dec_token_inter_dim: int = 64   # token-mixing MLP inner width
    dec_hidden_inter_dim: int = 64  # channel MLP inner width
    ief_iters: int = 1

    @property
    def npose(self) -> int:
        return 6 * (self.num_body_joints + 1)  # 144: grot + 21 body + 2 hands

    @property
    def n_parts(self) -> int:
        return self.num_body_joints - 2  # 21 tokenized (non-hand) body joints


class _SelfAttention(nn.Module):
    """Upstream ``pose_transformer.Attention``: fused qkv projection
    (``to_qkv`` [dim, 3*heads*dim_head], no bias), scale ``dim_head**-0.5``,
    output projection ``to_out`` (with bias). Note inner dim (heads*dim_head)
    need not equal ``dim`` — HMR2/TokenHMR use 8x64=512 inside dim=1024."""

    dim: int
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, N, _ = x.shape
        q = q.reshape(B, N, self.heads, self.dim_head)
        k = k.reshape(B, N, self.heads, self.dim_head)
        v = v.reshape(B, N, self.heads, self.dim_head)
        attn = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k) * (self.dim_head ** -0.5), axis=-1
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, inner)
        return nn.Dense(self.dim, name="to_out")(out)


class _CrossAttention(nn.Module):
    """Upstream ``pose_transformer.CrossAttention``: ``to_q`` from the token
    stream, fused ``to_kv`` from the context stream (both bias-free),
    ``to_out`` with bias."""

    dim: int
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)
        B, Nq, _ = x.shape
        Nk = context.shape[1]
        q = q.reshape(B, Nq, self.heads, self.dim_head)
        k = k.reshape(B, Nk, self.heads, self.dim_head)
        v = v.reshape(B, Nk, self.heads, self.dim_head)
        attn = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k) * (self.dim_head ** -0.5), axis=-1
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Nq, inner)
        return nn.Dense(self.dim, name="to_out")(out)


class CrossAttentionDecoder(nn.Module):
    """Exact flax re-layout of the upstream ``TransformerDecoder`` the
    reference head instantiates (ref ``modifications/token_head.py:151-153``;
    upstream HMR2/TokenHMR ``pose_transformer.py``):

      x = to_token_embedding(token); x = x + pos_embedding
      per layer: x = SA(LN(x)) + x ; x = CA(LN(x), ctx) + x ; x = FF(LN(x)) + x

    Pre-norm residual blocks (norm INSIDE the residual branch), torch LayerNorm
    eps 1e-5, exact GELU, and NO final layer norm. Every parameter has a
    1:1 torch counterpart (see :func:`torch_head_to_flax`)."""

    config: SMPLHeadConfig

    @nn.compact
    def __call__(self, token: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = nn.Dense(cfg.dim, name="to_token_embedding")(token)
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(1.0),
            (1, 1, cfg.dim),
        )
        x = x + pos[:, : x.shape[1]]
        for i in range(cfg.depth):
            h = nn.LayerNorm(epsilon=1e-5, name=f"sa_ln{i}")(x)
            x = x + _SelfAttention(cfg.dim, cfg.heads, cfg.dim_head, name=f"sa{i}")(h)
            h = nn.LayerNorm(epsilon=1e-5, name=f"ca_ln{i}")(x)
            x = x + _CrossAttention(cfg.dim, cfg.heads, cfg.dim_head, name=f"ca{i}")(
                h, context
            )
            h = nn.LayerNorm(epsilon=1e-5, name=f"ff_ln{i}")(x)
            h = nn.Dense(cfg.mlp_dim, name=f"ff1_{i}")(h)
            h = jax.nn.gelu(h, approximate=False)
            x = x + nn.Dense(cfg.dim, name=f"ff2_{i}")(h)
        return x


class _MixerLayer(nn.Module):
    """Flax re-layout of PCT's ``MixerLayer`` (public, Geng et al. CVPR 2023
    ``models/modules.py`` — the layer family TokenHMR's 'parts' tokenizer
    decoder is built from): token-mixing MLP then channel MLP, with the
    distinctive three-way residual ``out = x + y + z``. Exact GELU, torch
    LayerNorm eps 1e-5, dropout 0 at inference."""

    hidden_dim: int
    hidden_inter_dim: int
    token_dim: int
    token_inter_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        y = jnp.swapaxes(y, 1, 2)                       # [B, C, J]
        y = nn.Dense(self.token_inter_dim, name="token_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.token_dim, name="token_fc2")(y)
        y = jnp.swapaxes(y, 1, 2)                       # [B, J, C]
        z = nn.LayerNorm(epsilon=1e-5, name="ln2")(x + y)
        z = nn.Dense(self.hidden_inter_dim, name="channel_fc1")(z)
        z = jax.nn.gelu(z, approximate=False)
        z = nn.Dense(self.hidden_dim, name="channel_fc2")(z)
        return x + y + z


class TokenClassifier(nn.Module):
    """Body-pose token classifier over a frozen VQ tokenizer decoder
    (upstream TokenHMR ``TokenClassfier``; ref ``token_head.py:160-164,217``).

    Layout: a linear ``cls_head`` maps ``token_out [B, dim]`` to per-token
    class logits ``[B, token_num, token_class_num]``; the softmax-expected
    codebook embedding (soft lookup — PCT decodes the expectation under the
    class distribution, not the argmax) feeds the frozen tokenizer *decoder*
    in the public PCT 'parts' layout (``models/pct_tokenizer.py`` decode
    path): ``decoder_token_mlp`` mixes token_num tokens down to the 21
    non-hand body joints, ``decoder_start`` lifts codes to the decoder width,
    ``dec_num_blocks`` MixerLayers, LayerNorm, and ``recover_embed`` reads
    out 6d rotations per joint -> ``[B, 126]`` pose residuals.

    The decoder structure is the published PCT layout; the single-linear
    ``cls_head`` is the minimal reading of the classifier (validated against
    a real checkpoint via scripts/activation_diff.py — conversion infers all
    geometry from the state_dict and fails loudly on unrecognized keys)."""

    config: SMPLHeadConfig

    @nn.compact
    def __call__(self, token_out: jnp.ndarray):
        cfg = self.config
        B = token_out.shape[0]
        logits = nn.Dense(cfg.token_num * cfg.token_class_num, name="cls_head")(
            token_out
        ).reshape(B, cfg.token_num, cfg.token_class_num)
        probs = jax.nn.softmax(logits, axis=-1)
        codebook = self.param(
            "codebook",
            nn.initializers.normal(0.02),
            (cfg.token_class_num, cfg.token_code_dim),
        )
        codes = jnp.einsum("btc,cd->btd", probs, codebook)  # soft lookup
        x = jnp.swapaxes(codes, 1, 2)                       # [B, C, N]
        x = nn.Dense(cfg.n_parts, name="decoder_token_mlp")(x)
        x = jnp.swapaxes(x, 1, 2)                           # [B, J=21, C]
        x = nn.Dense(cfg.dec_hidden_dim, name="decoder_start")(x)
        for i in range(cfg.dec_num_blocks):
            x = _MixerLayer(
                cfg.dec_hidden_dim,
                cfg.dec_hidden_inter_dim,
                cfg.n_parts,
                cfg.dec_token_inter_dim,
                name=f"mixer_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-5, name="decoder_ln")(x)
        j6 = nn.Dense(6, name="recover_embed")(x)           # [B, 21, 6]
        return j6.reshape(B, cfg.n_parts * 6), probs


class SMPLTokenDecoderHead(nn.Module):
    """Cross-attention SMPL decoder head with token_out exposure."""

    config: SMPLHeadConfig

    @nn.compact
    def __call__(self, context_tokens: jnp.ndarray) -> T.Dict[str, jnp.ndarray]:
        """``context_tokens``: [B, N, context_dim] ViT patch tokens ->
        dict with body_pose/betas/global_orient/cam/token_out."""
        cfg = self.config
        B = context_tokens.shape[0]
        if context_tokens.shape[-1] != cfg.context_dim:
            raise ValueError(
                f"context tokens width {context_tokens.shape[-1]} != "
                f"config.context_dim {cfg.context_dim}"
            )

        init_body_pose = self.param(
            "init_body_pose", nn.initializers.zeros, (1, cfg.npose)
        )
        init_betas = self.param("init_betas", nn.initializers.zeros, (1, 10))
        init_cam = self.param("init_cam", nn.initializers.zeros, (1, 3))

        pred_body_pose = jnp.broadcast_to(init_body_pose, (B, cfg.npose))
        pred_betas = jnp.broadcast_to(init_betas, (B, 10))
        pred_cam = jnp.broadcast_to(init_cam, (B, 3))

        decoder = CrossAttentionDecoder(cfg, name="decoder")
        classifier = TokenClassifier(cfg, name="decpose")
        # readouts constructed ONCE (shared across IEF iterations, matching
        # the reference head); in-loop construction would raise flax's
        # NameInUseError for ief_iters >= 2
        dec_grot = nn.Dense(6, name="decpose_grot")
        dec_hands = nn.Dense(12, name="decpose_hands")
        dec_shape = nn.Dense(10, name="decshape")
        dec_cam = nn.Dense(3, name="deccam")
        token_out = None
        for _ in range(cfg.ief_iters):
            token = jnp.zeros((B, 1, 1), context_tokens.dtype)  # zero input token
            token_out = decoder(token, context_tokens)[:, 0, :]  # [B, dim]
            pred_grot = dec_grot(token_out)
            body_6d, _probs = classifier(token_out)
            pred_hands = dec_hands(token_out)
            pred_body_pose = (
                jnp.concatenate([pred_grot, body_6d, pred_hands], axis=-1)
                + pred_body_pose
            )
            pred_betas = dec_shape(token_out) + pred_betas
            pred_cam = dec_cam(token_out) + pred_cam

        R = rot6d_to_rotmat(pred_body_pose.reshape(B, cfg.num_body_joints + 1, 6))
        return {
            "global_orient": R[:, :1],          # [B, 1, 3, 3]
            "body_pose": R[:, 1:],              # [B, 23, 3, 3]
            "betas": pred_betas,                # [B, 10]
            "cam": pred_cam,                    # [B, 3]
            "token_out": token_out,             # [B, 1024] — the "vit" modality
        }


def _convert_decpose(
    sub: T.Dict[str, np.ndarray], cfg: SMPLHeadConfig
) -> T.Dict[str, T.Any]:
    """Map the TokenClassfier state_dict slice (keys relative to ``decpose.``)
    onto the flax :class:`TokenClassifier` tree.

    Recognizes the frozen PCT-layout tokenizer decoder regardless of its
    nesting prefix (``tokenizer.decoder_start`` vs ``decoder_start`` etc.) by
    key *suffix*: ``codebook``, ``decoder_token_mlp``, ``decoder_start``,
    ``decoder.{i}.{layernorm1,MLP_token.ff.0,...}`` MixerLayers,
    ``decoder_layer_norm``, ``recover_embed``. Whatever single linear
    (weight [N*V, dim] + optional bias) remains is the classifier head. Any
    leftover key is a layout mismatch and raises — a real checkpoint can
    never be silently half-converted."""
    out: T.Dict[str, T.Any] = {}
    consumed: T.Set[str] = set()

    def find(suffix: str) -> T.Optional[str]:
        hits = [k for k in sub if k == suffix or k.endswith("." + suffix)]
        if len(hits) > 1:
            raise ValueError(f"decpose: ambiguous keys for '{suffix}': {hits}")
        return hits[0] if hits else None

    def dense(stem: str) -> T.Optional[T.Dict[str, np.ndarray]]:
        wk = find(f"{stem}.weight")
        if wk is None:
            return None
        consumed.add(wk)
        d = {"kernel": np.transpose(sub[wk], (1, 0))}
        bk = find(f"{stem}.bias")
        if bk is not None:
            consumed.add(bk)
            d["bias"] = sub[bk]
        return d

    def lnorm(stem: str) -> T.Optional[T.Dict[str, np.ndarray]]:
        wk, bk = find(f"{stem}.weight"), find(f"{stem}.bias")
        if wk is None:
            return None
        if bk is None:
            # the flax module always carries a bias param; a bias-less torch
            # LayerNorm is a layout we don't model — refuse loudly rather
            # than crash with KeyError(None)
            raise ValueError(
                f"decpose: LayerNorm '{stem}' has weight but no bias — "
                "unsupported layout (torch LayerNorm(bias=False)?)"
            )
        consumed.add(wk)
        consumed.add(bk)
        return {"scale": sub[wk], "bias": sub[bk]}

    cb = find("codebook")
    if cb is not None:
        consumed.add(cb)
        out["codebook"] = sub[cb]
    for stem, name in (
        ("decoder_token_mlp", "decoder_token_mlp"),
        ("decoder_start", "decoder_start"),
        ("recover_embed", "recover_embed"),
    ):
        d = dense(stem)
        if d is not None:
            out[name] = d
    d = lnorm("decoder_layer_norm")
    if d is not None:
        out["decoder_ln"] = d
    i = 0
    while find(f"decoder.{i}.layernorm1.weight") is not None:
        out[f"mixer_{i}"] = {
            "ln1": lnorm(f"decoder.{i}.layernorm1"),
            "token_fc1": dense(f"decoder.{i}.MLP_token.ff.0"),
            "token_fc2": dense(f"decoder.{i}.MLP_token.ff.3"),
            "ln2": lnorm(f"decoder.{i}.layernorm2"),
            "channel_fc1": dense(f"decoder.{i}.MLP_channel.ff.0"),
            "channel_fc2": dense(f"decoder.{i}.MLP_channel.ff.3"),
        }
        i += 1

    # the classifier head: the one remaining Linear (any name)
    rest = [k for k in sub if k not in consumed]
    head_w = [k for k in rest if k.endswith(".weight") and sub[k].ndim == 2]
    if len(head_w) == 1:
        wk = head_w[0]
        consumed.add(wk)
        out["cls_head"] = {"kernel": np.transpose(sub[wk], (1, 0))}
        bk = wk[: -len("weight")] + "bias"
        if bk in sub:
            consumed.add(bk)
            out["cls_head"]["bias"] = sub[bk]
    leftovers = sorted(k for k in sub if k not in consumed)
    if leftovers:
        raise ValueError(
            "decpose: unrecognized TokenClassfier keys (layout mismatch — "
            f"refusing a partial conversion): {leftovers}"
        )
    return out


def classifier_config_from_state_dict(
    sd: T.Dict[str, np.ndarray], cfg: SMPLHeadConfig
) -> SMPLHeadConfig:
    """Derive the TokenClassfier geometry fields of ``cfg`` from a real
    checkpoint's ``decpose.*`` shapes (codebook [V, C], token-MLP [J, N],
    decoder widths) so the flax init tree matches before conversion."""
    sub = {k[len("decpose."):]: v for k, v in sd.items() if k.startswith("decpose.")}
    if not sub:
        return cfg
    upd: T.Dict[str, int] = {}

    def shape(suffix):
        hits = [k for k in sub if k == suffix or k.endswith("." + suffix)]
        return sub[hits[0]].shape if hits else None

    s = shape("codebook")
    if s is not None:
        upd["token_class_num"], upd["token_code_dim"] = int(s[0]), int(s[1])
    s = shape("decoder_token_mlp.weight")
    if s is not None:
        upd["token_num"] = int(s[1])
    s = shape("decoder_start.weight")
    if s is not None:
        upd["dec_hidden_dim"] = int(s[0])
    s = shape("decoder.0.MLP_token.ff.0.weight")
    if s is not None:
        upd["dec_token_inter_dim"] = int(s[0])
    s = shape("decoder.0.MLP_channel.ff.0.weight")
    if s is not None:
        upd["dec_hidden_inter_dim"] = int(s[0])
    n = 0
    while shape(f"decoder.{n}.layernorm1.weight") is not None:
        n += 1
    if n:
        upd["dec_num_blocks"] = n
    return dataclasses.replace(cfg, **upd)


def torch_head_to_flax(sd: T.Dict[str, np.ndarray], cfg: SMPLHeadConfig) -> T.Dict:
    """Map the reference head's torch state_dict onto this tree.

    Covers the linear readouts, the IEF init buffers, the full upstream
    ``TransformerDecoder`` (ref ``modifications/token_head.py:151-153``;
    upstream key layout ``transformer.to_token_embedding``,
    ``transformer.pos_embedding``, ``transformer.transformer.layers.{i}.{j}``
    with j=0 self-attn / j=1 cross-attn / j=2 feed-forward, each a PreNorm
    wrapper with ``.norm`` + ``.fn``), AND the TokenClassfier (``decpose.*``,
    ref ``token_head.py:160-164`` — classifier head + frozen PCT-layout
    tokenizer decoder, see :func:`_convert_decpose`; geometry can be derived
    first with :func:`classifier_config_from_state_dict`). The decoder alone
    determines ``token_out`` — the per-frame "vit" modality the scorer
    consumes — so this mapping is what end-to-end feature parity rides on.
    Any key left unconsumed is a layout mismatch and raises (the same
    loud-failure policy as :func:`_convert_decpose` and the d2 converter) —
    a silently half-converted head would only surface as score drift."""
    used: T.Set[str] = set()

    def take(key):
        used.add(key)
        return sd[key]

    def dense(prefix):
        out = {"kernel": np.transpose(take(f"{prefix}.weight"), (1, 0))}
        if f"{prefix}.bias" in sd:
            out["bias"] = take(f"{prefix}.bias")
        return out

    def ln(prefix):
        return {"scale": take(f"{prefix}.weight"), "bias": take(f"{prefix}.bias")}

    params: T.Dict[str, T.Any] = {}
    for name in ("decpose_grot", "decpose_hands", "decshape", "deccam"):
        if f"{name}.weight" in sd:
            params[name] = dense(name)
    for buf in ("init_body_pose", "init_betas", "init_cam"):
        if buf in sd:
            params[buf] = take(buf)

    decpose_sub = {
        k[len("decpose."):]: v for k, v in sd.items() if k.startswith("decpose.")
    }
    used.update(k for k in sd if k.startswith("decpose."))  # validated inside
    if decpose_sub:
        params["decpose"] = _convert_decpose(decpose_sub, cfg)

    if "transformer.to_token_embedding.weight" in sd:
        dec: T.Dict[str, T.Any] = {
            "to_token_embedding": dense("transformer.to_token_embedding"),
            "pos_embedding": take("transformer.pos_embedding"),
        }
        i = 0
        while f"transformer.transformer.layers.{i}.0.norm.weight" in sd:
            p = f"transformer.transformer.layers.{i}"
            dec[f"sa_ln{i}"] = ln(f"{p}.0.norm")
            dec[f"sa{i}"] = {
                "to_qkv": dense(f"{p}.0.fn.to_qkv"),
                "to_out": dense(f"{p}.0.fn.to_out.0"),
            }
            dec[f"ca_ln{i}"] = ln(f"{p}.1.norm")
            dec[f"ca{i}"] = {
                "to_q": dense(f"{p}.1.fn.to_q"),
                "to_kv": dense(f"{p}.1.fn.to_kv"),
                "to_out": dense(f"{p}.1.fn.to_out.0"),
            }
            dec[f"ff_ln{i}"] = ln(f"{p}.2.norm")
            dec[f"ff1_{i}"] = dense(f"{p}.2.fn.net.0")
            dec[f"ff2_{i}"] = dense(f"{p}.2.fn.net.3")
            i += 1
        params["decoder"] = dec
    leftover = set(sd) - used
    if leftover:
        raise ValueError(
            f"torch_head_to_flax: {len(leftover)} unconsumed checkpoint "
            f"key(s) — layout mismatch, refusing a half-converted head; "
            f"e.g. {sorted(leftover)[:5]}"
        )
    return params
