"""HumanActionScorer — the human-centric fusion encoder, as one XLA graph.

Capability parity with reference ``model.py`` (C1-C5 in SURVEY.md):

- :class:`TemporalConvBlock`     <- ref ``model.py:21-40``
- :class:`MovementConvEncoder`   <- ref ``model.py:43-58``
- :class:`PerFrameFusion`        <- ref ``model.py:61-98`` (MinimalPerFrameFusion)
- :class:`TransformerEncoderLayer` <- torch ``nn.TransformerEncoderLayer``
  semantics (post-LN, ReLU, packed qkv) as used at ref ``model.py:145-146``
- :class:`HumanActionScorer`     <- ref ``model.py:102-193``

Design notes (TPU-first):
- The whole forward is a single jittable function with static shapes; the
  per-modality loop unrolls at trace time (<= 7 modalities).
- Convs run as ``[B, T, C]`` NWC convolutions (XLA tiles them onto the MXU);
  the 33-token temporal transformer is plain einsum attention (far below the
  flash-attention crossover at this sequence length).
- Numerical conventions match torch so converted checkpoints reproduce
  reference embeddings: exact (erf) GELU, GroupNorm/LayerNorm eps = 1e-5,
  ``F.normalize`` eps = 1e-12, attention scaled by 1/sqrt(head_dim).

Documented reference quirks kept for API parity:
- ``latent_dim`` is accepted and unused (ref ``model.py:107``) — the embedding
  dimension is ``d_model``.
- ``modality_mask`` is accepted and unused (ref ``model.py:79,180-182``).
"""

from __future__ import annotations

import dataclasses
import math
import typing as T

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.deltas import l2_normalize

DimsMap = T.Mapping[str, int]


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Hyperparameters of the fusion encoder (ref ``model.py:102-110``)."""

    dims_map_raw: T.Tuple[T.Tuple[str, int], ...]
    dims_map_diff: T.Tuple[T.Tuple[str, int], ...]
    d_model: int = 256
    latent_dim: int = 128          # accepted, unused (reference quirk)
    time_layers: int = 4
    time_heads: int = 8
    dropout: float = 0.1
    # "xla" (default) | "pallas" | "pallas_interpret"; the Pallas fused
    # kernel only engages on the deterministic path (attention-weight dropout
    # needs materialized weights, so training keeps the einsum path)
    attention_impl: str = "xla"
    # "module" (XLA conv lowering) | "kernel" (fused Pallas conv stages with
    # custom VJP — trains through ops/conv_kernel_train.py)
    conv_impl: str = "module"
    conv_precision: str = "default"

    @classmethod
    def create(
        cls,
        dims_map_raw: DimsMap,
        dims_map_diff: DimsMap,
        **kw,
    ) -> "EncoderConfig":
        if set(dims_map_raw.keys()) != set(dims_map_diff.keys()):
            raise ValueError(
                "dims_map_raw and dims_map_diff must have the same modality keys."
            )
        return cls(
            dims_map_raw=tuple((m, int(d)) for m, d in dims_map_raw.items()),
            dims_map_diff=tuple(
                (m, int(dims_map_diff[m])) for m, _ in dims_map_raw.items()
            ),
            **kw,
        )

    @property
    def modalities(self) -> T.Tuple[str, ...]:
        return tuple(m for m, _ in self.dims_map_raw)

    @property
    def one_pass_raw(self) -> int:
        return sum(d for _, d in self.dims_map_raw)

    @property
    def one_pass_diff(self) -> int:
        return sum(d for _, d in self.dims_map_diff)

    @property
    def has_diff(self) -> bool:
        return any(d > 0 for _, d in self.dims_map_diff)

    @property
    def input_dim(self) -> int:
        return self.one_pass_raw + (self.one_pass_diff if self.has_diff else 0)


def sinusoidal_positional_embedding(length: int, d_model: int) -> jnp.ndarray:
    """Fixed sin/cos PE table ``[length, d_model]`` (ref ``model.py:8-19``)."""
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    ang = pos * div                                   # [length, d_model/2]
    return jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1).reshape(length, d_model)


class TemporalConvBlock(nn.Module):
    """Residual dilated conv pair, GELU, GroupNorm(1) (ref ``model.py:21-40``)."""

    channels: int
    kernel_size: int = 5
    dilation: int = 1
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        pad = self.dilation * (self.kernel_size - 1) // 2
        conv = lambda name: nn.Conv(
            self.channels,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=[(pad, pad)],
            use_bias=False,
            name=name,
        )
        res = x
        y = jax.nn.gelu(conv("conv1")(x), approximate=False)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = conv("conv2")(y)
        y = jax.nn.gelu(y + res, approximate=False)
        # torch GroupNorm(1, C) over [B, C, T] normalizes jointly over (C, T)
        # per sample; flax GroupNorm(num_groups=1) on [B, T, C] matches.
        return nn.GroupNorm(num_groups=1, epsilon=1e-5, name="norm")(y)


class _SubParam(nn.Module):
    """A named child scope holding bare parameters — lets the kernel-backed
    block expose the EXACT param tree of :class:`TemporalConvBlock`
    (``{"conv1": {"kernel"}, ...}``) so checkpoints are interchangeable."""

    specs: T.Tuple[T.Tuple[str, T.Tuple[int, ...], T.Any], ...]

    @nn.compact
    def __call__(self):
        return tuple(self.param(n, init, shape) for n, shape, init in self.specs)


class TemporalConvBlockKernel(nn.Module):
    """:class:`TemporalConvBlock` with the whole residual stage running in the
    fused Pallas kernel (``ops/conv_kernel_train.py``): forward AND backward
    are single fused launches, with dropout applied in-kernel from a mask
    drawn off the flax ``dropout`` RNG stream. Param tree and init values are
    identical to the module block (same child-scope paths), so the two are
    checkpoint-interchangeable."""

    channels: int
    kernel_size: int = 5
    dilation: int = 1
    dropout: float = 0.1
    precision: str = "default"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from ..ops.conv_kernel_train import fused_temporal_block_train

        C = self.channels
        k = self.kernel_size
        conv_init = nn.initializers.lecun_normal()
        (w1,) = _SubParam(((("kernel"), (k, C, C), conv_init),), name="conv1")()
        (w2,) = _SubParam(((("kernel"), (k, C, C), conv_init),), name="conv2")()
        gs, gb = _SubParam(
            (
                ("scale", (C,), nn.initializers.ones),
                ("bias", (C,), nn.initializers.zeros),
            ),
            name="norm",
        )()
        if deterministic or self.dropout == 0.0:
            mask = None
        else:
            keep = 1.0 - self.dropout
            mask = (
                jax.random.bernoulli(self.make_rng("dropout"), keep, x.shape)
                / keep
            ).astype(x.dtype)
        return fused_temporal_block_train(
            x, w1, w2, gs, gb, mask,
            self.dilation, self.precision,
        )


class MovementConvEncoder(nn.Module):
    """Per-modality temporal encoder: 1x1 stem -> dilated blocks -> linear proj
    (ref ``model.py:43-58``)."""

    d_out: int
    dropout: float = 0.1
    kernel_size: int = 5
    dilations: T.Tuple[int, ...] = (1, 2, 4, 8)
    conv_impl: str = "module"       # "module" | "kernel" (fused Pallas stage)
    conv_precision: str = "default"

    @nn.compact
    def __call__(self, x_btf: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        y = nn.Conv(self.d_out, kernel_size=(1,), use_bias=False, name="stem")(x_btf)
        for i, d in enumerate(self.dilations):
            if self.conv_impl == "kernel":
                y = TemporalConvBlockKernel(
                    self.d_out,
                    kernel_size=self.kernel_size,
                    dilation=d,
                    dropout=self.dropout,
                    precision=self.conv_precision,
                    name=f"block{i}",
                )(y, deterministic=deterministic)
            else:
                y = TemporalConvBlock(
                    self.d_out,
                    kernel_size=self.kernel_size,
                    dilation=d,
                    dropout=self.dropout,
                    name=f"block{i}",
                )(y, deterministic=deterministic)
        return nn.Dense(self.d_out, use_bias=False, name="proj")(y)


class PerFrameFusion(nn.Module):
    """One learned latent query cross-attends over M modality tokens per frame,
    with per-modality learned temperature and additive logit bias
    (ref ``model.py:61-98``)."""

    d_model: int
    n_modalities: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        m_tokens: jnp.ndarray,  # [B, T, M, D]
        mask: T.Optional[jnp.ndarray] = None,  # accepted, unused (ref quirk)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        del mask  # reference accepts but never applies it (model.py:79)
        B, Tlen, M, D = m_tokens.shape
        latent = self.param(
            "latent", nn.initializers.normal(1.0), (1, 1, self.d_model)
        )
        kv = nn.LayerNorm(epsilon=1e-5, name="kv_ln")(m_tokens)
        q = nn.LayerNorm(epsilon=1e-5, name="q_ln")(
            jnp.broadcast_to(latent, (B, Tlen, 1, self.d_model))
        )
        Q = nn.Dense(self.d_model, use_bias=False, name="Wq")(q)      # [B,T,1,D]
        K = nn.Dense(self.d_model, use_bias=False, name="Wk")(kv)     # [B,T,M,D]
        V = nn.Dense(self.d_model, use_bias=False, name="Wv")(kv)

        logits = jnp.einsum("btqd,btmd->btqm", Q, K) / math.sqrt(D)   # [B,T,1,M]
        logit_temp = self.param("logit_temp", nn.initializers.zeros, (M,))
        logit_bias = self.param("logit_bias", nn.initializers.zeros, (M,))
        tau = jax.nn.softplus(logit_temp) + 1e-3
        logits = logits / tau[None, None, None, :] + logit_bias[None, None, None, :]

        A = jax.nn.softmax(logits, axis=-1)
        self.sow("intermediates", "fusion_attn", A[:, :, 0, :])
        A = nn.Dropout(self.dropout, deterministic=deterministic)(A)
        fused = jnp.einsum("btqm,btmd->btqd", A, V)[:, :, 0, :]
        return nn.Dense(self.d_model, use_bias=False, name="Wo")(fused)


class TransformerEncoderLayer(nn.Module):
    """torch ``nn.TransformerEncoderLayer`` semantics: post-LN, ReLU FFN,
    packed qkv projection, dropout on attention weights and residuals."""

    d_model: int
    n_heads: int
    d_ff: int
    dropout: float = 0.1
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, S, D = x.shape
        H = self.n_heads
        hd = D // H

        qkv = nn.Dense(3 * D, name="in_proj")(x)                     # [B,S,3D]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, H, hd)
        k = k.reshape(B, S, H, hd)
        v = v.reshape(B, S, H, hd)
        if deterministic and self.attention_impl != "xla":
            from ..ops.attention import multihead_attention

            ctx = multihead_attention(
                q, k, v, impl=self.attention_impl
            ).reshape(B, S, D)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
            attn = jax.nn.softmax(logits, axis=-1)
            attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, S, D)
        ctx = nn.Dense(D, name="out_proj")(ctx)
        ctx = nn.Dropout(self.dropout, deterministic=deterministic)(ctx)
        x = nn.LayerNorm(epsilon=1e-5, name="ln1")(x + ctx)

        h = nn.Dense(self.d_ff, name="linear1")(x)
        h = jax.nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(D, name="linear2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(epsilon=1e-5, name="ln2")(x + h)


class HumanActionScorer(nn.Module):
    """Fusion encoder over concatenated raw||diff multi-modal features
    (ref ``model.py:102-193``).

    Input  ``x``: ``[B, T, D]`` with the raw block first, concatenation order =
    insertion order of the dims map (ref ``utils.py:496-514``).
    Returns ``(seq_embed [B, d_model], frame_embeds [B, T+1, d_model],
    tokens [B, T+1, d_model])`` — both embeds L2-normalized.
    """

    config: EncoderConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        modality_mask: T.Optional[jnp.ndarray] = None,  # accepted, unused
        deterministic: bool = True,
    ):
        del modality_mask  # reference computes a fusion mask and ignores it
        cfg = self.config
        B, Tlen, D = x.shape
        if D != cfg.input_dim:
            raise ValueError(f"expected input dim {cfg.input_dim}, got {D}")

        # split raw / diff blocks, then per-modality chunks (static slicing)
        raw = x[:, :, : cfg.one_pass_raw]
        diff = (
            x[:, :, cfg.one_pass_raw : cfg.one_pass_raw + cfg.one_pass_diff]
            if cfg.has_diff
            else None
        )

        per_mod = []
        r_off = 0
        d_off = 0
        diff_dims = dict(cfg.dims_map_diff)
        for m, rd in cfg.dims_map_raw:
            s = MovementConvEncoder(
                cfg.d_model, dropout=cfg.dropout, name=f"state_enc_{m}",
                conv_impl=cfg.conv_impl, conv_precision=cfg.conv_precision,
            )(raw[:, :, r_off : r_off + rd], deterministic=deterministic)
            r_off += rd
            dd = diff_dims[m]
            if cfg.has_diff and dd > 0:
                u = MovementConvEncoder(
                    cfg.d_model, dropout=cfg.dropout, name=f"motion_enc_{m}",
                    conv_impl=cfg.conv_impl, conv_precision=cfg.conv_precision,
                )(diff[:, :, d_off : d_off + dd], deterministic=deterministic)
                s = s + u
            d_off += dd
            # non-affine layer norm over the feature dim (ref model.py:175)
            mu = jnp.mean(s, axis=-1, keepdims=True)
            var = jnp.var(s, axis=-1, keepdims=True)
            s = (s - mu) / jnp.sqrt(var + 1e-5)
            per_mod.append(s[:, :, None, :])

        m_tokens = jnp.concatenate(per_mod, axis=2)                  # [B,T,M,Dm]

        frame_tok = PerFrameFusion(
            cfg.d_model, len(cfg.modalities), dropout=cfg.dropout, name="fusion"
        )(m_tokens, deterministic=deterministic)                     # [B,T,Dm]

        cls = self.param("cls", nn.initializers.normal(1.0), (1, 1, cfg.d_model))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, cfg.d_model)), frame_tok], axis=1
        )
        tokens = tokens + sinusoidal_positional_embedding(Tlen + 1, cfg.d_model)[
            None, :, :
        ].astype(tokens.dtype)
        for i in range(cfg.time_layers):
            tokens = TransformerEncoderLayer(
                cfg.d_model,
                cfg.time_heads,
                4 * cfg.d_model,
                dropout=cfg.dropout,
                attention_impl=cfg.attention_impl,
                name=f"temporal{i}",
            )(tokens, deterministic=deterministic)

        cls_out = tokens[:, 0, :]
        seq_embed = l2_normalize(cls_out, axis=-1)
        frame_embeds = l2_normalize(tokens, axis=-1)
        return seq_embed, frame_embeds, tokens


def init_encoder(
    config: EncoderConfig, rng: jax.Array, clip_len: int = 32
) -> T.Tuple[HumanActionScorer, T.Any]:
    """Convenience: build module + init params on a dummy window batch."""
    model = HumanActionScorer(config)
    dummy = jnp.zeros((1, clip_len, config.input_dim), jnp.float32)
    params = model.init({"params": rng}, dummy, deterministic=True)["params"]
    return model, params


def apply_with_attention(
    model: HumanActionScorer, params, x: jnp.ndarray
) -> T.Tuple[T.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Forward pass that also returns the per-frame fusion attention map
    ``[B, T, M]`` — the reference stashes this on the module as ``last_attn``
    (ref ``model.py:77,94,148,185``); here it is sown into the flax
    ``intermediates`` collection and surfaced functionally."""
    outputs, inter = model.apply(
        {"params": params}, x, deterministic=True, mutable=["intermediates"]
    )
    attn = inter["intermediates"]["fusion"]["fusion_attn"][0]
    return outputs, attn
