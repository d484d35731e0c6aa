"""ViT backbone (ViTPose/ViT-H style) for TokenHMR-equivalent mesh recovery.

Capability parity with the TokenHMR backbone consumed by the reference
(ref ``modifications/mesh_generator.py:46-56`` loads it;
``modifications/token_head.py:184`` receives its channel-first feature map).
The reference's backbone is an external torch ViT-H (patch 16, embed 1280,
depth 32, heads 16, 256x192 input -> 16x12 patch grid, no class token).

TPU-first notes:
- operates on ``[B, H, W, 3]`` NHWC batches (whole frame stacks at once —
  the reference runs batch-8 crops, ref ``mesh_generator.py:146``);
- pre-LN blocks with exact-GELU MLPs; attention as einsum (the 192-token
  sequence is far below the flash-attention crossover; the MXU work is in
  the MLPs, which XLA tiles directly);
- returns both the ``[B, h*w, C]`` token sequence (decoder context) and the
  channel-first map for API parity.

``torch_vit_to_flax`` maps timm/ViTPose-style checkpoint names onto this tree.
"""

from __future__ import annotations

import dataclasses
import typing as T

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: T.Tuple[int, int] = (256, 192)
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    use_cls_token: bool = False
    final_norm: bool = True
    attention_impl: str = "xla"   # "xla" | "pallas" | "pallas_interpret"
    # optional per-block matmul precision schedule (len == depth), e.g.
    # ("default",)*24 + ("high",)*8 — mixed-precision extraction
    # (PARITY.md round-4 study); None = inherit the stage-wide class
    block_precision: T.Optional[T.Tuple[str, ...]] = None

    @property
    def grid(self) -> T.Tuple[int, int]:
        return (self.img_size[0] // self.patch_size, self.img_size[1] // self.patch_size)

    @property
    def num_patches(self) -> int:
        h, w = self.grid
        return h * w


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, D = x.shape
        H = self.num_heads
        hd = D // H

        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.attention_impl in ("head_batched", "head_batched_interpret"):
            # round-3 candidate: all heads as one [B*H, N, d] GEMM stream
            # with fused softmax (ops/attention_core.py::mha_head_batched)
            from ..ops.attention_core import mha_head_batched

            qkv_flat = nn.Dense(3 * D, name="qkv")(h)
            ctx = mha_head_batched(
                qkv_flat[..., :D],
                qkv_flat[..., D : 2 * D],
                qkv_flat[..., 2 * D :],
                heads=H,
                interpret=self.attention_impl == "head_batched_interpret",
            )
            x = x + nn.Dense(D, name="proj")(ctx)
            h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
            h = nn.Dense(int(D * self.mlp_ratio), name="fc1")(h)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dense(D, name="fc2")(h)
            return x + h
        if self.attention_impl in ("core", "core_interpret"):
            # layout-preserving fused attention (ops/attention_core.py):
            # q/k/v stay [B, N, D] contiguous slices of the qkv GEMM output
            # — no bqhd<->bhqk relayouts, softmax fused in-kernel. The
            # head-major column order of the qkv weight matches the reshape
            # path, so params are interchangeable.
            from ..ops.attention_core import mha_core

            qkv_flat = nn.Dense(3 * D, name="qkv")(h)
            ctx = mha_core(
                qkv_flat[..., :D],
                qkv_flat[..., D : 2 * D],
                qkv_flat[..., 2 * D :],
                heads=H,
                precision="default",
                interpret=self.attention_impl == "core_interpret",
            )
            x = x + nn.Dense(D, name="proj")(ctx)
            h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
            h = nn.Dense(int(D * self.mlp_ratio), name="fc1")(h)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dense(D, name="fc2")(h)
            return x + h
        qkv = nn.Dense(3 * D, name="qkv")(h).reshape(B, N, 3, H, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.attention_impl != "xla":
            from ..ops.attention import multihead_attention

            ctx = multihead_attention(q, k, v, impl=self.attention_impl)
            ctx = ctx.reshape(B, N, D)
        else:
            attn = jax.nn.softmax(
                jnp.einsum("bqhd,bkhd->bhqk", q, k)
                / jnp.sqrt(hd).astype(x.dtype),
                axis=-1,
            )
            ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, D)
        x = x + nn.Dense(D, name="proj")(ctx)

        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(D * self.mlp_ratio), name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(D, name="fc2")(h)
        return x + h


class ViTBackbone(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> T.Tuple[jnp.ndarray, jnp.ndarray]:
        """``x``: [B, H, W, 3] normalized crops ->
        (tokens [B, h*w, C], feature map [B, C, h, w])."""
        cfg = self.config
        if cfg.block_precision is not None and len(cfg.block_precision) != cfg.depth:
            raise ValueError(
                f"block_precision needs {cfg.depth} entries, got "
                f"{len(cfg.block_precision)}"
            )
        p = cfg.patch_size
        x = nn.Conv(
            cfg.embed_dim, kernel_size=(p, p), strides=(p, p), name="patch_embed"
        )(x)                                              # [B, h, w, C]
        B, h, w, C = x.shape
        tokens = x.reshape(B, h * w, C)
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, cfg.num_patches + (1 if cfg.use_cls_token else 0), cfg.embed_dim),
        )
        if cfg.use_cls_token:
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dim))
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls, (B, 1, C)), tokens], axis=1
            )
        tokens = tokens + pos.astype(tokens.dtype)
        for i in range(cfg.depth):
            blk = ViTBlock(
                cfg.embed_dim,
                cfg.num_heads,
                cfg.mlp_ratio,
                attention_impl=cfg.attention_impl,
                name=f"block{i}",
            )
            if cfg.block_precision is not None:
                # per-block matmul class (mixed-precision extraction,
                # PARITY.md round-4 study): the inner context overrides the
                # extractor's stage-wide default_matmul_precision
                with jax.default_matmul_precision(cfg.block_precision[i]):
                    tokens = blk(tokens)
            else:
                tokens = blk(tokens)
        if cfg.final_norm:
            tokens = nn.LayerNorm(epsilon=1e-6, name="norm")(tokens)
        if cfg.use_cls_token:
            tokens = tokens[:, 1:]
        fmap = jnp.transpose(tokens.reshape(B, h, w, C), (0, 3, 1, 2))
        return tokens, fmap


def torch_vit_to_flax(sd: T.Dict[str, np.ndarray], cfg: ViTConfig) -> T.Dict:
    """Map a ViTPose/timm-style torch state_dict onto the ViTBackbone tree.

    Expected torch names: ``patch_embed.proj.{weight,bias}``, ``pos_embed``,
    ``blocks.{i}.norm1.*``, ``blocks.{i}.attn.qkv.*``, ``blocks.{i}.attn.proj.*``,
    ``blocks.{i}.norm2.*``, ``blocks.{i}.mlp.fc1.*``, ``blocks.{i}.mlp.fc2.*``,
    optional ``norm.*`` / ``cls_token``.
    """
    def dense(prefix):
        return {
            "kernel": np.transpose(sd[f"{prefix}.weight"], (1, 0)),
            "bias": sd[f"{prefix}.bias"],
        }

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params: T.Dict[str, T.Any] = {
        "patch_embed": {
            # torch conv [out, in, kh, kw] -> flax [kh, kw, in, out]
            "kernel": np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0)),
            "bias": sd["patch_embed.proj.bias"],
        },
        "pos_embed": sd["pos_embed"],
    }
    if cfg.use_cls_token and "cls_token" in sd:
        params["cls_token"] = sd["cls_token"]
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        params[f"block{i}"] = {
            "norm1": ln(f"{b}.norm1"),
            "qkv": dense(f"{b}.attn.qkv"),
            "proj": dense(f"{b}.attn.proj"),
            "norm2": ln(f"{b}.norm2"),
            "fc1": dense(f"{b}.mlp.fc1"),
            "fc2": dense(f"{b}.mlp.fc2"),
        }
    if cfg.final_norm and "norm.weight" in sd:
        params["norm"] = ln("norm")
    return params
