"""Multi-head attention with a Pallas TPU flash-attention kernel.

The framework's attention sites (fusion-encoder temporal transformer at 33
tokens, ViT backbone at 192 patch tokens) are small enough that XLA's fused
einsum attention is already near-optimal — ``impl="xla"`` is the default.
The Pallas kernel (``impl="pallas"``) exists for the regimes where fused
attention wins: long-sequence scoring variants and large-batch ViT extraction
sweeps, where materializing [B, H, N, N] score tensors becomes HBM-bound.

Kernel design (per the TPU kernel playbook):
- grid over (batch*heads, query blocks); Q block resident in VMEM;
- online-softmax streaming over KV blocks (running max/denominator), so the
  [N, N] score matrix never hits HBM;
- sequence padded to sublane multiples; validity handled with an additive
  -inf mask derived from the true length (static at trace time).
"""

from __future__ import annotations

import functools
import math
import typing as T

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_xla(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: T.Optional[float] = None
) -> jnp.ndarray:
    """Reference einsum attention. q/k/v: [B, N, H, D] -> [B, N, H, D]."""
    D = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int,
                  block_kv: int, precision: str = "highest"):
    """One (batch*head, q-block) program: stream KV blocks with online softmax.

    ``precision``: "highest" casts q/k/v to f32 and uses 6-pass f32 dots
    (scoring parity); "default" keeps the inputs' dtype (bf16 extraction:
    one MXU pass per dot, f32 accumulation — flash-attention standard)."""
    hi = precision == "highest"
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    q = q_ref[0]
    if hi:
        q = q.astype(jnp.float32)
    bq, D = q.shape
    n_kv = k_ref.shape[1]
    num_blocks = n_kv // block_kv

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :]
        if hi:
            k = k.astype(jnp.float32)
            v = v.astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ) * scale                                          # [bq, block_kv]
        kv_idx = i * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_kv), 1
        )
        s = jnp.where(kv_idx < n_valid, s, -jnp.inf)
        m_cur = jnp.max(s, axis=-1, keepdims=True)         # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p if hi else p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, D), jnp.float32)
    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _m, l = jax.lax.fori_loop(0, num_blocks, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: T.Optional[float] = None,
    block_q: int = 128,
    block_kv: int = 128,
    interpret: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """Pallas fused attention. q/k/v: [B, N, H, D] -> [B, N, H, D]."""
    B, N, H, D = q.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(D)

    n_pad = _round_up(N, max(block_q, block_kv))
    bq = min(block_q, n_pad)
    bkv = min(block_kv, n_pad)

    def to_bh(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, N, D)
        if n_pad != N:
            x = jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0)))
        return x

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    grid = (B * H, n_pad // bq)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, n_valid=N, block_kv=bkv,
            precision=precision,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, n_pad, D), q.dtype),
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:, :N, :].reshape(B, H, N, D)
    return jnp.transpose(out, (0, 2, 1, 3))


def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: T.Optional[float] = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Dispatch between the XLA einsum path and the Pallas kernel.

    ``impl``: "xla" | "pallas" (f32 dots) | "pallas_bf16" (input-dtype dots,
    for the bf16 extraction path) | "pallas_interpret"."""
    if impl == "pallas":
        return flash_attention(q, k, v, scale)
    if impl == "pallas_bf16":
        return flash_attention(q, k, v, scale, precision="default")
    if impl == "pallas_interpret":
        return flash_attention(q, k, v, scale, interpret=True)
    return attention_xla(q, k, v, scale)
