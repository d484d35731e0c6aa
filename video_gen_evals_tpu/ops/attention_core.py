"""Multi-head attention core for short sequences in the LAYOUT the model
already has — the ViT-H extraction backbone's MFU killer.

Probe data (benchmarks/profile_vit_blocks.py, v5e-1, batch 32 bf16): the
ViT-H GEMMs run at 88% MFU, but XLA's einsum attention adds ~32 ms to a
86 ms forward — ~13.5 ms of bqhd<->bhqk relayouts and ~18.6 ms of softmax +
[B,H,N,N] score materialization, for ~4% of the FLOPs. Flash attention
(ops/attention.py) is WORSE here (141 ms): at N=192 its per-(batch,head)
grid and kv streaming buy nothing — the score matrix fits comfortably in
VMEM — while it still pays the layout transposes.

This kernel instead:
- consumes q, k, v as ``[B, N, H*hd]`` — contiguous lane-slices of the qkv
  GEMM output, NO transposes anywhere in the graph;
- one grid program per frame block: all H heads computed in-kernel, score
  matrix [N, N] lives and dies in VMEM/registers (f32 softmax);
- per-head lane slices (hd=80 offsets) resolve to VMEM-internal copies,
  which beat the HBM-level relayouts XLA emits.

Scoring-path transformers (33 tokens) keep the einsum path; this kernel
targets the extraction regime (bf16, N ~ 100-1000).
"""

from __future__ import annotations

import functools
import math
import typing as T

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float,
                precision: str):
    """One program = one frame block; loops heads with fused f32 softmax."""
    BF, N, D = q_ref.shape
    hd = D // heads
    hi = precision in ("high", "highest")
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,          # bf16_3x on the MXU
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]

    for f in range(BF):
        q = q_ref[f]
        k = k_ref[f]
        v = v_ref[f]
        if hi:
            q, k, v = (t.astype(jnp.float32) for t in (q, k, v))
        for h in range(heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            ) * scale                                       # [N, N] f32
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            ctx = jax.lax.dot_general(
                p if hi else p.astype(v.dtype), v[:, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )                                               # [N, hd]
            o_ref[f, :, sl] = ctx.astype(o_ref.dtype)


def mha_core(
    q: jnp.ndarray,   # [B, N, D] (D = H * head_dim), any float dtype
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: T.Optional[float] = None,
    block_frames: int = 4,
    precision: str = "default",
    interpret: bool = False,
) -> jnp.ndarray:
    """Layout-preserving fused multi-head attention: [B, N, D] -> [B, N, D].

    ``precision``: "default" = input-dtype dots (bf16 extraction mode, f32
    softmax/accumulation), "high" = f32-cast inputs with bf16_3x dots (the
    scoring precision class), "highest" = all-f32 dots.
    """
    B, N, D = q.shape
    if D % heads:
        raise ValueError(f"D={D} not divisible by heads={heads}")
    if precision not in ("default", "high", "highest"):
        raise ValueError(f"unknown precision {precision!r}")
    scale = scale if scale is not None else 1.0 / math.sqrt(D // heads)
    bf = block_frames
    while B % bf:
        bf //= 2
    bf = max(bf, 1)

    spec = pl.BlockSpec((bf, N, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _mha_kernel, heads=heads, scale=scale, precision=precision
        ),
        grid=(B // bf,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, N, D), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _mha_hb_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One program = a block of (batch*head) pairs; single-head fused-softmax
    attention per pair (head axis rides the grid, not in-kernel slicing)."""
    BH, N, d = q_ref.shape
    for i in range(BH):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                           # [N, N] f32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[i] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def mha_head_batched(
    q: jnp.ndarray,   # [B, N, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: T.Optional[float] = None,
    block_pairs: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Head-batched packed-QKV schedule (round-3 judge directive #8): all
    heads flattened into one ``[B*H, N, d]`` GEMM stream with fused f32
    softmax; the head axis rides the Pallas grid instead of in-kernel lane
    slices. Pays 3 explicit ``[B,N,H,d] -> [B*H,N,d]`` relayouts up front +
    1 back, betting that one bulk transpose each way is cheaper than XLA's
    per-op relayouts. Measured on v5e-1 (benchmarks/BENCH_NOTES.md round 3):
    see the ViT-H attention section for the verdict."""
    B, N, D = q.shape
    if D % heads:
        raise ValueError(f"D={D} not divisible by heads={heads}")
    d = D // heads
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    def pack(t):
        return (
            t.reshape(B, N, heads, d)
            .transpose(0, 2, 1, 3)
            .reshape(B * heads, N, d)
        )

    qp, kp, vp = pack(q), pack(k), pack(v)
    BH = B * heads
    bp = block_pairs
    while BH % bp:
        bp //= 2
    bp = max(bp, 1)
    spec = pl.BlockSpec((bp, N, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mha_hb_kernel, scale=scale),
        grid=(BH // bp,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((BH, N, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return (
        out.reshape(B, heads, N, d).transpose(0, 2, 1, 3).reshape(B, N, D)
    )
