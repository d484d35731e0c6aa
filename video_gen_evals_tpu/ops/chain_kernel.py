"""Whole-chain fused conv kernel: all 4 residual dilated stages in ONE launch.

``ops/conv_kernel.py`` fuses one TemporalConvBlock stage; the remaining gap to
the conv section's speed-of-light (~8.5 ms vs ~6.9 ms at ``high``, BENCH_NOTES)
is inter-stage HBM round trips and 40 kernel launches (10 chains x 4 stages).
This kernel runs a chain's FOUR stages (dilations 1, 2, 4, 8 — ref
``model.py:43-58``) back to back with the activations VMEM-resident
throughout.

The trick is weight residency: 8 convs of bf16-split (hi, lo) weights are
10.5 MB — too big for Mosaic's automatic double-buffered pipelining of input
blocks. The weights therefore stay in HBM (``memory_space=ANY``) and the
kernel DMAs them into a VMEM scratch ONCE at grid step 0 (the TPU grid is
sequential, so later steps reuse the resident copy) — single-buffered weight
residency that XLA's conv lowering cannot express.

Precision "high" only (bf16_3x via pre-split hi/lo weights + in-kernel
activation splits), matching the scoring default; the per-stage kernel
remains the fallback for other precisions.
"""

from __future__ import annotations

import functools
import typing as T

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_kernel import _K, _gelu, split_bf16

_DILATIONS = (1, 2, 4, 8)


def _dot3_pre(a: jnp.ndarray, w_hi: jnp.ndarray, w_lo: jnp.ndarray) -> jnp.ndarray:
    """bf16_3x with pre-split bf16 weights (activations split in-kernel)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    d = lambda u, v: jax.lax.dot_general(
        u, v, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return d(a_hi, w_hi) + d(a_hi, w_lo) + d(a_lo, w_hi)


def _chain_kernel(
    x_ref,            # [BW, T, C] VMEM activation block
    wh_hbm, wl_hbm,   # [2*S, K, C, C] bf16, HBM (ANY): conv1/conv2 interleaved
    gs_ref, gb_ref,   # [S, C] VMEM
    out_ref,          # [BW, T, C] VMEM
    wh_vmem, wl_vmem, # scratch: [2*S, K, C, C] bf16 VMEM (resident weights)
    xp,               # scratch: [BW, T + 2*pad_max, C] padded activations
    sem,              # DMA semaphore (2,)
    *, t_len: int, dilations: T.Tuple[int, ...],
):
    BW, _, C = x_ref.shape

    # one-time weight DMA: the sequential grid reuses the VMEM copy
    @pl.when(pl.program_id(0) == 0)
    def _load_weights():
        ch = pltpu.make_async_copy(wh_hbm, wh_vmem, sem.at[0])
        cl = pltpu.make_async_copy(wl_hbm, wl_vmem, sem.at[1])
        ch.start()
        cl.start()
        ch.wait()
        cl.wait()

    def conv5(src, s2, dilation):
        """Conv with weight set ``s2`` (0..2S-1) from the resident scratch."""
        pad = dilation * (_K - 1) // 2
        xp[:, :pad, :] = jnp.zeros((BW, pad, C), src.dtype)
        xp[:, pad : pad + t_len, :] = src
        xp[:, pad + t_len : pad + t_len + pad, :] = jnp.zeros(
            (BW, pad, C), src.dtype
        )
        acc = None
        for j in range(_K):
            sl = xp[:, j * dilation : j * dilation + t_len, :]
            t = _dot3_pre(
                sl.reshape(BW * t_len, C), wh_vmem[s2, j], wl_vmem[s2, j]
            )
            acc = t if acc is None else acc + t
        return acc.reshape(BW, t_len, C)

    y = x_ref[...]
    for s, dil in enumerate(dilations):
        h = _gelu(conv5(y, 2 * s, dil))
        h = _gelu(conv5(h, 2 * s + 1, dil) + y)
        mu = jnp.mean(h.reshape(BW, t_len * C), axis=1).reshape(BW, 1, 1)
        var = jnp.mean(
            (h - mu).reshape(BW, t_len * C) ** 2, axis=1
        ).reshape(BW, 1, 1)
        hn = (h - mu) * jax.lax.rsqrt(var + 1e-5)
        y = hn * gs_ref[s][None, None, :] + gb_ref[s][None, None, :]
    out_ref[...] = y


def _chain_kernel_mm(
    x_ref,            # [BW, T, C] VMEM activation block
    wh_hbm, wl_hbm,   # [2*S, K, C, C] bf16, HBM (ANY): conv1/conv2 interleaved
    gs_ref, gb_ref,   # [S, C] VMEM
    out_ref,          # [BW, T, C] VMEM
    wh_vmem, wl_vmem, # scratch: [2*S, K, C, C] bf16 VMEM (resident weights)
    sem,              # DMA semaphore (2,)
    *, t_len: int, dilations: T.Tuple[int, ...],
):
    """Matmul-first chain kernel (round-5 directive #4): the round-2 chain
    experiments lost with the slice-first taps because the padded activation
    scratch pushed VMEM past budget at block_windows=32. This variant uses the
    scratch-free mm_first conv (each tap's bf16_3x dot runs on the UNPADDED
    activations; the shifted accumulation is 5 static VPU adds with zero
    edges — see ``conv_kernel._block_kernel_high_mm``), keeping only the
    HBM->VMEM resident-weight DMA from the chain design. Numerics identical
    to the per-stage mm_first kernel stacked per stage."""
    BW, _, C = x_ref.shape

    @pl.when(pl.program_id(0) == 0)
    def _load_weights():
        ch = pltpu.make_async_copy(wh_hbm, wh_vmem, sem.at[0])
        cl = pltpu.make_async_copy(wl_hbm, wl_vmem, sem.at[1])
        ch.start()
        cl.start()
        ch.wait()
        cl.wait()

    dn = (((1,), (0,)), ((), ()))
    d = lambda u, v: jax.lax.dot_general(
        u, v, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    def conv5(src, s2, dilation):
        a = src.reshape(BW * t_len, C)
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = None
        for j in range(_K):
            o = (j - _K // 2) * dilation      # y[t] += z[t + o]
            if abs(o) >= t_len:
                continue  # tap entirely outside the window: exact zero
            z = (
                d(a_hi, wh_vmem[s2, j])
                + d(a_hi, wl_vmem[s2, j])
                + d(a_lo, wh_vmem[s2, j])
            ).reshape(BW, t_len, C)
            if o == 0:
                acc = z if acc is None else acc + z
            else:
                zp = jnp.pad(
                    z[:, o:, :] if o > 0 else z[:, : t_len + o, :],
                    ((0, 0), (0, o) if o > 0 else (-o, 0), (0, 0)),
                )
                acc = zp if acc is None else acc + zp
        return acc

    y = x_ref[...]
    for s, dil in enumerate(dilations):
        h = _gelu(conv5(y, 2 * s, dil))
        h = _gelu(conv5(h, 2 * s + 1, dil) + y)
        mu = jnp.mean(h.reshape(BW, t_len * C), axis=1).reshape(BW, 1, 1)
        var = jnp.mean(
            (h - mu).reshape(BW, t_len * C) ** 2, axis=1
        ).reshape(BW, 1, 1)
        hn = (h - mu) * jax.lax.rsqrt(var + 1e-5)
        y = hn * gs_ref[s][None, None, :] + gb_ref[s][None, None, :]
    out_ref[...] = y


def fused_temporal_chain(
    x: jnp.ndarray,          # [B, T, C] f32 post-stem activations
    w1s: jnp.ndarray,        # [S, K, C, C] f32 (conv1 per stage)
    w2s: jnp.ndarray,        # [S, K, C, C] f32 (conv2 per stage)
    gn_scales: jnp.ndarray,  # [S, C]
    gn_biases: jnp.ndarray,  # [S, C]
    dilations: T.Tuple[int, ...] = _DILATIONS,
    block_windows: int = 16,
    variant: str = "slice",
    interpret: bool = False,
) -> jnp.ndarray:
    """All residual conv stages of one MovementConvEncoder chain, one launch.

    Numerics identical to stacking ``fused_temporal_block(precision="high")``
    per stage (same bf16_3x dots, same A&S erf GELU). ``variant``: "slice"
    (padded-scratch shifted operands) or "mm_first" (scratch-free matmul on
    unpadded activations + shifted output accumulation — round-5 directive:
    the mm taps remove the very scratch whose VMEM pressure forced
    block_windows=16 in the round-2 chain experiments).
    """
    B, t_len, C = x.shape
    S = len(dilations)
    if w1s.shape[0] != S:
        raise ValueError(f"expected {S} stage weights, got {w1s.shape[0]}")
    if B % block_windows != 0:
        raise ValueError(f"batch {B} not divisible by block {block_windows}")
    if variant not in ("slice", "mm_first"):
        raise ValueError(f"variant must be 'slice' or 'mm_first', got {variant!r}")
    pad_max = max(dilations) * (_K - 1) // 2

    # interleave per-stage conv1/conv2 and pre-split hi/lo on the host:
    # layout [2S, K, C, C] so the kernel indexes one weight set per conv
    w = jnp.stack([w1s, w2s], axis=1).reshape(2 * S, _K, C, C)
    w_hi, w_lo = split_bf16(w)

    act = pl.BlockSpec((block_windows, t_len, C), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    whbm = pl.BlockSpec(memory_space=pltpu.ANY)
    gsp = pl.BlockSpec((S, C), lambda i: (0, 0), memory_space=pltpu.VMEM)

    scratch = [
        pltpu.VMEM((2 * S, _K, C, C), jnp.bfloat16),
        pltpu.VMEM((2 * S, _K, C, C), jnp.bfloat16),
    ]
    if variant == "mm_first":
        kernel = functools.partial(
            _chain_kernel_mm, t_len=t_len, dilations=dilations
        )
    else:
        kernel = functools.partial(
            _chain_kernel, t_len=t_len, dilations=dilations
        )
        scratch.append(
            pltpu.VMEM((block_windows, t_len + 2 * pad_max, C), x.dtype)
        )
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    return pl.pallas_call(
        kernel,
        grid=(B // block_windows,),
        in_specs=[act, whbm, whbm, gsp, gsp],
        out_specs=act,
        out_shape=jax.ShapeDtypeStruct((B, t_len, C), x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, w_hi, w_lo, gn_scales, gn_biases)
