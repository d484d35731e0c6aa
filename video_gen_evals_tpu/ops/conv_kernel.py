"""Fused TemporalConvBlock Pallas kernel — the conv section is ~85% of the
scoring encoder's time (benchmarks/BENCH_NOTES.md round-2 profiling).

One kernel computes a whole residual dilated-conv stage (ref ``model.py:21-40``:
conv1 -> GELU -> conv2 -> +residual -> GELU -> GroupNorm(1)) with the
activations VMEM-resident between the two convolutions: XLA's lowering runs
the two convs as separate HBM-roundtrip kernels. Each dilated k=5 conv is
expressed as 5 shifted ``[BW*T, C] x [C, C]`` matmuls accumulating in f32 on
the MXU — per-window zero padding lives in a VMEM scratch so window
boundaries never mix.

Precision modes (Mosaic exposes no HIGH dot precision and no erf):
- ``"high"``: manual bf16_3x — weights pre-split into (hi, lo) bf16 halves,
  activations split in-kernel, dot3 = ahi*whi + ahi*wlo + alo*whi with f32
  accumulation: the same three MXU passes XLA's ``high`` performs.
- ``"highest"``: full-f32 dots (``jax.lax.Precision.HIGHEST``).
GELU's erf uses the Abramowitz-Stegun 7.1.26 rational approximation
(max abs error 1.5e-7 — below the bf16_3x noise floor).
"""

from __future__ import annotations

import functools
import typing as T

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_K = 5  # kernel taps (ref model.py:24: kernel_size=5)


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7)."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865475))


def split_bf16(w: jnp.ndarray) -> T.Tuple[jnp.ndarray, jnp.ndarray]:
    """f32 -> (hi, lo) bf16 halves with hi + lo ~= w to bf16_3x accuracy."""
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


# (the bf16_3x three-pass dot lives inline in each kernel body — see the
# per-kernel `d = lambda ...` with precision pinned to DEFAULT: bf16 inputs
# are already exact on the MXU, and an ambient
# default_matmul_precision("high") context would otherwise leak HIGH into
# the kernel, which Mosaic rejects)


def _dot_f32(a: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.dot_general(
        a,
        w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _block_kernel_high(
    x_ref, w1h_ref, w1l_ref, w2h_ref, w2l_ref, gs_ref, gb_ref, out_ref, xp,
    *, dilation: int, t_len: int,
):
    BW, _, C = x_ref.shape
    pad = dilation * (_K - 1) // 2
    x = x_ref[...]

    def conv5(src, wh_ref, wl_ref):
        xp[:, :pad, :] = jnp.zeros((BW, pad, C), src.dtype)
        xp[:, pad : pad + t_len, :] = src
        xp[:, pad + t_len :, :] = jnp.zeros((BW, pad, C), src.dtype)
        # split the padded activations into bf16 (hi, lo) ONCE per conv —
        # the tap loop then slices the split values (the per-dot3 split
        # would redo the subtract+casts 5x over the same rows)
        xpv = xp[...]
        a_hi = xpv.astype(jnp.bfloat16)
        a_lo = (xpv - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        d = lambda u, v: jax.lax.dot_general(
            u, v, dimension_numbers=dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        acc = None
        for j in range(_K):
            hi = a_hi[:, j * dilation : j * dilation + t_len, :].reshape(
                BW * t_len, C
            )
            lo = a_lo[:, j * dilation : j * dilation + t_len, :].reshape(
                BW * t_len, C
            )
            t = d(hi, wh_ref[j]) + d(hi, wl_ref[j]) + d(lo, wh_ref[j])
            acc = t if acc is None else acc + t
        return acc.reshape(BW, t_len, C)

    h = _gelu(conv5(x, w1h_ref, w1l_ref))
    h = _gelu(conv5(h, w2h_ref, w2l_ref) + x)
    mu = jnp.mean(h.reshape(BW, t_len * C), axis=1).reshape(BW, 1, 1)
    var = jnp.mean((h - mu).reshape(BW, t_len * C) ** 2, axis=1).reshape(BW, 1, 1)
    hn = (h - mu) * jax.lax.rsqrt(var + 1e-5)
    out_ref[...] = hn * gs_ref[0][None, None, :] + gb_ref[0][None, None, :]


def _block_kernel_high_mm(
    x_ref, w1h_ref, w1l_ref, w2h_ref, w2l_ref, gs_ref, gb_ref, out_ref,
    *, dilation: int, t_len: int,
):
    """Matmul-first formulation of the bf16_3x stage (round-3 take 3).

    The slice-first kernel pads activations into a VMEM scratch and slices a
    shifted [BW*T, C] operand per tap — 5 operand retilings per conv. Here
    each tap's matmul runs on the UNPADDED activations instead (the
    [BW, T, C] -> [BW*T, C] merge is layout-free), using shift-invariance of
    the conv: z_j = x @ w_j, then y[t] += z_j[t + (j-2)*dil] as 5 static
    shifted VPU adds with zero edges (window boundaries never mix — shifts
    stay inside each window's T axis). Identical MXU work and bf16_3x
    numerics; no padded scratch, no per-tap operand relayout.
    """
    BW, _, C = x_ref.shape
    x = x_ref[...]
    dn = (((1,), (0,)), ((), ()))
    d = lambda u, v: jax.lax.dot_general(
        u, v, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    def conv5(src, wh_ref, wl_ref):
        a = src.reshape(BW * t_len, C)
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = None
        for j in range(_K):
            o = (j - _K // 2) * dilation      # y[t] += z[t + o]
            if abs(o) >= t_len:
                continue  # tap entirely outside the window: exact zero
            z = (
                d(a_hi, wh_ref[j]) + d(a_hi, wl_ref[j]) + d(a_lo, wh_ref[j])
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

    h = _gelu(conv5(x, w1h_ref, w1l_ref))
    h = _gelu(conv5(h, w2h_ref, w2l_ref) + x)
    mu = jnp.mean(h.reshape(BW, t_len * C), axis=1).reshape(BW, 1, 1)
    var = jnp.mean((h - mu).reshape(BW, t_len * C) ** 2, axis=1).reshape(BW, 1, 1)
    hn = (h - mu) * jax.lax.rsqrt(var + 1e-5)
    out_ref[...] = hn * gs_ref[0][None, None, :] + gb_ref[0][None, None, :]


def _block_kernel_f32(
    x_ref, w1_ref, w2_ref, gs_ref, gb_ref, out_ref, xp,
    *, dilation: int, t_len: int,
):
    BW, _, C = x_ref.shape
    pad = dilation * (_K - 1) // 2
    x = x_ref[...]

    def conv5(src, w_ref):
        xp[:, :pad, :] = jnp.zeros((BW, pad, C), src.dtype)
        xp[:, pad : pad + t_len, :] = src
        xp[:, pad + t_len :, :] = jnp.zeros((BW, pad, C), src.dtype)
        acc = None
        for j in range(_K):
            sl = xp[:, j * dilation : j * dilation + t_len, :]
            t = _dot_f32(sl.reshape(BW * t_len, C), w_ref[j])
            acc = t if acc is None else acc + t
        return acc.reshape(BW, t_len, C)

    h = _gelu(conv5(x, w1_ref))
    h = _gelu(conv5(h, w2_ref) + x)
    mu = jnp.mean(h.reshape(BW, t_len * C), axis=1).reshape(BW, 1, 1)
    var = jnp.mean((h - mu).reshape(BW, t_len * C) ** 2, axis=1).reshape(BW, 1, 1)
    hn = (h - mu) * jax.lax.rsqrt(var + 1e-5)
    out_ref[...] = hn * gs_ref[0][None, None, :] + gb_ref[0][None, None, :]


def _block_kernel_high_stacked(
    x_ref, w1h_ref, w1l_ref, w2h_ref, w2l_ref, gs_ref, gb_ref, out_ref, xp,
    *, dilation: int, t_len: int,
):
    """Stacked-chain variant: leading singleton chain axis on every block
    (grid = (chains, window blocks), per-chain weights streamed by the
    index_map). Same math as :func:`_block_kernel_high`."""
    _, BW, _, C = x_ref.shape
    pad = dilation * (_K - 1) // 2
    x = x_ref[0]

    def conv5(src, wh_ref, wl_ref):
        xp[:, :pad, :] = jnp.zeros((BW, pad, C), src.dtype)
        xp[:, pad : pad + t_len, :] = src
        xp[:, pad + t_len :, :] = jnp.zeros((BW, pad, C), src.dtype)
        xpv = xp[...]
        a_hi = xpv.astype(jnp.bfloat16)
        a_lo = (xpv - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        d = lambda u, v: jax.lax.dot_general(
            u, v, dimension_numbers=dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        acc = None
        for j in range(_K):
            hi = a_hi[:, j * dilation : j * dilation + t_len, :].reshape(
                BW * t_len, C
            )
            lo = a_lo[:, j * dilation : j * dilation + t_len, :].reshape(
                BW * t_len, C
            )
            t = d(hi, wh_ref[0, j]) + d(hi, wl_ref[0, j]) + d(lo, wh_ref[0, j])
            acc = t if acc is None else acc + t
        return acc.reshape(BW, t_len, C)

    h = _gelu(conv5(x, w1h_ref, w1l_ref))
    h = _gelu(conv5(h, w2h_ref, w2l_ref) + x)
    mu = jnp.mean(h.reshape(BW, t_len * C), axis=1).reshape(BW, 1, 1)
    var = jnp.mean((h - mu).reshape(BW, t_len * C) ** 2, axis=1).reshape(BW, 1, 1)
    hn = (h - mu) * jax.lax.rsqrt(var + 1e-5)
    out_ref[0] = hn * gs_ref[0, 0][None, None, :] + gb_ref[0, 0][None, None, :]


def fused_temporal_block_stacked(
    xs: jnp.ndarray,         # [S, B, T, C] f32 stacked chain activations
    w1s: jnp.ndarray,        # [S, K, C, C]
    w2s: jnp.ndarray,        # [S, K, C, C]
    gn_scales: jnp.ndarray,  # [S, C]
    gn_biases: jnp.ndarray,  # [S, C]
    dilation: int,
    block_windows: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """One launch runs a residual stage for ALL chains: grid (S, B/bw) with
    the chain id indexing the weight blocks. Removes the per-chain launch
    overhead (10 chains x 4 stages = 40 launches -> 4) while keeping each
    program identical to the per-chain kernel. Precision "high" (bf16_3x).
    """
    S, B, t_len, C = xs.shape
    if B % block_windows != 0:
        raise ValueError(f"batch {B} not divisible by block {block_windows}")
    pad = dilation * (_K - 1) // 2

    act = pl.BlockSpec((1, block_windows, t_len, C), lambda s, i: (s, i, 0, 0),
                       memory_space=pltpu.VMEM)
    wsp = pl.BlockSpec((1, _K, C, C), lambda s, i: (s, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    gsp = pl.BlockSpec((1, 1, C), lambda s, i: (s, 0, 0),
                       memory_space=pltpu.VMEM)
    w1h, w1l = split_bf16(w1s)
    w2h, w2l = split_bf16(w2s)
    kernel = functools.partial(
        _block_kernel_high_stacked, dilation=dilation, t_len=t_len
    )
    return pl.pallas_call(
        kernel,
        grid=(S, B // block_windows),
        in_specs=[act, wsp, wsp, wsp, wsp, gsp, gsp],
        out_specs=act,
        out_shape=jax.ShapeDtypeStruct((S, B, t_len, C), xs.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_windows, t_len + 2 * pad, C), xs.dtype)
        ],
        interpret=interpret,
    )(xs, w1h, w1l, w2h, w2l,
      gn_scales.reshape(S, 1, C), gn_biases.reshape(S, 1, C))


def fused_temporal_block(
    x: jnp.ndarray,         # [B, T, C] f32 chain activations
    w1: jnp.ndarray,        # [K, C, C] f32
    w2: jnp.ndarray,        # [K, C, C] f32
    gn_scale: jnp.ndarray,  # [C]
    gn_bias: jnp.ndarray,   # [C]
    dilation: int,
    block_windows: int = 32,
    precision: str = "high",
    variant: str = "slice",
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused residual dilated-conv stage over a window batch.

    ``precision``: "high" (bf16_3x, matches XLA's default scoring precision)
    or "highest" (full f32).
    ``variant`` (precision "high" only): "slice" (padded-scratch shifted
    operands) or "mm_first" (matmul on unpadded activations + shifted output
    accumulation — see ``_block_kernel_high_mm``).
    """
    B, t_len, C = x.shape
    if B % block_windows != 0:
        raise ValueError(f"batch {B} not divisible by block {block_windows}")
    if precision not in ("high", "highest"):
        raise ValueError(
            f"precision must be 'high' or 'highest', got {precision!r} "
            "(silent fallback would change numerics — CLAUDE.md)"
        )
    if variant not in ("slice", "mm_first"):
        raise ValueError(
            f"variant must be 'slice' or 'mm_first', got {variant!r}"
        )
    if precision == "highest" and variant == "mm_first":
        raise ValueError(
            "variant='mm_first' exists only for precision='high' (the f32 "
            "path has no mm-first kernel; running 'slice' silently would be "
            "the ignored-argument fallback this validation exists to stop)"
        )
    pad = dilation * (_K - 1) // 2

    act_spec = pl.BlockSpec(
        (block_windows, t_len, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec((_K, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((block_windows, t_len + 2 * pad, C), x.dtype)]
    gs = gn_scale.reshape(1, C)
    gb = gn_bias.reshape(1, C)

    if precision == "high":
        w1h, w1l = split_bf16(w1)
        w2h, w2l = split_bf16(w2)
        if variant == "mm_first":
            kernel = functools.partial(
                _block_kernel_high_mm, dilation=dilation, t_len=t_len
            )
            scratch = []
        else:
            kernel = functools.partial(
                _block_kernel_high, dilation=dilation, t_len=t_len
            )
        return pl.pallas_call(
            kernel,
            grid=(B // block_windows,),
            in_specs=[act_spec, w_spec, w_spec, w_spec, w_spec, g_spec, g_spec],
            out_specs=act_spec,
            out_shape=jax.ShapeDtypeStruct((B, t_len, C), x.dtype),
            scratch_shapes=scratch,
            interpret=interpret,
        )(x, w1h, w1l, w2h, w2l, gs, gb)

    kernel = functools.partial(_block_kernel_f32, dilation=dilation, t_len=t_len)
    return pl.pallas_call(
        kernel,
        grid=(B // block_windows,),
        in_specs=[act_spec, w_spec, w_spec, g_spec, g_spec],
        out_specs=act_spec,
        out_shape=jax.ShapeDtypeStruct((B, t_len, C), x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, w1, w2, gs, gb)
