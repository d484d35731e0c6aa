"""Trainable fused TemporalConvBlock kernel: forward + custom-VJP backward.

``ops/conv_kernel.py`` gives the scoring path a fused residual conv stage
(conv1 -> GELU -> conv2 -> +res -> GELU -> GroupNorm(1)); this module makes
the same fusion available to TRAINING (BASELINE config 5, ref
``train.py:488-524``):

- the forward kernel additionally applies the reference's dropout between
  GELU(conv1) and conv2 (ref ``model.py:30-36``) via a precomputed scaled
  mask (host PRNG stays out of the graph; the mask is drawn in-graph by the
  caller from a flax RNG stream);
- a second Pallas kernel computes the ENTIRE stage backward in one launch:
  it rematerialises the forward intermediates VMEM-resident (flash-attention
  style) and emits dx plus weight/affine grads, with the [K, C, C] weight
  grads accumulated across the sequential TPU grid into revisited output
  blocks;
- ``jax.custom_vjp`` stitches the two together so ``jax.grad`` of a loss
  through ``fused_temporal_block_train`` uses the fused backward.

Precision: training runs at jax's ``default`` matmul precision (single bf16
MXU pass — see ``train/step.py``), so the kernels' dots cast to bf16 with
f32 accumulation; ``"highest"`` (full f32) is provided for parity tests.
On non-TPU backends the kernels run in Pallas interpret mode so the same
code path stays correct (and testable) on the CPU conftest backend.
"""

from __future__ import annotations

import functools
import typing as T

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_kernel import _K, _erf, _gelu

_INV_SQRT2 = 0.7071067811865475
_INV_SQRT_2PI = 0.3989422804014327


def _gelu_grad(u: jnp.ndarray) -> jnp.ndarray:
    """d/du gelu(u) = Phi(u) + u * phi(u) (exact-erf GELU)."""
    phi = jnp.exp(-0.5 * u * u) * _INV_SQRT_2PI
    return 0.5 * (1.0 + _erf(u * _INV_SQRT2)) + u * phi


def _make_dot(precision: str):
    dn = (((1,), (0,)), ((), ()))
    if precision == "highest":
        def dot(a, w):
            return jax.lax.dot_general(
                a, w, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
    else:  # "default": one bf16 MXU pass, f32 accumulation
        def dot(a, w):
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
    return dot


def _make_dot_tn(precision: str):
    """[N, C1] x [N, C2] -> [C1, C2] contraction over rows (weight grads)."""
    dn = (((0,), (0,)), ((), ()))
    if precision == "highest":
        def dot(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
    else:
        def dot(a, b):
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
    return dot


def _pad_into(xp, src, pad: int, t_len: int):
    BW, _, C = xp.shape
    xp[:, :pad, :] = jnp.zeros((BW, pad, C), src.dtype)
    xp[:, pad : pad + t_len, :] = src
    xp[:, pad + t_len :, :] = jnp.zeros((BW, pad, C), src.dtype)


def _conv5_mm(src, w_ref, dot, dilation: int, t_len: int,
              precision: str = "highest"):
    """Matmul-first dilated conv (round-3 take 3, same trick as
    ``conv_kernel.py::_block_kernel_high_mm``): each tap's matmul runs on
    the UNPADDED activations — the [BW,T,C]->[BW*T,C] merge is layout-free —
    and the conv is assembled by shift-invariance as 5 static shifted adds
    with zero edges. No padded scratch, no per-tap operand retiling."""
    BW, _, C = src.shape
    a = src
    if precision != "highest":
        a = a.astype(jnp.bfloat16)
    a2 = a.reshape(BW * t_len, C)
    acc = jnp.zeros((BW, t_len, C), jnp.float32)
    for j in range(_K):
        o = (j - _K // 2) * dilation      # y[t] += z[t + o]
        if abs(o) >= t_len:
            continue  # tap reaches entirely outside the window: exact zero
        z = dot(a2, w_ref[j]).reshape(BW, t_len, C)
        if o == 0:
            zp = z
        else:
            zp = jnp.pad(
                z[:, o:, :] if o > 0 else z[:, : t_len + o, :],
                ((0, 0), (0, o) if o > 0 else (-o, 0), (0, 0)),
            )
        acc = acc + zp
    return acc


# ---------------------------------------------------------------- forward

def _fwd_kernel(x_ref, w1_ref, w2_ref, gs_ref, gb_ref, *rest,
                dilation: int, t_len: int, precision: str, has_mask: bool):
    if has_mask:
        m_ref, out_ref = rest
    else:
        (out_ref,) = rest
    BW, _, C = x_ref.shape
    dot = _make_dot(precision)
    x = x_ref[...]

    a1 = _gelu(_conv5_mm(x, w1_ref, dot, dilation, t_len, precision))
    if has_mask:
        a1 = a1 * m_ref[...]
    h = _gelu(_conv5_mm(a1, w2_ref, dot, dilation, t_len, precision) + x)
    mu = jnp.mean(h.reshape(BW, t_len * C), axis=1).reshape(BW, 1, 1)
    var = jnp.mean((h - mu).reshape(BW, t_len * C) ** 2, axis=1).reshape(BW, 1, 1)
    hn = (h - mu) * jax.lax.rsqrt(var + 1e-5)
    out_ref[...] = hn * gs_ref[0][None, None, :] + gb_ref[0][None, None, :]


# ---------------------------------------------------------------- backward

def _bwd_kernel(
    x_ref, w1_ref, w2_ref, w1t_ref, w2t_ref, gs_ref, dy_ref, *rest,
    dilation: int, t_len: int, precision: str, has_mask: bool,
):
    """One launch per window block: rematerialise the stage forward, then
    dx / dw1 / dw2 / dgs / dgb.  Weight/affine grads accumulate across the
    (sequential) grid into constant-index output blocks."""
    if has_mask:
        m_ref = rest[0]
        rest = rest[1:]
    dx_ref, dw1_ref, dw2_ref, dgs_ref, dgb_ref, xp = rest
    BW, _, C = x_ref.shape
    pad = dilation * (_K - 1) // 2
    dot = _make_dot(precision)
    dot_tn = _make_dot_tn(precision)
    x = x_ref[...]
    dy = dy_ref[...]
    gs = gs_ref[0]

    # --- rematerialised forward (matmul-first taps) ---
    h1 = _conv5_mm(x, w1_ref, dot, dilation, t_len, precision)
    d1 = _gelu(h1)
    if has_mask:
        d1 = d1 * m_ref[...]
    r = _conv5_mm(d1, w2_ref, dot, dilation, t_len, precision) + x
    h = _gelu(r)
    mu = jnp.mean(h.reshape(BW, t_len * C), axis=1).reshape(BW, 1, 1)
    var = jnp.mean((h - mu).reshape(BW, t_len * C) ** 2, axis=1).reshape(BW, 1, 1)
    rstd = jax.lax.rsqrt(var + 1e-5)
    hn = (h - mu) * rstd

    # --- GroupNorm(1) affine + stats backward (stats over (T, C) / window) ---
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = jnp.zeros(dw1_ref.shape, dw1_ref.dtype)
        dw2_ref[...] = jnp.zeros(dw2_ref.shape, dw2_ref.dtype)
        dgs_ref[...] = jnp.zeros(dgs_ref.shape, dgs_ref.dtype)
        dgb_ref[...] = jnp.zeros(dgb_ref.shape, dgb_ref.dtype)

    dgb_ref[...] += jnp.sum(dy.reshape(BW * t_len, C), axis=0, keepdims=True)
    dgs_ref[...] += jnp.sum(
        (dy * hn).reshape(BW * t_len, C), axis=0, keepdims=True
    )

    dhn = dy * gs[None, None, :]
    m1 = jnp.mean(dhn.reshape(BW, t_len * C), axis=1).reshape(BW, 1, 1)
    m2 = jnp.mean((dhn * hn).reshape(BW, t_len * C), axis=1).reshape(BW, 1, 1)
    dr = rstd * (dhn - m1 - hn * m2) * _gelu_grad(r)

    # --- conv2 backward: dw2 (tap-sliced padded d1), then dd1 ---
    _pad_into(xp, d1, pad, t_len)
    d1p = xp[...]
    if precision != "highest":
        d1p = d1p.astype(jnp.bfloat16)
        dr_c = dr.astype(jnp.bfloat16)
    else:
        dr_c = dr
    for j in range(_K):
        sl = d1p[:, j * dilation : j * dilation + t_len, :]
        dw2_ref[j] += dot_tn(
            sl.reshape(BW * t_len, C), dr_c.reshape(BW * t_len, C)
        )
    dd1 = _conv5_mm(dr, w2t_ref, dot, dilation, t_len, precision)
    if has_mask:
        dd1 = dd1 * m_ref[...]
    dh1 = dd1 * _gelu_grad(h1)

    # --- conv1 backward: dw1 needs padded x, then dx ---
    _pad_into(xp, x, pad, t_len)
    x_p = xp[...]
    if precision != "highest":
        x_p = x_p.astype(jnp.bfloat16)
        dh1_c = dh1.astype(jnp.bfloat16)
    else:
        dh1_c = dh1
    for j in range(_K):
        sl = x_p[:, j * dilation : j * dilation + t_len, :]
        dw1_ref[j] += dot_tn(
            sl.reshape(BW * t_len, C), dh1_c.reshape(BW * t_len, C)
        )
    dx_ref[...] = dr + _conv5_mm(dh1, w1t_ref, dot, dilation, t_len, precision)


# ---------------------------------------------------------------- plumbing

def _pick_block(B: int, cap: int) -> int:
    for bw in (cap, 32, 16, 8, 4, 2, 1):
        if bw <= cap and B % bw == 0:
            return bw
    return 1


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8)
)
def fused_temporal_block_train(
    x: jnp.ndarray,         # [B, T, C] f32
    w1: jnp.ndarray,        # [K, C, C] f32
    w2: jnp.ndarray,        # [K, C, C] f32
    gn_scale: jnp.ndarray,  # [C]
    gn_bias: jnp.ndarray,   # [C]
    mask: T.Optional[jnp.ndarray],  # [B, T, C] scaled dropout mask, or None
    dilation: int,
    precision: str = "default",
    interpret: T.Optional[bool] = None,
) -> jnp.ndarray:
    """Trainable fused residual conv stage (see module docstring).

    ``mask`` is the scaled keep mask (0 or 1/keep_prob) applied after
    GELU(conv1), matching ``nn.Dropout`` semantics in the module block
    (``fusion_encoder.py:128-131``); pass ``None`` for deterministic mode.
    Differentiable in (x, w1, w2, gn_scale, gn_bias); the mask cotangent is
    zero (it is a function of the RNG only).
    """
    return _fwd_call(x, w1, w2, gn_scale, gn_bias, mask,
                     dilation, precision, interpret)


def _fwd_call(x, w1, w2, gs, gb, mask, dilation, precision, interpret):
    B, t_len, C = x.shape
    bw = _pick_block(B, 32)
    if interpret is None:
        interpret = _interpret_default()

    act = pl.BlockSpec((bw, t_len, C), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    wsp = pl.BlockSpec((_K, C, C), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    gsp = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    has_mask = mask is not None
    kernel = functools.partial(
        _fwd_kernel, dilation=dilation, t_len=t_len,
        precision=precision, has_mask=has_mask,
    )
    in_specs = [act, wsp, wsp, gsp, gsp] + ([act] if has_mask else [])
    args = [x, w1, w2, gs.reshape(1, C), gb.reshape(1, C)]
    if has_mask:
        args.append(mask)
    return pl.pallas_call(
        kernel,
        grid=(B // bw,),
        in_specs=in_specs,
        out_specs=act,
        out_shape=jax.ShapeDtypeStruct((B, t_len, C), x.dtype),
        interpret=interpret,
    )(*args)


def _vjp_fwd(x, w1, w2, gs, gb, mask, dilation, precision, interpret):
    y = _fwd_call(x, w1, w2, gs, gb, mask, dilation, precision, interpret)
    return y, (x, w1, w2, gs, mask)


def _vjp_bwd(dilation, precision, interpret, res, dy):
    x, w1, w2, gs, mask = res
    B, t_len, C = x.shape
    bw = _pick_block(B, 16)   # backward holds more live VMEM: smaller blocks
    pad = dilation * (_K - 1) // 2
    if interpret is None:
        interpret = _interpret_default()

    act = pl.BlockSpec((bw, t_len, C), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    wsp = pl.BlockSpec((_K, C, C), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    gsp = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    has_mask = mask is not None
    # transposed-conv weights: tap-reversed, Cin/Cout swapped
    w1t = jnp.swapaxes(w1[::-1], 1, 2)
    w2t = jnp.swapaxes(w2[::-1], 1, 2)

    kernel = functools.partial(
        _bwd_kernel, dilation=dilation, t_len=t_len,
        precision=precision, has_mask=has_mask,
    )
    in_specs = [act, wsp, wsp, wsp, wsp, gsp, act] + ([act] if has_mask else [])
    args = [x, w1, w2, w1t, w2t, gs.reshape(1, C), dy]
    if has_mask:
        args.append(mask)
    dx, dw1, dw2, dgs, dgb = pl.pallas_call(
        kernel,
        grid=(B // bw,),
        in_specs=in_specs,
        out_specs=[act, wsp, wsp, gsp, gsp],
        out_shape=[
            jax.ShapeDtypeStruct((B, t_len, C), x.dtype),
            jax.ShapeDtypeStruct((_K, C, C), jnp.float32),
            jax.ShapeDtypeStruct((_K, C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bw, t_len + 2 * pad, C), x.dtype)],
        interpret=interpret,
    )(*args)
    dmask = jnp.zeros_like(mask) if has_mask else None
    return dx, dw1, dw2, dgs.reshape(-1), dgb.reshape(-1), dmask


fused_temporal_block_train.defvjp(_vjp_fwd, _vjp_bwd)
