"""Fused scoring forward for the HumanActionScorer.

The reference architecture runs up to 2M independent MovementConvEncoder
chains (raw + diff stream per modality) whose post-stem shapes are identical
(ref ``model.py:169-176``). XLA executes them as 2M separate small
convolutions; on v5e that leaves the MXU underfed (~10 TFLOP/s measured).
Stacking the chains into ONE vmapped convolution with a leading
weight/activation batch axis lifts the conv op itself to ~13-17 TFLOP/s in
isolation — but measured END TO END on the full model at "high" precision the
module path still wins (17.5 ms vs 22.2 ms per 256-window batch on v5e: the
stack/unstack transposes and per-call weight stacking outweigh the conv win).
Kept as a verified-equivalent alternative formulation and a starting point
for a future fused Pallas conv-chain kernel; the pipelines use the module
forward.

``fused_forward`` consumes the SAME parameter tree as ``HumanActionScorer``
(checkpoint-compatible — weights are stacked at trace time) and is verified
bit-equivalent-within-float-tolerance against ``model.apply`` in
``tests/test_fused_apply.py``. Deterministic (scoring) path only: the
training path keeps the module forward (dropout needs per-site RNG wiring).
"""

from __future__ import annotations

import math
import typing as T

import jax
import jax.numpy as jnp

from ..ops.deltas import l2_normalize
from .fusion_encoder import EncoderConfig, sinusoidal_positional_embedding

_DILATIONS = (1, 2, 4, 8)
_KERNEL = 5


def _conv(x: jnp.ndarray, w: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """NWC same-padding dilated conv; w: [k, Cin, Cout]."""
    pad = dilation * (w.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def _conv_taps(y: jnp.ndarray, w: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """Stacked-chain dilated conv as K shifted batched matmuls.

    ``y``: [S, B, T, C] chain activations, ``w``: [S, K, Cin, Cout].
    Each tap is one einsum ``sbtf,sfg->sbtg`` — a size-S batched GEMM with
    M = B*T rows, which the MXU tiles directly (XLA's conv lowering of the
    same op runs S separate small convolutions).
    """
    S, B, T, C = y.shape
    K = w.shape[1]
    pad = dilation * (K - 1) // 2
    ypad = jnp.pad(y, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    out = None
    for j in range(K):
        sl = jax.lax.dynamic_slice_in_dim(ypad, j * dilation, T, axis=2)
        t = jnp.einsum("sbtf,sfg->sbtg", sl, w[:, j])
        out = t if out is None else out + t
    return out


def _group_norm_1(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """torch GroupNorm(1, C) over [.., B, T, C]: stats over (T, C) per sample.
    Operates on stacked [S, B, T, C] with per-S scale/bias [S, C]."""
    mu = jnp.mean(x, axis=(2, 3), keepdims=True)
    var = jnp.var(x, axis=(2, 3), keepdims=True)
    xn = (x - mu) / jnp.sqrt(var + 1e-5)
    return xn * scale[:, None, None, :] + bias[:, None, None, :]


def fused_forward(
    cfg: EncoderConfig, params, x: jnp.ndarray, conv_impl: str = "vmap_conv"
) -> T.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deterministic forward identical to ``HumanActionScorer.__call__``.

    ``conv_impl``: "vmap_conv" (vmapped ``conv_general_dilated``) or
    "tap_matmul" (K shifted batched GEMMs per conv — see ``_conv_taps``).
    """
    B, Tlen, D = x.shape
    if D != cfg.input_dim:
        raise ValueError(f"expected input dim {cfg.input_dim}, got {D}")
    d_model = cfg.d_model
    diff_dims = dict(cfg.dims_map_diff)

    raw = x[:, :, : cfg.one_pass_raw]
    diff = (
        x[:, :, cfg.one_pass_raw : cfg.one_pass_raw + cfg.one_pass_diff]
        if cfg.has_diff
        else None
    )

    # per-chain stems (different input dims -> separate small matmuls),
    # collecting (chain activations, chain -> modality-slot bookkeeping)
    chains: T.List[jnp.ndarray] = []
    chain_params: T.List[T.Any] = []
    slot_of_chain: T.List[int] = []
    r_off = d_off = 0
    for slot, (m, rd) in enumerate(cfg.dims_map_raw):
        p = params[f"state_enc_{m}"]
        chains.append(_conv(raw[:, :, r_off : r_off + rd], p["stem"]["kernel"]))
        chain_params.append(p)
        slot_of_chain.append(slot)
        r_off += rd
        dd = diff_dims[m]
        if cfg.has_diff and dd > 0:
            p = params[f"motion_enc_{m}"]
            chains.append(_conv(diff[:, :, d_off : d_off + dd], p["stem"]["kernel"]))
            chain_params.append(p)
            slot_of_chain.append(slot)
        d_off += dd

    y = jnp.stack(chains)                               # [S, B, T, d_model]
    S = y.shape[0]

    # stacked residual blocks: one vmapped conv chain for all S streams
    for i, dil in enumerate(_DILATIONS):
        w1 = jnp.stack([p[f"block{i}"]["conv1"]["kernel"] for p in chain_params])
        w2 = jnp.stack([p[f"block{i}"]["conv2"]["kernel"] for p in chain_params])
        gs = jnp.stack([p[f"block{i}"]["norm"]["scale"] for p in chain_params])
        gb = jnp.stack([p[f"block{i}"]["norm"]["bias"] for p in chain_params])
        res = y
        if conv_impl == "tap_matmul":
            h = _conv_taps(y, w1, dil)
        else:
            h = jax.vmap(lambda xx, ww: _conv(xx, ww, dil))(y, w1)
        h = jax.nn.gelu(h, approximate=False)
        if conv_impl == "tap_matmul":
            h = _conv_taps(h, w2, dil)
        else:
            h = jax.vmap(lambda xx, ww: _conv(xx, ww, dil))(h, w2)
        h = jax.nn.gelu(h + res, approximate=False)
        y = _group_norm_1(h, gs, gb)

    proj = jnp.stack([p["proj"]["kernel"] for p in chain_params])  # [S, dm, dm]
    y = jnp.einsum("sbtc,scd->sbtd", y, proj)

    # sum raw+diff per modality slot, then non-affine layer norm
    M = len(cfg.modalities)
    slots = jnp.asarray(slot_of_chain)
    summed = jax.ops.segment_sum(
        y.reshape(S, -1), slots, num_segments=M
    ).reshape(M, B, Tlen, d_model)
    mu = jnp.mean(summed, axis=-1, keepdims=True)
    var = jnp.var(summed, axis=-1, keepdims=True)
    m_tokens = jnp.transpose(
        (summed - mu) / jnp.sqrt(var + 1e-5), (1, 2, 0, 3)
    )                                                    # [B, T, M, dm]

    # per-frame fusion (identical math to PerFrameFusion)
    f = params["fusion"]
    kv = _layer_norm(m_tokens, f["kv_ln"]["scale"], f["kv_ln"]["bias"])
    q = _layer_norm(
        jnp.broadcast_to(f["latent"], (B, Tlen, 1, d_model)),
        f["q_ln"]["scale"],
        f["q_ln"]["bias"],
    )
    Q = q @ f["Wq"]["kernel"]
    K = kv @ f["Wk"]["kernel"]
    V = kv @ f["Wv"]["kernel"]
    logits = jnp.einsum("btqd,btmd->btqm", Q, K) / math.sqrt(d_model)
    tau = jax.nn.softplus(f["logit_temp"]) + 1e-3
    logits = logits / tau[None, None, None, :] + f["logit_bias"][None, None, None, :]
    A = jax.nn.softmax(logits, axis=-1)
    frame_tok = (jnp.einsum("btqm,btmd->btqd", A, V)[:, :, 0, :]) @ f["Wo"]["kernel"]

    tokens = jnp.concatenate(
        [jnp.broadcast_to(params["cls"], (B, 1, d_model)), frame_tok], axis=1
    )
    tokens = tokens + sinusoidal_positional_embedding(Tlen + 1, d_model)[None].astype(
        tokens.dtype
    )
    for i in range(cfg.time_layers):
        tokens = _transformer_layer(params[f"temporal{i}"], tokens, cfg.time_heads)

    cls_out = tokens[:, 0, :]
    return l2_normalize(cls_out, axis=-1), l2_normalize(tokens, axis=-1), tokens


def block_kernel_forward(
    cfg: EncoderConfig,
    params,
    x: jnp.ndarray,
    block_windows: int = 32,
    precision: str = "high",
    interpret: bool = False,
    stage_fusion: str = "stage",
    conv_variant: str = "slice",
    attn_impl: str = "xla",
) -> T.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deterministic forward with the residual conv stages running in the
    fused Pallas kernel (``ops/conv_kernel.py``) and everything else on the
    module math. Consumes the SAME param tree as ``HumanActionScorer``;
    per-chain layout is kept (the stacked-chain variants measured slower,
    see BENCH_NOTES round-2 shootout).

    ``attn_impl``: temporal-transformer attention — "xla" (einsum, default)
    or "core" (layout-preserving fused Pallas attention, f32 in-kernel dots).

    ``precision``: "high" (in-kernel bf16_3x — matches the scoring default)
    or "highest" (full-f32 dots).
    ``stage_fusion``: "stage" (one kernel per residual stage) or "chain"
    (all 4 stages in one launch with HBM-resident weight DMA — requires
    precision "high"; see ``ops/chain_kernel.py``).
    ``conv_variant``: in-kernel tap formulation for the per-stage kernel —
    "slice" or "mm_first" (``ops/conv_kernel.py``).
    """
    from ..ops.conv_kernel import fused_temporal_block
    if stage_fusion in ("chain", "chain2"):
        if precision != "high":
            raise ValueError("chain fusion supports precision='high' only")
        from ..ops.chain_kernel import fused_temporal_chain
    if stage_fusion == "stacked":
        if precision != "high":
            raise ValueError("stacked fusion supports precision='high' only")
        from ..ops.conv_kernel import fused_temporal_block_stacked
    B, Tlen, D = x.shape
    if D != cfg.input_dim:
        raise ValueError(f"expected input dim {cfg.input_dim}, got {D}")
    d_model = cfg.d_model
    diff_dims = dict(cfg.dims_map_diff)

    raw = x[:, :, : cfg.one_pass_raw]
    diff = (
        x[:, :, cfg.one_pass_raw : cfg.one_pass_raw + cfg.one_pass_diff]
        if cfg.has_diff
        else None
    )

    def chain(p, xin):
        y = _conv(xin, p["stem"]["kernel"])
        if stage_fusion in ("chain", "chain2"):
            # "chain": all 4 stages, one launch — 10.5 MB resident weights
            # (+ the slice variant's padded scratch) force block_windows<=16.
            # "chain2": two stages per launch — half the weights, so the full
            # 32-window block fits. The mm_first taps drop the padded scratch
            # entirely (round-5 directive #4), so the 4-stage chain also
            # fits bw=32.
            groups = ((0, 1, 2, 3),) if stage_fusion == "chain" else (
                (0, 1), (2, 3)
            )
            bw = min(
                block_windows,
                16 if (stage_fusion == "chain" and conv_variant != "mm_first")
                else 32,
            )
            for g in groups:
                y = fused_temporal_chain(
                    y,
                    jnp.stack([p[f"block{i}"]["conv1"]["kernel"] for i in g]),
                    jnp.stack([p[f"block{i}"]["conv2"]["kernel"] for i in g]),
                    jnp.stack([p[f"block{i}"]["norm"]["scale"] for i in g]),
                    jnp.stack([p[f"block{i}"]["norm"]["bias"] for i in g]),
                    dilations=tuple(_DILATIONS[i] for i in g),
                    block_windows=bw,
                    variant=conv_variant,
                    interpret=interpret,
                )
            return y @ p["proj"]["kernel"]
        for i, dil in enumerate(_DILATIONS):
            bp = p[f"block{i}"]
            y = fused_temporal_block(
                y,
                bp["conv1"]["kernel"],
                bp["conv2"]["kernel"],
                bp["norm"]["scale"],
                bp["norm"]["bias"],
                dilation=dil,
                block_windows=block_windows,
                precision=precision,
                variant=conv_variant,
                interpret=interpret,
            )
        return y @ p["proj"]["kernel"]

    if stage_fusion == "stacked":
        # ALL chains' stages in 4 launches: stems per chain (ragged input
        # dims), stack, grid-(chain, block) kernel, per-chain proj, then
        # per-modality raw+diff sum (same bookkeeping as fused_forward)
        chains: T.List[jnp.ndarray] = []
        chain_params: T.List[T.Any] = []
        slot_of_chain: T.List[int] = []
        r_off = d_off = 0
        for slot, (m, rd) in enumerate(cfg.dims_map_raw):
            p = params[f"state_enc_{m}"]
            chains.append(_conv(raw[:, :, r_off : r_off + rd], p["stem"]["kernel"]))
            chain_params.append(p)
            slot_of_chain.append(slot)
            r_off += rd
            dd = diff_dims[m]
            if cfg.has_diff and dd > 0:
                p = params[f"motion_enc_{m}"]
                chains.append(
                    _conv(diff[:, :, d_off : d_off + dd], p["stem"]["kernel"])
                )
                chain_params.append(p)
                slot_of_chain.append(slot)
            d_off += dd
        y = jnp.stack(chains)                            # [S, B, T, dm]
        S = y.shape[0]
        for i, dil in enumerate(_DILATIONS):
            y = fused_temporal_block_stacked(
                y,
                jnp.stack([p[f"block{i}"]["conv1"]["kernel"] for p in chain_params]),
                jnp.stack([p[f"block{i}"]["conv2"]["kernel"] for p in chain_params]),
                jnp.stack([p[f"block{i}"]["norm"]["scale"] for p in chain_params]),
                jnp.stack([p[f"block{i}"]["norm"]["bias"] for p in chain_params]),
                dilation=dil,
                block_windows=block_windows,
                interpret=interpret,
            )
        proj = jnp.stack([p["proj"]["kernel"] for p in chain_params])
        y = jnp.einsum("sbtc,scd->sbtd", y, proj)
        M = len(cfg.modalities)
        summed = jax.ops.segment_sum(
            y.reshape(S, -1), jnp.asarray(slot_of_chain), num_segments=M
        ).reshape(M, B, Tlen, d_model)
        mu = jnp.mean(summed, axis=-1, keepdims=True)
        var = jnp.var(summed, axis=-1, keepdims=True)
        m_tokens = jnp.transpose(
            (summed - mu) / jnp.sqrt(var + 1e-5), (1, 2, 0, 3)
        )                                                # [B, T, M, dm]
    else:
        per_mod = []
        r_off = d_off = 0
        for m, rd in cfg.dims_map_raw:
            s = chain(params[f"state_enc_{m}"], raw[:, :, r_off : r_off + rd])
            r_off += rd
            dd = diff_dims[m]
            if cfg.has_diff and dd > 0:
                s = s + chain(
                    params[f"motion_enc_{m}"], diff[:, :, d_off : d_off + dd]
                )
            d_off += dd
            mu = jnp.mean(s, axis=-1, keepdims=True)
            var = jnp.var(s, axis=-1, keepdims=True)
            per_mod.append(((s - mu) / jnp.sqrt(var + 1e-5))[:, :, None, :])

        m_tokens = jnp.concatenate(per_mod, axis=2)      # [B, T, M, dm]

    f = params["fusion"]
    kv = _layer_norm(m_tokens, f["kv_ln"]["scale"], f["kv_ln"]["bias"])
    q = _layer_norm(
        jnp.broadcast_to(f["latent"], (B, Tlen, 1, d_model)),
        f["q_ln"]["scale"],
        f["q_ln"]["bias"],
    )
    Q = q @ f["Wq"]["kernel"]
    K = kv @ f["Wk"]["kernel"]
    V = kv @ f["Wv"]["kernel"]
    logits = jnp.einsum("btqd,btmd->btqm", Q, K) / math.sqrt(d_model)
    tau = jax.nn.softplus(f["logit_temp"]) + 1e-3
    logits = logits / tau[None, None, None, :] + f["logit_bias"][None, None, None, :]
    A = jax.nn.softmax(logits, axis=-1)
    frame_tok = (jnp.einsum("btqm,btmd->btqd", A, V)[:, :, 0, :]) @ f["Wo"]["kernel"]

    tokens = jnp.concatenate(
        [jnp.broadcast_to(params["cls"], (B, 1, d_model)), frame_tok], axis=1
    )
    tokens = tokens + sinusoidal_positional_embedding(Tlen + 1, d_model)[None].astype(
        tokens.dtype
    )
    for i in range(cfg.time_layers):
        tokens = _transformer_layer(
            params[f"temporal{i}"], tokens, cfg.time_heads,
            attn_impl=attn_impl, precision=precision, interpret=interpret,
        )

    cls_out = tokens[:, 0, :]
    return l2_normalize(cls_out, axis=-1), l2_normalize(tokens, axis=-1), tokens


def _layer_norm(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * scale + bias


def _transformer_layer(p, x, n_heads, attn_impl="xla", precision="highest",
                       interpret=False):
    B, S, D = x.shape
    hd = D // n_heads
    qkv = x @ p["in_proj"]["kernel"] + p["in_proj"]["bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if attn_impl == "core":
        # Layout-preserving fused attention (ops/attention_core.py): consumes
        # the [B, S, D] qkv slices directly — no bqhd<->bhqk relayouts, the
        # [S, S] score matrix lives in VMEM. In-kernel dots run at the
        # forward's precision class ("high" = bf16_3x, "highest" = f32), so
        # core-vs-xla A/Bs compare like with like. S=33 experiment; see
        # BENCH_NOTES for the measured verdict.
        from ..ops.attention_core import mha_core

        ctx = mha_core(
            q, k, v, heads=n_heads, precision=precision, interpret=interpret
        )
    elif attn_impl == "xla":
        q = q.reshape(B, S, n_heads, hd)
        k = k.reshape(B, S, n_heads, hd)
        v = v.reshape(B, S, n_heads, hd)
        attn = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd), axis=-1
        )
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, S, D)
    else:
        # a typo'd impl must fail loudly — silently falling through to the
        # einsum path would make a bench run report xla numbers as "core"
        raise ValueError(f"unknown attn_impl {attn_impl!r}")
    ctx = ctx @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]
    x = _layer_norm(x + ctx, p["ln1"]["scale"], p["ln1"]["bias"])
    h = jax.nn.relu(x @ p["linear1"]["kernel"] + p["linear1"]["bias"])
    h = h @ p["linear2"]["kernel"] + p["linear2"]["bias"]
    return _layer_norm(x + h, p["ln2"]["scale"], p["ln2"]["bias"])
