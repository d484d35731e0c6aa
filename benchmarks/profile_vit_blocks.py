"""ViT-H MFU diagnosis: decompose the extraction backbone's block cost.

BENCH_NOTES: ViT-H bf16 extraction measured 436 frames/s at batch 32
(~55% MFU against the 197 TF/s v5e bf16 peak) and FLAT to batch 128 —
so the limiter is per-activation work, not weight streaming. This probe
times ablated variants (one compile each, persistent cache) to locate it:

- ``full``        the real ViTBackbone forward
- ``gemm_only``   the same 6 Dense matmuls per block, no LN/attn/residual
                  (the practical GEMM roofline for these shapes)
- ``no_attn``     attention replaced by ctx = v (isolates softmax/einsum
                  transpose cost, keeps all matmuls)
- ``hd128``       16 -> 10 heads (head_dim 80 -> 128): MXU lane-padding test

Timing discipline per BENCH_NOTES: chained iterations, varied input,
final value fetch, second pass reported.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from video_gen_evals_tpu.models.vit import ViTBackbone, ViTConfig

    B = int(os.environ.get("PROBE_BATCH", "32"))
    depth = int(os.environ.get("PROBE_DEPTH", "32"))
    iters = int(os.environ.get("PROBE_ITERS", "8"))
    D, N, H = 1280, 192, 16

    rng = np.random.default_rng(0)
    crops = jnp.asarray(rng.normal(size=(B, 256, 192, 3)).astype(np.float32))

    def bf16(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            tree,
        )

    def timeit(fn, x):
        """Chained + input-varied iteration timing (BENCH_NOTES discipline);
        returns ms/call (2nd pass)."""
        carry = jnp.zeros((), jnp.float32)
        _ = float(jnp.sum(fn(x)).astype(jnp.float32))
        for _pass in range(2):
            t0 = time.perf_counter()
            for i in range(iters):
                xi = x + (carry * 0 + jnp.float32(i) * 1e-6).astype(x.dtype)
                carry = jnp.sum(fn(xi)).astype(jnp.float32)
            _ = float(carry)
            dt = (time.perf_counter() - t0) / iters
        return dt * 1e3

    results = {}
    flops_frame = 248e9  # ViT-H fwd GFLOPs/frame (BENCH_NOTES)

    # --- full backbone -------------------------------------------------
    cfg = ViTConfig(depth=depth)
    model = ViTBackbone(cfg)
    params = bf16(model.init(jax.random.key(0), crops[:1])["params"])
    jfwd = jax.jit(lambda p, c: model.apply({"params": p}, c)[0])
    ms = timeit(lambda c: jfwd(params, c), crops)
    results["full_ms"] = round(ms, 2)
    results["full_fps"] = round(B / ms * 1e3, 1)
    results["full_mfu_pct"] = round(
        flops_frame * (depth / 32) * B / (ms * 1e-3) / 197e12 * 100, 1
    )

    # --- GEMM-only roofline -------------------------------------------
    class GemmBlock(nn.Module):
        @nn.compact
        def __call__(self, x):
            q = nn.Dense(3 * D, name="qkv")(x)
            x = nn.Dense(D, name="proj")(q[..., :D])
            h = nn.Dense(4 * D, name="fc1")(x)
            return nn.Dense(D, name="fc2")(h)

    class GemmStack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(depth):
                x = GemmBlock(name=f"b{i}")(x)
            return x

    tok = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    gm = GemmStack()
    gp = bf16(gm.init(jax.random.key(1), tok[:1])["params"])
    jg = jax.jit(lambda p, t: gm.apply({"params": p}, t))
    ms = timeit(lambda t: jg(gp, t), tok)
    results["gemm_only_ms"] = round(ms, 2)
    gemm_flops = 2 * B * N * D * D * 12 * depth
    results["gemm_only_tflops"] = round(gemm_flops / (ms * 1e-3) / 1e12, 1)
    results["gemm_only_mfu_pct"] = round(
        gemm_flops / (ms * 1e-3) / 197e12 * 100, 1
    )

    # --- no-attention (ctx = v) ----------------------------------------
    class NoAttnBlock(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
            qkv = h @ self.param(
                "qkv", nn.initializers.lecun_normal(), (D, 3 * D)
            )
            x = x + nn.Dense(D, name="proj")(qkv[..., 2 * D :])
            h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
            h = nn.Dense(4 * D, name="fc1")(h)
            h = jax.nn.gelu(h, approximate=False)
            return x + nn.Dense(D, name="fc2")(h)

    class NoAttnStack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(depth):
                x = NoAttnBlock(name=f"b{i}")(x)
            return x

    nam = NoAttnStack()
    nap = bf16(nam.init(jax.random.key(2), tok[:1])["params"])
    jn = jax.jit(lambda p, t: nam.apply({"params": p}, t))
    results["no_attn_ms"] = round(timeit(lambda t: jn(nap, t), tok), 2)

    # --- head_dim 128 (10 heads) ---------------------------------------
    cfg128 = ViTConfig(depth=depth, num_heads=10)
    m128 = ViTBackbone(cfg128)
    p128 = bf16(m128.init(jax.random.key(3), crops[:1])["params"])
    j128 = jax.jit(lambda p, c: m128.apply({"params": p}, c)[0])
    results["hd128_ms"] = round(timeit(lambda c: j128(p128, c), crops), 2)

    # --- Pallas flash attention (bf16 dots) ----------------------------
    cfgf = ViTConfig(depth=depth, attention_impl="pallas_bf16")
    mf = ViTBackbone(cfgf)
    jf = jax.jit(lambda p, c: mf.apply({"params": p}, c)[0])
    ms = timeit(lambda c: jf(params, c), crops)
    results["flash_bf16_ms"] = round(ms, 2)
    results["flash_bf16_fps"] = round(B / ms * 1e3, 1)

    # --- transpose-only "attention" -------------------------------------
    # isolates the bqhd->bhqk->bqhd relayout cost from softmax+dot cost:
    # same transposes as real attention, but ctx = transposed-back v
    class TpOnlyBlock(nn.Module):
        @nn.compact
        def __call__(self, x):
            Bq, Nq, _ = x.shape
            h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
            qkv = nn.Dense(3 * D, name="qkv")(h).reshape(Bq, Nq, 3, H, D // H)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            vt = jnp.transpose(v, (0, 2, 1, 3))            # bqhd -> bhqd
            vt = vt + jnp.transpose(q + k, (0, 2, 1, 3)) * jnp.bfloat16(1e-6)
            ctx = jnp.transpose(vt, (0, 2, 1, 3)).reshape(Bq, Nq, D)
            x = x + nn.Dense(D, name="proj")(ctx)
            h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
            h = nn.Dense(4 * D, name="fc1")(h)
            h = jax.nn.gelu(h, approximate=False)
            return x + nn.Dense(D, name="fc2")(h)

    class TpOnlyStack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(depth):
                x = TpOnlyBlock(name=f"b{i}")(x)
            return x

    tm_ = TpOnlyStack()
    tp_ = bf16(tm_.init(jax.random.key(4), tok[:1])["params"])
    jt = jax.jit(lambda p, t: tm_.apply({"params": p}, t))
    results["transpose_only_ms"] = round(timeit(lambda t: jt(tp_, t), tok), 2)

    # --- layout-preserving attention core (ops/attention_core.py) -------
    cfgc = ViTConfig(depth=depth, attention_impl="core")
    mc = ViTBackbone(cfgc)
    jc = jax.jit(lambda p, c: mc.apply({"params": p}, c)[0])
    ms = timeit(lambda c: jc(params, c), crops)
    results["core_ms"] = round(ms, 2)
    results["core_fps"] = round(B / ms * 1e3, 1)
    results["core_mfu_pct"] = round(
        flops_frame * (depth / 32) * B / (ms * 1e-3) / 197e12 * 100, 1
    )

    # --- core kernel with 128-lane-aligned heads (10 x 128) -------------
    cfgca = ViTConfig(depth=depth, num_heads=10, attention_impl="core")
    mca = ViTBackbone(cfgca)
    jca = jax.jit(lambda p, c: mca.apply({"params": p}, c)[0])
    results["core_hd128_ms"] = round(timeit(lambda c: jca(p128, c), crops), 2)

    results.update({"batch": B, "depth": depth})
    print(json.dumps(results))


if __name__ == "__main__":
    main()
