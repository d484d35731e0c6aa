"""Round-3 ViT-H attention swing (judge directive #8): time the full ViT-H
backbone (bf16 params) with the head-batched packed-QKV schedule vs the XLA
einsum path and the round-2 layout-preserving core, across frame batches.

    PROBE_ITERS=8 python benchmarks/probe_attention_r3.py

Prints one JSON line per (impl, batch). BENCH_NOTES timing discipline:
chained data deps, varied inputs, second-pass timing, final value fetch.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from video_gen_evals_tpu.models.vit import ViTBackbone, ViTConfig

    iters = int(os.environ.get("PROBE_ITERS", "8"))
    batches = [int(b) for b in os.environ.get("PROBE_BATCHES", "32,64,128").split(",")]
    impls = os.environ.get("PROBE_IMPLS", "xla,core,head_batched").split(",")

    rng = np.random.default_rng(0)

    def bf16(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            tree,
        )

    # one shared param tree: impls are param-compatible
    base_cfg = ViTConfig()
    params = None

    for B in batches:
        crops = jnp.asarray(
            rng.normal(size=(B, 256, 192, 3)).astype(np.float32)
        )
        for impl in impls:
            cfg = ViTConfig(attention_impl=impl)
            model = ViTBackbone(cfg)
            if params is None:
                params = bf16(model.init(jax.random.key(0), crops[:1])["params"])
            jfwd = jax.jit(lambda p, c: model.apply({"params": p}, c)[0])
            carry = jnp.zeros((), jnp.float32)
            _ = float(jnp.sum(jfwd(params, crops)).astype(jnp.float32))
            for _pass in range(2):
                t0 = time.perf_counter()
                for i in range(iters):
                    ci = crops + (carry * 0 + jnp.float32(i) * 1e-6)
                    carry = jnp.sum(jfwd(params, ci)).astype(jnp.float32)
                _ = float(carry)
                ms = (time.perf_counter() - t0) / iters * 1e3
            print(json.dumps({
                "impl": impl, "batch": B, "ms": round(ms, 2),
                "fps": round(B / ms * 1e3, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
