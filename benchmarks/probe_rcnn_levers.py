"""R-CNN detect-stage lever experiments (round 3, after probe_rcnn_backbone).

The per-stage probe localized the detect stage's cost: res4 245 ms/8 frames
(89.6% MFU of block_diag's 32x-expanded FLOPs — i.e. wasted on zeros),
roi_pool 177 ms (slice-traffic bound), stem 30 ms (cin=3 at 1.6% MFU). This
probe measures the candidate fixes BEFORE wiring them into the model:

A. grouped 3x3 conv at each res-stage geometry: native feature_group_count,
   full block-diag (current default), and SUPER-GROUP block-diag — merge
   groups only up to a dense ``width``-channel block (128 = one MXU lane
   tile), so the executed-FLOP expansion is ``width/cg`` instead of ``G``;
B. stem 7x7/2 cin=3 conv vs im2col (49 strided slices + one [147,64] matmul);
C. roi_pool variants: f32 vs bf16 packed pyramid, window 48 vs 32,
   sequential lax.map vs vmap over images, chunk size.

    BENCH_PART=groups,stem,roi python benchmarks/probe_rcnn_levers.py
"""

from __future__ import annotations

import functools
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

    parts = os.environ.get("BENCH_PART", "groups,stem,roi").split(",")
    prec = os.environ.get("BENCH_PREC", "high")
    iters = int(os.environ.get("BENCH_ITERS", "6"))
    B = 8
    rng = np.random.default_rng(0)

    def timed(tag, fn, *args):
        with jax.default_matmul_precision(prec):
            f = jax.jit(fn)
            y = f(*args)
            leaf = jax.tree_util.tree_leaves(y)[0]
            _ = float(jnp.sum(leaf).astype(jnp.float32))
            for _pass in range(2):
                carry = jnp.zeros((), jnp.float32)
                t0 = time.perf_counter()
                for i in range(iters):
                    d = carry * 0 + jnp.float32(i) * 1e-3
                    ai = jax.tree_util.tree_map(lambda a: a + d.astype(a.dtype), args[0])
                    y = f(ai, *args[1:])
                    leaf = jax.tree_util.tree_leaves(y)[0]
                    carry = jnp.sum(leaf).astype(jnp.float32)
                _ = float(carry)
                ms = (time.perf_counter() - t0) / iters * 1e3
        print(json.dumps({"tag": tag, "prec": prec, "ms": round(ms, 2)}),
              flush=True)
        return ms

    # ---------------- A: grouped conv formulations -----------------------
    if "groups" in parts:
        G = 32
        geoms = [  # (name, H, W, C=bott)
            ("res2", 200, 272, 256),
            ("res3", 100, 136, 512),
            ("res4", 50, 68, 1024),
            ("res5", 25, 34, 2048),
        ]
        for name, H, W, C in geoms:
            cg = C // G
            x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
            kern = jnp.asarray(
                rng.normal(size=(3, 3, cg, C)).astype(np.float32) * 0.05
            )

            def native(xx, kk):
                return jax.lax.conv_general_dilated(
                    xx, kk, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=G,
                )

            def supergroup(xx, kk, width):
                m = max(width // cg, 1)
                m = min(m, G)
                Gp = G // m
                cog = C // G
                k5 = kk.reshape(3, 3, cg, Gp, m, cog)
                eye = jnp.eye(m, dtype=kk.dtype)[
                    None, None, :, None, None, :, None
                ]
                full = (k5[:, :, None] * eye).reshape(3, 3, m * cg, Gp * m * cog)
                return jax.lax.conv_general_dilated(
                    xx, full, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=Gp,
                )

            timed(f"{name}_native_g32", native, x, kern)
            for width in (128, 256, 512):
                if width // cg >= 1 and width <= C:
                    timed(
                        f"{name}_super{width}",
                        functools.partial(supergroup, width=width),
                        x, kern,
                    )
            timed(f"{name}_full_blockdiag",
                  functools.partial(supergroup, width=C), x, kern)

    # ---------------- B: stem ---------------------------------------------
    if "stem" in parts:
        x = jnp.asarray(rng.normal(size=(B, 800, 1088, 3)).astype(np.float32))
        kern = jnp.asarray(rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.05)

        def stem_conv(xx, kk):
            return jax.lax.conv_general_dilated(
                xx, kk, (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def stem_im2col(xx, kk):
            Bx, H, W, C = xx.shape
            Ho, Wo = H // 2, W // 2
            xp = jnp.pad(xx, ((0, 0), (3, 3), (3, 3), (0, 0)))
            cols = [
                xp[:, dy : dy + H : 2, dx : dx + W : 2, :]
                for dy in range(7)
                for dx in range(7)
            ]
            patches = jnp.concatenate(cols, axis=-1)       # [B, Ho, Wo, 147]
            wmat = kk.reshape(49 * C, kk.shape[-1])
            return patches @ wmat

        a = stem_conv(x, kern)
        b = stem_im2col(x, kern)
        print(json.dumps({
            "tag": "stem_equivalence_maxdiff",
            "v": float(jnp.max(jnp.abs(a - b))),
        }), flush=True)
        timed("stem_conv", stem_conv, x, kern)
        timed("stem_im2col", stem_im2col, x, kern)

    # ---------------- C: roi pool -----------------------------------------
    if "roi" in parts:
        from video_gen_evals_tpu.models.rcnn import RCNNConfig
        from video_gen_evals_tpu.ops.roi_align import (
            assign_fpn_levels,
            pack_pyramid,
            roi_align_pyramid,
        )

        cfg = RCNNConfig.x101_32x8d()
        f = cfg.fpn_channels
        CH, CW = 800, 1088
        pyr = [
            jnp.asarray(rng.normal(size=(CH // s, CW // s, f)).astype(np.float32))
            for s in (4, 8, 16, 32)
        ]
        K = cfg.rpn_post_nms_topk
        bx = rng.uniform(0, 1, size=(B, K, 4)).astype(np.float32)
        boxes = np.stack([
            bx[..., 0] * CW, bx[..., 1] * CH,
            np.minimum(bx[..., 0] * CW + 30 + bx[..., 2] * 300, CW),
            np.minimum(bx[..., 1] * CH + 30 + bx[..., 3] * 300, CH),
        ], axis=-1).astype(np.float32)
        boxes = jnp.asarray(boxes)

        def pool(bxs, *pyr_in, dtype, window, img_vmap, chunk):
            # pyramid passed as jit arguments: closing over the ~74 MB
            # pyramid would bake it into the HLO as constants and blow the
            # tunnel's remote-compile request limit (CLAUDE.md)
            lv = assign_fpn_levels(bxs.reshape(-1, 4)).reshape(bxs.shape[:2])
            pyr_c = [p.astype(dtype) for p in pyr_in]
            buf, offs, hw = pack_pyramid(pyr_c)

            def one(args):
                bb, ll = args
                return roi_align_pyramid(
                    buf, offs, hw, cfg.strides[:4], bb, ll,
                    out_size=cfg.roi_resolution, window=window, chunk=chunk,
                )

            if img_vmap:
                return jax.vmap(lambda bb, ll: one((bb, ll)))(bxs, lv)
            return jax.lax.map(one, (bxs, lv))

        for tag, kw in [
            ("roi_base_f32_w48_map_c128",
             dict(dtype=jnp.float32, window=48, img_vmap=False, chunk=128)),
            ("roi_bf16_w48_map_c128",
             dict(dtype=jnp.bfloat16, window=48, img_vmap=False, chunk=128)),
            ("roi_f32_w32_map_c128",
             dict(dtype=jnp.float32, window=32, img_vmap=False, chunk=128)),
            ("roi_f32_w48_vmap_c128",
             dict(dtype=jnp.float32, window=48, img_vmap=True, chunk=128)),
            ("roi_f32_w48_map_c256",
             dict(dtype=jnp.float32, window=48, img_vmap=False, chunk=256)),
            ("roi_bf16_w32_vmap_c256",
             dict(dtype=jnp.bfloat16, window=32, img_vmap=True, chunk=256)),
        ]:
            timed(tag, functools.partial(pool, **kw), boxes, *pyr)

    # ------------- D: Pallas DMA + single-GEMM pool (round 4) -------------
    if "dma" in parts:
        from video_gen_evals_tpu.models.rcnn import RCNNConfig
        from video_gen_evals_tpu.ops.roi_align import (
            assign_fpn_levels,
            pack_pyramid,
            roi_align_pyramid,
            roi_align_pyramid_dma,
        )

        cfg = RCNNConfig.x101_32x8d()
        f = cfg.fpn_channels
        CH, CW = 800, 1088
        pyr = [
            jnp.asarray(rng.normal(size=(CH // s, CW // s, f)).astype(np.float32))
            for s in (4, 8, 16, 32)
        ]
        K = cfg.rpn_post_nms_topk
        bx = rng.uniform(0, 1, size=(B, K, 4)).astype(np.float32)
        boxes = np.stack([
            bx[..., 0] * CW, bx[..., 1] * CH,
            np.minimum(bx[..., 0] * CW + 30 + bx[..., 2] * 300, CW),
            np.minimum(bx[..., 1] * CH + 30 + bx[..., 3] * 300, CH),
        ], axis=-1).astype(np.float32)
        boxes = jnp.asarray(boxes)

        def pool_dma(bxs, *pyr_in, dtype, n, precision):
            lv = assign_fpn_levels(bxs.reshape(-1, 4)).reshape(bxs.shape[:2])
            pyr_c = [p.astype(dtype) for p in pyr_in]
            buf, offs, hw = pack_pyramid(pyr_c)

            def one(args):
                bb, ll = args
                return roi_align_pyramid_dma(
                    buf, offs, hw, cfg.strides[:4], bb, ll,
                    out_size=cfg.roi_resolution, window=cfg.roi_window,
                    rois_per_step=n, precision=precision,
                )

            return jax.lax.map(one, (bxs, lv))

        def pool_base(bxs, *pyr_in):
            lv = assign_fpn_levels(bxs.reshape(-1, 4)).reshape(bxs.shape[:2])
            buf, offs, hw = pack_pyramid(list(pyr_in))

            def one(args):
                bb, ll = args
                return roi_align_pyramid(
                    buf, offs, hw, cfg.strides[:4], bb, ll,
                    out_size=cfg.roi_resolution, window=cfg.roi_window,
                    chunk=cfg.roi_chunk,
                )

            return jax.lax.map(one, (bxs, lv))

        base_ms = timed("roi_dma_baseline_matmul_f32", pool_base, boxes, *pyr)
        hi = jax.lax.Precision.HIGHEST
        df = jax.lax.Precision.DEFAULT   # Mosaic dots support DEFAULT/HIGHEST only
        for tag, kw in [
            ("roi_dma_f32_n1_highest", dict(dtype=jnp.float32, n=1, precision=hi)),
            ("roi_dma_f32_n2_highest", dict(dtype=jnp.float32, n=2, precision=hi)),
            ("roi_dma_f32_n1_default", dict(dtype=jnp.float32, n=1, precision=df)),
            ("roi_dma_bf16_n1", dict(dtype=jnp.bfloat16, n=1, precision=df)),
        ]:
            timed(tag, functools.partial(pool_dma, **kw), boxes, *pyr)
        # numeric agreement of the two impls ON CHIP (HIGHEST vs HIGHEST)
        got = jax.jit(functools.partial(
            pool_dma, dtype=jnp.float32, n=1, precision=hi
        ))(boxes, *pyr)
        want = jax.jit(pool_base)(boxes, *pyr)
        d = float(jnp.max(jnp.abs(got - want)))
        print(json.dumps({"tag": "roi_dma_vs_matmul_maxabs", "val": d}),
              flush=True)


if __name__ == "__main__":
    main()
