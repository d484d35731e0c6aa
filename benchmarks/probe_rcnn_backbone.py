"""Per-stage Faster R-CNN X101-FPN breakdown on TPU (round 3, detect-perf).

BENCH_NOTES measured the detect stage at 668 ms/8 frames (`high`+block_diag),
with backbone+FPN dominating — but the backbone's NOMINAL FLOPs at the
800x1088 canvas predict ~12 ms/pass-equivalent on a v5e (197 TFLOP/s bf16),
so the measured number implies single-digit MFU somewhere. This probe times
each backbone stage standalone (stem / res2..res5 / FPN convs) plus the
ROIAlign pool and box head with the BENCH_NOTES timing discipline, and
reports nominal GFLOPs and hardware MFU per stage so the slow stage is
localized rather than guessed.

    BENCH_PREC=high BENCH_IMPL=block_diag python benchmarks/probe_rcnn_backbone.py

Env: BENCH_PREC (high|default), BENCH_IMPL (block_diag|native),
BENCH_B (default 8), BENCH_STAGES (csv filter).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def conv_flops(h, w, k, cin, cout, groups=1):
    """Nominal fused-multiply-add x2 FLOPs of one conv at output h x w."""
    return 2.0 * h * w * k * k * (cin // groups) * cout


def main() -> None:
    from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from video_gen_evals_tpu.models.rcnn import (
        BottleneckX,
        ConvFrozenBN,
        RCNNConfig,
    )
    from video_gen_evals_tpu.ops.roi_align import (
        assign_fpn_levels,
        pack_pyramid,
        roi_align_pyramid,
    )

    prec = os.environ.get("BENCH_PREC", "high")
    impl = os.environ.get("BENCH_IMPL", "block_diag")
    B = int(os.environ.get("BENCH_B", "8"))
    only = os.environ.get("BENCH_STAGES")
    only = set(only.split(",")) if only else None
    iters = int(os.environ.get("BENCH_ITERS", "6"))
    cfg = RCNNConfig.x101_32x8d()
    # canvas for 240x320 video frames (BENCH_NOTES detect stage)
    CH, CW = 800, 1088
    # bf16_3x runs 3 MXU passes per nominal FLOP; default 1
    mult = {"high": 3.0, "default": 1.0, "highest": 6.0}[prec]
    peak = 197e12

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = ConvFrozenBN(cfg.stem_channels, 7, 2, name="stem_conv1")(x)
            x = jax.nn.relu(x)
            return jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
            )

    class Stage(nn.Module):
        si: int

        @nn.compact
        def __call__(self, x):
            si = self.si
            n = cfg.stage_blocks[si]
            out_ch = cfg.stage_out[si]
            width = cfg.groups * cfg.width_per_group
            bott = width * (2 ** si)
            for bi in range(n):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = BottleneckX(
                    out_ch, bott, stride, cfg.groups, cfg.stride_in_1x1,
                    has_shortcut=(bi == 0), conv_impl=impl,
                    name=f"res{si + 2}_b{bi}",
                )(x)
            return x

    class FPNConvs(nn.Module):
        """laterals + 3x3 outputs on the four residual feature maps (the
        top-down adds/upsamples are bandwidth-trivial and timed implicitly)."""

        @nn.compact
        def __call__(self, feats):
            f = cfg.fpn_channels
            outs = []
            for i, r in enumerate(feats):
                l = nn.Conv(f, (1, 1), name=f"lat{i}")(r)
                outs.append(
                    nn.Conv(f, (3, 3), padding=[(1, 1), (1, 1)],
                            name=f"out{i}")(l)
                )
            return outs

    def stage_flops(si, h, w):
        n = cfg.stage_blocks[si]
        out_ch = cfg.stage_out[si]
        width = cfg.groups * cfg.width_per_group
        bott = width * (2 ** si)
        cin = cfg.stem_channels if si == 0 else cfg.stage_out[si - 1]
        # hardware-executed FLOPs: native grouped divides cin by G;
        # block_diag runs the zero-filled full conv (G x the native FLOPs)
        g = cfg.groups if impl == "native" else 1
        cg_in = bott
        fl = 0.0
        for bi in range(n):
            c_in = cin if bi == 0 else out_ch
            fl += conv_flops(h, w, 1, c_in, bott)
            fl += conv_flops(h, w, 3, cg_in, bott, g)
            fl += conv_flops(h, w, 1, bott, out_ch)
            if bi == 0:
                fl += conv_flops(h, w, 1, c_in, out_ch)
        return fl

    rng = np.random.default_rng(0)

    def timed(name, fn, params, x, nominal_flops):
        if only and name not in only:
            return
        with jax.default_matmul_precision(prec):
            f = jax.jit(fn)
            base = x
            y = f(params, base)
            leaf = jax.tree_util.tree_leaves(y)[0]
            _ = float(jnp.sum(leaf).astype(jnp.float32))  # compile barrier
            for _pass in range(2):
                carry = jnp.zeros((), jnp.float32)
                t0 = time.perf_counter()
                for i in range(iters):
                    d = carry * 0 + jnp.float32(i) * 1e-3
                    xi = jax.tree_util.tree_map(lambda a: a + d, base)
                    y = f(params, xi)
                    leaf = jax.tree_util.tree_leaves(y)[0]
                    carry = jnp.sum(leaf).astype(jnp.float32)
                _ = float(carry)
                ms = (time.perf_counter() - t0) / iters * 1e3
        hw_tflops = nominal_flops * B * mult / (ms * 1e-3) / 1e12
        print(
            json.dumps({
                "stage": name, "prec": prec, "impl": impl, "batch": B,
                "ms": round(ms, 2),
                "nominal_gflop_per_im": round(nominal_flops / 1e9, 1),
                "hw_tflops": round(hw_tflops, 1),
                "mfu_pct": round(100 * hw_tflops * 1e12 / peak, 1),
            }),
            flush=True,
        )

    key = jax.random.PRNGKey(0)

    # stem: [B, 800, 1088, 3] -> [B, 200, 272, 64]
    stem = Stem()
    x0 = jnp.asarray(rng.normal(size=(B, CH, CW, 3)).astype(np.float32))
    p = stem.init(key, x0)["params"]
    timed("stem", lambda pp, xx: stem.apply({"params": pp}, xx), p, x0,
          conv_flops(CH // 2, CW // 2, 7, 3, cfg.stem_channels))

    # res stages
    shapes = [
        (CH // 4, CW // 4, cfg.stem_channels),
        (CH // 4, CW // 4, cfg.stage_out[0]),
        (CH // 8, CW // 8, cfg.stage_out[1]),
        (CH // 16, CW // 16, cfg.stage_out[2]),
    ]
    for si in range(4):
        h_in, w_in, c_in = shapes[si]
        h_out = h_in if si == 0 else h_in // 2
        w_out = w_in if si == 0 else w_in // 2
        st = Stage(si)
        x = jnp.asarray(rng.normal(size=(B, h_in, w_in, c_in)).astype(np.float32))
        p = st.init(key, x)["params"]
        timed(f"res{si + 2}", lambda pp, xx, st=st: st.apply({"params": pp}, xx),
              p, x, stage_flops(si, h_out, w_out))

    # FPN convs on the 4 residual maps
    fpn = FPNConvs()
    feats = tuple(
        jnp.asarray(rng.normal(size=(
            B, CH // (4 * 2 ** i), CW // (4 * 2 ** i), cfg.stage_out[i]
        )).astype(np.float32))
        for i in range(4)
    )
    p = fpn.init(key, feats)["params"]
    fl = sum(
        conv_flops(CH // (4 * 2 ** i), CW // (4 * 2 ** i), 1,
                   cfg.stage_out[i], cfg.fpn_channels)
        + conv_flops(CH // (4 * 2 ** i), CW // (4 * 2 ** i), 3,
                     cfg.fpn_channels, cfg.fpn_channels)
        for i in range(4)
    )
    timed("fpn_convs", lambda pp, ff: fpn.apply({"params": pp}, ff), p, feats, fl)

    # ROIAlign pool: 1000 boxes per image from a packed pyramid
    if only is None or "roi_pool" in only:
        f = cfg.fpn_channels
        pyr = [
            jnp.asarray(rng.normal(size=(
                CH // s, CW // s, f
            )).astype(np.float32))
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

        def pool(pyr_in, bxs):
            # pyramid rides the params slot: closing the jit over the
            # ~74 MB pyramid would bake it into the HLO as constants and
            # blow the tunnel's remote-compile request limit (CLAUDE.md)
            import jax as _j
            lv = assign_fpn_levels(bxs.reshape(-1, 4)).reshape(bxs.shape[:2])
            buf, offs, hw = pack_pyramid(pyr_in)

            def one(args):
                bb, ll = args
                return roi_align_pyramid(
                    buf, offs, hw, cfg.strides[:4], bb, ll,
                    out_size=cfg.roi_resolution, window=cfg.roi_window,
                    chunk=cfg.roi_chunk,
                )

            return _j.lax.map(one, (bxs, lv))

        # traffic-bound: report GB/s instead of MFU via nominal matmul flops
        nom = (
            2.0 * K * (cfg.roi_resolution * cfg.roi_window * cfg.roi_window * f
                       + cfg.roi_resolution * cfg.roi_resolution
                       * cfg.roi_window * f)
        )
        timed("roi_pool", pool, pyr, boxes, nom)

    # box head: 1000 pooled ROIs x (12544 -> 1024 -> 1024 -> 81/320)
    if only is None or "box_head" in only:
        K = cfg.rpn_post_nms_topk
        pooled = jnp.asarray(rng.normal(size=(
            B * K, cfg.roi_resolution, cfg.roi_resolution, cfg.fpn_channels
        )).astype(np.float32))

        class Head(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = x.reshape(x.shape[0], -1)
                x = jax.nn.relu(nn.Dense(cfg.fc_dim, name="fc1")(x))
                x = jax.nn.relu(nn.Dense(cfg.fc_dim, name="fc2")(x))
                return (nn.Dense(cfg.num_classes + 1, name="cls")(x),
                        nn.Dense(cfg.num_classes * 4, name="box")(x))

        head = Head()
        p = head.init(key, pooled[:2])["params"]
        d_in = cfg.roi_resolution ** 2 * cfg.fpn_channels
        fl = 2.0 * K * (d_in * cfg.fc_dim + cfg.fc_dim * cfg.fc_dim
                        + cfg.fc_dim * (cfg.num_classes * 5 + 1))
        timed("box_head", lambda pp, xx: head.apply({"params": pp}, xx), p,
              pooled, fl)


if __name__ == "__main__":
    main()
