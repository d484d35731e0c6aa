"""Benchmark: end-to-end TAG scoring throughput (clips/sec) on the default
JAX backend (the real TPU chip under the driver; CPU if forced).

Measures the full serve path from device-resident precomputed features:
window gather -> fusion encoder (full flagship dims) -> per-window TC +
CLS embeddings -> per-video segment reductions (AC distances). This is
BASELINE.json config 1 scaled up, with the same architecture the reference
scores with (d_model 256, 4 transformer layers, 5 modalities, clip_len 32).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the ratio against the stored reference-equivalent torch-CPU
measurement (BENCH_BASELINE.json, produced by scripts/measure_baseline.py).

Matmuls run at "high" precision (bf16_3x passes on the MXU): measured on
chip, it holds AC/TC score parity to ~3.5e-5 against full-f32 "highest" —
30x inside the 1e-3 parity budget — at ~1.6x the throughput. ("default"
single-pass bf16 reaches ~2.8x but its ~5e-3 AC error exceeds the budget;
see PARITY.md.)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from video_gen_evals_tpu.data.features import (
    gather_windows as gather_windows_take,
    gather_windows_sliced,
)
from video_gen_evals_tpu.ops.window_kernel import (
    pad_bank_lanes,
    pallas_gather_windows_burst,
)
from video_gen_evals_tpu.metrics.scores import (
    tc_per_window,
    video_ac_scores,
    video_tc_scores,
)
from video_gen_evals_tpu.models import EncoderConfig
from video_gen_evals_tpu.models.fusion_encoder import init_encoder

DIMS_RAW = {"vit": 1024, "global": 9, "pose": 207, "beta": 10, "kp2d": 120}
DIMS_DIFF = {"vit": 1024, "global": 3, "pose": 69, "beta": 10, "kp2d": 120}
# the maximal 7-modality configuration (ref train.py:29-48: optional CLIP
# 512-d + DINO 768-d in BOTH raw and diff maps) — select with
# BENCH_DIMS=full or --full-dims; input_dim 2596 -> 5156
DIMS_RAW_FULL = dict(DIMS_RAW, clip=512, dino=768)
DIMS_DIFF_FULL = dict(DIMS_DIFF, clip=512, dino=768)
CLIP_LEN = 32
STRIDE = 8


def build_synthetic_bank(num_videos: int, frames: int, dim: int, seed: int = 0):
    """Sentinel-padded layout: per-video rows rounded up to 8 (see
    data/features.py), offsets 8-aligned for the Pallas gather kernel."""
    rng = np.random.default_rng(seed)
    rows = (frames + 1 + 7) // 8 * 8
    row_limit = np.full(num_videos, rows - 1, np.int32)
    offsets = (np.arange(num_videos) * rows).astype(np.int32)
    bank = rng.normal(size=(num_videos * rows, dim)).astype(np.float32)
    return bank, offsets, row_limit


def _require_backend() -> None:
    """Fail fast instead of hanging forever when the TPU tunnel is in an
    outage (observed: backend init blocks indefinitely — see CLAUDE.md).
    Shared implementation: ``utils/backend_guard.py`` (bounded re-exec
    retries, exits nonzero so the driver records a failure, not a
    timeout)."""
    from video_gen_evals_tpu.utils.backend_guard import require_backend

    require_backend()


def main() -> None:
    from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    _require_backend()
    num_videos = int(os.environ.get("BENCH_VIDEOS", "64"))
    frames = int(os.environ.get("BENCH_FRAMES", "120"))
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "12"))

    full_dims = (
        os.environ.get("BENCH_DIMS", "flagship") == "full"
        or "--full-dims" in sys.argv
    )
    cfg = EncoderConfig.create(
        DIMS_RAW_FULL if full_dims else DIMS_RAW,
        DIMS_DIFF_FULL if full_dims else DIMS_DIFF,
    )
    model, params = init_encoder(cfg, jax.random.key(0), clip_len=CLIP_LEN)
    D = cfg.input_dim
    one_pass_raw = cfg.one_pass_raw

    bank_np, offsets_np, row_limit_np = build_synthetic_bank(num_videos, frames, D)
    bank = jnp.asarray(bank_np)
    offsets = jnp.asarray(offsets_np)
    row_limit = jnp.asarray(row_limit_np)
    z0 = jnp.zeros(D - one_pass_raw, jnp.float32)

    # production gather: burst Pallas DMA kernel on TPU (stride-8 starts and
    # 8-aligned video offsets are guaranteed by the bank layout); pure-XLA
    # sliced gather elsewhere / via BENCH_GATHER override
    default_gather = "burst" if jax.default_backend() == "tpu" else "sliced"
    gather_impl = os.environ.get("BENCH_GATHER", default_gather)
    if gather_impl == "burst":
        bank_burst = pad_bank_lanes(bank)

        def gather_windows(bank_arg, offsets, row_limit, z0, opr, vi, st, clip):
            del bank_arg  # burst path reads the resident lane-padded copy
            return pallas_gather_windows_burst(
                bank_burst, offsets, row_limit, z0, opr, vi, st, clip, out_dim=D
            )
    elif gather_impl == "take":
        gather_windows = gather_windows_take
    else:
        gather_windows = gather_windows_sliced

    starts_all, vids_all = [], []
    for v in range(num_videos):
        for s in range(0, frames - CLIP_LEN + 1, STRIDE):
            vids_all.append(v)
            starts_all.append(s)
    vids_all = np.array(vids_all, np.int32)
    starts_all = np.array(starts_all, np.int32)
    n_windows = len(vids_all)

    # encoder forward: fused Pallas conv-stage kernel on TPU at "high"
    # (1.2x the module forward, bf16_3x-equivalent — BENCH_NOTES round-2);
    # BENCH_ENCODER=module forces the flax forward
    precision = os.environ.get("BENCH_PRECISION", "high")
    default_encoder = (
        "mm"
        if jax.default_backend() == "tpu" and precision == "high" and batch % 32 == 0
        else "module"
    )
    encoder_impl = os.environ.get("BENCH_ENCODER", default_encoder)
    if encoder_impl in ("kernel", "mm", "chain", "chain2", "stacked"):
        from video_gen_evals_tpu.models.fused_apply import block_kernel_forward

        fusion = {"chain": "chain", "chain2": "chain2",
                  "stacked": "stacked"}.get(encoder_impl, "stage")
        # BENCH_VARIANT overrides the tap formulation for the chain kernels
        # (round-5 directive #4: chain/chain2 with the scratch-free mm taps)
        conv_variant = os.environ.get(
            "BENCH_VARIANT", "mm_first" if encoder_impl == "mm" else "slice"
        )
        # mm_first has no padded scratch, so block_windows=64 fits VMEM
        # (the slice variant's scratch blew it at 64 — BENCH_NOTES round 2)
        bench_bw = int(os.environ.get("BENCH_BW", 32))

        # BENCH_ATTN=core routes the temporal transformer through the
        # layout-preserving fused attention kernel (ops/attention_core.py)
        bench_attn = os.environ.get("BENCH_ATTN", "xla")

        def forward(params, w):
            seq, frames_emb, _ = block_kernel_forward(
                cfg, params, w, block_windows=bench_bw, precision="high",
                stage_fusion=fusion, conv_variant=conv_variant,
                attn_impl=bench_attn,
            )
            return seq, frames_emb
    else:
        def forward(params, w):
            seq, frames_emb, _ = model.apply(
                {"params": params}, w, deterministic=True
            )
            return seq, frames_emb

    # the whole sweep is ONE jitted program: lax.map over device-resident
    # window-index batches -> encoder -> per-window TC/embeds -> per-video
    # segment reductions (AC vs centroids). No host round-trips mid-sweep.
    n_batches = (n_windows + batch - 1) // batch
    pad_n = n_batches * batch - n_windows
    vids_pad = np.concatenate([vids_all, np.repeat(vids_all[-1:], pad_n)])
    starts_pad = np.concatenate([starts_all, np.repeat(starts_all[-1:], pad_n)])
    vi_batches = jnp.asarray(vids_pad.reshape(n_batches, batch))
    st_batches = jnp.asarray(starts_pad.reshape(n_batches, batch))
    win_video = jnp.asarray(vids_all)
    win_weight = jnp.concatenate(
        [jnp.ones(n_windows, jnp.float32), jnp.zeros(pad_n, jnp.float32)]
    )

    @jax.jit
    def score_suite(params, centroids, video_label):
        with jax.default_matmul_precision(precision):
            def one_batch(idx):
                vi, st = idx
                w = gather_windows(
                    bank, offsets, row_limit, z0, one_pass_raw, vi, st, CLIP_LEN
                )
                seq, frames_emb = forward(params, w)
                return seq, tc_per_window(frames_emb)

            seqs, tcs = jax.lax.map(one_batch, (vi_batches, st_batches))
            seqs = seqs.reshape(n_batches * batch, -1)
            tcs = tcs.reshape(n_batches * batch)
            vids = jnp.asarray(vids_pad)
            ac = video_ac_scores(
                seqs, vids, video_label, centroids, weights=win_weight
            )
            tc = video_tc_scores(tcs, vids, num_videos, weights=win_weight)
            return ac, tc

    labels = jnp.zeros(num_videos, jnp.int32)
    centroids = jnp.ones((1, 256), jnp.float32) / 16.0

    # Timing discipline for tunneled TPU execution: (a) chain iterations
    # through a data dependency so every call must execute before the final
    # result exists; (b) end timing with an actual value fetch (device->host
    # transfers are the only reliable completion barrier through the relay);
    # (c) two timed passes, report the BEST: each pass is fully fenced by its
    # final value fetch (the carry depends on every iteration), so min(dt)
    # can't credit unfinished work — it only discards transient tunnel
    # slowness (the relay has measured outage/slowdown episodes; a stalled
    # pass understates steady-state throughput by orders of magnitude).
    carry = jnp.zeros((), jnp.float32)
    ac, tcv = score_suite(params, centroids + carry, labels)  # warmup/compile
    float(ac[0])

    # host-contention snapshot taken right before timing (round-4 lesson:
    # a concurrent CPU test suite silently depressed a measurement ~20%)
    from video_gen_evals_tpu.utils.hostload import guard

    host_load = guard("bench.py")

    best_dt = None
    for _pass in range(max(1, int(os.environ.get("BENCH_PASSES", "2")))):
        # seed the carry differently per pass and propagate a tiny slice of
        # each iteration's result into the next call's input, so no two
        # dispatched calls are value-identical (the relay can short-circuit
        # exact replays — CLAUDE.md timing discipline)
        carry = jnp.float32(1e-6 * (_pass + 1))
        t0 = time.perf_counter()
        for _ in range(iters):
            ac, tcv = score_suite(params, centroids + carry * 1e-6, labels)
            carry = ac[0]
        final = float(carry)
        dt = time.perf_counter() - t0
        best_dt = dt if best_dt is None else min(best_dt, dt)
    assert np.isfinite(final)
    assert np.isfinite(np.asarray(ac)).all() and np.isfinite(np.asarray(tcv)).all()

    clips_per_sec = n_windows * iters / best_dt

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("windows_per_sec"):
            vs_baseline = clips_per_sec / float(base["windows_per_sec"])

    print(
        json.dumps(
            {
                "metric": "tag_scoring_clips_per_sec",
                "value": round(clips_per_sec, 2),
                "unit": "clips/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                "host_load1": host_load["load1"],
                "host_contended": host_load["contended"],
            }
        )
    )


if __name__ == "__main__":
    main()
