"""TAG scoring pipeline (the serve path) — ref ``eval.py`` equivalent.

Everything between "feature bank" and "{ac, tc} per video" runs as jitted
device programs with static shapes:

  gather windows -> fusion encoder -> (CLS embeds, per-window TC)
  -> segment-mean by video -> AC (centroid distance) + TC

Batches use a fixed static size (tail padded with repeats, masked out of the
reductions) so the whole sweep compiles exactly once. Host work is limited to
manifest scanning, feature-bank construction, and the final JSON.

Outputs ``video_scores.json`` with the reference schema ``{vid: {ac, tc}}``
(ref ``eval.py:439-453``) and sign-inverted Spearman vs human MOS
(ref ``eval.py:456-464``).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import typing as T

import jax
import jax.numpy as jnp
import numpy as np

from ..data import (
    FeatureBank,
    ModalityPaths,
    ModalityStats,
    VideoManifest,
    build_feature_bank,
    build_feature_bank_cached,
    compute_stats,
    compute_stats_cached,
    enumerate_windows,
    gather_windows,
    gather_windows_sliced,
    scan_class_tree,
    scan_generated_flat,
    train_test_split,
)
from ..metrics.correlation import match_and_correlate
from ..metrics.scores import (
    finalize_centroids,
    finalize_video_scores,
    tc_per_window,
)
from ..models import EncoderConfig, HumanActionScorer
from ..utils.names import ACTION_CLASSES, canonicalize_class


@dataclasses.dataclass
class ScoreConfig:
    clip_len: int = 32
    stride: int = 8
    batch_size: int = 512
    seed: int = 1337
    # "high" (bf16_3x) holds ~3.5e-5 AC/TC agreement with full f32 at ~1.6x
    # the throughput; "highest" is bit-closest to the fp32 reference;
    # "default" (~2.8x) exceeds the 1e-3 parity budget (see PARITY.md)
    matmul_precision: str = "high"
    # forward/gather implementation selectors (see WindowEncoder): "auto"
    # picks the fused Pallas stage kernel + burst gather on single-chip TPU
    encoder_impl: str = "auto"
    gather_impl: str = "auto"
    # in-memory bank assembly for the end-to-end pipeline
    # (pipelines/full.py): "host" (numpy, reference-exact f64 stats when
    # self-normalizing), "device" (device-resident assembly,
    # data/device_bank.py — extraction features never round-trip through
    # the tunnel), "auto" = device on TPU backends
    bank_impl: str = "auto"


class WindowEncoder:
    """Jitted (bank -> window batch -> embeddings + TC) program."""

    def __init__(
        self,
        model: HumanActionScorer,
        params,
        batch_size: int,
        clip_len: int,
        matmul_precision: str = "high",
        gather_impl: str = "auto",
        mesh=None,
        encoder_impl: str = "auto",
    ):
        self.model = model
        self.params = params
        self.batch_size = batch_size
        self.clip_len = clip_len
        self.mesh = mesh
        # "auto": on single-chip TPU at "high" precision, run the residual
        # conv stages (85% of encoder time) in the fused Pallas kernel —
        # measured 1.2x the module forward at bf16_3x-level agreement
        # (BENCH_NOTES round-2). "chain_kernel" additionally fuses all 4
        # stages per chain into one launch (ops/chain_kernel.py).
        # "module" forces the flax forward.
        if encoder_impl in ("block_kernel", "chain_kernel") and mesh is not None:
            raise ValueError(
                f"encoder_impl='{encoder_impl}' cannot be combined with a mesh: "
                "the Pallas kernels are single-chip; use encoder_impl='auto' "
                "(sharded sweeps take the module forward) or drop the mesh"
            )
        explicit_kernel = encoder_impl in ("block_kernel", "chain_kernel")
        if explicit_kernel and matmul_precision != "high":
            raise ValueError(
                f"encoder_impl='{encoder_impl}' runs the fused kernels at "
                f"precision 'high' (bf16_3x); matmul_precision="
                f"{matmul_precision!r} would silently change numerics — use "
                "encoder_impl='auto' (module forward honors the precision) "
                "or precision 'high'"
            )
        # auto: kernel only where it measured faster (single-chip TPU, high
        # precision, full 32-window blocks). An EXPLICIT kernel request is
        # always honored (32/8/4-window blocks; interpret mode off-TPU) —
        # silently falling back to the module forward would misattribute
        # benchmarks and serve-path numerics.
        self._use_block_kernel = (
            encoder_impl == "auto"
            and mesh is None
            and jax.default_backend() == "tpu"
            and matmul_precision == "high"
            and batch_size % 32 == 0
        ) or explicit_kernel
        if explicit_kernel and batch_size % 4 != 0:
            raise ValueError(
                f"encoder_impl='{encoder_impl}' needs batch_size divisible by "
                f"4 (got {batch_size}) — the fused kernel blocks windows in "
                "groups of 32/8/4"
            )
        self._stage_fusion = "chain" if encoder_impl == "chain_kernel" else "stage"
        # "auto": burst Pallas DMA gather on single-chip TPU when the batch
        # and starts satisfy its alignment contract (checked per sweep in
        # encode_bank), falling back to the pure-XLA sliced gather. Sharded
        # (mesh) sweeps stay on the XLA path: GSPMD partitions it directly.
        self._try_burst = (
            gather_impl in ("auto", "burst")
            and mesh is None
            and jax.default_backend() == "tpu"
            and clip_len % 8 == 0
            and batch_size % 8 == 0
        )
        self._encode_burst = None
        if gather_impl == "auto":
            gather_impl = "sliced"
        elif gather_impl == "burst":
            gather_impl = "sliced"  # fallback fn when alignment fails
        self._batch_shard = self._rep_shard = None
        if mesh is not None:
            # window-axis sharding over `data` (SURVEY §5.8): each chip
            # encodes batch/n_data windows from a replicated bank
            from ..parallel import batch_sharding, replicated_sharding

            if batch_size % mesh.shape["data"] != 0:
                raise ValueError(
                    f"batch_size {batch_size} must divide evenly over the "
                    f"mesh data axis ({mesh.shape['data']})"
                )
            self._batch_shard = batch_sharding(mesh)
            self._rep_shard = replicated_sharding(mesh)
            from ..parallel import put_global

            self.params = put_global(params, self._rep_shard)
        gather = {
            "sliced": gather_windows_sliced,  # fastest pure-XLA path
            "take": gather_windows,           # exact for arbitrary starts
        }[gather_impl]

        if self._use_block_kernel:
            from ..models.fused_apply import block_kernel_forward

            bw = 32 if batch_size % 32 == 0 else (
                8 if batch_size % 8 == 0 else 4
            )
            interp = jax.default_backend() != "tpu"

            def _forward(params, w):
                # per-stage kernels use the matmul-first tap formulation
                # (round-3 take 3: +4-6% end-to-end over the slice-first
                # padded-scratch variant — BENCH_NOTES)
                seq, frames, _ = block_kernel_forward(
                    self.model.config, params, w,
                    block_windows=bw, precision="high", interpret=interp,
                    stage_fusion=self._stage_fusion,
                    conv_variant=(
                        "mm_first" if self._stage_fusion == "stage" else "slice"
                    ),
                )
                return seq, frames
        else:

            def _forward(params, w):
                seq, frames, _ = model.apply(
                    {"params": params}, w, deterministic=True
                )
                return seq, frames

        def _encode(params, bank, offsets, row_limit, z0, video_idx, starts, one_pass_raw):
            with jax.default_matmul_precision(matmul_precision):
                w = gather(
                    bank, offsets, row_limit, z0, one_pass_raw, video_idx, starts, clip_len
                )
                seq, frames = _forward(params, w)
                return seq, tc_per_window(frames)

        # multi-process mesh: all-gather the (small) outputs on device so
        # every host can read them (dp-sharded outputs are not addressable
        # across processes); single-process meshes keep the inferred sharding
        out_s = None
        if mesh is not None and not self._rep_shard.is_fully_addressable:
            out_s = (self._rep_shard, self._rep_shard)
        self._encode = jax.jit(
            _encode, static_argnames=("one_pass_raw",), out_shardings=out_s
        )

        if self._try_burst:
            from ..ops.window_kernel import pallas_gather_windows_burst

            def _encode_burst(
                params, bank_pad, offsets, row_limit, z0, video_idx, starts,
                one_pass_raw, out_dim,
            ):
                with jax.default_matmul_precision(matmul_precision):
                    w = pallas_gather_windows_burst(
                        bank_pad, offsets, row_limit, z0, one_pass_raw,
                        video_idx, starts, clip_len, out_dim=out_dim,
                    )
                    seq, frames = _forward(params, w)
                    return seq, tc_per_window(frames)

            self._encode_burst = jax.jit(
                _encode_burst, static_argnames=("one_pass_raw", "out_dim"),
                out_shardings=out_s,
            )

        # per-batch segment accumulator for encode_bank_segsum: rides along
        # each encode dispatch so the [B, D] window outputs never cross the
        # host boundary. nv (valid count) is traced, so one compile serves
        # full and tail batches alike.
        def _accum_fn(state, seq, tc, seg, nv):
            seq_sum, tc_sum, cnt = state
            w = (jnp.arange(seq.shape[0]) < nv).astype(seq_sum.dtype)
            n_seg = seq_sum.shape[0]
            seq_sum = seq_sum + jax.ops.segment_sum(
                seq.astype(seq_sum.dtype) * w[:, None], seg, n_seg
            )
            tc_sum = tc_sum + jax.ops.segment_sum(
                tc.astype(tc_sum.dtype) * w, seg, n_seg
            )
            cnt = cnt + jax.ops.segment_sum(w, seg, n_seg)
            return seq_sum, tc_sum, cnt

        accum_out_s = None
        if mesh is not None:
            # the accumulated state is tiny and read by every host at the
            # end: keep it replicated (GSPMD inserts the psum)
            accum_out_s = (self._rep_shard, self._rep_shard, self._rep_shard)
        self._accum = jax.jit(_accum_fn, out_shardings=accum_out_s)

    def _iter_encoded(
        self,
        bank: FeatureBank,
        windows: T.Sequence[T.Tuple[int, int]],
        bank_dev: T.Optional[T.Tuple] = None,
    ):
        """Dispatch the window sweep batch by batch WITHOUT host syncs.

        Yields ``(seq, tc, n_valid)`` per batch: padded-to-batch_size DEVICE
        arrays plus the count of real (non-pad) leading rows. Callers decide
        how results come home — one deferred bulk fetch (:meth:`encode_bank`)
        or on-device accumulation (:meth:`encode_bank_segsum`)."""
        n = len(windows)
        # a bank built with min_rows < clip_len would let the sliced gather
        # read the NEXT video's rows — enforce the build-time convention here
        bank.validate_clip_len(self.clip_len)
        video_idx = np.array([w[0] for w in windows], np.int32)
        starts = np.array([w[1] for w in windows], np.int32)

        if bank_dev is not None:
            bank_d, offsets_d, row_limit_d, z0_d = bank_dev
        else:
            bank_d = jnp.asarray(bank.bank)
            offsets_d = jnp.asarray(bank.offsets)
            row_limit_d = jnp.asarray(bank.row_limit)
            z0_d = jnp.asarray(bank.z0_diff)
            if self.mesh is not None:
                from ..parallel import put_global

                bank_d, offsets_d, row_limit_d, z0_d = (
                    put_global(a, self._rep_shard)
                    for a in (bank_d, offsets_d, row_limit_d, z0_d)
                )

        use_burst = (
            self._try_burst
            and np.all(np.asarray(bank.offsets) % 8 == 0)
            and np.all((np.asarray(bank.row_limit) + 1) % 8 == 0)
            and np.all(starts % 8 == 0)
        )
        if use_burst:
            from ..ops.window_kernel import pad_bank_lanes

            bank_burst = pad_bank_lanes(bank_d)
            out_dim = int(bank_d.shape[1])

        B = self.batch_size
        for lo in range(0, n, B):
            vi = video_idx[lo : lo + B]
            st = starts[lo : lo + B]
            n_valid = len(vi)
            pad = B - n_valid
            if pad:
                vi = np.concatenate([vi, np.repeat(vi[-1:], pad)])
                st = np.concatenate([st, np.repeat(st[-1:], pad)])
            vi_d, st_d = jnp.asarray(vi), jnp.asarray(st)
            if self.mesh is not None:
                from ..parallel import put_global

                vi_d = put_global(vi_d, self._batch_shard)
                st_d = put_global(st_d, self._batch_shard)
            if use_burst:
                seq, tc = self._encode_burst(
                    self.params,
                    bank_burst,
                    offsets_d,
                    row_limit_d,
                    z0_d,
                    vi_d,
                    st_d,
                    bank.one_pass_raw,
                    out_dim,
                )
            else:
                seq, tc = self._encode(
                    self.params,
                    bank_d,
                    offsets_d,
                    row_limit_d,
                    z0_d,
                    vi_d,
                    st_d,
                    bank.one_pass_raw,
                )
            yield seq, tc, n_valid

    def encode_bank(
        self,
        bank: FeatureBank,
        windows: T.Sequence[T.Tuple[int, int]],
        bank_dev: T.Optional[T.Tuple] = None,
    ) -> T.Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (seq_embeds [N, D], window_tc [N], window_video [N]).

        ``bank_dev``: optional pre-uploaded ``(bank, offsets, row_limit,
        z0_diff)`` device arrays (already mesh-placed when sharded) — a
        caller that keeps the bank resident (the training harness's eval
        passes) skips re-transferring it per call.

        All batches are dispatched back to back and fetched in ONE
        ``jax.device_get`` at the end: through the axon tunnel a per-batch
        blocking fetch costs a ~28 ms round-trip, so the sweep used to pay
        2 round-trips per batch of pure idle time. Pad rows are sliced off
        on the host (a device-side slice would compile a new tiny program
        per tail shape)."""
        outs, valids = [], []
        video_idx = np.array([w[0] for w in windows], np.int32)
        for seq, tc, n_valid in self._iter_encoded(bank, windows, bank_dev):
            outs.append((seq, tc))
            valids.append(n_valid)
        got = jax.device_get(outs)
        seqs = np.concatenate([np.asarray(s)[:nv] for (s, _), nv in zip(got, valids)])
        tcs = np.concatenate([np.asarray(t)[:nv] for (_, t), nv in zip(got, valids)])
        return seqs, tcs, video_idx

    def encode_bank_segsum(
        self,
        bank: FeatureBank,
        windows: T.Sequence[T.Tuple[int, int]],
        seg_ids: np.ndarray,
        num_segments: int,
        bank_dev: T.Optional[T.Tuple] = None,
    ) -> T.Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Encode + reduce: returns host ``(seq_sum [S, D], tc_sum [S],
        count [S])`` where segment ``s`` sums the window CLS embeddings and
        per-window TC of windows with ``seg_ids == s`` (video index for
        scoring, class id for centroids).

        The reduction rides along each encode dispatch on device, so the
        per-batch ``[B, D]`` outputs never cross the host boundary — only
        the ``[S]``-sized sums are fetched, once (SURVEY §7.1 north star:
        no host round-trips until the final JSON). Summation order differs
        from the one-shot reducers by batch grouping (f32, ~1e-7)."""
        seg_ids = np.asarray(seg_ids, np.int32)
        if len(seg_ids) != len(windows):
            raise ValueError(
                f"seg_ids has {len(seg_ids)} entries for {len(windows)} windows"
            )
        B = self.batch_size
        d_model = self.model.config.d_model
        state = (
            jnp.zeros((num_segments, d_model), jnp.float32),
            jnp.zeros((num_segments,), jnp.float32),
            jnp.zeros((num_segments,), jnp.float32),
        )
        if self.mesh is not None:
            from ..parallel import put_global

            state = tuple(put_global(a, self._rep_shard) for a in state)
        for i, (seq, tc, n_valid) in enumerate(
            self._iter_encoded(bank, windows, bank_dev)
        ):
            seg = seg_ids[i * B : i * B + B]
            pad = B - len(seg)
            if pad:  # pad rows are masked out by the n_valid weight
                seg = np.concatenate([seg, np.repeat(seg[-1:], pad)])
            seg_d = jnp.asarray(seg)
            if self.mesh is not None:
                seg_d = put_global(seg_d, self._batch_shard)
            state = self._accum(state, seq, tc, seg_d, n_valid)
        seq_sum, tc_sum, count = jax.device_get(state)
        return np.asarray(seq_sum), np.asarray(tc_sum), np.asarray(count)


def _resolve_bank_impl(cfg: ScoreConfig) -> str:
    # Measured on the tunneled v5e-1 (benchmarks/probe_bank_impl.py, 16
    # videos x 64 frames, flagship dims): host 0.28 s vs device 0.43 s per
    # warm build — the host assembler + one bulk bank upload beats the
    # device path's per-video stream dispatch even though the device path
    # moves ~half the bytes. "auto" = host; "device" stays selectable
    # (bitwise-equivalence-tested) for directly-attached TPU hosts.
    if cfg.bank_impl == "auto":
        return "host"
    if cfg.bank_impl not in ("host", "device"):
        raise ValueError(f"unknown bank_impl {cfg.bank_impl!r}")
    return cfg.bank_impl


def build_real_centroids(
    encoder: WindowEncoder,
    real_manifest: VideoManifest,
    paths: ModalityPaths,
    stats: ModalityStats,
    cfg: ScoreConfig,
    bank_cache: T.Optional[str] = None,
) -> T.Tuple[np.ndarray, T.Dict[str, int]]:
    """Class centroids from the real-video train split (ref ``eval.py:260-286``)."""
    train_ds, _ = train_test_split(real_manifest, 0.8, seed=cfg.seed)
    label_dict = real_manifest.label_dict()
    bank = build_feature_bank_cached(
        train_ds.items, paths, stats, min_rows=cfg.clip_len + 8,
        cache_path=bank_cache, impl=_resolve_bank_impl(cfg),
    )
    windows = enumerate_windows(train_ds, cfg.clip_len, cfg.stride)
    # per-class sums accumulate on device along the sweep; only the [C, D]
    # sums come home (one fetch), then the tiny finalize runs locally
    win_label = np.array(
        [label_dict[bank.classes[v]] for v, _s in windows], np.int32
    )
    seq_sum, _tc_sum, count = encoder.encode_bank_segsum(
        bank, windows, win_label, len(label_dict)
    )
    from ..utils.hostmath import host_math

    with host_math():
        centroids = np.asarray(
            finalize_centroids(jnp.asarray(seq_sum), jnp.asarray(count))
        )
    return centroids, label_dict


def score_bank(
    encoder: WindowEncoder,
    bank: FeatureBank,
    manifest: VideoManifest,
    centroids: np.ndarray,
    label_dict: T.Dict[str, int],
    cfg: ScoreConfig,
) -> T.Dict[str, T.Dict[str, float]]:
    """Score every video in ``manifest``: returns ``{video_id: {ac, tc}}``."""
    windows = enumerate_windows(manifest, cfg.clip_len, cfg.stride)
    if not windows:
        return {}
    num_videos = len(manifest.items)
    # per-video sums accumulate on device along the sweep (no per-batch
    # fetches — SURVEY §7.1); the [V]-sized finalize runs locally
    win_video = np.array([v for v, _s in windows], np.int32)
    seq_sum, tc_sum, count = encoder.encode_bank_segsum(
        bank, windows, win_video, num_videos
    )
    from ..utils.hostmath import host_math

    # AC only for videos whose canonical class has a centroid
    video_cls = [canonicalize_class(c) for c in bank.classes]
    video_label = np.array(
        [label_dict.get(c, 0) for c in video_cls], np.int32
    )
    has_label = np.array(
        [c in label_dict and label_dict[c] < len(centroids) for c in video_cls]
    )
    with host_math():
        ac_j, tc_j = finalize_video_scores(
            jnp.asarray(seq_sum),
            jnp.asarray(tc_sum),
            jnp.asarray(count),
            jnp.asarray(video_label),
            jnp.asarray(centroids),
        )
        ac_v, tc_v = np.asarray(ac_j), np.asarray(tc_j)

    # videos can appear with zero windows only if length <= 0 (skipped)
    has_window = count > 0

    scores: T.Dict[str, T.Dict[str, float]] = {}
    import os

    for v, it in enumerate(manifest.items):
        if not has_window[v]:
            continue
        vid = os.path.splitext(it.name)[0]
        entry = scores.setdefault(vid, {})
        entry["tc"] = float(tc_v[v])
        if has_label[v]:
            entry["ac"] = float(ac_v[v])
    return scores


def score_generated(
    model: HumanActionScorer,
    params,
    generated_dir: str,
    real_meshes_dir: str,
    real_paths: ModalityPaths,
    gen_paths: ModalityPaths,
    cfg: T.Optional[ScoreConfig] = None,
    human_scores_path: T.Optional[str] = None,
    output_json: T.Optional[str] = "video_scores.json",
    stats: T.Optional[ModalityStats] = None,
    dump_features: T.Optional[str] = None,
    bank_cache_dir: T.Optional[str] = None,
    mesh=None,
    num_hosts: int = 1,
    host_id: int = 0,
) -> T.Dict[str, T.Any]:
    """Full ref ``eval.py`` flow: stats from real train split, centroids, score
    every generated video, optional Spearman vs human MOS.

    ``dump_features``: optional ``.npz`` path for the window feature cache
    (seq embeddings + per-window TC + window->video metadata), the equivalent
    of the reference's ``window_features.pt`` dump (ref ``eval.py:202-205``).
    ``mesh``: optional ``jax.sharding.Mesh`` — window batches then shard over
    its ``data`` axis (the WindowEncoder sharded sweep).
    ``num_hosts``/``host_id``: multi-pod sweep (SURVEY §5.8) — this process
    scores only its strided shard of the generated manifest (stats/centroids
    come from the full real train split on every host, so shards agree);
    merge the per-host JSONs with ``pipelines.merge_scores``. Human-corr is
    computed at merge time (it needs every video), so ``human_scores_path``
    is ignored when ``num_hosts > 1``. ``output_json`` is suffixed
    ``.host<I>of<N>`` (unless already so suffixed) so hosts sharing an
    output directory never clobber each other; the path actually written is
    returned as ``result["output_json"]``.
    """
    cfg = cfg or ScoreConfig()
    gen_manifest = scan_generated_flat(generated_dir)
    if num_hosts > 1:
        from ..parallel import shard_items

        gen_manifest = VideoManifest(
            shard_items(gen_manifest.items, host_id, num_hosts)
        )
        human_scores_path = None  # correlations run at merge time
        if output_json:
            stem, ext = os.path.splitext(output_json)
            tag = f".host{host_id}of{num_hosts}"
            if not stem.endswith(tag):
                output_json = f"{stem}{tag}{ext or '.json'}"
        if not gen_manifest.items:
            # more hosts than videos: this host's shard is empty — emit an
            # empty (still mergeable) shard instead of crashing bank build
            if output_json:
                with open(output_json, "w") as f:
                    json.dump({}, f, indent=2)
            return {"scores": {}, "output_json": output_json}
    real_manifest = scan_class_tree(real_meshes_dir, filter_classes=list(ACTION_CLASSES))
    if stats is None:
        train_ds, _ = train_test_split(real_manifest, 0.8, seed=cfg.seed)
        stats = compute_stats_cached(
            train_ds.items, real_paths,
            cache_path=(
                os.path.join(bank_cache_dir, "stats.npz")
                if bank_cache_dir else None
            ),
        )

    encoder = WindowEncoder(
        model, params, cfg.batch_size, cfg.clip_len, cfg.matmul_precision,
        gather_impl=cfg.gather_impl, encoder_impl=cfg.encoder_impl,
        mesh=mesh,
    )
    cache = lambda name: (
        os.path.join(bank_cache_dir, name) if bank_cache_dir else None
    )
    centroids, label_dict = build_real_centroids(
        encoder, real_manifest, real_paths, stats, cfg,
        bank_cache=cache("real_train_bank.npz"),
    )

    gen_cache_name = (
        f"generated_bank.host{host_id}of{num_hosts}.npz"
        if num_hosts > 1
        else "generated_bank.npz"
    )
    gen_bank = build_feature_bank_cached(
        gen_manifest.items, gen_paths, stats, min_rows=cfg.clip_len + 8,
        cache_path=cache(gen_cache_name), impl=_resolve_bank_impl(cfg),
    )
    combined = score_bank(encoder, gen_bank, gen_manifest, centroids, label_dict, cfg)

    if dump_features:
        windows = enumerate_windows(gen_manifest, cfg.clip_len, cfg.stride)
        seqs, window_tc, win_video = encoder.encode_bank(gen_bank, windows)
        np.savez_compressed(
            dump_features,
            seq_embeds=seqs,
            window_tc=window_tc,
            window_video=win_video,
            window_start=np.array([s for _v, s in windows], np.int32),
            video_names=np.array(gen_bank.names),
            video_classes=np.array(gen_bank.classes),
        )

    result: T.Dict[str, T.Any] = {"scores": combined, "output_json": output_json}
    if output_json:
        with open(output_json, "w") as f:
            json.dump(combined, f, indent=2)

    if human_scores_path:
        with open(human_scores_path) as f:
            human = json.load(f)
        ac_only = {k: v["ac"] for k, v in combined.items() if "ac" in v}
        tc_only = {k: v["tc"] for k, v in combined.items() if "tc" in v}
        result["ac_corr"] = match_and_correlate(ac_only, human, "ac")
        result["tc_corr"] = match_and_correlate(tc_only, human, "tc")
    return result


def main(argv: T.Optional[T.List[str]] = None) -> None:
    import argparse

    p = argparse.ArgumentParser(description="TAG scoring (AC + TC) pipeline")
    p.add_argument("--generated-meshes", required=True)
    p.add_argument("--real-meshes", required=True)
    p.add_argument("--checkpoint", required=True, help=".pt (torch) or orbax dir")
    p.add_argument("--real-kp-dir", default=None)
    p.add_argument("--gen-kp-dir", default=None)
    p.add_argument("--real-clip-dir", default=None,
                   help="CLIP embeddings for real videos "
                        "(<dir>/<class>/<stem>/clip_embeddings.npz); enables "
                        "the clip modality end to end (ref utils.py:426-438)")
    p.add_argument("--gen-clip-dir", default=None,
                   help="CLIP embeddings for generated videos "
                        "(<dir>/<stem>/clip_embeddings.npz)")
    p.add_argument("--real-dino-dir", default=None,
                   help="DINO embeddings for real videos (ref utils.py:440-452)")
    p.add_argument("--gen-dino-dir", default=None,
                   help="DINO embeddings for generated videos")
    p.add_argument("--human-scores", default=None)
    p.add_argument("--clip-len", type=int, default=32)
    p.add_argument("--stride", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--output", default="video_scores.json")
    p.add_argument("--dump-features", default=None,
                   help="optional .npz window-feature cache (ref window_features.pt)")
    p.add_argument("--bank-cache", default=None,
                   help="directory for cached feature banks (skips the "
                        "normalize/delta pass when the video set is unchanged)")
    p.add_argument("--bug-compat", dest="bug_compat", action="store_true", default=True,
                   help="reproduce the reference's accidental behaviors "
                        "(layout auto-detection, permissive ckpt loading) — "
                        "see core.config.BugCompat / PARITY.md")
    p.add_argument("--no-bug-compat", dest="bug_compat", action="store_false")
    p.add_argument("--precision", default="high",
                   choices=["default", "high", "highest"],
                   help="matmul precision (PARITY.md: 'high' holds the "
                        "1e-3 parity budget at ~1.6x 'highest' throughput)")
    p.add_argument("--encoder-impl", default="auto",
                   choices=["auto", "module", "block_kernel", "chain_kernel"])
    p.add_argument("--mesh-data", type=int, default=0,
                   help="shard window batches data-parallel over an N-device "
                        "mesh (module encoder forward; 0 = single device)")
    p.add_argument("--gather-impl", default="auto",
                   choices=["auto", "sliced", "burst", "take"])
    p.add_argument("--num-hosts", type=int, default=1,
                   help="multi-pod sweep (SURVEY §5.8): total hosts sharding "
                        "the generated manifest; each writes "
                        "<output>.hostIofN.json — merge with "
                        "python -m video_gen_evals_tpu.pipelines.merge_scores")
    p.add_argument("--host-id", type=int, default=-1,
                   help="this host's shard index; -1 = jax.process_index()")
    from ..utils.cli import add_distributed_args, maybe_initialize_distributed

    add_distributed_args(p)
    args = p.parse_args(argv)
    maybe_initialize_distributed(args)

    from ..core.config import BugCompat

    bc = BugCompat.enabled() if args.bug_compat else BugCompat.disabled()
    cfg = ScoreConfig(
        args.clip_len, args.stride, args.batch_size,
        matmul_precision=args.precision,
        encoder_impl=args.encoder_impl,
        gather_impl=args.gather_impl,
    )
    # bug-compat: side-modality layout keyed off the keypoint dir NAME
    # (ref utils.py:411-446); otherwise the explicit layouts
    real_paths = ModalityPaths(
        keypoint_dir=args.real_kp_dir,
        clip_dir=args.real_clip_dir,
        dino_dir=args.real_dino_dir,
        layout="auto" if bc.layout_auto else "real",
    )
    gen_paths = ModalityPaths(
        keypoint_dir=args.gen_kp_dir,
        clip_dir=args.gen_clip_dir,
        dino_dir=args.gen_dino_dir,
        layout="auto" if bc.layout_auto else "generated",
    )

    real_manifest = scan_class_tree(args.real_meshes, filter_classes=list(ACTION_CLASSES))
    train_ds, _ = train_test_split(real_manifest, 0.8, seed=cfg.seed)
    stats = compute_stats_cached(
        train_ds.items, real_paths,
        cache_path=(
            os.path.join(args.bank_cache, "stats.npz")
            if args.bank_cache else None
        ),
    )

    enc_cfg = EncoderConfig.create(stats.dims_map_raw(), stats.dims_map_diff())
    model = HumanActionScorer(enc_cfg)
    if args.checkpoint.endswith(".pt"):
        from ..models.torch_compat import load_torch_checkpoint

        params = load_torch_checkpoint(
            args.checkpoint, enc_cfg, strict=not bc.permissive_ckpt
        )
    else:
        from ..train.checkpoint import restore_params

        params = restore_params(args.checkpoint)

    mesh = None
    if args.mesh_data > 0:
        if args.num_hosts > 1 and jax.process_count() > 1:
            # a cross-process mesh assumes every process feeds it the SAME
            # batches; per-host manifest shards feed it different ones —
            # garbage assignments or a collective-count deadlock
            p.error(
                "--num-hosts manifest sharding cannot combine with a "
                "cross-process --mesh-data mesh: run one single-process "
                "CLI per host (the DCN tier), or drop --num-hosts and "
                "let the global mesh shard one manifest"
            )
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh_data, 1)

    host_id = args.host_id
    if args.num_hosts > 1:
        if host_id < 0:
            # only trust process_index() when a distributed runtime with the
            # matching process count is actually up — otherwise every host
            # would silently resolve to 0 and all score the same shard
            if jax.process_count() != args.num_hosts:
                p.error(
                    f"--host-id -1 needs jax.process_count() == --num-hosts "
                    f"(have {jax.process_count()} vs {args.num_hosts}); pass "
                    "--host-id explicitly or initialize jax.distributed"
                )
            host_id = jax.process_index()
        if args.human_scores:
            print(
                "note: --human-scores is deferred with --num-hosts > 1 — "
                "correlations need every video; run "
                "pipelines.merge_scores with --human-scores on the shards",
                file=sys.stderr,
            )
    else:
        host_id = max(host_id, 0)

    result = score_generated(
        model,
        params,
        args.generated_meshes,
        args.real_meshes,
        real_paths,
        gen_paths,
        cfg,
        human_scores_path=args.human_scores,
        output_json=args.output,
        stats=stats,
        dump_features=args.dump_features,
        bank_cache_dir=args.bank_cache,
        mesh=mesh,
        num_hosts=args.num_hosts,
        host_id=host_id,
    )
    n = len(result["scores"])
    print(f"Saved AC/TC scores for {n} videos to {result['output_json']}")
    for key in ("ac_corr", "tc_corr"):
        if key in result and result[key]["spearman"] is not None:
            print(f"{key}: spearman={result[key]['spearman']:.4f} (n={result[key]['n']})")


if __name__ == "__main__":
    main()
