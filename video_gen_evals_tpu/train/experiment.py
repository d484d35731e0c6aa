"""Experiment harness: the ref ``BaseExperiment``/``Exp_TCL_Hard_V2Plus``
training loop (C22-C23 in SURVEY.md), rebuilt around device-resident data.

Per epoch (ref ``train.py:433-467``):
  1. train over PK-balanced batches (fused 4-forward jitted step);
  2. build class centroids from train windows;
  3. test-set loss with per-component breakdown -> best-checkpoint criterion;
  4. test-set centroid distances (monitoring);
  5. human-correlation monitor on generated videos (monitoring).

TPU-first data flow: the entire train/test feature banks live in HBM; each
step gathers its PK batch on device (no per-window host IO), optionally
sharded over the mesh ``data`` axis (gradients psum over ICI via GSPMD).
Observability: structured JSONL metrics (SURVEY §5.5) instead of prints.
"""

from __future__ import annotations

import json
import os
import sys
import time
import typing as T

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TrainConfig
from ..data import (
    ModalityPaths,
    PKBatchSampler,
    build_feature_bank_cached,
    compute_stats_cached,
    enumerate_windows,
    gather_windows,
    scan_class_tree,
    train_test_split,
)
from ..metrics.correlation import correlate_with_class_fallback
from ..metrics.scores import finalize_centroids, finalize_video_scores
from ..models import EncoderConfig, HumanActionScorer
from ..models.fusion_encoder import init_encoder
from ..pipelines.score import WindowEncoder
from ..utils.names import infer_class_from_name
from .checkpoint import save_params
from .step import TrainState, make_eval_loss_fn, make_optimizer, make_train_step


class Experiment:
    def __init__(self, cfg: TrainConfig, mesh=None, eval_batch: int = 512):
        self.cfg = cfg
        self.mesh = mesh
        self.eval_batch = eval_batch
        self.rng = jax.random.key(cfg.seed)
        if mesh is not None:
            from ..parallel import batch_sharding, replicated_sharding

            n_data = mesh.shape["data"]
            if (cfg.P * cfg.K) % n_data != 0:
                raise ValueError(
                    f"PK batch size {cfg.P * cfg.K} must divide evenly over the "
                    f"mesh data axis ({n_data})"
                )
            self._batch_shard = batch_sharding(mesh)
            self._rep_shard = replicated_sharding(mesh)
        else:
            self._batch_shard = None
            self._rep_shard = None
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self._ckpt_saver = None   # lazy AsyncSaver (see save_resume_checkpoint)
        self._snapshot_fn = None  # lazy jitted on-device state copier

        ts = time.strftime("%Y%m%d_%H%M%S")
        self.save_dir = os.path.join(cfg.save_dir, f"{cfg.name}_{ts}")
        os.makedirs(self.save_dir, exist_ok=True)
        self.metrics_path = os.path.join(self.save_dir, "metrics.jsonl")

        # ---------------- data ----------------
        self.full_ds = scan_class_tree(
            cfg.paths.real_meshes_dir, filter_classes=cfg.filter_classes
        )
        self.train_ds, self.test_ds = train_test_split(self.full_ds, 0.8, cfg.seed)
        self.real_paths = ModalityPaths(
            keypoint_dir=cfg.paths.real_kp_dir,
            clip_dir=cfg.paths.real_clip_dir,
            dino_dir=cfg.paths.real_dino_dir,
            layout="real",
        )
        self.stats = compute_stats_cached(
            self.train_ds.items, self.real_paths,
            cache_path=(
                os.path.join(cfg.bank_cache_dir, "stats.npz")
                if cfg.bank_cache_dir else None
            ),
        )
        self.label_dict = self.full_ds.label_dict()
        with open(os.path.join(self.save_dir, "label_mapping.json"), "w") as f:
            json.dump(self.label_dict, f, indent=2)
        cfg.to_json(os.path.join(self.save_dir, "config.json"))

        mods = [m for m in cfg.detect_modalities() if m in self.stats.modalities]
        min_rows = cfg.clip_len + 8
        cache = lambda name: (
            os.path.join(cfg.bank_cache_dir, name) if cfg.bank_cache_dir else None
        )
        self.train_bank = build_feature_bank_cached(
            self.train_ds.items, self.real_paths, self.stats, mods,
            min_rows=min_rows, cache_path=cache("train_bank.npz"),
        )
        self.test_bank = build_feature_bank_cached(
            self.test_ds.items, self.real_paths, self.stats, mods,
            min_rows=min_rows, cache_path=cache("test_bank.npz"),
        )
        self.train_windows = enumerate_windows(self.train_ds, cfg.clip_len, cfg.stride)
        self.test_windows = enumerate_windows(self.test_ds, cfg.clip_len, cfg.stride)
        self.window_labels = np.array(
            [self.label_dict[self.train_bank.classes[vi]] for vi, _ in self.train_windows],
            np.int32,
        )
        # per-epoch deterministic sampler seeding: makes the batch stream a
        # pure function of (seed, epoch) so checkpoint resume reproduces the
        # uninterrupted run exactly (SURVEY §5.3 fault-tolerance plan)
        self._sampler_for_epoch = lambda epoch: PKBatchSampler(
            self.window_labels,
            P=cfg.P,
            K=cfg.K,
            drop_last=True,
            rng=np.random.default_rng(cfg.seed * 100003 + epoch),
        )
        self.sampler = self._sampler_for_epoch(0)

        # ---------------- model / optimizer ----------------
        dims_raw = {m: self.stats.dims_map_raw()[m] for m in mods}
        dims_diff = {m: self.stats.dims_map_diff()[m] for m in mods}
        conv_impl = cfg.conv_impl
        if conv_impl == "auto":
            # fused Pallas conv stages with custom VJP (+12.5% steps/s,
            # BENCH_NOTES round 2); module convs off-TPU and under meshes
            # (GSPMD partitions the XLA conv lowering directly)
            conv_impl = (
                "kernel"
                if jax.default_backend() == "tpu" and mesh is None
                else "module"
            )
        self.enc_cfg = EncoderConfig.create(
            dims_raw,
            dims_diff,
            d_model=cfg.d_model,
            latent_dim=cfg.latent_dim,
            time_layers=cfg.time_layers,
            time_heads=cfg.time_heads,
            dropout=cfg.dropout,
            conv_impl=conv_impl,
        )
        self.model, params = init_encoder(
            self.enc_cfg, jax.random.key(cfg.seed), cfg.clip_len
        )
        steps_per_epoch = max(1, len(self.sampler))
        self.tx = make_optimizer(
            cfg.lr, steps_per_epoch * cfg.epochs, eta_min=cfg.eta_min
        )
        step_counter = jnp.zeros((), jnp.int32)
        if mesh is not None:
            # params TP-sharded over `model` (replicated when n_model=1);
            # optimizer moments inherit the placement via zeros_like
            from ..parallel import put_global, tp_param_sharding

            params = jax.tree.map(
                put_global, params, tp_param_sharding(mesh, params)
            )
            step_counter = put_global(step_counter, self._rep_shard)
            self.rng = put_global(self.rng, self._rep_shard)
        self.state = TrainState(params, self.tx.init(params), step_counter)
        self.train_step = make_train_step(self.model, self.tx, cfg.hard_negative_weight)
        self.eval_loss = make_eval_loss_fn(self.model, cfg.hard_negative_weight)

        self._gather = jax.jit(
            gather_windows, static_argnames=("one_pass_raw", "clip_len")
        )
        self._train_bank_dev = self._bank_device(self.train_bank)
        self._test_bank_dev = self._bank_device(self.test_bank)
        self._encoder: T.Optional[WindowEncoder] = None
        self.best_eval_loss = float("inf")
        self.best_ckpt: T.Optional[str] = None

    # ------------------------------------------------------------------
    def _bank_device(self, bank):
        arrs = (
            jnp.asarray(bank.bank),
            jnp.asarray(bank.offsets),
            jnp.asarray(bank.row_limit),
            jnp.asarray(bank.z0_diff),
        )
        if self.mesh is not None:
            # full bank replicated on every chip: each data shard gathers its
            # own window slice from a local copy (no cross-chip traffic)
            from ..parallel import put_global

            arrs = tuple(put_global(a, self._rep_shard) for a in arrs)
        return arrs

    def _shard_batch(self, x):
        """Shard the leading (window) axis over `data` when a mesh is active
        (multi-process meshes included — every host computes the same full
        batch and contributes its shard); tail batches that don't divide
        stay replicated (same values, no resharding error)."""
        if self.mesh is None:
            return x
        from ..parallel import put_global

        if x.shape[0] % self.mesh.shape["data"] == 0:
            return put_global(x, self._batch_shard)
        return put_global(x, self._rep_shard)

    def _gather_batch(self, bank, bank_dev, windows, idxs):
        vi = self._shard_batch(jnp.asarray(np.array([windows[i][0] for i in idxs], np.int32)))
        st = self._shard_batch(jnp.asarray(np.array([windows[i][1] for i in idxs], np.int32)))
        return self._gather(
            bank_dev[0],
            bank_dev[1],
            bank_dev[2],
            bank_dev[3],
            bank.one_pass_raw,
            vi,
            st,
            self.cfg.clip_len,
        )

    def _log(self, record: T.Dict[str, T.Any]) -> None:
        record = {
            k: (float(v) if isinstance(v, (np.floating, jnp.ndarray)) else v)
            for k, v in record.items()
        }
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    # ------------------------------------------------------------------
    def train_one_epoch(self, epoch: int) -> float:
        total = 0.0
        n_batches = 0
        n_skipped = 0
        t0 = time.time()
        for batch_idx in self._sampler_for_epoch(epoch):
            feats = self._gather_batch(
                self.train_bank, self._train_bank_dev, self.train_windows, batch_idx
            )
            labels = self._shard_batch(jnp.asarray(self.window_labels[batch_idx]))
            self.state, metrics = self.train_step(
                self.state, feats, labels, self.rng
            )
            t = float(metrics["total"])
            # the step's lax.cond already skipped the update for a
            # non-finite loss (ref train.py:499-500 `continue`s before
            # accumulating) — mirror that in the logged epoch loss instead
            # of letting one NaN batch poison the whole epoch's number
            if np.isfinite(t):
                total += t
            else:
                n_skipped += 1
            n_batches += 1
        dt = time.time() - t0
        avg = total / max(1, n_batches - n_skipped)
        clips_per_sec = n_batches * self.cfg.batch_size * 4 / max(dt, 1e-9)
        self._log(
            {
                "event": "train_epoch",
                "epoch": epoch,
                "loss": avg,
                "batches": n_batches,
                "skipped": n_skipped,
                "seconds": dt,
                "clips_per_sec": clips_per_sec,
            }
        )
        return avg

    # ------------------------------------------------------------------
    def _window_encoder(self) -> WindowEncoder:
        """One encoder for the whole run: rebuilding per eval call would
        re-trace the jitted encode program every epoch (tunnel compiles are
        45-600 s cold); the jit takes params as an argument, so swapping in
        the current epoch's params keeps the compiled program."""
        if self._encoder is None:
            self._encoder = WindowEncoder(
                self.model,
                self.state.params,
                self.eval_batch,
                self.cfg.clip_len,
                mesh=self.mesh,
            )
        else:
            if self.mesh is not None:
                from ..parallel import put_global

                self._encoder.params = put_global(
                    self.state.params, self._encoder._rep_shard
                )
            else:
                self._encoder.params = self.state.params
        return self._encoder

    def evaluate_centroids(self) -> np.ndarray:
        enc = self._window_encoder()
        win_label = np.array(
            [self.label_dict[self.train_bank.classes[vi]]
             for vi, _s in self.train_windows],
            np.int32,
        )
        # per-class sums accumulate on device along the sweep; only the
        # [C, D] sums come home (one fetch) and finalize locally
        seq_sum, _tc_sum, count = enc.encode_bank_segsum(
            self.train_bank, self.train_windows, win_label,
            len(self.label_dict), bank_dev=self._train_bank_dev,
        )
        from ..utils.hostmath import host_math

        with host_math():
            return np.asarray(
                finalize_centroids(jnp.asarray(seq_sum), jnp.asarray(count))
            )

    def evaluate_test_loss(self, epoch: int) -> T.Tuple[float, T.Dict[str, float]]:
        """Same loss as training over fixed test-window chunks (eval mode);
        non-finite chunks skipped (ref ``train.py:286-333``)."""
        n = len(self.test_windows)
        B = min(self.eval_batch, n)
        rng = jax.random.key(self.cfg.seed + 999)
        total = 0.0
        comp_sum: T.Dict[str, float] = {}
        n_batches = 0
        test_labels = np.array(
            [self.label_dict[self.test_bank.classes[vi]] for vi, _ in self.test_windows],
            np.int32,
        )
        for lo in range(0, n, B):
            idxs = list(range(lo, min(lo + B, n)))  # tail batch included
            # (ref DataLoader yields the final partial batch; one extra
            # compile for the tail shape)
            feats = self._gather_batch(
                self.test_bank, self._test_bank_dev, self.test_windows, idxs
            )
            labels = self._shard_batch(jnp.asarray(test_labels[idxs]))
            comps = self.eval_loss(
                self.state.params, feats, labels, jax.random.fold_in(rng, lo)
            )
            comps = {k: float(v) for k, v in comps.items()}
            if not np.isfinite(comps["total"]):
                continue
            total += comps["total"]
            for k, v in comps.items():
                if k != "total":
                    comp_sum[k] = comp_sum.get(k, 0.0) + v
            n_batches += 1
        if n_batches == 0:
            return float("inf"), {}
        avg = total / n_batches
        comps_avg = {k: v / n_batches for k, v in comp_sum.items()}
        self._log(
            {"event": "eval_loss", "epoch": epoch, "loss": avg, **comps_avg}
        )
        return avg, comps_avg

    def evaluate_centroid_distance(
        self, epoch: int, centroids: np.ndarray
    ) -> T.Tuple[float, T.Dict[str, float]]:
        enc = self._window_encoder()
        seqs, _tc, win_video = enc.encode_bank(
            self.test_bank, self.test_windows, bank_dev=self._test_bank_dev
        )
        labels = np.array(
            [self.label_dict[self.test_bank.classes[v]] for v in win_video], np.int32
        )
        cen = centroids[labels]
        d = np.linalg.norm(seqs - cen, axis=-1)
        avg = float(d.mean()) if len(d) else float("inf")
        per_class = {
            cls: float(d[labels == idx].mean())
            for cls, idx in self.label_dict.items()
            if np.any(labels == idx)
        }
        self._log(
            {
                "event": "centroid_distance",
                "epoch": epoch,
                "avg": avg,
                **{f"cls_{k}": v for k, v in per_class.items()},
            }
        )
        return avg, per_class

    def evaluate_human_corr(
        self, epoch: int, centroids: np.ndarray
    ) -> T.Optional[T.Dict[str, T.Any]]:
        """Human-correlation monitor (ref ``utils.py:1047-1220``): scores the
        generated videos and correlates with MOS using class-mean fallback."""
        cfg = self.cfg
        gen_dir = cfg.paths.generated_meshes_dir
        human_path = cfg.paths.human_scores
        if not (gen_dir and os.path.isdir(gen_dir) and os.path.exists(human_path)):
            return None
        from ..data import scan_generated_flat

        gen_manifest = scan_generated_flat(gen_dir)
        inferred = infer_generated_classes(gen_manifest.items, self.label_dict)
        gen_paths = ModalityPaths(
            keypoint_dir=cfg.paths.gen_kp_dir,
            clip_dir=cfg.paths.gen_clip_dir,
            dino_dir=cfg.paths.gen_dino_dir,
            layout="generated",
        )
        bank = build_feature_bank_cached(
            gen_manifest.items, gen_paths, self.stats, self.stats.modalities,
            min_rows=cfg.clip_len + 8,
            cache_path=(
                os.path.join(cfg.bank_cache_dir, "gen_bank.npz")
                if cfg.bank_cache_dir else None
            ),
        )
        windows = enumerate_windows(gen_manifest, cfg.clip_len, cfg.stride)
        ac_scores, tc_scores = generated_monitor_scores(
            gen_manifest.items, inferred, bank, windows,
            self._window_encoder(), centroids, self.label_dict,
        )
        with open(human_path) as f:
            human = json.load(f)
        out = {
            "action": correlate_with_class_fallback(
                ac_scores, human, "ac", self.label_dict.keys()
            ),
            "motion": correlate_with_class_fallback(
                tc_scores, human, "tc", self.label_dict.keys()
            ),
        }
        self._log(
            {
                "event": "human_corr",
                "epoch": epoch,
                "action_spearman": out["action"]["spearman"],
                "motion_spearman": out["motion"]["spearman"],
            }
        )
        return out

    # ------------------------------------------------------------------
    # -- async checkpoint machinery (TrainConfig.async_checkpoint) --------
    @property
    def _async_saves(self) -> bool:
        return self.cfg.async_checkpoint and jax.process_count() == 1

    def _saver(self):
        if self._ckpt_saver is None:
            from .checkpoint import AsyncSaver

            self._ckpt_saver = AsyncSaver()
        return self._ckpt_saver

    def _device_snapshot(self, tree):
        """On-device copy of ``tree`` (one jitted program, HBM-bandwidth
        cheap). Required before handing state to the background saver:
        ``train_step`` donates its input state, which would invalidate the
        live buffers mid-fetch; the snapshot's buffers are never donated."""
        if self._snapshot_fn is None:
            self._snapshot_fn = jax.jit(
                lambda t: jax.tree_util.tree_map(jnp.copy, t)
            )
        return self._snapshot_fn(tree)

    def wait_for_checkpoints(self) -> None:
        """Block until pending background checkpoint saves are durable."""
        if self._ckpt_saver is not None:
            self._ckpt_saver.wait()

    def save_resume_checkpoint(
        self, epoch: int, path: T.Optional[str] = None, block: bool = True
    ) -> str:
        """Full train-state checkpoint for exact resume (params, optimizer,
        step counter, epoch, best loss) — a capability the reference lacks
        (it saves model weights only, ref ``train.py:450-455``).

        ``block=False`` (used by :meth:`run` when async checkpointing is on)
        snapshots the state on device and hands the fetch+write to a worker
        thread; call :meth:`wait_for_checkpoints` before relying on the file.
        """
        from .checkpoint import save_train_state

        path = path or os.path.join(self.save_dir, f"resume_epoch{epoch:03d}")
        state_tree = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "epoch": jnp.asarray(epoch, jnp.int32),
            "best_eval_loss": jnp.asarray(self.best_eval_loss, jnp.float32),
        }
        if block or not self._async_saves:
            save_train_state(path, state_tree)
            return path
        snap = self._device_snapshot(state_tree)
        self._saver().submit(lambda: save_train_state(path, snap))
        return path

    def restore_resume_checkpoint(self, path: str) -> int:
        """Restore full train state; returns the next epoch to run."""
        from .checkpoint import restore_train_state

        self.wait_for_checkpoints()  # never read a file a worker is writing

        if self.mesh is not None:
            # abstract template — device_get can't fetch cross-process shards
            abstract = lambda t: jax.tree_util.tree_map(
                lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), t
            )
            params_like = abstract(self.state.params)
            opt_like = abstract(self.state.opt_state)
        else:
            params_like = jax.device_get(self.state.params)
            opt_like = jax.device_get(self.state.opt_state)
        like = {
            "params": params_like,
            "opt_state": opt_like,
            "step": np.zeros((), np.int32),
            "epoch": np.zeros((), np.int32),
            "best_eval_loss": np.zeros((), np.float32),
        }
        st = restore_train_state(path, like)
        if self.mesh is not None:
            # re-place every leaf on its live sharding (multi-process meshes
            # included: every host read the same checkpoint bytes)
            from ..parallel import put_global

            place = lambda new, old: jax.tree_util.tree_map(
                lambda n, o: put_global(np.asarray(n), o.sharding), new, old
            )
            self.state = TrainState(
                place(st["params"], self.state.params),
                place(st["opt_state"], self.state.opt_state),
                place(st["step"], self.state.step),
            )
        else:
            self.state = TrainState(
                jax.tree_util.tree_map(jnp.asarray, st["params"]),
                jax.tree_util.tree_map(jnp.asarray, st["opt_state"]),
                jnp.asarray(st["step"]),
            )
        self.best_eval_loss = float(st["best_eval_loss"])
        return int(st["epoch"]) + 1

    def run(self, start_epoch: int = 0) -> None:
        # inside the loop, checkpoint writes go to the background saver
        # (cfg.async_checkpoint, single-process only): the ~30 s tunnel
        # device_get+write overlaps the next epoch's compute. The finally
        # drains the queue, so every file run() promised exists when it
        # returns — even on an exception (the last good checkpoint must
        # land for resume).
        try:
            for epoch in range(start_epoch, self.cfg.epochs):
                avg_loss = self.train_one_epoch(epoch)
                centroids = self.evaluate_centroids()
                eval_loss, _comps = self.evaluate_test_loss(epoch)
                if eval_loss < self.best_eval_loss:
                    self.best_eval_loss = eval_loss
                    ckpt = os.path.join(
                        self.save_dir, f"best_eval_epoch{epoch + 1:03d}"
                    )
                    if self._async_saves:
                        snap = self._device_snapshot(self.state.params)
                        # bind per-iteration values: ckpt/snap are rebound on
                        # later epochs before the worker may run
                        self._saver().submit(
                            lambda p=ckpt, s=snap: save_params(p, s)
                        )
                    else:
                        save_params(ckpt, self.state.params)
                    self.best_ckpt = ckpt
                    self._log({"event": "checkpoint", "epoch": epoch, "loss": eval_loss})
                self.evaluate_centroid_distance(epoch, centroids)
                try:
                    self.evaluate_human_corr(epoch, centroids)
                except Exception as e:  # noqa: BLE001
                    # purely a monitor (the reference's own monitor skips
                    # unloadable gen videos, ref utils.py:1083-1086) — a bad
                    # generated tree must not abort training before the
                    # epoch's resume checkpoint is written
                    self._log({
                        "event": "human_corr_failed",
                        "epoch": epoch,
                        "error": f"{type(e).__name__}: {e}",
                    })
                self.save_resume_checkpoint(epoch, block=not self._async_saves)
        finally:
            # don't let a drain-time save failure mask an in-flight
            # exception from the loop body
            if sys.exc_info()[0] is None:
                self.wait_for_checkpoints()
            else:
                try:
                    self.wait_for_checkpoints()
                except Exception as e:  # noqa: BLE001
                    self._log({
                        "event": "checkpoint_drain_failed",
                        "error": f"{type(e).__name__}: {e}",
                    })


def infer_generated_classes(
    items: T.Sequence, label_dict: T.Dict[str, int]
) -> T.List[T.Optional[str]]:
    """Known-class-substring inference for generated videos (ref
    ``utils.py:1069-1073``): each item's class is set to the first label
    whose name appears in the filename stem, falling back to the first
    known class when none does (the reference's ``_infer_class_from_name``
    fallback). Returns the per-item inference BEFORE the fallback — the
    AC scorer needs to know which videos genuinely matched (see
    :func:`generated_monitor_scores`)."""
    inferred: T.List[T.Optional[str]] = []
    for it in items:
        stem = os.path.splitext(it.name)[0]
        cls = infer_class_from_name(stem, label_dict.keys())
        inferred.append(cls)
        it.cls = cls if cls is not None else next(iter(label_dict))
    return inferred


def generated_monitor_scores(
    items: T.Sequence,
    inferred: T.Sequence[T.Optional[str]],
    bank,
    windows: T.Sequence[T.Tuple[int, int]],
    encoder: WindowEncoder,
    centroids: np.ndarray,
    label_dict: T.Dict[str, int],
) -> T.Tuple[T.Dict[str, float], T.Dict[str, float]]:
    """Per-video (ac_scores, tc_scores) for the human-corr monitor, exactly
    per the reference's ``get_human_corr`` single pass (ref
    ``utils.py:1125-1165``): TC (mean window TC) covers EVERY video, while
    AC only covers videos whose name contains a known class — the reference
    skips class-less videos from ``action_scores`` (``utils.py:1154-1159``)
    even though their VideoItem carried the fallback class."""
    num_videos = len(items)
    # per-video sums accumulate on device along the sweep; only the
    # [V]-sized sums come home (one fetch) and finalize locally
    win_video = np.array([v for v, _s in windows], np.int32)
    seq_sum, tc_sum, count = encoder.encode_bank_segsum(
        bank, windows, win_video, num_videos
    )
    video_label = np.array(
        [label_dict.get(c, 0) for c in bank.classes], np.int32
    )
    from ..utils.hostmath import host_math

    with host_math():
        ac_j, tc_j = finalize_video_scores(
            jnp.asarray(seq_sum),
            jnp.asarray(tc_sum),
            jnp.asarray(count),
            jnp.asarray(video_label),
            jnp.asarray(centroids),
        )
        ac_v, tc_v = np.asarray(ac_j), np.asarray(tc_j)
    tc_scores = {items[v].name: float(tc_v[v]) for v in range(num_videos)}
    ac_scores = {
        items[v].name: float(ac_v[v])
        for v in range(num_videos)
        if inferred[v] is not None and bank.classes[v] in label_dict
    }
    return ac_scores, tc_scores
