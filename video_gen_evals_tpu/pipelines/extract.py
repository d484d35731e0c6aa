"""Feature extraction pipeline: video frames -> SMPL mesh params + token_out
("vit" modality) + 2D whole-body keypoints, batched on device.

Capability parity with ref ``extract_mesh.py`` + ``modifications/
{mesh_generator,process_video}.py`` (C25-C29 in SURVEY.md), redesigned
TPU-first:

reference (per video):                      this pipeline (per video):
  per-frame detectron2 call (Python loop)     ONE batched detector forward
  per-frame crop on CPU                       batched crop+resize on device
  TokenHMR forwards in chunks of 8            ONE batched mesh forward
  DWPose ONNX per frame                       ONE batched pose forward
  frames silently dropped                     fixed shapes + validity masks,
                                              compacted only at npz-write time

Filtering semantics are exact: a mesh frame is kept iff exactly one person
box scores > 0.5 (ref ``mesh_generator.py:103-111``); the video is rejected
if < 80% of frames qualify (ref ``:113-117``). The keypoint branch follows
DWPose's published semantics (upstream mode): person boxes at score > 0.3
after class-agnostic NMS, and a FULL-FRAME fallback box when nothing is
detected — so no frame is dropped for lack of detection (the reference's
18-body+both-hands rule, ref ``process_video.py:23-57``, is structurally
always satisfied once a pose exists). Input preprocessing is upstream-exact
by default (``ops/upstream_crops.py``; see ExtractorConfig.preproc).

Extraction is resumable via per-action JSON ledgers (ref
``extract_mesh.py:121-194``).
"""

from __future__ import annotations

import dataclasses
import json
import os
import typing as T

import jax
import jax.numpy as jnp
import numpy as np

from ..models.detector import (
    DetectorConfig,
    YOLOXLiteDetector,
    dwpose_person_detections,
    person_detections,
    single_person_mask,
)
from ..models.pose2d import (
    PoseNetConfig,
    SimCCPoseNet,
    dwpose_postprocess,
    flatten_first_person,
    wholebody_to_openpose,
)
from ..models.smpl_head import SMPLHeadConfig, SMPLTokenDecoderHead
from ..models.vit import ViTBackbone, ViTConfig
from ..ops.image import (
    batched_person_crops,
    crop_resize_matmul,
    resize_pil_matmul,
)
from ..ops.upstream_crops import (
    dwpose_backmap,
    dwpose_topdown_crop,
    vitdet_mesh_crop,
    yolox_letterbox,
)
from ..utils.io import ResumableLedger, save_video_npz

# ImageNet-ish crop normalization (0..255 scale), matching top-down defaults
_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_STD = np.array([58.395, 57.12, 57.375], np.float32)


@dataclasses.dataclass
class ExtractorConfig:
    det: DetectorConfig = dataclasses.field(default_factory=DetectorConfig)
    vit: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    head: SMPLHeadConfig = dataclasses.field(default_factory=SMPLHeadConfig)
    pose: PoseNetConfig = dataclasses.field(default_factory=PoseNetConfig)
    # Mesh-path box provenance. "yolox": one shared YOLOX detector feeds both
    # the mesh and keypoint crops (fast mode). "rcnn": the mesh crops and the
    # single-person video filter use Faster R-CNN X101-FPN boxes — the
    # reference's actual mesh detector (ref ``mesh_generator.py:69-74``,
    # DefaultPredictor preprocessing reproduced device-side) — while the
    # DWPose keypoint branch keeps its own YOLOX boxes (ITS reference
    # provenance). PARITY.md's box-sensitivity study is why this matters:
    # AC/TC scores are not robust to detector-family box differences.
    mesh_detector: str = "yolox"
    rcnn: "RCNNConfig" = None  # default filled in __post_init__
    frame_batch: int = 32
    # the X101-FPN detect stage works at an 800x1088 canvas (~70x the pixel
    # area of the other stages' crops), so it chunks smaller to bound HBM
    rcnn_frame_batch: int = 8
    det_score_thresh: float = 0.5
    min_single_ratio: float = 0.8
    # Input preprocessing provenance (round-4). "upstream" (default) feeds
    # each net the EXACT published preprocessing its converted weights were
    # trained/exported with (ops/upstream_crops.py): TokenHMR ViTDetDataset
    # crops for the mesh net, the mmpose top-down warp + DWPose detector
    # letterbox/class-agnostic-NMS/full-frame-fallback semantics for the
    # keypoint branch. "legacy" keeps the round-1..3 home-grown geometry
    # (crop_scale aspect-expand crops, ImageNet-normalized stretch-resize
    # detector canvas) for continuity comparisons; it matches NO published
    # weight pipeline — PARITY.md's box-sensitivity study is why that
    # matters.
    preproc: str = "upstream"
    crop_scale: float = 1.2        # legacy-mode crop expansion only
    vitdet_rescale: float = 2.5    # ViTDetDataset rescale_factor
    vitdet_antialias: bool = True  # hmr2 gaussian pre-blur (df > 1.1)
    pose_padding: float = 1.25     # mmpose bbox_xyxy2cs padding
    # DWPose onnxdet thresholds: candidates > 0.1 pre-NMS, class-agnostic
    # NMS 0.45, keypoint-branch person keep > 0.3
    pose_det_prefilter: float = 0.1
    pose_det_iou: float = 0.45
    pose_det_score_thresh: float = 0.3
    # onnxpose substitutes a full-frame box when no person is detected, so
    # the reference NEVER drops a keypoint frame for lack of detection —
    # the frame gets a full-frame pose instead
    pose_fullframe_fallback: bool = True
    kp_bug_compat: bool = True   # drop invalid kp frames like the reference
    # Extraction numerics (PARITY.md round-3 extraction-precision study):
    # matmul class for every extraction stage (detector/ViT-H/head/pose) and
    # an optional bf16 parameter cast. "high" (bf16_3x) is the default — same
    # budget-backed choice as scoring; "default" (single-pass bf16 dots) and
    # param_dtype="bfloat16" are the measured fast modes.
    matmul_precision: str = "high"
    param_dtype: str = "float32"   # "float32" | "bfloat16"
    # Benchmark/debug mode: treat every frame as single-person (detection
    # still runs, but the >=80%-single rejection is bypassed). Needed to
    # exercise the full mesh/pose path with random (unconverted) detector
    # weights, e.g. benchmarks/bench_full.py; production extraction keeps
    # the reference's filtering semantics.
    keep_all_frames: bool = False

    def __post_init__(self):
        if self.preproc not in ("upstream", "legacy"):
            raise ValueError(f"unknown preproc {self.preproc!r}")
        if self.rcnn is None:
            from ..models.rcnn import RCNNConfig

            self.rcnn = RCNNConfig.x101_32x8d()

    @classmethod
    def parity(cls, **kw) -> "ExtractorConfig":
        """The reference-reproduction preset (one flag: ``--parity`` on the
        extract CLI): Faster R-CNN X101-FPN mesh boxes with the exact
        (non-``fast()``) RCNNConfig (ref ``mesh_generator.py:69-74``),
        upstream preprocessing on every input path, the budget-measured
        ``high`` matmul class (PARITY.md extraction-precision study), f32
        params, and the reference's keypoint frame-dropping quirk."""
        kw.setdefault("mesh_detector", "rcnn")
        kw.setdefault("preproc", "upstream")
        kw.setdefault("matmul_precision", "high")
        kw.setdefault("param_dtype", "float32")
        kw.setdefault("kp_bug_compat", True)
        kw.setdefault("vitdet_antialias", True)
        kw.setdefault("pose_fullframe_fallback", True)
        # rcnn=None resolves to the exact RCNNConfig.x101_32x8d() in
        # __post_init__ (NOT the fast() throughput preset)
        return cls(**kw)

    def is_parity(self) -> bool:
        """True iff this config is the reference-reproduction configuration
        (every knob that changes score provenance matches :meth:`parity`;
        ``matmul_precision`` may also be the stricter ``highest``).
        Recorded in each extraction run's ``RUN_CONFIG`` provenance file so
        downstream consumers can tell parity features from fast-mode ones."""
        from ..models.rcnn import RCNNConfig

        return (
            self.mesh_detector == "rcnn"
            and self.preproc == "upstream"
            and self.matmul_precision in ("high", "highest")
            and self.param_dtype == "float32"
            and self.kp_bug_compat
            and self.vitdet_antialias
            and self.pose_fullframe_fallback
            and self.rcnn == RCNNConfig.x101_32x8d()
        )


class Extractor:
    """Batched detector + mesh net + pose net with jitted stages.

    ``mesh``: optional ``jax.sharding.Mesh`` — the extraction stages then run
    data-parallel over its ``data`` axis (frame batch sharded, params
    replicated, XLA inserts any collectives). Extraction is embarrassingly
    parallel across frames, so dp scaling is the whole story; keep
    ``frame_batch`` divisible by the mesh's data size for even shards."""

    def __init__(self, config: T.Optional[ExtractorConfig] = None, params=None,
                 rng=None, mesh=None):
        self.cfg = config or ExtractorConfig()
        self.mesh = mesh
        cfg = self.cfg
        self.detector = YOLOXLiteDetector(cfg.det)
        self.backbone = ViTBackbone(cfg.vit)
        self.head = SMPLTokenDecoderHead(cfg.head)
        self.pose_net = SimCCPoseNet(cfg.pose)
        self.rcnn = None
        if cfg.mesh_detector == "rcnn":
            from ..models.rcnn import FasterRCNN

            self.rcnn = FasterRCNN(cfg.rcnn)
        elif cfg.mesh_detector != "yolox":
            raise ValueError(f"unknown mesh_detector {cfg.mesh_detector!r}")

        # ``params`` may be PARTIAL (e.g. converted checkpoints for some
        # nets): only the missing nets are random-initialized — initializing
        # ViT-H just to immediately overwrite it wastes init compute and,
        # under a mesh, a full replication of throwaway weights
        params = dict(params) if params is not None else {}
        needed = ["det", "vit", "head", "pose"] + (
            ["rcnn"] if self.rcnn is not None else []
        )
        missing = [k for k in needed if k not in params]
        if missing:
            rng = rng if rng is not None else jax.random.key(0)
            k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
            dh, dw = cfg.det.input_hw
            ch, cw = cfg.vit.img_size
            ph, pw = cfg.pose.input_hw
            init_of = {
                "det": lambda: self.detector.init(
                    k1, jnp.zeros((1, dh, dw, 3)))["params"],
                "vit": lambda: self.backbone.init(
                    k2, jnp.zeros((1, ch, cw, 3)))["params"],
                "head": lambda: self.head.init(
                    k3, jnp.zeros((1, cfg.vit.num_patches, cfg.vit.embed_dim))
                )["params"],
                "pose": lambda: self.pose_net.init(
                    k4, jnp.zeros((1, ph, pw, 3)))["params"],
                "rcnn": lambda: self.rcnn.init(
                    k5, jnp.zeros((1, 64, 64, 3)), method=self.rcnn.init_all
                )["params"],
            }
            for k in missing:
                params[k] = init_of[k]()
        if self.cfg.param_dtype == "bfloat16":
            params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32
                else a,
                params,
            )
        self.params = params
        if mesh is not None:
            n_data = mesh.shape["data"]
            if cfg.frame_batch % n_data:
                raise ValueError(
                    f"frame_batch ({cfg.frame_batch}) must be divisible by "
                    f"the mesh data axis ({n_data})"
                )
            if self.rcnn is not None and cfg.rcnn_frame_batch % n_data:
                raise ValueError(
                    f"rcnn_frame_batch ({cfg.rcnn_frame_batch}) must be "
                    f"divisible by the mesh data axis ({n_data})"
                )
            self._place_params()
        self._build_jits()

    def _place_params(self) -> None:
        """Replicate the param tree onto the mesh ONCE — without this every
        sjit stage call would re-broadcast the (potentially GB-scale) params
        per chunk to satisfy its replicated in_sharding."""
        from ..parallel.mesh import put_global, replicated_sharding

        self.params = put_global(self.params, replicated_sharding(self.mesh))

    @classmethod
    def from_checkpoints(
        cls,
        config: T.Optional[ExtractorConfig] = None,
        *,
        tokenhmr: T.Optional[str] = None,
        dwpose: T.Optional[str] = None,
        yolox: T.Optional[str] = None,
        rcnn: T.Optional[str] = None,
        rng=None,
        mesh=None,
    ) -> "Extractor":
        """Build an Extractor with the published pretrained weights.

        Each argument is a checkpoint file for one network (see
        ``pipelines/weights.py`` for accepted formats); nets without a file
        keep their random init. Providing a file switches that net's config
        to its published geometry and, for ``rcnn``, selects the R-CNN mesh
        detector — so ``Extractor.from_checkpoints(tokenhmr=..., dwpose=...,
        yolox=..., rcnn=...)`` reproduces the reference's full pretrained
        stack (ref ``mesh_generator.py:35-78``, ``dwpose_init.py``).
        """
        from .weights import (
            extraction_params_from_checkpoints,
            load_torch_state_dict,
            published_config,
        )

        # load each file once; helpers accept preloaded dicts
        tokenhmr = load_torch_state_dict(tokenhmr) if tokenhmr else None
        cfg = published_config(
            config or ExtractorConfig(),
            tokenhmr=tokenhmr, dwpose=dwpose, yolox=yolox, rcnn=rcnn,
        )
        converted = extraction_params_from_checkpoints(
            cfg, tokenhmr=tokenhmr, dwpose=dwpose, yolox=yolox, rcnn=rcnn
        )
        # partial-params constructor: nets WITH a checkpoint skip random
        # init entirely, and mesh placement happens exactly once (__init__
        # casts to cfg.param_dtype before placing)
        return cls(cfg, params=converted, rng=rng, mesh=mesh)

    # ------------------------------------------------------------------
    def _build_jits(self) -> None:
        cfg = self.cfg
        dh, dw = cfg.det.input_hw
        prec = cfg.matmul_precision

        mesh = self.mesh
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, put_global, replicated_sharding

            _DP = batch_sharding(mesh)
            _REP = replicated_sharding(mesh)
            # chunks sliced/padded from a larger array carry whatever layout
            # the slice produced — re-place them on the data axis so they
            # match the stage jits' in_shardings exactly
            self._put_dp = lambda x: put_global(x, _DP)
        else:
            self._put_dp = lambda x: x

        def sjit(fn, in_s):
            """jit, data-parallel over the mesh when one is present: "dp"
            args shard their leading (frame-batch) axis over the ``data``
            axis, "rep" args (params, frame geometry) replicate; every
            stage output is batch-leading, so outputs shard on ``data``."""
            if mesh is None:
                return jax.jit(fn)
            return jax.jit(
                fn,
                in_shardings=tuple(
                    _DP if s == "dp" else _REP for s in in_s
                ),
                out_shardings=_DP,
            )

        upstream = cfg.preproc == "upstream"

        def detect(params, frames_f32, frame_wh):
          with jax.default_matmul_precision(prec):
            B, H, W, _ = frames_f32.shape
            if upstream:
                # Megvii/DWPose letterbox canvas: aspect-preserving resize
                # onto a 114-filled square, raw BGR 0..255, boxes mapped
                # back by 1/ratio (ref dwpose onnxdet preprocess)
                if dh != dw:
                    raise ValueError("letterbox needs a square det input")
                canvas, ratio = yolox_letterbox(frames_f32, size=dh)
                raw = self.detector.apply({"params": params}, canvas)
                boxes, scores, person = dwpose_person_detections(
                    raw,
                    prefilter_thresh=cfg.pose_det_prefilter,
                    iou_thresh=cfg.pose_det_iou,
                    max_out=cfg.det.max_detections,
                )
                boxes = boxes * jnp.float32(1.0 / ratio)
                mesh_valid = person & (scores > cfg.det_score_thresh)
                pose_valid = person & (scores > cfg.pose_det_score_thresh)
            else:
                # legacy canvas: ImageNet-normalized full-frame stretch
                full_box = jnp.asarray(
                    [W / 2.0, H / 2.0, float(W), float(H)], jnp.float32
                )
                det_in = jax.vmap(
                    lambda f: crop_resize_matmul(f, full_box, (dh, dw))
                )(frames_f32)
                det_in = (det_in - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
                raw = self.detector.apply({"params": params}, det_in)
                boxes, scores, valid = person_detections(
                    raw, score_thresh=cfg.det_score_thresh
                )
                boxes = boxes * jnp.asarray(
                    [W / dw, H / dh, W / dw, H / dh], boxes.dtype
                )
                mesh_valid = pose_valid = valid
            single = jnp.sum(mesh_valid.astype(jnp.int32), axis=-1) == 1
            present = jnp.any(pose_valid, axis=-1)  # >=1 person this frame
            best_m = jnp.argmax(jnp.where(mesh_valid, scores, -1.0), axis=-1)
            box_mesh = jnp.take_along_axis(
                boxes, best_m[:, None, None], axis=1
            )[:, 0]
            best_p = jnp.argmax(jnp.where(pose_valid, scores, -1.0), axis=-1)
            box_pose = jnp.take_along_axis(
                boxes, best_p[:, None, None], axis=1
            )[:, 0]
            if upstream and cfg.pose_fullframe_fallback:
                # onnxpose: empty detection -> pose on [0, 0, W, H]
                fb = jnp.asarray([0.0, 0.0, float(W), float(H)], jnp.float32)
                box_pose = jnp.where(present[:, None], box_pose, fb)
            return box_mesh, box_pose, single, present

        def mesh_forward(params_vit, params_head, frames_f32, boxes_xyxy):
          with jax.default_matmul_precision(prec):
            if upstream:
                crops = vitdet_mesh_crop(
                    frames_f32,
                    boxes_xyxy,
                    out_hw=cfg.vit.img_size,
                    rescale_factor=cfg.vitdet_rescale,
                    antialias=cfg.vitdet_antialias,
                )
            else:
                crops = batched_person_crops(
                    frames_f32,
                    boxes_xyxy,
                    out_hw=cfg.vit.img_size,
                    scale=cfg.crop_scale,
                    mean=jnp.asarray(_MEAN),
                    std=jnp.asarray(_STD),
                )
            tokens, _fmap = self.backbone.apply({"params": params_vit}, crops)
            return self.head.apply({"params": params_head}, tokens)

        def pose_forward(params_pose, frames_f32, boxes_xyxy, frame_wh):
          with jax.default_matmul_precision(prec):
            ph, pw = cfg.pose.input_hw
            if upstream:
                crops, center, scale = dwpose_topdown_crop(
                    frames_f32,
                    boxes_xyxy,
                    input_hw=(ph, pw),
                    padding=cfg.pose_padding,
                )
                kps_crop, scores = self.pose_net.apply(
                    {"params": params_pose}, crops
                )
                kps_frame = dwpose_backmap(
                    kps_crop, center, scale, input_hw=(ph, pw)
                )
                return wholebody_to_openpose(kps_frame, scores)
            crops = batched_person_crops(
                frames_f32,
                boxes_xyxy,
                out_hw=(ph, pw),
                scale=cfg.crop_scale,
                mean=jnp.asarray(_MEAN),
                std=jnp.asarray(_STD),
            )
            kps_crop, scores = self.pose_net.apply({"params": params_pose}, crops)
            # map crop coords -> frame coords (inverse of crop_resize mapping)
            x0, y0, x1, y1 = (
                boxes_xyxy[:, 0],
                boxes_xyxy[:, 1],
                boxes_xyxy[:, 2],
                boxes_xyxy[:, 3],
            )
            cx = (x0 + x1) / 2
            cy = (y0 + y1) / 2
            w = (x1 - x0) * cfg.crop_scale
            h = (y1 - y0) * cfg.crop_scale
            # match batched_person_crops aspect expansion
            target = pw / ph
            w_e = jnp.where(w / jnp.maximum(h, 1e-6) > target, w, h * target)
            h_e = jnp.where(w / jnp.maximum(h, 1e-6) >= target, w / target, h)
            bx0 = cx - w_e / 2
            by0 = cy - h_e / 2
            xf = bx0[:, None] + (kps_crop[..., 0] + 0.5) * (w_e[:, None] / pw) - 0.5
            yf = by0[:, None] + (kps_crop[..., 1] + 0.5) * (h_e[:, None] / ph) - 0.5
            kps134, sc134 = wholebody_to_openpose(
                jnp.stack([xf, yf], axis=-1), scores
            )
            return kps134, sc134

        def kp_post(kps134, sc134, frame_wh):
            """Batched DWPose postprocess + 120-d flatten over all frames at
            once (each frame holds the single detected person, P=1). Replaces
            the reference's per-frame host loop (ref ``process_video.py:63-86``)."""

            def one(k, s):
                post = dwpose_postprocess(k[None], s[None], frame_wh)
                return flatten_first_person(post)

            return jax.vmap(one)(kps134, sc134)

        if self.rcnn is not None:
            from ..models.rcnn import (
                PIXEL_MEAN_BGR,
                clip_boxes,
                pad_to_divisible,
                resize_shortest_edge,
            )

            def detect_rcnn(params, frames_f32):
              with jax.default_matmul_precision(prec):
                # DefaultPredictor preprocessing, device-side (ref
                # mesh_generator.py:74 + d2 DefaultPredictor): BGR input,
                # shortest-edge-800 resize (bilinear), pixel-mean subtract
                # (std is 1), zero-pad to 32-divisible canvas.
                B, H, W, _ = frames_f32.shape
                rc = cfg.rcnn
                rh, rw = resize_shortest_edge(
                    (H, W), rc.min_size_test, rc.max_size_test
                )
                ch_, cw_ = pad_to_divisible((rh, rw))
                # PIL-BILINEAR semantics (d2 ResizeShortestEdge resizes via
                # PIL.Image.resize, incl. antialias when downsampling) — not
                # the crop-gather convention the mesh/pose crops use.
                resized = jax.vmap(
                    lambda f: resize_pil_matmul(f, (rh, rw))
                )(frames_f32)
                bgr = resized[..., ::-1] - jnp.asarray(PIXEL_MEAN_BGR)
                canvas = jnp.pad(
                    bgr, ((0, 0), (0, ch_ - rh), (0, cw_ - rw), (0, 0))
                )
                det = self.rcnn.apply(
                    {"params": params}, canvas, image_hw=(rh, rw)
                )
                # d2 detector_postprocess: rescale to original frame coords,
                # then clip to the original size
                sx = W / rw
                sy = H / rh
                boxes = det["boxes"] * jnp.asarray([sx, sy, sx, sy], jnp.float32)
                boxes = clip_boxes(boxes, (H, W))
                # ref mesh_generator.py:103-111: person class, score > 0.5,
                # exactly one such box
                person = (
                    (det["classes"] == 0)
                    & (det["scores"] > cfg.det_score_thresh)
                    & det["valid"]
                )
                single = jnp.sum(person.astype(jnp.int32), axis=-1) == 1
                present = jnp.any(person, axis=-1)
                best = jnp.argmax(
                    jnp.where(person, det["scores"], -1.0), axis=-1
                )
                box1 = jnp.take_along_axis(
                    boxes, best[:, None, None], axis=1
                )[:, 0]
                return box1, single, present

            self._detect_rcnn = sjit(detect_rcnn, ("rep", "dp"))
        else:
            self._detect_rcnn = None

        self._detect = sjit(detect, ("rep", "dp", "rep"))
        self._mesh_forward = sjit(mesh_forward, ("rep", "rep", "dp", "dp"))
        self._pose_forward = sjit(pose_forward, ("rep", "dp", "dp", "rep"))
        # kp_post and the upload cast run on WHOLE-VIDEO arrays of arbitrary
        # length (not chunked through _batched), so they must not be
        # dp-constrained — a non-divisible frame count would be rejected.
        # Under a mesh their inputs already live across the mesh devices
        # (concatenated stage-chunk outputs) and GSPMD partitions freely.
        self._kp_post = jax.jit(kp_post)
        self._to_f32 = jax.jit(lambda u8: u8.astype(jnp.float32))

    # ------------------------------------------------------------------
    def _batched(self, fn, frames, *extra, fetch: bool = True,
                 batch: T.Optional[int] = None):
        """Run a jitted per-frame-stack fn in fixed-size chunks (pad tail).

        ``frames``/``extra`` may be numpy or device arrays; chunk outputs are
        queued device-side and fetched once at the end (``fetch=True``) so
        dispatch pipelines instead of paying a host round trip per chunk —
        through the axon tunnel that round trip is ~28 ms (BENCH_NOTES)."""
        B = batch or self.cfg.frame_batch
        n = frames.shape[0]
        outs = []
        for lo in range(0, n, B):
            chunk = frames[lo : lo + B]
            pad = B - chunk.shape[0]
            if pad:
                chunk = jnp.concatenate(
                    [chunk, jnp.repeat(chunk[-1:], pad, axis=0)]
                )
            extras = []
            for e in extra:
                ce = e[lo : lo + B]
                if pad:
                    ce = jnp.concatenate([ce, jnp.repeat(ce[-1:], pad, axis=0)])
                extras.append(self._put_dp(jnp.asarray(ce)))
            out = fn(self._put_dp(jnp.asarray(chunk)), *extras)
            if pad:
                out = jax.tree_util.tree_map(lambda x: x[:-pad], out)
            outs.append(out)
        joined = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs) if len(xs) > 1 else xs[0], *outs
        )
        if fetch:
            joined = jax.tree_util.tree_map(np.asarray, joined)
        return joined

    # ------------------------------------------------------------------
    def _kp_frame_mask(self, valid, present) -> np.ndarray:
        """Per-frame keypoint keep rule. With the upstream full-frame
        fallback the reference NEVER drops a frame for lack of detection
        (onnxpose substitutes the [0, 0, W, H] box); without it, the
        legacy rule drops no-person frames."""
        if self.cfg.preproc == "upstream" and self.cfg.pose_fullframe_fallback:
            return np.asarray(valid)
        return np.asarray(valid) & np.asarray(present)

    def _detect_stage(self, frames_f32, wh, with_keypoints):
        """(mesh boxes, pose boxes, single-person mask, person-present
        mask), all device-side.

        yolox mode: ONE shared detector pass feeds both crop branches.
        rcnn mode: mesh boxes + the video filter come from Faster R-CNN
        (the reference's mesh provenance); the pose branch keeps YOLOX
        boxes (DWPose's own detector) — so the kp present mask is YOLOX's.
        ``present`` ("any person this frame") is the reference's per-frame
        keypoint drop rule (ref ``process_video.py:23-57`` drops a frame
        only when no person is detected); ``single`` ("exactly one") is
        the mesh filter (ref ``mesh_generator.py:103-111``)."""
        if self.rcnn is not None:
            box_mesh, single, _ = self._batched(
                lambda f: self._detect_rcnn(self.params["rcnn"], f),
                frames_f32,
                fetch=False,
                batch=min(self.cfg.rcnn_frame_batch, self.cfg.frame_batch),
            )
            box_pose, present = None, None
            if with_keypoints:
                _, box_pose, _, present = self._batched(
                    lambda f: self._detect(self.params["det"], f, wh),
                    frames_f32,
                    fetch=False,
                )
            return box_mesh, box_pose, single, present
        box_mesh, box_pose, single, present = self._batched(
            lambda f: self._detect(self.params["det"], f, wh),
            frames_f32,
            fetch=False,
        )
        return box_mesh, box_pose, single, present

    def _upload_frames(self, frames: np.ndarray) -> jnp.ndarray:
        """Host uint8 frames -> device f32, ONE transfer.

        Through the axon tunnel host->device moves ~55 MB/s, so the frame
        stack is shipped once in uint8 (4x smaller than f32) and cast on
        device; all stages then slice the same device-resident array.
        Already-device arrays (e.g. from a prefetch thread) pass through."""
        if isinstance(frames, jax.Array):
            return frames
        return self._to_f32(jax.device_put(np.ascontiguousarray(frames)))

    def process_video_full(
        self,
        frames: T.Optional[np.ndarray],
        with_keypoints: bool = False,
        frames_dev: T.Optional[jnp.ndarray] = None,
    ) -> T.Tuple[T.Optional[T.Dict[str, np.ndarray]], T.Optional[T.Dict[str, np.ndarray]]]:
        """Mesh (+ keypoint) extraction for one video with ONE frame upload
        and ONE detector pass shared by both heads.

        ``frames``: [T, H, W, 3] uint8 RGB (or None when ``frames_dev`` — a
        pre-uploaded device f32 stack, e.g. from a prefetch thread — is
        given). Returns ``(mesh, kp)`` where ``mesh`` is None if the video
        fails the single-person ratio test (ref ``mesh_generator.py:113-117``)
        — keypoints are then skipped, matching ``run_tree``'s reference
        behavior."""
        frames_f32 = (
            frames_dev if frames_dev is not None else self._upload_frames(frames)
        )
        Tn, H, W, _ = frames_f32.shape
        wh = (jnp.float32(W), jnp.float32(H))
        # dispatch EVERY stage device-side before any host fetch: the whole
        # per-video graph (detect -> crops -> mesh [-> pose -> postprocess])
        # chains on device, and the host blocks only once at the end. The
        # mesh/pose work is speculative w.r.t. the single-person ratio test —
        # for rejected videos it is wasted, but accepted videos (the common
        # case) never stall on the detector fetch.
        box_mesh, box_pose, single, present = self._detect_stage(
            frames_f32, wh, with_keypoints
        )
        out = self._batched(
            lambda f, b: self._mesh_forward(
                self.params["vit"], self.params["head"], f, b
            ),
            frames_f32,
            box_mesh,
            fetch=False,
        )
        if with_keypoints:
            kps134, sc134 = self._batched(
                lambda f, b: self._pose_forward(self.params["pose"], f, b, wh),
                frames_f32,
                box_pose,
                fetch=False,
            )
            kp120, valid = self._kp_post(kps134, sc134, wh)

        single_np = np.asarray(single)
        if self.cfg.keep_all_frames:
            single_np = np.ones_like(single_np, dtype=bool)
        elif single_np.sum() == 0 or single_np.mean() < self.cfg.min_single_ratio:
            return None, None

        out = jax.tree_util.tree_map(np.asarray, out)
        keep = np.where(single_np)[0]
        mesh = {
            "pose": out["body_pose"][keep],
            "betas": out["betas"][keep],
            "global_orient": out["global_orient"][keep],
            "vit": out["token_out"][keep],
            "frame_idx": keep.astype(np.int32),
        }
        if not with_keypoints:
            return mesh, None

        valid = self._kp_frame_mask(valid, present)
        if self.cfg.keep_all_frames:
            valid = np.ones_like(valid, dtype=bool)
        return mesh, {"kp120": np.asarray(kp120), "valid": valid}

    def process_videos_streamed(
        self,
        items: T.Sequence[T.Tuple[str, np.ndarray]],
        with_keypoints: bool = False,
        upload_threads: int = 2,
        max_stream_frames: int = 2048,
        fetch_arrays: bool = True,
    ) -> T.Tuple[
        T.Dict[str, T.Optional[T.Dict[str, np.ndarray]]],
        T.Dict[str, T.Optional[T.Dict[str, np.ndarray]]],
    ]:
        """Cross-video streamed extraction: ALL frames of a same-resolution
        video group run through detect -> mesh [-> pose] as one chunked
        device stream, then results split back per video.

        Per-video semantics are preserved exactly (single-person ratio test,
        keypoint validity); what changes is the execution shape — full
        ``frame_batch`` chunks regardless of video length, one host fetch
        per stage per super-batch instead of per video. The reference
        processes one video at a time with a per-frame detector loop
        (ref ``extract_mesh.py:200-236``).

        ``fetch_arrays=False`` keeps the [T, D]-sized outputs ON DEVICE
        (per-video dicts hold jax arrays; only the tiny single/valid masks
        are fetched to compute the keep indices) — the feed for the
        device-resident bank assembly (``data/device_bank.py``), where the
        features never round-trip through the ~55 MB/s tunnel.

        Returns ``(mesh_by_name, kp_by_name)``; a rejected video maps to
        None in both.
        """
        import concurrent.futures

        mesh_by_name: T.Dict[str, T.Optional[T.Dict[str, np.ndarray]]] = {}
        kp_by_name: T.Dict[str, T.Optional[T.Dict[str, np.ndarray]]] = {}
        groups: T.Dict[T.Tuple[int, int], T.List[T.Tuple[str, np.ndarray]]] = {}
        for name, frames in items:
            groups.setdefault(tuple(frames.shape[1:3]), []).append(
                (name, frames)
            )

        pool = concurrent.futures.ThreadPoolExecutor(max_workers=upload_threads)
        try:
            for (H, W), group in groups.items():
                # super-batches bound device memory (f32 stream + stages)
                batches: T.List[T.List[T.Tuple[str, np.ndarray]]] = [[]]
                nf = 0
                for name, frames in group:
                    if nf + frames.shape[0] > max_stream_frames and batches[-1]:
                        batches.append([])
                        nf = 0
                    batches[-1].append((name, frames))
                    nf += frames.shape[0]
                for batch in batches:
                    self._stream_one_batch(
                        batch, H, W, with_keypoints, pool,
                        mesh_by_name, kp_by_name,
                        fetch_arrays=fetch_arrays,
                    )
        finally:
            pool.shutdown(wait=True)
        return mesh_by_name, kp_by_name

    def _stream_one_batch(
        self, batch, H, W, with_keypoints, pool, mesh_by_name, kp_by_name,
        fetch_arrays: bool = True,
    ) -> None:
        names = [n for n, _ in batch]
        lengths = [f.shape[0] for _, f in batch]
        devs = list(pool.map(lambda nf: self._upload_frames(nf[1]), batch))
        stream = jnp.concatenate(devs, axis=0) if len(devs) > 1 else devs[0]
        wh = (jnp.float32(W), jnp.float32(H))

        box_mesh, box_pose, single, present = self._detect_stage(
            stream, wh, with_keypoints
        )
        out = self._batched(
            lambda f, b: self._mesh_forward(
                self.params["vit"], self.params["head"], f, b
            ),
            stream,
            box_mesh,
            fetch=False,
        )
        if with_keypoints:
            kps134, sc134 = self._batched(
                lambda f, b: self._pose_forward(self.params["pose"], f, b, wh),
                stream,
                box_pose,
                fetch=False,
            )
            kp120, kvalid = self._kp_post(kps134, sc134, wh)
            if fetch_arrays:
                kp120 = np.asarray(kp120)
            # the masks are tiny and drive host-side keep-index construction
            # either way; only the [T, D]-sized arrays stay device-resident
            # in the no-fetch mode
            kvalid = self._kp_frame_mask(kvalid, present)

        single_np = np.asarray(single)
        if fetch_arrays:
            out = jax.tree_util.tree_map(np.asarray, out)
        offs = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
        for i, name in enumerate(names):
            lo, hi = offs[i], offs[i + 1]
            s = single_np[lo:hi]
            if self.cfg.keep_all_frames:
                s = np.ones_like(s, dtype=bool)
            if s.sum() == 0 or s.mean() < (
                0.0 if self.cfg.keep_all_frames else self.cfg.min_single_ratio
            ):
                mesh_by_name[name] = None
                kp_by_name[name] = None
                continue
            keep = np.where(s)[0]
            mesh_by_name[name] = {
                "pose": out["body_pose"][lo:hi][keep],
                "betas": out["betas"][lo:hi][keep],
                "global_orient": out["global_orient"][lo:hi][keep],
                "vit": out["token_out"][lo:hi][keep],
                "frame_idx": keep.astype(np.int32),
            }
            if with_keypoints:
                v = kvalid[lo:hi]
                if self.cfg.keep_all_frames:
                    v = np.ones_like(v, dtype=bool)
                kp_by_name[name] = {"kp120": kp120[lo:hi], "valid": v}
            else:
                kp_by_name[name] = None

    def process_video(self, frames: np.ndarray) -> T.Optional[T.Dict[str, np.ndarray]]:
        """Mesh extraction for one video (ref ``mesh_generator.process_video``).

        ``frames``: [T, H, W, 3] uint8 RGB. Returns dict of per-valid-frame
        arrays + ``frame_idx`` or None if the video fails the single-person
        ratio test.
        """
        mesh, _ = self.process_video_full(frames, with_keypoints=False)
        return mesh

    def process_video_keypoints(self, frames: np.ndarray) -> T.Dict[str, np.ndarray]:
        """Whole-body keypoints for one video (ref ``process_video.py``).

        Returns ``{"kp120": [T,120], "valid": [T]}``; in bug-compat mode the
        caller saves only valid rows (reference frame-dropping)."""
        Tn, H, W, _ = frames.shape
        frames_f32 = self._upload_frames(frames)
        wh = (jnp.float32(W), jnp.float32(H))
        _, box_pose, _single, present = self._batched(
            lambda f: self._detect(self.params["det"], f, wh),
            frames_f32,
            fetch=False,
        )
        kps134, sc134 = self._batched(
            lambda f, b: self._pose_forward(self.params["pose"], f, b, wh),
            frames_f32,
            box_pose,
            fetch=False,
        )

        kp120, valid = self._kp_post(kps134, sc134, wh)
        # per-frame keep rule: see _kp_frame_mask (upstream mode keeps every
        # frame via the full-frame fallback; visibility never gates)
        valid = self._kp_frame_mask(valid, present)
        if self.cfg.keep_all_frames:
            valid = np.ones_like(valid, dtype=bool)
        return {"kp120": np.asarray(kp120), "valid": valid}

    # ------------------------------------------------------------------
    def _write_run_config(self, log_dir: str, num_hosts: int = 1,
                          host_id: int = 0) -> str:
        """Publish the run's score-provenance knobs to
        ``<log_dir>/RUN_CONFIG[.hostIofN].json`` (atomic, per-host).

        The reference records nothing about how features were produced; the
        box-sensitivity study (PARITY.md) shows detector family and crop
        preprocessing ARE part of the feature definition, so each extraction
        run records them — a downstream scorer (or a later resume with a
        different config) can tell reference-parity features from fast-mode
        ones instead of silently mixing provenances."""
        cfg = self.cfg
        name = (
            f"RUN_CONFIG.host{host_id}of{num_hosts}.json"
            if num_hosts > 1 else "RUN_CONFIG.json"
        )
        os.makedirs(log_dir, exist_ok=True)
        path = os.path.join(log_dir, name)
        payload = {
            "parity": cfg.is_parity(),
            "mesh_detector": cfg.mesh_detector,
            "preproc": cfg.preproc,
            "matmul_precision": cfg.matmul_precision,
            "param_dtype": cfg.param_dtype,
            "kp_bug_compat": cfg.kp_bug_compat,
            "vitdet_antialias": cfg.vitdet_antialias,
            "pose_fullframe_fallback": cfg.pose_fullframe_fallback,
            "rcnn": dataclasses.asdict(cfg.rcnn),
            "keep_all_frames": cfg.keep_all_frames,
        }
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
        os.replace(tmp, path)
        return path

    def run_tree(
        self,
        video_tree: str,
        out_root: str,
        log_dir: str,
        kp_out_root: T.Optional[str] = None,
        actions: T.Optional[T.List[str]] = None,
        frame_loader: T.Optional[T.Callable[[str], np.ndarray]] = None,
        prefetch: int = 2,
        stream_group: int = 8,
        num_hosts: int = 1,
        host_id: int = 0,
    ) -> T.Dict[str, int]:
        """Resumable extraction over ``<video_tree>/<action>/*.{mp4,avi,mkv}``
        (ref ``extract_mesh.py:150-241``).

        ``num_hosts``/``host_id``: multi-pod sweep (SURVEY §5.8) — this
        process extracts only its strided shard of each action's sorted
        video list (``parallel.shard_items``; assignment is progress-
        independent, so resume is stable), recording to per-host ledgers
        (``<action>.host<I>of<N>.json``). Outputs are per-video npz trees,
        so no merge step is needed — hosts can share one output root.

        Decode AND upload run ``prefetch`` videos ahead on host threads (the
        native libav decoder when built, OpenCV otherwise; the upload ships
        uint8 and casts on device) so the device never waits on demux+decode
        and the ~55 MB/s tunnel transfer overlaps the previous video's
        compute — the reference decodes synchronously per video
        (ref ``extract_mesh.py:200-209``). Set ``prefetch=0`` to disable.

        With ``stream_group > 1`` (and prefetch on), videos run through the
        device stages as cross-video streamed batches
        (:meth:`process_videos_streamed`) with the next group decoding
        ahead; per-video semantics (ledger records, fault isolation via a
        per-video fallback) are preserved. ``stream_group=1`` forces the
        per-video path.
        """
        import concurrent.futures

        from ..utils.io import load_all_frames

        self._write_run_config(log_dir, num_hosts=num_hosts, host_id=host_id)
        loader = frame_loader or load_all_frames

        def load_and_upload(path):
            return self._upload_frames(loader(path))
        all_actions = sorted(
            d for d in os.listdir(video_tree)
            if os.path.isdir(os.path.join(video_tree, d))
        )
        if actions:
            missing = [a for a in actions if a not in all_actions]
            if missing:
                raise ValueError(f"Actions not found under {video_tree}: {missing}")
            all_actions = actions

        counts = {"single": 0, "not_single": 0, "errors": 0, "skipped": 0}
        exts = (".mp4", ".avi", ".mkv", ".npy")
        pool = (
            concurrent.futures.ThreadPoolExecutor(max_workers=max(prefetch, 1))
            if prefetch > 0
            else None
        )
        for action in all_actions:
            action_dir = os.path.join(video_tree, action)
            ledger_name = (
                f"{action}.host{host_id}of{num_hosts}"
                if num_hosts > 1
                else action
            )
            ledger = ResumableLedger(log_dir, ledger_name)
            processed = ledger.processed()
            videos = sorted(
                f for f in os.listdir(action_dir) if f.lower().endswith(exts)
            )
            if num_hosts > 1:
                from ..parallel import shard_items

                videos = shard_items(videos, host_id, num_hosts)
            pending = []
            for video in videos:
                if video in processed:
                    counts["skipped"] += 1
                else:
                    pending.append(video)
            wk = kp_out_root is not None

            def save_and_record(video: str, mesh, kp) -> None:
                stem = os.path.splitext(video)[0]
                if mesh is not None:
                    save_video_npz(
                        out_root,
                        os.path.join(action, stem),
                        mesh["pose"],
                        mesh["betas"],
                        mesh["global_orient"],
                        mesh["vit"],
                        mesh["frame_idx"],
                        meta={"action": action, "video": video},
                    )
                    if kp is not None:
                        rows = (
                            kp["kp120"][kp["valid"]]
                            if self.cfg.kp_bug_compat
                            else kp["kp120"]
                        )
                        kp_dir = os.path.join(kp_out_root, action, stem)
                        os.makedirs(kp_dir, exist_ok=True)
                        kp_path = os.path.join(kp_dir, "keypoints.npy")
                        tmp = f"{kp_path}.{os.getpid()}.tmp.npy"
                        np.save(tmp, rows.astype(np.float32))
                        os.replace(tmp, kp_path)  # atomic publish
                    ledger.record(video, "single")
                    counts["single"] += 1
                else:
                    ledger.record(video, "not_single")
                    counts["not_single"] += 1

            if pool is not None and stream_group > 1:
                # cross-video streamed batches, next group decoding ahead
                g = stream_group
                chunks = [pending[lo : lo + g] for lo in range(0, len(pending), g)]
                futures = {}

                def submit(chunk):
                    for v in chunk:
                        futures[v] = pool.submit(
                            load_and_upload, os.path.join(action_dir, v)
                        )

                if chunks:
                    submit(chunks[0])
                for gi, chunk in enumerate(chunks):
                    if gi + 1 < len(chunks):
                        submit(chunks[gi + 1])
                    items = []
                    for v in chunk:
                        try:
                            items.append((v, futures.pop(v).result()))
                        except Exception as e:  # decode fault, per video
                            ledger.record(v, "errors", str(e))
                            counts["errors"] += 1
                    if not items:
                        continue
                    try:
                        mesh_by, kp_by = self.process_videos_streamed(
                            items, with_keypoints=wk
                        )
                        for v, _ in items:
                            try:
                                save_and_record(v, mesh_by[v], kp_by[v])
                            except Exception as e:
                                ledger.record(v, "errors", str(e))
                                counts["errors"] += 1
                    except Exception:
                        # streamed batch failed: per-video fallback keeps the
                        # reference's fault isolation (ref :232-236)
                        for v, fd in items:
                            try:
                                mesh, kp = self.process_video_full(
                                    None, with_keypoints=wk, frames_dev=fd
                                )
                                save_and_record(v, mesh, kp)
                            except Exception as e:
                                ledger.record(v, "errors", str(e))
                                counts["errors"] += 1
                continue_per_video = False
            else:
                continue_per_video = True

            if continue_per_video:
                futures = {}
                if pool is not None:
                    for video in pending[:prefetch]:
                        futures[video] = pool.submit(
                            load_and_upload, os.path.join(action_dir, video)
                        )
                for i, video in enumerate(pending):
                    try:
                        frames = frames_dev = None
                        if pool is not None:
                            for nxt in pending[i + 1 : i + 1 + prefetch]:
                                if nxt not in futures:
                                    futures[nxt] = pool.submit(
                                        load_and_upload,
                                        os.path.join(action_dir, nxt),
                                    )
                            frames_dev = futures.pop(video).result()
                        else:
                            frames = loader(os.path.join(action_dir, video))
                        mesh, kp = self.process_video_full(
                            frames, with_keypoints=wk, frames_dev=frames_dev
                        )
                        save_and_record(video, mesh, kp)
                    except Exception as e:  # per-video fault isolation
                        ledger.record(video, "errors", str(e))
                        counts["errors"] += 1
        if pool is not None:
            pool.shutdown(wait=True)
        return counts


def main(argv: T.Optional[T.List[str]] = None) -> None:
    import argparse

    p = argparse.ArgumentParser(description="Batched mesh/keypoint extraction")
    p.add_argument("--videos", required=True, help="root of <action>/<video> tree")
    p.add_argument("--out-meshes", default="real_meshes")
    p.add_argument("--out-kps", default=None)
    p.add_argument("--log-dir", default="EXTRACTION_LOGS")
    p.add_argument("--action", default=None)
    p.add_argument("--bug-compat", dest="bug_compat", action="store_true", default=True,
                   help="reproduce the reference's keypoint frame-dropping "
                        "(mesh/kp misalignment quirk) — see core.config.BugCompat")
    p.add_argument("--no-bug-compat", dest="bug_compat", action="store_false")
    p.add_argument("--stream-group", type=int, default=8,
                   help="videos per cross-video streamed device batch "
                        "(1 = per-video path)")
    p.add_argument("--prefetch", type=int, default=2,
                   help="decode+upload threads running ahead (0 = off)")
    p.add_argument("--parity", action="store_true",
                   help="ONE-FLAG reference-reproduction preset "
                        "(ExtractorConfig.parity()): R-CNN X101-FPN mesh "
                        "boxes with the exact RCNNConfig, upstream-exact "
                        "preprocessing on every input path, matmul 'high', "
                        "f32 params, bug-compat on — overrides "
                        "--mesh-detector/--rcnn-fast/--preproc")
    p.add_argument("--mesh-detector", choices=["yolox", "rcnn"], default="yolox",
                   help="mesh-path box provenance: 'rcnn' = Faster R-CNN "
                        "X101-FPN (the reference's detector family, ref "
                        "mesh_generator.py:69-74); 'yolox' = shared fast "
                        "detector (see PARITY.md box-sensitivity study)")
    p.add_argument("--preproc", choices=["upstream", "legacy"], default="upstream",
                   help="input preprocessing: 'upstream' (default) = the "
                        "published pipelines the converted weights expect "
                        "(ViTDetDataset crops / mmpose top-down warp / "
                        "YOLOX letterbox); 'legacy' = rounds 1-3 home-grown "
                        "geometry, for continuity comparison only")
    p.add_argument("--tokenhmr-ckpt", default=None,
                   help="TokenHMR checkpoint (tokenhmr_model_latest.ckpt / "
                        ".pt / .npz): ViT-H backbone + SMPL token head")
    p.add_argument("--dwpose-ckpt", default=None,
                   help="DWPose wholebody pose net, mmpose dwpose_l layout "
                        "(.pth / .npz)")
    p.add_argument("--yolox-ckpt", default=None,
                   help="DWPose person detector, Megvii yolox_l layout "
                        "(.pth / .npz)")
    p.add_argument("--rcnn-ckpt", default=None,
                   help="Faster R-CNN X101-FPN detectron2 checkpoint (.pkl "
                        "/ .pt); implies --mesh-detector rcnn")
    p.add_argument("--rcnn-fast", action="store_true",
                   help="R-CNN throughput preset (RCNNConfig.fast(): bf16 "
                        "ROIAlign pyramid + window 32) — measured 29.4 vs "
                        "18.4 frames/s, NOT parity-exact (BENCH_NOTES)")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="shard every extraction stage data-parallel over an "
                        "N-device mesh (frame batch on the 'data' axis; "
                        "0 = single device)")
    p.add_argument("--num-hosts", type=int, default=1,
                   help="multi-pod sweep (SURVEY §5.8): total hosts sharding "
                        "each action's video list; outputs are per-video, so "
                        "hosts may share one output root (no merge step)")
    p.add_argument("--host-id", type=int, default=-1,
                   help="this host's shard index; -1 = jax.process_index()")
    from ..utils.cli import add_distributed_args, maybe_initialize_distributed

    add_distributed_args(p)
    args = p.parse_args(argv)
    maybe_initialize_distributed(args)

    from ..models.rcnn import RCNNConfig

    if args.parity and args.rcnn_fast:
        p.error("--parity pins the exact RCNNConfig; drop --rcnn-fast")
    if args.rcnn_fast and args.mesh_detector != "rcnn" and not args.rcnn_ckpt:
        p.error("--rcnn-fast requires the R-CNN mesh detector "
                "(--mesh-detector rcnn or --rcnn-ckpt)")

    mesh = None
    if args.mesh_data > 0:
        import jax

        if args.num_hosts > 1 and jax.process_count() > 1:
            # per-host video shards feed the mesh DIFFERENT frames; a
            # cross-process mesh requires identical inputs on every process
            p.error(
                "--num-hosts video sharding cannot combine with a "
                "cross-process --mesh-data mesh: run one single-process "
                "CLI per host (the DCN tier)"
            )
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh_data, 1)

    if args.parity:
        if args.rcnn_fast:
            p.error("--parity pins the exact RCNNConfig; drop --rcnn-fast")
        ex_cfg = ExtractorConfig.parity(kp_bug_compat=args.bug_compat)
    else:
        ex_cfg = ExtractorConfig(
            kp_bug_compat=args.bug_compat,
            mesh_detector=args.mesh_detector,
            preproc=args.preproc,
            rcnn=RCNNConfig.fast() if args.rcnn_fast else None,
        )
    if not ex_cfg.is_parity():
        # loud, once, on stderr: fast-mode features are NOT the reference's
        # feature definition (PARITY.md box-sensitivity study); the one-flag
        # fix is --parity. Provenance is also recorded in RUN_CONFIG.json.
        import sys as _sys

        print(
            "[extract] throughput mode (mesh boxes: "
            f"{ex_cfg.mesh_detector}, preproc: {ex_cfg.preproc}) — NOT the "
            "reference-reproduction configuration; pass --parity to "
            "reproduce reference scores (provenance recorded in "
            f"{args.log_dir}/RUN_CONFIG.json)",
            file=_sys.stderr,
        )
    ex = Extractor.from_checkpoints(
        ex_cfg,
        mesh=mesh,
        tokenhmr=args.tokenhmr_ckpt,
        dwpose=args.dwpose_ckpt,
        yolox=args.yolox_ckpt,
        rcnn=args.rcnn_ckpt,
    )
    host_id = args.host_id
    if args.num_hosts > 1 and host_id < 0:
        import jax

        # only trust process_index() when a distributed runtime with the
        # matching process count is actually up — otherwise every host would
        # silently resolve to 0 and all extract the same shard
        if jax.process_count() != args.num_hosts:
            p.error(
                f"--host-id -1 needs jax.process_count() == --num-hosts "
                f"(have {jax.process_count()} vs {args.num_hosts}); pass "
                "--host-id explicitly or initialize jax.distributed"
            )
        host_id = jax.process_index()
    counts = ex.run_tree(
        args.videos,
        args.out_meshes,
        args.log_dir,
        kp_out_root=args.out_kps,
        actions=[args.action] if args.action else None,
        prefetch=args.prefetch,
        stream_group=args.stream_group,
        num_hosts=args.num_hosts,
        host_id=max(host_id, 0),
    )
    print(counts)


if __name__ == "__main__":
    main()
