"""Extraction pipeline e2e: tiny networks on synthetic frame stacks, npz
contract, resumable ledgers, bug-compat keypoint frame dropping."""

import os

import numpy as np
import pytest

from video_gen_evals_tpu.models.detector import DetectorConfig
from video_gen_evals_tpu.models.pose2d import PoseNetConfig
from video_gen_evals_tpu.models.smpl_head import SMPLHeadConfig
from video_gen_evals_tpu.models.vit import ViTConfig
from video_gen_evals_tpu.pipelines.extract import Extractor, ExtractorConfig


def tiny_extractor(**kw) -> Extractor:
    cfg = ExtractorConfig(
        det=DetectorConfig(input_hw=(64, 64), depth=0.33, width=0.0625, max_detections=4),
        vit=ViTConfig(img_size=(32, 24), patch_size=8, embed_dim=32, depth=1, num_heads=4),
        head=SMPLHeadConfig(
            dim=32, context_dim=32, depth=1, heads=2, dim_head=8, mlp_dim=32,
            token_num=2, token_class_num=8, token_code_dim=4,
        ),
        pose=PoseNetConfig(
            input_hw=(32, 24), widen_factor=0.0625, deepen_factor=0.2,
            gau_dim=16, gau_s=8,
        ),
        frame_batch=8,
        min_single_ratio=0.0,   # random-weight detector: accept whatever it finds
        **kw,
    )
    return Extractor(cfg)


@pytest.fixture(scope="module")
def extractor():
    return tiny_extractor()


def test_process_video_contract(extractor, rng):
    frames = rng.integers(0, 255, size=(10, 48, 40, 3)).astype(np.uint8)
    out = extractor.process_video(frames)
    if out is None:
        pytest.skip("random detector found no single-person frames")
    Tv = out["frame_idx"].shape[0]
    assert 0 < Tv <= 10
    assert out["pose"].shape == (Tv, 23, 3, 3)
    assert out["betas"].shape == (Tv, 10)
    assert out["global_orient"].shape == (Tv, 1, 3, 3)
    assert out["vit"].shape == (Tv, 32)
    assert np.isfinite(out["vit"]).all()


def test_process_video_keypoints_contract(extractor, rng):
    frames = rng.integers(0, 255, size=(6, 48, 40, 3)).astype(np.uint8)
    kp = extractor.process_video_keypoints(frames)
    assert kp["kp120"].shape == (6, 120)
    assert kp["valid"].shape == (6,)
    assert kp["valid"].dtype == bool


def test_run_tree_resumable(extractor, rng, tmp_path):
    # synthetic "videos" as .npy frame stacks
    tree = tmp_path / "videos"
    for action in ("JumpingJack", "PushUps"):
        d = tree / action
        d.mkdir(parents=True)
        for i in range(2):
            frames = rng.integers(0, 255, size=(9, 48, 40, 3)).astype(np.uint8)
            np.save(d / f"v{i}.npy", frames)

    out_meshes = str(tmp_path / "meshes")
    out_kps = str(tmp_path / "kps")
    logs = str(tmp_path / "logs")
    counts1 = extractor.run_tree(
        str(tree), out_meshes, logs, kp_out_root=out_kps, frame_loader=np.load
    )
    assert counts1["single"] + counts1["not_single"] + counts1["errors"] == 4
    assert counts1["skipped"] == 0

    # every "single" video produced a valid npz per the extraction contract
    produced = []
    for action in ("JumpingJack", "PushUps"):
        d = os.path.join(out_meshes, action)
        if os.path.isdir(d):
            produced.extend(os.path.join(d, f) for f in os.listdir(d))
    assert len(produced) == counts1["single"]
    for p in produced:
        npz = np.load(p, allow_pickle=False)
        assert set(npz.files) >= {"pose", "betas", "global_orient", "vit", "frame_idx", "meta"}
        assert npz["pose"].shape[1:] == (23, 3, 3)

    # second run: everything skipped via ledgers (resume semantics)
    counts2 = extractor.run_tree(
        str(tree), out_meshes, logs, kp_out_root=out_kps, frame_loader=np.load
    )
    assert counts2["skipped"] == 4
    assert counts2["single"] == counts2["not_single"] == counts2["errors"] == 0

    # provenance record: every run publishes its score-affecting knobs
    import json

    with open(os.path.join(logs, "RUN_CONFIG.json")) as f:
        rc = json.load(f)
    assert rc["parity"] is False  # tiny fixture = yolox fast mode
    assert rc["mesh_detector"] == "yolox"
    assert rc["preproc"] == "upstream"
    assert "roi_dtype" in rc["rcnn"]


def test_run_tree_multi_host_shards_cover_tree(extractor, rng, tmp_path):
    """Multi-pod extraction (SURVEY §5.8): three hosts with disjoint strided
    video shards and per-host ledgers reproduce exactly the single-host
    output tree; per-host resume skips only that host's shard."""
    tree = tmp_path / "videos"
    for action in ("JumpingJack", "PushUps"):
        d = tree / action
        d.mkdir(parents=True)
        for i in range(5 if action == "JumpingJack" else 2):
            frames = rng.integers(0, 255, size=(9, 48, 40, 3)).astype(np.uint8)
            np.save(d / f"v{i}.npy", frames)

    def produced_set(root):
        out = set()
        for action in ("JumpingJack", "PushUps"):
            d = os.path.join(root, action)
            if os.path.isdir(d):
                out.update((action, f) for f in os.listdir(d))
        return out

    single_meshes = str(tmp_path / "meshes_single")
    extractor.run_tree(
        str(tree), single_meshes, str(tmp_path / "logs_single"),
        frame_loader=np.load,
    )

    sharded_meshes = str(tmp_path / "meshes_sharded")
    logs = str(tmp_path / "logs_sharded")  # shared log dir: per-host ledgers
    counts = [
        extractor.run_tree(
            str(tree), sharded_meshes, logs, frame_loader=np.load,
            num_hosts=3, host_id=i,
        )
        for i in range(3)
    ]
    assert sum(c["single"] + c["not_single"] + c["errors"] for c in counts) == 7
    assert all(c["skipped"] == 0 for c in counts)
    assert produced_set(sharded_meshes) == produced_set(single_meshes)

    # per-host provenance records (never clobber each other in a shared dir)
    for i in range(3):
        assert os.path.exists(os.path.join(logs, f"RUN_CONFIG.host{i}of3.json"))

    # per-host ledger files exist and partition the videos disjointly
    import json

    owned = []
    for i in range(3):
        mine = set()
        for action in ("JumpingJack", "PushUps"):
            for kind in ("single", "not_single", "errors"):
                p = os.path.join(logs, kind, f"{action}.host{i}of3.json")
                if os.path.exists(p):
                    with open(p) as f:
                        data = json.load(f)
                    mine.update((action, v) for v in data)
        owned.append(mine)
    union = set().union(*owned)
    assert len(union) == 7
    assert sum(len(m) for m in owned) == 7  # disjoint

    # resume: host 0 re-run skips exactly its own shard
    again = extractor.run_tree(
        str(tree), sharded_meshes, logs, frame_loader=np.load,
        num_hosts=3, host_id=0,
    )
    assert again["skipped"] == len(owned[0])
    assert again["single"] == again["not_single"] == again["errors"] == 0


def test_run_tree_error_isolation(extractor, tmp_path):
    tree = tmp_path / "videos"
    d = tree / "JumpingJack"
    d.mkdir(parents=True)
    np.save(d / "bad.npy", np.zeros(3, np.float32))  # wrong shape -> error

    counts = extractor.run_tree(
        str(tree), str(tmp_path / "m"), str(tmp_path / "l"), frame_loader=np.load
    )
    assert counts["errors"] == 1
    import json

    with open(tmp_path / "l" / "errors" / "JumpingJack.json") as f:
        errs = json.load(f)
    assert "bad.npy" in errs


def test_rcnn_mesh_detector_mode(rng):
    """mesh_detector='rcnn': Faster R-CNN boxes feed the mesh crops and the
    single-person filter (ref mesh_generator.py:69-74 provenance); the pose
    branch keeps YOLOX boxes. Contracts must match the yolox mode exactly."""
    from video_gen_evals_tpu.models.rcnn import RCNNConfig

    ex = tiny_extractor(
        mesh_detector="rcnn",
        rcnn=RCNNConfig.small(),
        keep_all_frames=True,   # random weights: exercise the full path
    )
    assert "rcnn" in ex.params
    frames = rng.integers(0, 255, size=(6, 48, 40, 3)).astype(np.uint8)
    mesh, kp = ex.process_video_full(frames, with_keypoints=True)
    Tv = mesh["frame_idx"].shape[0]
    assert Tv == 6
    assert mesh["pose"].shape == (Tv, 23, 3, 3)
    assert mesh["vit"].shape == (Tv, 32)
    assert np.isfinite(mesh["vit"]).all()
    assert kp["kp120"].shape == (6, 120)

    # streamed path agrees with the per-video path (same detector stages)
    mesh_by, kp_by = ex.process_videos_streamed(
        [("v0", frames)], with_keypoints=True
    )
    np.testing.assert_allclose(
        mesh_by["v0"]["vit"], mesh["vit"], rtol=0, atol=1e-5
    )
    np.testing.assert_array_equal(kp_by["v0"]["valid"], kp["valid"])


def test_rcnn_single_person_filter_semantics():
    """The rcnn-mode video accept/reject rule is the reference's: exactly
    one person box > 0.5 per frame, >= min_single_ratio of frames."""
    import jax.numpy as jnp

    from video_gen_evals_tpu.models.rcnn import RCNNConfig

    ex = tiny_extractor(mesh_detector="rcnn", rcnn=RCNNConfig.small())
    # patch the rcnn detect stage to a deterministic stub: frame i has
    # (i % 3) qualifying person boxes
    def fake_detect(params, frames_f32):
        B = frames_f32.shape[0]
        idx = jnp.arange(B)
        single = (idx % 3) == 1
        present = (idx % 3) >= 1
        box = jnp.tile(jnp.asarray([[1.0, 2.0, 30.0, 40.0]]), (B, 1))
        return box, single, present

    ex._detect_rcnn = fake_detect
    frames = np.zeros((9, 48, 40, 3), np.uint8)
    # 3 of 9 frames single -> ratio 1/3
    ex.cfg.min_single_ratio = 0.5
    assert ex.process_video(frames) is None
    ex.cfg.min_single_ratio = 0.3
    out = ex.process_video(frames)
    assert out is not None
    np.testing.assert_array_equal(out["frame_idx"], [1, 4, 7])


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 8, reason="needs 8 virtual devices"
)
def test_mesh_extraction_matches_single_device(rng):
    """Data-parallel extraction over a dp8 mesh (frame batch sharded over
    the ``data`` axis, params replicated) reproduces the single-device
    outputs on identical params and frames. 15 frames (NOT divisible by 8)
    exercises the unconstrained whole-video upload + kp_post paths."""
    from video_gen_evals_tpu.parallel.mesh import make_mesh

    # keep_all_frames: the random-weight detector may find zero single-person
    # frames, which would reject the video on both paths and test nothing
    import jax

    base = tiny_extractor(keep_all_frames=True)
    ex_m = Extractor(base.cfg, params=base.params, mesh=make_mesh(8, 1))
    # params must be placed onto the mesh ONCE at construction (replicated),
    # not re-broadcast per stage call
    leaf = jax.tree_util.tree_leaves(ex_m.params)[0]
    assert leaf.sharding.is_fully_replicated
    assert len(leaf.sharding.device_set) == 8
    frames = rng.integers(0, 255, size=(15, 48, 40, 3)).astype(np.uint8)

    base_mesh, base_kp = base.process_video_full(frames, with_keypoints=True)
    got_mesh, got_kp = ex_m.process_video_full(frames, with_keypoints=True)

    assert base_mesh is not None and got_mesh is not None
    assert set(got_mesh) == set(base_mesh)
    for k in base_mesh:
        np.testing.assert_allclose(
            got_mesh[k], base_mesh[k], atol=5e-5, err_msg=k
        )
    np.testing.assert_array_equal(got_kp["valid"], base_kp["valid"])
    np.testing.assert_allclose(got_kp["kp120"], base_kp["kp120"], atol=1e-4)


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 8, reason="needs 8 virtual devices"
)
def test_mesh_extraction_rcnn_matches_single_device(rng):
    """dp8-mesh equivalence for the R-CNN detect path: the sharded
    detect_rcnn + mesh stages reproduce single-device boxes/outputs."""
    from video_gen_evals_tpu.models.rcnn import RCNNConfig
    from video_gen_evals_tpu.parallel.mesh import make_mesh

    base = tiny_extractor(
        mesh_detector="rcnn", rcnn=RCNNConfig.small(),
        keep_all_frames=True, rcnn_frame_batch=8,
    )
    ex_m = Extractor(base.cfg, params=base.params, mesh=make_mesh(8, 1))
    frames = rng.integers(0, 255, size=(8, 48, 40, 3)).astype(np.uint8)

    base_mesh, _ = base.process_video_full(frames)
    got_mesh, _ = ex_m.process_video_full(frames)
    assert base_mesh is not None and got_mesh is not None
    for k in base_mesh:
        np.testing.assert_allclose(
            got_mesh[k], base_mesh[k], atol=5e-5, err_msg=k
        )


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 8, reason="needs 8 virtual devices"
)
def test_mesh_requires_divisible_frame_batch():
    """A mesh whose data size does not divide frame_batch fails up front
    with a clear message, not deep inside a sharding error."""
    from video_gen_evals_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="frame_batch.*divisible"):
        tiny_extractor_mesh = ExtractorConfig(
            det=DetectorConfig(input_hw=(64, 64), depth=0.33, width=0.0625,
                               max_detections=4),
            vit=ViTConfig(img_size=(32, 24), patch_size=8, embed_dim=32,
                          depth=1, num_heads=4),
            head=SMPLHeadConfig(dim=32, context_dim=32, depth=1, heads=2,
                                dim_head=8, mlp_dim=32, token_num=2,
                                token_class_num=8, token_code_dim=4),
            pose=PoseNetConfig(input_hw=(32, 24), widen_factor=0.0625,
                               deepen_factor=0.2, gau_dim=16, gau_s=8),
            frame_batch=12,
        )
        Extractor(tiny_extractor_mesh, mesh=make_mesh(8, 1))


def test_parity_preset_knobs():
    """ExtractorConfig.parity() pins every reference-reproduction knob
    (VERDICT round-3 #2): R-CNN mesh boxes with the exact (non-fast)
    RCNNConfig, upstream preprocessing, 'high' matmuls, f32 params,
    bug-compat keypoint dropping, anti-aliased ViTDet crops, the
    full-frame pose fallback."""
    from video_gen_evals_tpu.models.rcnn import RCNNConfig

    cfg = ExtractorConfig.parity()
    assert cfg.mesh_detector == "rcnn"
    assert cfg.preproc == "upstream"
    assert cfg.matmul_precision == "high"
    assert cfg.param_dtype == "float32"
    assert cfg.kp_bug_compat is True
    assert cfg.vitdet_antialias is True
    assert cfg.pose_fullframe_fallback is True
    assert cfg.rcnn == RCNNConfig.x101_32x8d()
    assert cfg.rcnn != RCNNConfig.fast()
    # published DWPose detector thresholds
    assert (cfg.pose_det_prefilter, cfg.pose_det_iou,
            cfg.pose_det_score_thresh) == (0.1, 0.45, 0.3)
    # overrides still thread through
    assert ExtractorConfig.parity(frame_batch=16).frame_batch == 16
    # provenance predicate: the preset IS parity; every fast-mode knob
    # flips it off
    assert cfg.is_parity()
    assert ExtractorConfig.parity(matmul_precision="highest").is_parity()
    assert not ExtractorConfig().is_parity()                    # yolox mode
    assert not ExtractorConfig.parity(preproc="legacy").is_parity()
    assert not ExtractorConfig.parity(param_dtype="bfloat16").is_parity()
    assert not ExtractorConfig.parity(
        rcnn=RCNNConfig.fast()).is_parity()
    assert not ExtractorConfig.parity(
        matmul_precision="default").is_parity()


def test_pose_fullframe_fallback_keeps_frames(rng):
    """Upstream mode: a frame with NO detected person still yields a
    keypoint row (onnxpose substitutes the [0,0,W,H] box), so no frame is
    ever dropped — the reference's actual behavior. With the fallback off,
    the no-person frame is dropped."""
    import jax.numpy as jnp

    ex = tiny_extractor()

    def no_person_detect(params, frames_f32, frame_wh):
        B = frames_f32.shape[0]
        boxes = jnp.tile(jnp.asarray([[4.0, 4.0, 30.0, 40.0]], jnp.float32), (B, 1))
        present = jnp.arange(B) % 2 == 0   # odd frames: no person
        fb = jnp.asarray([0.0, 0.0, 40.0, 48.0], jnp.float32)
        box_pose = jnp.where(present[:, None], boxes, fb)
        return boxes, box_pose, present, present

    ex._detect = no_person_detect
    frames = rng.integers(0, 255, size=(6, 48, 40, 3)).astype(np.uint8)
    kp = ex.process_video_keypoints(frames)
    assert kp["valid"].all()          # fallback: every frame kept

    ex2 = tiny_extractor(pose_fullframe_fallback=False)
    ex2._detect = no_person_detect
    kp2 = ex2.process_video_keypoints(frames)
    np.testing.assert_array_equal(kp2["valid"], np.arange(6) % 2 == 0)


def test_upstream_detect_emits_fullframe_fallback_box(rng):
    """The real jitted detect stage in upstream mode: with a random-weight
    detector that finds nothing, the pose box is exactly [0, 0, W, H]."""
    import jax.numpy as jnp

    ex = tiny_extractor()
    frames = rng.integers(0, 255, size=(4, 48, 40, 3)).astype(np.uint8)
    f32 = ex._upload_frames(frames)
    wh = (jnp.float32(40), jnp.float32(48))
    _bm, bp, _single, present = ex._detect(ex.params["det"], f32, wh)
    present = np.asarray(present)
    bp = np.asarray(bp)
    for i in range(4):
        if not present[i]:
            np.testing.assert_allclose(bp[i], [0.0, 0.0, 40.0, 48.0])


def test_legacy_preproc_mode_still_works(rng):
    ex = tiny_extractor(preproc="legacy")
    frames = rng.integers(0, 255, size=(6, 48, 40, 3)).astype(np.uint8)
    mesh, kp = ex.process_video_full(frames, with_keypoints=True)
    if mesh is not None:
        assert mesh["vit"].shape[1] == 32
        assert kp["kp120"].shape == (6, 120)


def test_bad_preproc_rejected():
    with pytest.raises(ValueError, match="preproc"):
        ExtractorConfig(preproc="BENCH")
