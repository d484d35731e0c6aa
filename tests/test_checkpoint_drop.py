"""`Extractor.from_checkpoints`: published-checkpoint loading end to end.

Builds REAL torch checkpoint files at tiny geometry in each published
container convention — Lightning `{"state_dict": {backbone.*, smpl_head.*}}`
(TokenHMR, ref ``mesh_generator.py:35-46``), mmpose `{"state_dict": ...}`,
Megvii `{"model": ...}`, and a d2-named `.npz` — drops them on the CLI
surface, and checks the Extractor comes up with exactly the converted
weights and a working pipeline.
"""

import dataclasses

import numpy as np
import jax
import pytest

torch = pytest.importorskip("torch")

from video_gen_evals_tpu.models.detector import DetectorConfig
from video_gen_evals_tpu.models.pose2d import PoseNetConfig
from video_gen_evals_tpu.models.rcnn import RCNNConfig
from video_gen_evals_tpu.models.smpl_head import SMPLHeadConfig
from video_gen_evals_tpu.models.vit import ViTConfig
from video_gen_evals_tpu.pipelines.extract import Extractor, ExtractorConfig
from video_gen_evals_tpu.pipelines.weights import (
    load_torch_state_dict,
    sub_state_dict,
)


def _vit_sd(cfg: ViTConfig, rng) -> dict:
    """Shape-faithful ViTPose/timm-named state_dict with random values."""
    d, mlp = cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio)
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(d, 3, cfg.patch_size, cfg.patch_size)),
        "patch_embed.proj.bias": rng.normal(size=d),
        "pos_embed": rng.normal(size=(1, cfg.num_patches, d)),
        "norm.weight": rng.normal(size=d),
        "norm.bias": rng.normal(size=d),
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        for k in ("norm1", "norm2"):
            sd[f"{b}.{k}.weight"] = rng.normal(size=d)
            sd[f"{b}.{k}.bias"] = rng.normal(size=d)
        sd[f"{b}.attn.qkv.weight"] = rng.normal(size=(3 * d, d))
        sd[f"{b}.attn.qkv.bias"] = rng.normal(size=3 * d)
        sd[f"{b}.attn.proj.weight"] = rng.normal(size=(d, d))
        sd[f"{b}.attn.proj.bias"] = rng.normal(size=d)
        sd[f"{b}.mlp.fc1.weight"] = rng.normal(size=(mlp, d))
        sd[f"{b}.mlp.fc1.bias"] = rng.normal(size=mlp)
        sd[f"{b}.mlp.fc2.weight"] = rng.normal(size=(d, mlp))
        sd[f"{b}.mlp.fc2.bias"] = rng.normal(size=d)
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def _tiny_cfg() -> ExtractorConfig:
    return ExtractorConfig(
        det=DetectorConfig(input_hw=(64, 64), depth=0.33, width=0.0625, max_detections=4),
        vit=ViTConfig(img_size=(32, 24), patch_size=8, embed_dim=32, depth=1, num_heads=4),
        # classifier geometry DELIBERATELY wrong (token_class_num 16 vs the
        # checkpoint's 8): from_checkpoints must shape-infer the real one
        head=SMPLHeadConfig(
            dim=32, context_dim=32, depth=1, heads=2, dim_head=8, mlp_dim=32,
            token_num=2, token_class_num=16, token_code_dim=4,
        ),
        pose=PoseNetConfig(
            input_hw=(32, 24), widen_factor=0.0625, deepen_factor=0.2,
            gau_dim=16, gau_s=8,
        ),
        rcnn=RCNNConfig.small(),
        frame_batch=8,
        min_single_ratio=0.0,
    )


@pytest.fixture(scope="module")
def ckpt_files(tmp_path_factory):
    from test_rcnn import TorchRCNN, _randomize
    from test_rtmpose import TorchRTMPose
    from test_tokenhmr_decoder import TorchSMPLTokenHead
    from test_yolox import TorchYOLOX

    root = tmp_path_factory.mktemp("ckpts")
    cfg = _tiny_cfg()
    rng = np.random.default_rng(0)
    torch.manual_seed(0)

    head_cfg = dataclasses.replace(cfg.head, token_class_num=8)
    head_sd = {
        k: v.detach().numpy()
        for k, v in TorchSMPLTokenHead(head_cfg).state_dict().items()
    }
    light = {"state_dict": {}}
    for k, v in _vit_sd(cfg.vit, rng).items():
        light["state_dict"][f"backbone.{k}"] = torch.from_numpy(v)
    for k, v in head_sd.items():
        light["state_dict"][f"smpl_head.{k}"] = torch.from_numpy(np.asarray(v))
    light["state_dict"]["discriminator.blocks.0.weight"] = torch.zeros(3, 3)
    torch.save(light, root / "tokenhmr.ckpt")

    torch.save(
        {"state_dict": TorchRTMPose(cfg.pose).state_dict(), "meta": {"note": "x"}},
        root / "dwpose.pth",
    )
    torch.save(
        {"model": TorchYOLOX(cfg.det).state_dict(), "start_epoch": 3},
        root / "yolox.pth",
    )
    rcnn_sd = {
        k: v.numpy() for k, v in _randomize(TorchRCNN(cfg.rcnn)).state_dict().items()
    }
    np.savez(root / "rcnn.npz", **rcnn_sd)
    return root, cfg


def test_from_checkpoints_end_to_end(ckpt_files, rng):
    root, cfg = ckpt_files
    ex = Extractor.from_checkpoints(
        cfg,
        tokenhmr=str(root / "tokenhmr.ckpt"),
        dwpose=str(root / "dwpose.pth"),
        yolox=str(root / "yolox.pth"),
        rcnn=str(root / "rcnn.npz"),
    )
    # rcnn file selects the R-CNN mesh detector; classifier geometry comes
    # from the checkpoint, not the (deliberately wrong) config
    assert ex.cfg.mesh_detector == "rcnn"
    assert ex.cfg.head.token_class_num == 8
    # explicitly-configured tiny det/pose geometries are respected (no
    # silent upgrade to yolox_l/dwpose_l)
    assert ex.cfg.det == cfg.det and ex.cfg.pose == cfg.pose
    # every net got the converted weights, not random init
    from video_gen_evals_tpu.models.vit import torch_vit_to_flax

    sd = load_torch_state_dict(str(root / "tokenhmr.ckpt"))
    want_vit = torch_vit_to_flax(sub_state_dict(sd, "backbone."), ex.cfg.vit)
    np.testing.assert_array_equal(
        np.asarray(ex.params["vit"]["block0"]["qkv"]["kernel"]),
        want_vit["block0"]["qkv"]["kernel"],
    )
    for net in ("det", "pose", "head", "rcnn"):
        assert net in ex.params
    # the full pipeline runs with the dropped weights
    frames = rng.integers(0, 255, size=(6, 48, 40, 3)).astype(np.uint8)
    out = ex.process_video(frames)
    if out is not None:
        assert np.isfinite(out["vit"]).all()
    kp = ex.process_video_keypoints(frames)
    assert kp["kp120"].shape[-1] == 120


def test_partial_drop_keeps_random_nets(ckpt_files):
    root, cfg = ckpt_files
    ex = Extractor.from_checkpoints(cfg, yolox=str(root / "yolox.pth"))
    assert ex.cfg.mesh_detector == "yolox"
    for net in ("vit", "head", "pose"):
        assert net in ex.params   # random init retained


def test_loader_container_conventions(ckpt_files, tmp_path):
    root, _ = ckpt_files
    # Megvii wrapper: non-tensor extras dropped, 'model' unwrapped
    sd = load_torch_state_dict(str(root / "yolox.pth"))
    assert all(isinstance(v, np.ndarray) for v in sd.values())
    assert not any(k.startswith("model.") for k in sd)
    # DataParallel 'module.' prefix is stripped
    torch.save(
        {"state_dict": {"module.a.weight": torch.zeros(2)}}, tmp_path / "dp.pt"
    )
    assert list(load_torch_state_dict(str(tmp_path / "dp.pt"))) == ["a.weight"]
    # wrong-file drop fails loudly
    with pytest.raises(ValueError, match="no keys under prefix"):
        sub_state_dict(sd, "smpl_head.")


def test_published_geometry_upgrade_from_defaults():
    """Default (lite) det/pose configs upgrade to yolox_l/dwpose_l when a
    checkpoint is given — without loading any file for the nets we check."""
    from video_gen_evals_tpu.pipelines.weights import published_config

    cfg = published_config(
        ExtractorConfig(), yolox="unused.pth", dwpose="unused.pth"
    )
    assert cfg.det == DetectorConfig.yolox_l()
    assert cfg.pose == PoseNetConfig.dwpose_l()
