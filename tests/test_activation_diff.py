"""Smoke tests for the activation-diff harness (scripts/activation_diff.py)
against the in-repo torch replicas — proves the anchor tables, name
translation, NCHW->NHWC handling, and the CLI plumbing work end to end, so a
real checkpoint drop needs zero new code (VERDICT.md round 2, Missing #4)."""

import dataclasses
import sys
import os

import numpy as np
import jax
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from activation_diff import (  # noqa: E402
    diff_activations,
    main as adiff_main,
    run_diff,
    torch_module_activations,
)


def _ok_rows(rows, tol=1e-3):
    ok = [r for r in rows if r.status == "ok"]
    bad_status = [r for r in rows if r.status != "ok"]
    over = [r for r in ok if not (r.max_abs <= tol)]
    assert not bad_status, f"unmatched anchors: {[(r.torch_name, r.status) for r in bad_status]}"
    assert not over, f"over tol: {[(r.torch_name, r.max_abs) for r in over]}"
    return ok


# ---- ViT (timm-style torch replica) -----------------------------------------
class _PatchEmbed(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, 8, 8)

    def forward(self, x):
        return self.proj(x)


class _TimmAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, D = x.shape
        hd = D // self.heads
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-1, -2) / (hd ** 0.5)).softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(out)


class _TimmMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _TimmBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _TimmAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _TimmMlp(dim, dim * 4)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _TimmViT(nn.Module):
    def __init__(self, dim=32, depth=2, heads=4, n_patches=12):
        super().__init__()
        self.patch_embed = _PatchEmbed(dim)
        self.pos_embed = nn.Parameter(torch.randn(1, n_patches, dim) * 0.02)
        self.blocks = nn.ModuleList([_TimmBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        x = self.patch_embed(x)
        x = x.flatten(2).transpose(1, 2) + self.pos_embed
        for b in self.blocks:
            x = b(x)
        return self.norm(x)


def test_vit_activation_diff(tmp_path):
    torch.manual_seed(0)
    ref = _TimmViT().eval()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 24, 3)).astype(np.float32)
    acts = torch_module_activations(ref, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    overrides = dict(img_size=[32, 24], patch_size=8, embed_dim=32, depth=2, num_heads=4)

    rows = run_diff("vit", sd, x, acts, overrides)
    ok = _ok_rows(rows)
    assert len(ok) == 4  # patch_embed + 2 blocks + norm

    # full CLI path (argparse, file IO, exit code)
    np.save(tmp_path / "x.npy", x)
    np.savez(tmp_path / "sd.npz", **sd)
    np.savez(tmp_path / "acts.npz", **acts)
    rc = adiff_main([
        "--network", "vit",
        "--state-dict", str(tmp_path / "sd.npz"),
        "--input", str(tmp_path / "x.npy"),
        "--acts", str(tmp_path / "acts.npz"),
        "--config-json",
        '{"img_size": [32, 24], "patch_size": 8, "embed_dim": 32,'
        ' "depth": 2, "num_heads": 4}',
    ])
    assert rc == 0


def test_vit_activation_diff_catches_wrong_weights():
    """A deliberately corrupted layer must surface as an over-tol row AND a
    nonzero exit path — the harness actually discriminates."""
    torch.manual_seed(0)
    ref = _TimmViT().eval()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 32, 24, 3)).astype(np.float32)
    acts = torch_module_activations(ref, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    # random perturbation (a constant offset would vanish: fc1 consumes a
    # zero-mean LayerNorm output, so W+c adds c*sum(h) ~= 0)
    sd["blocks.1.mlp.fc1.weight"] = (
        sd["blocks.1.mlp.fc1.weight"]
        + rng.normal(scale=0.1, size=sd["blocks.1.mlp.fc1.weight"].shape).astype(
            np.float32
        )
    )
    overrides = dict(img_size=[32, 24], patch_size=8, embed_dim=32, depth=2, num_heads=4)
    rows = run_diff("vit", sd, x, acts, overrides)
    by_name = {r.torch_name: r for r in rows}
    assert by_name["blocks.0"].max_abs <= 1e-4          # pre-corruption layers fine
    assert by_name["blocks.1"].max_abs > 1e-2           # corruption localized


# ---- SMPL head ---------------------------------------------------------------
def test_smpl_head_activation_diff():
    from test_tokenhmr_decoder import TorchSMPLTokenHead, _classifier_cfg

    cfg = _classifier_cfg()
    torch.manual_seed(7)
    ref = TorchSMPLTokenHead(cfg).eval()
    rng = np.random.default_rng(7)
    ctx = rng.normal(size=(2, 6, cfg.context_dim)).astype(np.float32)
    acts = torch_module_activations(ref, torch.from_numpy(ctx))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rows = run_diff("smpl_head", sd, ctx, acts, dataclasses.asdict(cfg))
    ok = _ok_rows(rows)
    # 3 per decoder layer + decoder + 6 classifier stages + mixers + 4 readouts
    assert len(ok) == 3 * cfg.depth + 1 + 6 + cfg.dec_num_blocks + 4


# ---- RTMPose -----------------------------------------------------------------
def test_rtmpose_activation_diff():
    from test_rtmpose import TINY, TorchRTMPose, _randomize_bn_stats

    torch.manual_seed(3)
    ref = TorchRTMPose(TINY).eval()
    with torch.no_grad():
        _randomize_bn_stats(ref, np.random.default_rng(3))
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, *TINY.input_hw, 3)).astype(np.float32)
    acts = torch_module_activations(ref, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rows = run_diff("rtmpose", sd, x, acts, dataclasses.asdict(TINY))
    ok = _ok_rows(rows)
    assert len(ok) == 10  # stem + 4 stages + 5 head stages


# ---- YOLOX -------------------------------------------------------------------
def test_yolox_activation_diff():
    from test_yolox import TINY, TorchYOLOX, _randomize_bn_stats

    torch.manual_seed(4)
    ref = TorchYOLOX(TINY).eval()
    with torch.no_grad():
        _randomize_bn_stats(ref, np.random.default_rng(4))
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, *TINY.input_hw, 3)).astype(np.float32)
    acts = torch_module_activations(ref, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rows = run_diff("yolox", sd, x, acts, dataclasses.asdict(TINY))
    ok = _ok_rows(rows)
    assert len(ok) == 1 + 4 + 8 + 18  # stem, darks, PAFPN nodes, head convs/preds


# ---- anchor-table unit behavior ---------------------------------------------
def test_suffix_tolerant_lookup_and_statuses():
    t = {"model.backbone.stem": np.zeros((1, 2)), "other": np.zeros((1,))}
    f = {"neck/backbone/stem": np.zeros((1, 2)), "extra": np.zeros((1,))}
    rows = diff_activations(
        t, f,
        [("backbone.stem", "neck/backbone/stem"),   # matches via suffix
         ("missing.mod", "neck/backbone/stem"),
         ("backbone.stem", "not/there")],
    )
    assert [r.status for r in rows] == ["ok", "missing-torch", "missing-flax"]
    assert rows[0].max_abs == 0.0


# ---- Faster R-CNN ------------------------------------------------------------
def test_rcnn_activation_diff():
    from test_rcnn import TorchRCNN, _randomize
    from video_gen_evals_tpu.models.rcnn import RCNNConfig

    cfg = RCNNConfig.small()
    ref = _randomize(TorchRCNN(cfg), seed=6).eval()
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 64, 96, 3)).astype(np.float32)
    acts = torch_module_activations(ref, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rows = run_diff("rcnn", sd, x, acts, dataclasses.asdict(cfg))
    ok = _ok_rows(rows)
    # stem + res blocks + 8 FPN convs + 2 per-level RPN preds (last level)
    assert len(ok) == 1 + sum(cfg.stage_blocks) + 8 + 2


def test_load_state_dict_prefix_survives_wrapper_strip(tmp_path):
    """The canonical loader uniformly strips `model.`/`module.` wrapper
    prefixes; a --key-prefix written against the RAW checkpoint keys
    (e.g. `model.backbone.`) must still resolve instead of raising."""
    from activation_diff import _load_state_dict

    sd = {
        "model.backbone.w": torch.ones(2, 2),
        "model.head.w": torch.zeros(3),
    }
    p = str(tmp_path / "sd.pt")
    torch.save(sd, p)

    # raw-key prefix: retried with the stripped wrapper
    out = _load_state_dict(p, key_prefix="model.backbone.")
    assert sorted(out) == ["w"]
    # post-strip prefix works directly
    out2 = _load_state_dict(p, key_prefix="backbone.")
    assert sorted(out2) == ["w"]
    # a genuinely wrong prefix still fails loudly
    with pytest.raises(ValueError, match="no keys under prefix"):
        _load_state_dict(p, key_prefix="model.nonexistent.")
