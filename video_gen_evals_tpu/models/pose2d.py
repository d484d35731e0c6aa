"""DWPose-equivalent whole-body 2D pose estimation, batched and fixed-shape.

Capability parity with the reference's vendored DWPose stack (C28-C29 in
SURVEY.md): a top-down SimCC pose network over person crops plus the exact
post-processing semantics of ``modifications/dwpose_init.py`` and
``modifications/process_video.py``:

- 133 COCO-wholebody keypoints -> openpose-style 134 (neck inserted, body
  reordered) exactly as DWPose's ``Wholebody`` conversion;
- coordinates normalized by (W, H); visibility < 0.3 -> -1 sentinel
  (ref ``dwpose_init.py:42-57``);
- split body[0:18] / foot[18:24] / face[24:92] / hands[92:113]+[113:134]
  (ref ``dwpose_init.py:59-64``);
- the 120-d per-frame flatten (18 body + 2x21 hand x/y) with the
  "first person, >= 18 body kps, both hands" validity rule
  (ref ``process_video.py:23-57``) — realized as a fixed-shape mask instead
  of frame dropping (SURVEY §7.1: masks replace data-dependent shapes; the
  reference's silent frame-drop misalignment quirk becomes explicit).

The network itself (``RTMPoseNet``) follows RTMPose's PUBLISHED architecture
exactly — CSPNeXt backbone (3-conv stem, CSP stages with CSPNeXt blocks,
channel attention, SPP on the last stage) and the RTMCC head (7x7 final conv
to per-keypoint token maps, ScaleNorm+Linear token MLP, one Gated Attention
Unit, bias-free SimCC x/y classifiers) — so the reference's DWPose weights
(mmpose-layout state dicts; the ONNX graphs are exports of the same nets)
convert 1:1 through :func:`mmpose_to_flax`. Decode matches mmpose's
``get_simcc_maximum``: argmax bin / split_ratio, score = min(max_x, max_y).
The converter is unit-tested against a torch replica of the published layout
(``tests/test_rtmpose.py``); only the checkpoint files themselves are absent
from this image.
"""

from __future__ import annotations

import dataclasses
import typing as T

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NUM_WHOLEBODY_KPTS = 133    # COCO-wholebody
NUM_OPENPOSE_KPTS = 134     # after neck insertion

# mmpose -> openpose body reordering (public DWPose Wholebody conversion)
_MMPOSE_IDX = (17, 6, 8, 10, 7, 9, 12, 14, 16, 13, 15, 2, 1, 4, 3)
_OPENPOSE_IDX = (1, 2, 3, 4, 6, 7, 8, 9, 10, 12, 13, 14, 15, 16, 17)


@dataclasses.dataclass(frozen=True)
class PoseNetConfig:
    """RTMPose/CSPNeXt hyperparameters. ``deepen/widen`` scale the P5 arch
    table exactly as mmpose does; :meth:`dwpose_l` is the layout of the
    reference's DWPose wholebody model (384x288, widen 1.0)."""

    input_hw: T.Tuple[int, int] = (256, 192)   # (H, W) of person crops
    num_keypoints: int = NUM_WHOLEBODY_KPTS
    deepen_factor: float = 0.33
    widen_factor: float = 0.5
    simcc_ratio: float = 2.0
    gau_dim: int = 256
    gau_s: int = 128
    gau_expansion: int = 2
    final_kernel: int = 7

    # base CSPNeXt-P5 arch: (in, out, num_blocks, add_identity, use_spp)
    _ARCH: T.ClassVar[T.Tuple] = (
        (64, 128, 3, True, False),
        (128, 256, 6, True, False),
        (256, 512, 6, True, False),
        (512, 1024, 3, False, True),
    )

    def width(self, c: int) -> int:
        return max(1, int(c * self.widen_factor))

    def depth(self, n: int) -> int:
        return max(1, round(n * self.deepen_factor))

    @classmethod
    def dwpose_l(cls) -> "PoseNetConfig":
        return cls(input_hw=(384, 288), deepen_factor=1.0, widen_factor=1.0)


class BatchNormInference(nn.Module):
    """Frozen BatchNorm (running stats as params): these nets run pretrained
    and inference-only in the extraction pipeline, so the stats are plain
    parameters filled in by the weight converter."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        return (x - mean) * (scale * jax.lax.rsqrt(var + self.eps)) + bias


class ConvBN(nn.Module):
    """mmcv ConvModule: Conv2d(bias=False) + BN + SiLU."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            feature_group_count=self.groups,
            use_bias=False,
            name="conv",
        )(x)
        x = BatchNormInference(name="bn")(x)
        return jax.nn.silu(x) if self.act else x


class CSPNeXtBlock(nn.Module):
    """3x3 conv -> 5x5 depthwise-separable conv, residual add."""

    features: int
    add_identity: bool = True

    @nn.compact
    def __call__(self, x):
        h = ConvBN(self.features, kernel=3, name="conv1")(x)
        h = ConvBN(self.features, kernel=5, groups=self.features, name="conv2_dw")(h)
        h = ConvBN(self.features, kernel=1, name="conv2_pw")(h)
        return x + h if self.add_identity else h


class ChannelAttention(nn.Module):
    """Global-pool -> 1x1 conv (with bias) -> hardsigmoid gate."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = x.mean(axis=(1, 2))
        g = nn.Dense(c, name="fc")(g)
        return x * jax.nn.hard_sigmoid(g)[:, None, None, :]


class CSPLayer(nn.Module):
    """CSP split: main branch (1x1 + n CSPNeXt blocks) || short branch (1x1),
    concat, channel attention, 1x1 merge. expand_ratio = 0.5."""

    features: int
    n_blocks: int
    add_identity: bool = True

    @nn.compact
    def __call__(self, x):
        mid = self.features // 2
        main = ConvBN(mid, kernel=1, name="main_conv")(x)
        for i in range(self.n_blocks):
            main = CSPNeXtBlock(mid, self.add_identity, name=f"block{i}")(main)
        short = ConvBN(mid, kernel=1, name="short_conv")(x)
        both = jnp.concatenate([main, short], axis=-1)
        both = ChannelAttention(name="attention")(both)
        return ConvBN(self.features, kernel=1, name="final_conv")(both)


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling: 1x1 reduce, maxpools k=5/9/13, 1x1 merge."""

    features: int
    kernel_sizes: T.Tuple[int, ...] = (5, 9, 13)

    @nn.compact
    def __call__(self, x):
        mid = x.shape[-1] // 2
        x = ConvBN(mid, kernel=1, name="conv1")(x)
        pools = [
            nn.max_pool(
                x, (k, k), strides=(1, 1), padding=[(k // 2, k // 2)] * 2
            )
            for k in self.kernel_sizes
        ]
        return ConvBN(self.features, kernel=1, name="conv2")(
            jnp.concatenate([x] + pools, axis=-1)
        )


class CSPNeXt(nn.Module):
    """CSPNeXt-P5 backbone, last-stage output only (out_indices=(4,))."""

    config: PoseNetConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        stem_c = cfg.width(cfg._ARCH[0][0])
        x = ConvBN(max(1, stem_c // 2), stride=2, name="stem0")(x)
        x = ConvBN(max(1, stem_c // 2), name="stem1")(x)
        x = ConvBN(stem_c, name="stem2")(x)
        for s, (_, out_c, n, add_id, use_spp) in enumerate(cfg._ARCH, start=1):
            out = cfg.width(out_c)
            x = ConvBN(out, stride=2, name=f"stage{s}_conv")(x)
            if use_spp:
                x = SPPBottleneck(out, name=f"stage{s}_spp")(x)
            x = CSPLayer(out, cfg.depth(n), add_id, name=f"stage{s}_csp")(x)
        return x


class ScaleNorm(nn.Module):
    """x / max(||x|| * d^-0.5, eps) * g  (scalar g)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1,))
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True) * (x.shape[-1] ** -0.5)
        return x / jnp.maximum(norm, self.eps) * g


class GatedAttentionUnit(nn.Module):
    """RTMCCBlock (self-attn flavor, no rel-bias/pos-enc, dropout 0):

      shortcut = x * res_scale
      x <- ScaleNorm(x); uv = SiLU(x @ Wuv); u, v, base = split(uv, [e, e, s])
      q = base*gamma0+beta0; k = base*gamma1+beta1
      out = u * (relu(q k^T / sqrt(s))^2 @ v) @ Wo
      return shortcut + out
    """

    dim: int
    expansion: int = 2
    s: int = 128

    @nn.compact
    def __call__(self, x):
        e = self.dim * self.expansion
        res_scale = self.param("res_scale", nn.initializers.ones, (self.dim,))
        shortcut = x * res_scale
        x = ScaleNorm(name="ln")(x)
        uv = jax.nn.silu(nn.Dense(2 * e + self.s, use_bias=False, name="uv")(x))
        u, v, base = jnp.split(uv, [e, 2 * e], axis=-1)
        gamma = self.param("gamma", nn.initializers.normal(0.02), (2, self.s))
        beta = self.param("beta", nn.initializers.zeros, (2, self.s))
        q = base * gamma[0] + beta[0]
        k = base * gamma[1] + beta[1]
        qk = jnp.einsum("bnd,bmd->bnm", q, k) / jnp.sqrt(
            jnp.asarray(self.s, x.dtype)
        )
        kernel = jnp.square(jax.nn.relu(qk))
        out = u * jnp.einsum("bnm,bme->bne", kernel, v)
        return shortcut + nn.Dense(self.dim, use_bias=False, name="o")(out)


class RTMPoseNet(nn.Module):
    """RTMPose top-down pose net: CSPNeXt backbone + RTMCC SimCC head."""

    config: PoseNetConfig

    @nn.compact
    def __call__(self, crops: jnp.ndarray) -> T.Tuple[jnp.ndarray, jnp.ndarray]:
        """``crops``: [B, H, W, 3] normalized -> (keypoints_xy [B, K, 2] in
        crop pixel coords, scores [B, K])."""
        cfg = self.config
        H, W = cfg.input_hw
        K = cfg.num_keypoints

        feats = CSPNeXt(cfg, name="backbone")(crops)          # [B, h, w, C]
        B, h, w, _ = feats.shape
        fk = cfg.final_kernel
        tok = nn.Conv(
            K, (fk, fk), padding=[(fk // 2, fk // 2)] * 2, name="final_layer"
        )(feats)                                              # [B, h, w, K]
        tok = tok.transpose(0, 3, 1, 2).reshape(B, K, h * w)  # per-kpt token
        tok = ScaleNorm(name="mlp_ln")(tok)
        tok = nn.Dense(cfg.gau_dim, use_bias=False, name="mlp_fc")(tok)
        tok = GatedAttentionUnit(
            cfg.gau_dim, cfg.gau_expansion, cfg.gau_s, name="gau"
        )(tok)                                                # [B, K, d]

        nx = int(W * cfg.simcc_ratio)
        ny = int(H * cfg.simcc_ratio)
        x_logits = nn.Dense(nx, use_bias=False, name="cls_x")(tok)
        y_logits = nn.Dense(ny, use_bias=False, name="cls_y")(tok)
        return simcc_decode(x_logits, y_logits, cfg.simcc_ratio)


def simcc_decode(
    x_logits: jnp.ndarray,  # [B, K, nx]
    y_logits: jnp.ndarray,  # [B, K, ny]
    simcc_ratio: float,
) -> T.Tuple[jnp.ndarray, jnp.ndarray]:
    """mmpose ``get_simcc_maximum``: argmax bin / split_ratio per axis,
    score = min(max_x, max_y), locations -1 where score <= 0."""
    xs = jnp.argmax(x_logits, axis=-1).astype(jnp.float32) / simcc_ratio
    ys = jnp.argmax(y_logits, axis=-1).astype(jnp.float32) / simcc_ratio
    scores = jnp.minimum(jnp.max(x_logits, axis=-1), jnp.max(y_logits, axis=-1))
    kp = jnp.stack([xs, ys], axis=-1)
    kp = jnp.where(scores[..., None] > 0, kp, -1.0)
    return kp, scores


# backwards-compatible alias (pipeline/tests referred to the round-1 name)
SimCCPoseNet = RTMPoseNet


def mmpose_to_flax(sd: T.Dict[str, T.Any], cfg: PoseNetConfig) -> T.Dict:
    """Map an mmpose RTMPose state_dict (``backbone.*`` CSPNeXt +
    ``head.*`` RTMCCHead, e.g. the DWPose wholebody checkpoints the
    reference's ONNX graphs are exported from) onto :class:`RTMPoseNet`'s
    param tree. Works on ``{name: np.ndarray}``; no torch import needed."""

    def conv(prefix):
        # one transpose covers both regular [O,I,k,k]->[k,k,I,O] and
        # depthwise [C,1,k,k]->[k,k,1,C] torch->flax layouts
        w = np.asarray(sd[f"{prefix}.weight"])
        return {"kernel": np.transpose(w, (2, 3, 1, 0))}

    def bn(prefix):
        return {
            "scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
            "mean": np.asarray(sd[f"{prefix}.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.running_var"]),
        }

    def convbn(prefix):
        return {"conv": conv(f"{prefix}.conv"), "bn": bn(f"{prefix}.bn")}

    def dense(prefix, bias=True):
        out = {"kernel": np.transpose(np.asarray(sd[f"{prefix}.weight"]), (1, 0))}
        if bias and f"{prefix}.bias" in sd:
            out["bias"] = np.asarray(sd[f"{prefix}.bias"])
        return out

    def csp_block(prefix):
        return {
            "conv1": convbn(f"{prefix}.conv1"),
            "conv2_dw": convbn(f"{prefix}.conv2.depthwise_conv"),
            "conv2_pw": convbn(f"{prefix}.conv2.pointwise_conv"),
        }

    def csp_layer(prefix):
        out = {
            "main_conv": convbn(f"{prefix}.main_conv"),
            "short_conv": convbn(f"{prefix}.short_conv"),
            "final_conv": convbn(f"{prefix}.final_conv"),
            "attention": {
                "fc": {
                    "kernel": np.asarray(sd[f"{prefix}.attention.fc.weight"])[
                        :, :, 0, 0
                    ].T,
                    "bias": np.asarray(sd[f"{prefix}.attention.fc.bias"]),
                }
            },
        }
        i = 0
        while f"{prefix}.blocks.{i}.conv1.conv.weight" in sd:
            out[f"block{i}"] = csp_block(f"{prefix}.blocks.{i}")
            i += 1
        return out

    backbone: T.Dict[str, T.Any] = {
        "stem0": convbn("backbone.stem.0"),
        "stem1": convbn("backbone.stem.1"),
        "stem2": convbn("backbone.stem.2"),
    }
    for s, (_, _, _, _, use_spp) in enumerate(cfg._ARCH, start=1):
        backbone[f"stage{s}_conv"] = convbn(f"backbone.stage{s}.0")
        if use_spp:
            spp = f"backbone.stage{s}.1"
            backbone[f"stage{s}_spp"] = {
                "conv1": convbn(f"{spp}.conv1"),
                "conv2": convbn(f"{spp}.conv2"),
            }
            backbone[f"stage{s}_csp"] = csp_layer(f"backbone.stage{s}.2")
        else:
            backbone[f"stage{s}_csp"] = csp_layer(f"backbone.stage{s}.1")

    params: T.Dict[str, T.Any] = {
        "backbone": backbone,
        "final_layer": {
            "kernel": np.transpose(np.asarray(sd["head.final_layer.weight"]), (2, 3, 1, 0)),
            "bias": np.asarray(sd["head.final_layer.bias"]),
        },
        "mlp_ln": {"g": np.asarray(sd["head.mlp.0.g"]).reshape(1)},
        "mlp_fc": dense("head.mlp.1", bias=False),
        "gau": {
            "ln": {"g": np.asarray(sd["head.gau.ln.g"]).reshape(1)},
            "uv": dense("head.gau.uv", bias=False),
            "gamma": np.asarray(sd["head.gau.gamma"]),
            "beta": np.asarray(sd["head.gau.beta"]),
            "o": dense("head.gau.o", bias=False),
            "res_scale": np.asarray(sd["head.gau.res_scale.scale"]),
        },
        "cls_x": dense("head.cls_x", bias=False),
        "cls_y": dense("head.cls_y", bias=False),
    }
    return params


def wholebody_to_openpose(
    kpts: jnp.ndarray,    # [P, 133, 2]
    scores: jnp.ndarray,  # [P, 133]
) -> T.Tuple[jnp.ndarray, jnp.ndarray]:
    """COCO-wholebody -> openpose layout: insert neck (mean of shoulders,
    visible iff both shoulders > 0.3) at index 17, then reorder the body
    block (DWPose Wholebody conversion)."""
    neck_xy = (kpts[:, 5] + kpts[:, 6]) / 2.0
    neck_sc = jnp.where(
        jnp.logical_and(scores[:, 5] > 0.3, scores[:, 6] > 0.3),
        jnp.minimum(scores[:, 5], scores[:, 6]),
        0.0,
    )
    kpts134 = jnp.concatenate(
        [kpts[:, :17], neck_xy[:, None], kpts[:, 17:]], axis=1
    )
    sc134 = jnp.concatenate([scores[:, :17], neck_sc[:, None], scores[:, 17:]], axis=1)
    mm = jnp.asarray(_MMPOSE_IDX)
    op = jnp.asarray(_OPENPOSE_IDX)
    kpts134 = kpts134.at[:, op].set(kpts134[:, mm])
    sc134 = sc134.at[:, op].set(sc134[:, mm])
    return kpts134, sc134


def dwpose_postprocess(
    kpts134: jnp.ndarray,   # [P, 134, 2] pixel coords in the ORIGINAL frame
    scores: jnp.ndarray,    # [P, 134]
    frame_wh: T.Tuple[jnp.ndarray, jnp.ndarray],
    vis_thresh: float = 0.3,
) -> T.Dict[str, jnp.ndarray]:
    """Exact ``dwpose_init.py`` semantics: normalize by (W, H), mask
    sub-threshold keypoints to -1, split into body/foot/face/hands."""
    W, H = frame_wh
    cand = kpts134 / jnp.stack([W, H]).astype(kpts134.dtype)
    visible = scores > vis_thresh
    cand = jnp.where(visible[..., None], cand, -1.0)
    hands = jnp.concatenate([cand[:, 92:113], cand[:, 113:134]], axis=0)
    return {
        "candidate": cand,                 # [P, 134, 2]
        "body": cand[:, :18],              # [P, 18, 2]
        "foot": cand[:, 18:24],
        "faces": cand[:, 24:92],
        "hands": hands,                    # [2P, 21, 2]
        "visible": visible,
        "raw_score": scores[:, :18],
    }


def flatten_first_person(
    post: T.Dict[str, jnp.ndarray], visibility_rule: bool = False
) -> T.Tuple[jnp.ndarray, jnp.ndarray]:
    """The reference's 120-d flatten (ref ``process_video.py:23-57``),
    fixed-shape. Returns (kp120 [120], valid bool).

    The reference's shape checks (``body_all.shape[0] >= 18``, two hand
    rows) are structurally ALWAYS satisfied once any person is detected —
    its only real drop condition is "no person in this frame", which in
    this fixed-shape design lives with the detector (the caller ANDs its
    person-present mask in). Visibility is never consulted: sub-threshold
    keypoints flow into the 120-d vector as ``-1`` sentinels. So the
    default returns valid=True. ``visibility_rule=True`` opts into a
    stricter quality mask (all 18 body kps + >=1 kp per hand visible) that
    has NO reference counterpart.

    Hands are taken as rows 0 and 1 of the ``[2P, 21, 2]``
    left-hands-then-right-hands stack, exactly like the reference's
    ``h[0], h[1]`` — for P=1 that is person 0's left+right pair; for P>1
    it reproduces the reference's quirk of pairing person 0's and person
    1's LEFT hands (``dwpose_init.py:63-64``).
    """
    body = post["body"][0]            # [18, 2]
    lhand = post["hands"][0]          # [21, 2]
    rhand = post["hands"][1]          # ref h[1] (p0's right hand iff P=1)
    kp120 = jnp.concatenate(
        [body.reshape(-1), lhand.reshape(-1), rhand.reshape(-1)]
    )
    if not visibility_rule:
        return kp120, jnp.bool_(True)
    body_ok = jnp.all(post["visible"][0, :18])
    lhand_ok = jnp.any(post["visible"][0, 92:113])
    rhand_ok = jnp.any(post["visible"][0, 113:134])
    return kp120, jnp.logical_and(body_ok, jnp.logical_and(lhand_ok, rhand_ok))
