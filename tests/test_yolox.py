"""Weight-conversion parity for the YOLOX detector architecture.

DWPose's person detector is a YOLOX export (the reference consumes it through
the vendored ``Wholebody``, ref ``modifications/dwpose_init.py:32-35``). The
Megvii package isn't shipped, so this test reconstructs YOLOX's published
torch layout verbatim — CSPDarknet (Focus stem, CSP layers, SPP), YOLOPAFPN
neck, decoupled heads, exact (xy+grid)*stride / exp(wh)*stride decode — with
Megvii's exact state_dict naming, random-initializes it, and asserts
:func:`yolox_to_flax` + :class:`YOLOXDetector` reproduce its raw predictions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

from video_gen_evals_tpu.models.detector import (  # noqa: E402
    DetectorConfig,
    YOLOXDetector,
    yolox_to_flax,
)


# ---- torch replica of the published Megvii layout (oracle) ------------------
class BaseConv(nn.Module):
    def __init__(self, i, o, k, s=1):
        super().__init__()
        self.conv = nn.Conv2d(i, o, k, s, padding=(k - 1) // 2, bias=False)
        self.bn = nn.BatchNorm2d(o)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class Bottleneck(nn.Module):
    def __init__(self, i, o, shortcut=True):
        super().__init__()
        self.conv1 = BaseConv(i, o, 1)
        self.conv2 = BaseConv(o, o, 3)
        self.use_add = shortcut and i == o

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        return x + y if self.use_add else y


class CSPLayer(nn.Module):
    def __init__(self, i, o, n=1, shortcut=True):
        super().__init__()
        hidden = o // 2
        self.conv1 = BaseConv(i, hidden, 1)
        self.conv2 = BaseConv(i, hidden, 1)
        self.conv3 = BaseConv(2 * hidden, o, 1)
        self.m = nn.Sequential(*[Bottleneck(hidden, hidden, shortcut) for _ in range(n)])

    def forward(self, x):
        x1 = self.m(self.conv1(x))
        x2 = self.conv2(x)
        return self.conv3(torch.cat((x1, x2), dim=1))


class Focus(nn.Module):
    def __init__(self, i, o, k=3):
        super().__init__()
        self.conv = BaseConv(i * 4, o, k)

    def forward(self, x):
        tl = x[..., ::2, ::2]
        tr = x[..., ::2, 1::2]
        bl = x[..., 1::2, ::2]
        br = x[..., 1::2, 1::2]
        return self.conv(torch.cat((tl, bl, tr, br), dim=1))


class SPPBottleneck(nn.Module):
    def __init__(self, i, o, ks=(5, 9, 13)):
        super().__init__()
        mid = i // 2
        self.conv1 = BaseConv(i, mid, 1)
        self.m = nn.ModuleList([nn.MaxPool2d(k, 1, k // 2) for k in ks])
        self.conv2 = BaseConv(mid * (len(ks) + 1), o, 1)

    def forward(self, x):
        x = self.conv1(x)
        return self.conv2(torch.cat([x] + [m(x) for m in self.m], dim=1))


class CSPDarknet(nn.Module):
    def __init__(self, cfg: DetectorConfig):
        super().__init__()
        base, bd = cfg.base_channels, cfg.base_depth
        self.stem = Focus(3, base)
        self.dark2 = nn.Sequential(BaseConv(base, base * 2, 3, 2), CSPLayer(base * 2, base * 2, bd))
        self.dark3 = nn.Sequential(BaseConv(base * 2, base * 4, 3, 2), CSPLayer(base * 4, base * 4, bd * 3))
        self.dark4 = nn.Sequential(BaseConv(base * 4, base * 8, 3, 2), CSPLayer(base * 8, base * 8, bd * 3))
        self.dark5 = nn.Sequential(
            BaseConv(base * 8, base * 16, 3, 2),
            SPPBottleneck(base * 16, base * 16),
            CSPLayer(base * 16, base * 16, bd, shortcut=False),
        )

    def forward(self, x):
        x = self.stem(x)
        x = self.dark2(x)
        d3 = self.dark3(x)
        d4 = self.dark4(d3)
        d5 = self.dark5(d4)
        return d3, d4, d5


class YOLOPAFPN(nn.Module):
    def __init__(self, cfg: DetectorConfig):
        super().__init__()
        bd = cfg.base_depth
        c256, c512, c1024 = cfg.ch(4), cfg.ch(8), cfg.ch(16)
        self.backbone = CSPDarknet(cfg)
        self.upsample = nn.Upsample(scale_factor=2, mode="nearest")
        self.lateral_conv0 = BaseConv(c1024, c512, 1)
        self.C3_p4 = CSPLayer(2 * c512, c512, bd, shortcut=False)
        self.reduce_conv1 = BaseConv(c512, c256, 1)
        self.C3_p3 = CSPLayer(2 * c256, c256, bd, shortcut=False)
        self.bu_conv2 = BaseConv(c256, c256, 3, 2)
        self.C3_n3 = CSPLayer(2 * c256, c512, bd, shortcut=False)
        self.bu_conv1 = BaseConv(c512, c512, 3, 2)
        self.C3_n4 = CSPLayer(2 * c512, c1024, bd, shortcut=False)

    def forward(self, x):
        x2, x1, x0 = self.backbone(x)
        fpn_out0 = self.lateral_conv0(x0)
        f_out0 = self.C3_p4(torch.cat([self.upsample(fpn_out0), x1], 1))
        fpn_out1 = self.reduce_conv1(f_out0)
        pan_out2 = self.C3_p3(torch.cat([self.upsample(fpn_out1), x2], 1))
        pan_out1 = self.C3_n3(torch.cat([self.bu_conv2(pan_out2), fpn_out1], 1))
        pan_out0 = self.C3_n4(torch.cat([self.bu_conv1(pan_out1), fpn_out0], 1))
        return pan_out2, pan_out1, pan_out0


class YOLOXHead(nn.Module):
    def __init__(self, cfg: DetectorConfig):
        super().__init__()
        hidden = cfg.ch(4)
        in_chs = [cfg.ch(4), cfg.ch(8), cfg.ch(16)]
        self.stems = nn.ModuleList([BaseConv(c, hidden, 1) for c in in_chs])
        self.cls_convs = nn.ModuleList(
            [nn.Sequential(BaseConv(hidden, hidden, 3), BaseConv(hidden, hidden, 3)) for _ in in_chs]
        )
        self.reg_convs = nn.ModuleList(
            [nn.Sequential(BaseConv(hidden, hidden, 3), BaseConv(hidden, hidden, 3)) for _ in in_chs]
        )
        self.cls_preds = nn.ModuleList([nn.Conv2d(hidden, cfg.num_classes, 1) for _ in in_chs])
        self.reg_preds = nn.ModuleList([nn.Conv2d(hidden, 4, 1) for _ in in_chs])
        self.obj_preds = nn.ModuleList([nn.Conv2d(hidden, 1, 1) for _ in in_chs])
        self.strides = cfg.strides

    def forward(self, feats):
        boxes, objs, clss = [], [], []
        for i, (stride, f) in enumerate(zip(self.strides, feats)):
            x = self.stems[i](f)
            cls = self.cls_preds[i](self.cls_convs[i](x))
            rf = self.reg_convs[i](x)
            reg = self.reg_preds[i](rf)
            obj = self.obj_preds[i](rf)
            B, _, h, w = reg.shape
            gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
            px = (reg[:, 0] + gx[None].float()) * stride
            py = (reg[:, 1] + gy[None].float()) * stride
            pw = torch.exp(torch.clamp(reg[:, 2], -8, 8)) * stride
            ph = torch.exp(torch.clamp(reg[:, 3], -8, 8)) * stride
            b = torch.stack([px - pw / 2, py - ph / 2, px + pw / 2, py + ph / 2], -1)
            boxes.append(b.reshape(B, h * w, 4))
            objs.append(torch.sigmoid(obj).reshape(B, h * w))
            clss.append(torch.sigmoid(cls).permute(0, 2, 3, 1).reshape(B, h * w, -1))
        return (
            torch.cat(boxes, 1),
            torch.cat(objs, 1),
            torch.cat(clss, 1),
        )


class TorchYOLOX(nn.Module):
    def __init__(self, cfg: DetectorConfig):
        super().__init__()
        self.backbone = YOLOPAFPN(cfg)
        self.head = YOLOXHead(cfg)

    def forward(self, x):
        return self.head(self.backbone(x))


def _randomize_bn_stats(model, gen):
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                gen.normal(scale=0.3, size=m.running_mean.shape).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                gen.uniform(0.5, 2.0, size=m.running_var.shape).astype(np.float32)))


TINY = DetectorConfig(input_hw=(64, 64), depth=0.33, width=0.0625, num_classes=5)


def test_yolox_forward_matches_torch_layout():
    torch.manual_seed(0)
    ref = TorchYOLOX(TINY).eval()
    with torch.no_grad():
        _randomize_bn_stats(ref, np.random.default_rng(3))

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = yolox_to_flax(sd, TINY)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want_boxes, want_obj, want_cls = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    det = YOLOXDetector(TINY)
    raw = det.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(raw["obj"]), want_obj.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(raw["cls"]), want_cls.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(raw["boxes"]), want_boxes.numpy(), atol=1e-3)


def test_converter_consumes_every_key_and_matches_init_tree():
    torch.manual_seed(1)
    ref = TorchYOLOX(TINY)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    sd_real = {k: v for k, v in sd.items() if "num_batches_tracked" not in k}
    params = yolox_to_flax(sd, TINY)
    n_flax = len(jax.tree_util.tree_leaves(params))
    assert n_flax == len(sd_real), (n_flax, len(sd_real))

    det = YOLOXDetector(TINY)
    init = det.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))["params"]
    want = jax.tree_util.tree_map(lambda a: a.shape, init)
    got = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    assert want == got


def test_yolox_l_preset_is_dwpose_detector_layout():
    cfg = DetectorConfig.yolox_l()
    assert cfg.base_channels == 64 and cfg.base_depth == 3
    assert cfg.ch(16) == 1024 and cfg.input_hw == (640, 640)
