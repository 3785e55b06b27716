"""FRCNN converter NUMERIC parity against real torch layouts.

The reference's 2D branch lives in the external ``mmdet==2.14.0`` pip
package (not installed here), so — per the reference config
(``configs/detmatch/001/detmatch/split_0.py:38-99``) — the exact modules
it builds (ResNet-50-caffe backbone, FPN, RPNHead, Shared2FCBBoxHead) are
reimplemented in plain torch below with mmdet's module/parameter NAMING,
randomized, exported through
``tools/model_converters/import_torch_ckpt.convert_frcnn``, and A/B'd
against this repo's flax modules on the same inputs. This closes the
round-3 gap: a silent transpose / flatten-order bug in the converter now
fails here instead of surfacing as mysteriously-bad 2D AP after a real
checkpoint import.
"""
import functools
import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@functools.lru_cache()
def converter():
    spec = importlib.util.spec_from_file_location(
        "import_torch_ckpt",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "model_converters", "import_torch_ckpt.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# plain-torch reimplementation of the mmdet modules the reference
# configures (naming matches mmdet state_dict keys exactly)
# ---------------------------------------------------------------------------

class TBottleneck(tnn.Module):
    """mmdet Bottleneck, style='caffe' (stride on the 1x1 conv1)."""

    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, stride=stride,
                                bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride=stride,
                           bias=False),
                tnn.BatchNorm2d(planes * 4))
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idn)


class TResNet50(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        inp = 64
        for stage, (n, planes) in enumerate(
                zip((3, 4, 6, 3), (64, 128, 256, 512))):
            blocks = []
            stride = 1 if stage == 0 else 2
            for b in range(n):
                blocks.append(TBottleneck(
                    inp, planes, stride=stride if b == 0 else 1,
                    downsample=(b == 0)))
                inp = planes * 4
            setattr(self, f"layer{stage + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        outs = []
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
            outs.append(x)
        return outs


class _ConvModule(tnn.Module):
    """mmdet ConvModule (no norm/act) → parameter key '<name>.conv.*'."""

    def __init__(self, cin, cout, k, padding=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, padding=padding)

    def forward(self, x):
        return self.conv(x)


class TFPN(tnn.Module):
    def __init__(self, in_channels=(256, 512, 1024, 2048), out=256):
        super().__init__()
        self.lateral_convs = tnn.ModuleList(
            [_ConvModule(c, out, 1) for c in in_channels])
        self.fpn_convs = tnn.ModuleList(
            [_ConvModule(out, out, 3, padding=1) for _ in in_channels])

    def forward(self, inputs):
        lats = [l(x) for l, x in zip(self.lateral_convs, inputs)]
        for i in range(len(lats) - 1, 0, -1):
            lats[i - 1] = lats[i - 1] + F.interpolate(
                lats[i], size=lats[i - 1].shape[-2:], mode="nearest")
        outs = [f(l) for f, l in zip(self.fpn_convs, lats)]
        outs.append(F.max_pool2d(outs[-1], 1, stride=2))
        return outs


class TRPNHead(tnn.Module):
    def __init__(self, channels=256, num_anchors=3):
        super().__init__()
        self.rpn_conv = tnn.Conv2d(channels, channels, 3, padding=1)
        self.rpn_cls = tnn.Conv2d(channels, num_anchors, 1)
        self.rpn_reg = tnn.Conv2d(channels, num_anchors * 4, 1)

    def forward(self, feats):
        outs = []
        for f in feats:
            x = F.relu(self.rpn_conv(f))
            outs.append((self.rpn_cls(x), self.rpn_reg(x)))
        return outs


class TBBoxHead(tnn.Module):
    """mmdet Shared2FCBBoxHead: flatten(1) on (R, 256, 7, 7) NCHW."""

    def __init__(self, num_classes=3, fc=1024):
        super().__init__()
        self.shared_fcs = tnn.ModuleList(
            [tnn.Linear(256 * 7 * 7, fc), tnn.Linear(fc, fc)])
        self.fc_cls = tnn.Linear(fc, num_classes + 1)
        self.fc_reg = tnn.Linear(fc, num_classes * 4)

    def forward(self, x):
        x = x.flatten(1)
        for fc in self.shared_fcs:
            x = F.relu(fc(x))
        return self.fc_cls(x), self.fc_reg(x)


class TFRCNN(tnn.Module):
    """Container so state_dict keys carry the mmdet prefixes."""

    def __init__(self):
        super().__init__()
        self.backbone = TResNet50()
        self.neck = TFPN()
        self.rpn_head = TRPNHead()
        self.roi_head = tnn.Module()
        self.roi_head.bbox_head = TBBoxHead()


def _randomize(module, rng):
    sd = module.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.from_numpy(
                    0.5 + rng.rand(*v.shape).astype(np.float32))
            else:
                sd[k] = torch.from_numpy(
                    rng.randn(*v.shape).astype(np.float32) * 0.08)
    module.load_state_dict(sd)
    return module


@functools.lru_cache()
def _converted():
    rng = np.random.RandomState(0)
    t = _randomize(TFRCNN(), rng).eval()
    params, frozen = converter().convert_frcnn(
        {k: v for k, v in t.state_dict().items()})
    return t, params, frozen


def test_backbone_fpn_rpn_numeric_parity():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from detmatch_tpu.models.frcnn.resnet import FPN, ResNet50
    from detmatch_tpu.models.frcnn.rpn import RPNHead

    t, params, frozen = _converted()
    rng = np.random.RandomState(1)
    x = rng.randn(2, 64, 96, 3).astype(np.float32)

    with torch.no_grad():
        feats_t = t.backbone(torch.from_numpy(
            x.transpose(0, 3, 1, 2)))
        fpn_t = t.neck(feats_t)
        rpn_t = t.rpn_head(fpn_t)

    feats_j = ResNet50().apply(
        {"params": params["backbone"], "frozen": frozen["backbone"]},
        jnp.asarray(x))
    for i, (tj, tt) in enumerate(zip(feats_j, feats_t)):
        np.testing.assert_allclose(
            np.asarray(tj), tt.numpy().transpose(0, 2, 3, 1),
            atol=1e-3, err_msg=f"backbone C{i + 2}")

    fpn_j = FPN().apply({"params": params["neck"]}, feats_j)
    for i, (pj, pt) in enumerate(zip(fpn_j, fpn_t)):
        np.testing.assert_allclose(
            np.asarray(pj), pt.numpy().transpose(0, 2, 3, 1),
            atol=1e-3, err_msg=f"FPN P{i + 2}")

    rpn_j = RPNHead().apply({"params": params["rpn_head"]}, fpn_j)
    for i, ((cj, rj), (ct, rt)) in enumerate(zip(rpn_j, rpn_t)):
        np.testing.assert_allclose(
            np.asarray(cj), ct.numpy().transpose(0, 2, 3, 1),
            atol=1e-3, err_msg=f"rpn_cls L{i}")
        np.testing.assert_allclose(
            np.asarray(rj), rt.numpy().transpose(0, 2, 3, 1),
            atol=1e-3, err_msg=f"rpn_reg L{i}")


def test_bbox_head_numeric_parity():
    """Catches flatten-order bugs: torch flattens (R, C, 7, 7) C-major,
    flax flattens (R, 7, 7, C) H-major — the converter must permute the
    first shared FC's input dimension."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from detmatch_tpu.models.frcnn.roi_head2d import Shared2FCBBoxHead

    t, params, frozen = _converted()
    rng = np.random.RandomState(2)
    pooled = rng.randn(9, 256, 7, 7).astype(np.float32)

    with torch.no_grad():
        cls_t, reg_t = t.roi_head.bbox_head(torch.from_numpy(pooled))

    cls_j, reg_j = Shared2FCBBoxHead().apply(
        {"params": params["bbox_head"]},
        jnp.asarray(pooled.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(cls_j), cls_t.numpy(),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(reg_j), reg_t.numpy(),
                               atol=1e-3)
