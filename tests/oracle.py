"""Torch-oracle harness: import the REFERENCE's own torch modules from
/root/reference/src and compare our JAX reformulations against them
numerically (the only accuracy-parity instrument in a zero-egress world).

The reference depends on torchvision + pycocotools which are not in this
image; ``setup_reference()`` installs minimal pure-torch/pure-python stubs
in ``sys.modules`` *before* putting /root/reference on sys.path.  The stubs
implement the handful of ops the imported code actually executes (nms,
box_iou); torchvision *model* factories used by wrapper backbones
(resnet50, mobilenet_v2) are provided by tests/oracle_models.py as faithful
pure-torch re-implementations of the canonical architectures so the
reference wrappers can slice their children exactly as they do upstream.

Reference modules run on CPU — pass device='cpu' to losses whose ctor
defaults to 'cuda:0'.
"""
from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _torch_nms(boxes, scores, iou_threshold):
    """Sequential greedy NMS, identical keep-order to torchvision.ops.nms."""
    import torch

    order = scores.argsort(descending=True)
    keep = []
    suppressed = torch.zeros(boxes.shape[0], dtype=torch.bool)
    areas = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * \
            (boxes[:, 3] - boxes[:, 1]).clamp(min=0)
    for idx in order.tolist():
        if suppressed[idx]:
            continue
        keep.append(idx)
        lt = torch.max(boxes[idx, :2], boxes[:, :2])
        rb = torch.min(boxes[idx, 2:], boxes[:, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / (areas[idx] + areas - inter + 1e-12)
        suppressed |= iou > iou_threshold
    return torch.tensor(keep, dtype=torch.long)


def _torch_box_iou(box1, box2):
    import torch

    a1, a2 = box1[:, None, :2], box1[:, None, 2:]
    b1, b2 = box2[None, :, :2], box2[None, :, 2:]
    inter = (torch.min(a2, b2) - torch.max(a1, b1)).clamp(min=0).prod(-1)
    area1 = (box1[:, 2:] - box1[:, :2]).clamp(min=0).prod(-1)
    area2 = (box2[:, 2:] - box2[:, :2]).clamp(min=0).prod(-1)
    return inter / (area1[:, None] + area2[None, :] - inter + 1e-12)


def _make_torchvision():
    import torch

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops.nms = _torch_nms
    ops.box_iou = _torch_box_iou

    def batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.long)
        offs = idxs.to(boxes) * (boxes.max() + 1)
        return _torch_nms(boxes + offs[:, None], scores, iou_threshold)

    ops.batched_nms = batched_nms

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError(
                "torchvision stub: this component is not implemented; "
                "oracle tests must not execute it")

    ops.MultiScaleRoIAlign = _Unavailable
    ops.roi_align = _Unavailable
    ops_boxes = types.ModuleType("torchvision.ops.boxes")
    ops_boxes.nms = _torch_nms
    ops_boxes.box_iou = _torch_box_iou
    ops_boxes.batched_nms = batched_nms
    ops.boxes = ops_boxes

    models = types.ModuleType("torchvision.models")

    def _lazy_models():
        from tests import oracle_models
        return oracle_models

    resnet_mod = types.ModuleType("torchvision.models.resnet")
    for name in ("resnet18", "resnet34", "resnet50", "resnet101",
                 "resnet152", "resnext50_32x4d", "resnext101_32x8d",
                 "wide_resnet50_2", "wide_resnet101_2"):
        def _factory(pretrained=False, _name=name, **kw):
            if pretrained:
                raise RuntimeError("zero-egress: no pretrained weights")
            return getattr(_lazy_models(), _name)(**kw)
        setattr(resnet_mod, name, _factory)
        setattr(models, name, _factory)

    mbv2_mod = types.ModuleType("torchvision.models.mobilenetv2")

    def mobilenet_v2(pretrained=False, **kw):
        if pretrained:
            raise RuntimeError("zero-egress: no pretrained weights")
        return _lazy_models().mobilenet_v2(**kw)

    mbv2_mod.mobilenet_v2 = mobilenet_v2
    mbv2_mod.model_urls = {"mobilenet_v2": ""}
    mb_mod = types.ModuleType("torchvision.models.mobilenet")
    mb_mod.mobilenet_v2 = mobilenet_v2
    mb_mod.model_urls = {"mobilenet_v2": ""}
    mbv3_mod = types.ModuleType("torchvision.models.mobilenetv3")
    for name in ("mobilenet_v3_small", "mobilenet_v3_large"):
        def _m3factory(pretrained=False, _name=name, **kw):
            if pretrained:
                raise RuntimeError("zero-egress: no pretrained weights")
            return getattr(_lazy_models(), _name)(**kw)
        setattr(mbv3_mod, name, _m3factory)
        setattr(mb_mod, name, _m3factory)
        setattr(models, name, _m3factory)
    mbv3_mod.model_urls = {"mobilenet_v3_small": "",
                           "mobilenet_v3_large": ""}
    models.mobilenetv3 = mbv3_mod
    models.mobilenet_v2 = mobilenet_v2
    resnet_mod.model_urls = {n: "" for n in (
        "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
        "resnext50_32x4d", "resnext101_32x8d",
        "wide_resnet50_2", "wide_resnet101_2")}
    models.resnet = resnet_mod
    models.mobilenet = mb_mod
    models.mobilenetv2 = mbv2_mod

    shuffle_mod = types.ModuleType("torchvision.models.shufflenetv2")
    for name in ("shufflenet_v2_x0_5", "shufflenet_v2_x1_0",
                 "shufflenet_v2_x1_5", "shufflenet_v2_x2_0"):
        def _sfactory(pretrained=False, _name=name, **kw):
            if pretrained:
                raise RuntimeError("zero-egress: no pretrained weights")
            return getattr(_lazy_models(), _name)(**kw)
        setattr(shuffle_mod, name, _sfactory)
        setattr(models, name, _sfactory)
    shuffle_mod.model_urls = {n: "" for n in (
        "shufflenetv2_x0.5", "shufflenetv2_x1.0", "shufflenetv2_x1.5",
        "shufflenetv2_x2.0")}
    models.shufflenetv2 = shuffle_mod

    squeeze_mod = types.ModuleType("torchvision.models.squeezenet")
    for name in ("squeezenet1_0", "squeezenet1_1"):
        def _qfactory(pretrained=False, _name=name, **kw):
            if pretrained:
                raise RuntimeError("zero-egress: no pretrained weights")
            return getattr(_lazy_models(), _name)(**kw)
        setattr(squeeze_mod, name, _qfactory)
        setattr(models, name, _qfactory)
    squeeze_mod.model_urls = {"squeezenet1_0": "", "squeezenet1_1": ""}
    models.squeezenet = squeeze_mod

    vgg_mod = types.ModuleType("torchvision.models.vgg")
    for name in ("vgg11", "vgg13", "vgg16", "vgg19",
                 "vgg11_bn", "vgg13_bn", "vgg16_bn", "vgg19_bn"):
        def _vfactory(pretrained=False, _name=name, **kw):
            if pretrained:
                raise RuntimeError("zero-egress: no pretrained weights")
            return getattr(_lazy_models(), _name)(**kw)
        setattr(vgg_mod, name, _vfactory)
        setattr(models, name, _vfactory)
    vgg_mod.model_urls = {n: "" for n in (
        "vgg11", "vgg13", "vgg16", "vgg19",
        "vgg11_bn", "vgg13_bn", "vgg16_bn", "vgg19_bn")}
    models.vgg = vgg_mod

    convnext_mod = types.ModuleType("torchvision.models.convnext")
    for name in ("convnext_tiny", "convnext_small", "convnext_base",
                 "convnext_large"):
        def _cfactory(pretrained=False, _name=name, **kw):
            if pretrained:
                raise RuntimeError("zero-egress: no pretrained weights")
            return getattr(_lazy_models(), _name)(**kw)
        setattr(convnext_mod, name, _cfactory)
        setattr(models, name, _cfactory)
    convnext_mod._MODELS_URLS = {n: "" for n in (
        "convnext_tiny", "convnext_small", "convnext_base",
        "convnext_large")}
    models.convnext = convnext_mod

    regnet_mod = types.ModuleType("torchvision.models.regnet")
    for name in ("regnet_x_400mf", "regnet_x_800mf", "regnet_x_1_6gf",
                 "regnet_x_3_2gf", "regnet_x_8gf", "regnet_x_16gf",
                 "regnet_x_32gf", "regnet_y_400mf", "regnet_y_800mf",
                 "regnet_y_1_6gf", "regnet_y_3_2gf", "regnet_y_8gf",
                 "regnet_y_16gf", "regnet_y_32gf", "regnet_y_128gf"):
        def _rgfactory(pretrained=False, _name=name, **kw):
            if pretrained:
                raise RuntimeError("zero-egress: no pretrained weights")
            return getattr(_lazy_models(), _name)(**kw)
        setattr(regnet_mod, name, _rgfactory)
        setattr(models, name, _rgfactory)
    regnet_mod.model_urls = {}
    models.regnet = regnet_mod

    eff_mod = types.ModuleType("torchvision.models.efficientnet")
    for name in ("efficientnet_b0", "efficientnet_b1", "efficientnet_b2",
                 "efficientnet_b3", "efficientnet_b4", "efficientnet_b5",
                 "efficientnet_b6", "efficientnet_b7"):
        def _efactory(pretrained=False, _name=name, **kw):
            if pretrained:
                raise RuntimeError("zero-egress: no pretrained weights")
            return getattr(_lazy_models(), _name)(**kw)
        setattr(eff_mod, name, _efactory)
        setattr(models, name, _efactory)
    eff_mod.model_urls = {}
    models.efficientnet = eff_mod

    dense_mod = types.ModuleType("torchvision.models.densenet")
    for name in ("densenet121", "densenet161", "densenet169", "densenet201"):
        def _dfactory(pretrained=False, _name=name, **kw):
            # pretrained accepted: the reference wrapper hardcodes True
            # (densenet.py:28) before its own AttributeError quirk.
            return getattr(_lazy_models(), _name)(**kw)
        setattr(dense_mod, name, _dfactory)
        setattr(models, name, _dfactory)
    dense_mod.model_urls = {}
    models.densenet = dense_mod

    vit_mod = types.ModuleType("torchvision.models.vision_transformer")
    for name in ("vit_b_16", "vit_b_32", "vit_l_16", "vit_l_32"):
        def _vfactory(pretrained=False, _name=name, **kw):
            if pretrained:
                raise RuntimeError("zero-egress: no pretrained weights")
            return getattr(_lazy_models(), _name)(**kw)
        setattr(vit_mod, name, _vfactory)
        setattr(models, name, _vfactory)
    vit_mod.model_urls = {n: "" for n in
                          ("vit_b_16", "vit_b_32", "vit_l_16", "vit_l_32")}
    models.vision_transformer = vit_mod

    detection = types.ModuleType("torchvision.models.detection")
    detection.maskrcnn_resnet50_fpn = _Unavailable
    detection.fasterrcnn_resnet50_fpn = _Unavailable
    detection.retinanet_resnet50_fpn = _Unavailable
    models.detection = detection

    tv.ops = ops
    tv.models = models
    tv.__version__ = "0.0.0-stub"
    mods = {
        "torchvision": tv,
        "torchvision.ops": ops,
        "torchvision.ops.boxes": ops_boxes,
        "torchvision.models": models,
        "torchvision.models.resnet": resnet_mod,
        "torchvision.models.mobilenet": mb_mod,
        "torchvision.models.mobilenetv2": mbv2_mod,
        "torchvision.models.mobilenetv3": mbv3_mod,
        "torchvision.models.squeezenet": squeeze_mod,
        "torchvision.models.vgg": vgg_mod,
        "torchvision.models.convnext": convnext_mod,
        "torchvision.models.regnet": regnet_mod,
        "torchvision.models.efficientnet": eff_mod,
        "torchvision.models.densenet": dense_mod,
        "torchvision.models.vision_transformer": vit_mod,
        "torchvision.models.detection": detection,
    }
    return mods


def _make_pycocotools():
    pct = types.ModuleType("pycocotools")
    for sub in ("coco", "cocoeval", "mask"):
        m = types.ModuleType(f"pycocotools.{sub}")
        setattr(pct, sub, m)

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("pycocotools stub")

    pct.coco.COCO = _Unavailable
    pct.cocoeval.COCOeval = _Unavailable
    pct.mask.encode = _Unavailable
    pct.mask.decode = _Unavailable
    pct.mask.frPyObjects = _Unavailable
    return {
        "pycocotools": pct,
        "pycocotools.coco": pct.coco,
        "pycocotools.cocoeval": pct.cocoeval,
        "pycocotools.mask": pct.mask,
    }


def _torch16_compat_shims():
    """The reference targets torch 1.6, whose type promotion allowed e.g.
    ``long.clamp_(float_tensor)`` (yolov5_loss.py:273).  Shim the strict
    modern behavior back to 1.6 semantics for integer self tensors."""
    import torch

    orig_clamp_ = torch.Tensor.clamp_

    def clamp_compat(self, min=None, max=None):
        def cast(v):
            if (isinstance(v, torch.Tensor)
                    and v.dtype != self.dtype
                    and not self.dtype.is_floating_point):
                return v.to(self.dtype)
            return v

        return orig_clamp_(self, cast(min), cast(max))

    torch.Tensor.clamp_ = clamp_compat

    # hard-coded torch.cuda.FloatTensor constructors (seg_loss.py:19,330)
    # and .cuda() calls inside model constructors (unet.py:112-117) →
    # CPU no-ops on the CUDA-less in-tree torch
    if not torch.cuda.is_available():
        torch.cuda.FloatTensor = torch.FloatTensor
        torch.nn.Module.cuda = lambda self, *a, **k: self
        torch.Tensor.cuda = lambda self, *a, **k: self

    # numpy 2 removed the np.math alias (yolox_head.py:64 uses it)
    import math

    import numpy as _np

    if not hasattr(_np, "math"):
        _np.math = math


_DONE = False


class _StubFinder:
    """Auto-creates empty stub modules for any torchvision.* submodule not
    explicitly provided (the reference's backbone zoo imports ~15 of them;
    their symbols raise only if actually used)."""

    class _Lazy:
        def __init__(self, name):
            self._name = name

        def __call__(self, *a, **k):
            raise RuntimeError(f"torchvision stub symbol used: {self._name}")

        def __getitem__(self, k):  # model_urls dict lookups
            return ""

        def get(self, *a, **k):
            return ""

    def find_spec(self, fullname, path=None, target=None):
        import importlib.machinery

        if not fullname.startswith("torchvision."):
            return None
        return importlib.machinery.ModuleSpec(
            fullname, self, is_package=True)

    def create_module(self, spec):
        mod = types.ModuleType(spec.name)
        mod.__path__ = []

        def _getattr(name, _full=spec.name):
            if name.startswith("__"):
                raise AttributeError(name)
            return _StubFinder._Lazy(f"{_full}.{name}")

        mod.__getattr__ = _getattr
        return mod

    def exec_module(self, module):
        pass


def setup_reference():
    """Install stubs + sys.path so ``import src.<...>`` resolves to the
    reference.  Idempotent."""
    global _DONE
    if _DONE:
        return
    stubs = {}
    stubs.update(_make_torchvision())
    stubs.update(_make_pycocotools())
    ts = types.ModuleType("torchsummary")   # segnet.py imports it at top
    ts.summary = lambda *a, **k: None
    stubs["torchsummary"] = ts
    for name, mod in stubs.items():
        sys.modules.setdefault(name, mod)
        mod.__path__ = getattr(mod, "__path__", [])
    sys.meta_path.append(_StubFinder())
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _torch16_compat_shims()
    _DONE = True


def to_torch(x):
    import torch

    return torch.from_numpy(__import__("numpy").asarray(x))
